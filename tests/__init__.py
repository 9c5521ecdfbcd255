# Regular package marker: the reference checkout (appended to sys.path by
# tests/test_reference_differential.py) also contains a tests/ package,
# which would otherwise shadow this directory for cross-test imports like
# `from tests.test_train_step import ...`.
