from cutmix_seg_tpu.serve.export import (  # noqa: F401
    export_serving_artifact,
    load_serving_artifact,
    make_serving_fn,
)
