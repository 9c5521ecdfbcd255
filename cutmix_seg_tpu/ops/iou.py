"""Streaming per-class IoU / confusion-matrix accumulation on device.

Bit-accurate re-derivation of the reference evaluator semantics
(reference: evaluation.py:6-62): per-class intersection and union with an
ignore value of 255, accumulated over the whole validation set as integer
counts, final score ``I / max(U, 1)``.

TPU-native formulation: instead of per-sample host NumPy bincounts, we compute
one (C, C) confusion matrix per batch as an MXU matmul of one-hot encodings —
``cm = onehot(truth)^T @ onehot(pred)`` with the valid mask folded into the
truth side — and derive I and U from the matrix:

    I[c] = cm[c, c]
    U[c] = cm[c, :].sum() + cm[:, c].sum() - cm[c, c]

which is exactly the reference's masked (pred==c | tru==c) count. The pixel
axis is chunked so every f32 partial count stays below 2^24 (f32-exact
integer range); per-batch totals are int32 / int64 in the running total, so
the accumulation is exact and can be ``psum``-reduced across data-parallel
replicas. (The previous formulation scatter-added into ``t * C + p`` bins;
kept as ``_confusion_matrix_scatter`` for the measured comparison — TPU
scatters serialize, the same pathology class as the round-5 CE gather,
results_evidence/op_breakdown/.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# Pixel-axis chunk: every f32 partial count stays <= 2^21 < 2^24 (the f32
# exact-integer bound), so the matmul accumulation is exact by construction.
_CM_CHUNK = 1 << 21


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_value"))
def confusion_matrix(
    pred: jnp.ndarray,
    truth: jnp.ndarray,
    num_classes: int,
    ignore_value: int = 255,
) -> jnp.ndarray:
    """(C, C) int32 confusion matrix (rows = truth, cols = pred) over a batch.

    ``pred``/``truth``: integer arrays of identical shape; pixels whose truth
    equals ``ignore_value`` are excluded (the valid mask zeroes the truth-side
    one-hot row, so ignored and out-of-range pixels contribute nothing —
    identical to the scatter formulation's weight-0 bins).
    """
    t = truth.reshape(-1).astype(jnp.int32)
    p = pred.reshape(-1).astype(jnp.int32)
    valid = t != ignore_value
    n = t.shape[0]
    n_chunks = -(-n // _CM_CHUNK)
    pad = n_chunks * _CM_CHUNK - n
    if pad:
        t = jnp.pad(t, (0, pad))
        p = jnp.pad(p, (0, pad))
        valid = jnp.pad(valid, (0, pad))  # pads False -> zero rows
    iota = jnp.arange(num_classes, dtype=jnp.int32)
    cm = jnp.zeros((num_classes, num_classes), dtype=jnp.int32)
    for i in range(n_chunks):
        sl = slice(i * _CM_CHUNK, (i + 1) * _CM_CHUNK)
        a = ((t[sl, None] == iota) & valid[sl, None]).astype(jnp.float32)
        b = (p[sl, None] == iota).astype(jnp.float32)
        part = jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        cm = cm + part.astype(jnp.int32)
    return cm


@functools.partial(jax.jit, static_argnames=("num_classes", "ignore_value"))
def _confusion_matrix_scatter(
    pred: jnp.ndarray,
    truth: jnp.ndarray,
    num_classes: int,
    ignore_value: int = 255,
) -> jnp.ndarray:
    """The pre-round-5 scatter-add formulation, kept for the measured
    comparison (scripts/cm_probe.py) and as an equivalence oracle."""
    t = truth.reshape(-1).astype(jnp.int32)
    p = pred.reshape(-1).astype(jnp.int32)
    valid = t != ignore_value
    bins = jnp.where(valid, t * num_classes + p, 0)
    weights = valid.astype(jnp.int32)
    cm = jnp.zeros((num_classes * num_classes,), dtype=jnp.int32)
    cm = cm.at[bins].add(weights)
    return cm.reshape(num_classes, num_classes)


def i_and_u_from_cm(cm: jnp.ndarray):
    """Per-class (intersection, union) from a confusion matrix."""
    inter = jnp.diagonal(cm)
    union = cm.sum(axis=0) + cm.sum(axis=1) - inter
    return inter, union


class EvaluatorIoU:
    """Host-side streaming evaluator with the reference's exact scoring.

    Accepts device batches (preds/labels), accumulates an exact int64
    confusion matrix, and exposes per-class IoU via ``score()`` =
    I / max(U, 1) (reference: evaluation.py:61-62). Optional binary hole
    filling for 2-class problems (ISIC; reference: evaluation.py:52-55) runs
    on host per sample via scipy.
    """

    def __init__(self, num_classes: int, fill_holes: bool = False):
        if fill_holes and num_classes != 2:
            raise ValueError("fill_holes requires num_classes == 2")
        self.num_classes = num_classes
        self.fill_holes = fill_holes
        self.cm = np.zeros((num_classes, num_classes), dtype=np.int64)

    def update_batch(self, pred, truth, ignore_value: int = 255):
        """Accumulate a batch. pred/truth: (N, H, W) int arrays (device or host)."""
        if self.fill_holes:
            from scipy.ndimage import binary_fill_holes

            pred = np.asarray(pred)
            pred = np.stack(
                [binary_fill_holes(p != 0).astype(np.int64) for p in pred]
            )
        cm = confusion_matrix(
            jnp.asarray(pred), jnp.asarray(truth), self.num_classes, ignore_value
        )
        self.cm += np.asarray(cm, dtype=np.int64)

    def update_cm(self, cm):
        """Accumulate an already-reduced confusion matrix (e.g. psum'd)."""
        self.cm += np.asarray(cm, dtype=np.int64)

    @property
    def intersection(self) -> np.ndarray:
        return np.diagonal(self.cm).astype(np.float64)

    @property
    def union(self) -> np.ndarray:
        return (
            self.cm.sum(axis=0) + self.cm.sum(axis=1) - np.diagonal(self.cm)
        ).astype(np.float64)

    def score(self) -> np.ndarray:
        return self.intersection / np.maximum(self.union, 1.0)

    def miou(self) -> float:
        return float(self.score().mean())
