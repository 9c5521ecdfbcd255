"""Device-resident small-dataset store: canvases live in HBM, indices ride
the wire.

The reference re-decodes every sample in DataLoader worker processes each
time it is drawn (reference: datapipe/seg_data.py:15-109). The TPU-native
host loader already caches decoded canvases (data/loader.py DecodeCache),
but on a tunnelled/remote TPU host the dominant per-iteration cost is not
decode — it is shipping ~20-30 MB of canvas bytes host->device every step
(measured ~100 MB/s through the tunnel, ~270 ms/iter at the Pascal headline
shape). For datasets that fit in a slice of HBM (the reference's semi-sup
protocol trains on tens-to-hundreds of labelled images), the right TPU
design is to stage the decoded uint8 canvases on device ONCE and ship only
per-iteration index vectors + affine matrices (a few KB): the fused train
step gathers its canvases from HBM (`jnp.take` on the leading axis) and the
input pipeline drops off the critical path entirely.

Training-stream parity: the host still samples the same geometry with the
same RNG draws in the same order (HostBatchBuilder index mode), so a run
with the resident store enabled sees the same sample indices and transform
parameters as the streaming run. Numerically: label warps are BIT-EQUAL
(integer taps); image warps agree to f32 rounding (~1e-5) because the
streaming path re-anchors matrices to the transfer window while the
resident path warps from the full canvas, so the f32 mul-add order differs
(tests/test_data.py asserts exactly this split: labels exact, images
atol=1e-5).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# default auto-enable budget for the resident store (uint8 canvases+labels);
# small next to a v5e's 16 GB HBM but covers the reference's semi-sup splits
DEFAULT_MAX_BYTES = 1 << 30


def resident_nbytes(source, n_images: int, with_labels: bool) -> int:
    ch, cw = source.canvas_hw
    per = ch * cw * 3 + (ch * cw if with_labels else 0) + 8
    return n_images * per


class ResidentDataset:
    """Decode-once, device-forever store over a subset of dataset indices."""

    def __init__(self, source, indices: Sequence[int], mesh,
                 with_labels: bool = True, replicated_sharding=None):
        from cutmix_seg_tpu.parallel.mesh import replicated

        idx = np.unique(np.asarray(indices, np.int64))
        self.row_of = np.full(int(idx.max()) + 1, -1, np.int64)
        self.row_of[idx] = np.arange(len(idx))
        ch, cw = source.canvas_hw
        canvas = np.zeros((len(idx), ch, cw, 3), np.uint8)
        labels = (np.full((len(idx), ch, cw), 255, np.uint8)
                  if with_labels else None)
        sizes = np.zeros((len(idx), 2), np.int32)
        for row, i in enumerate(idx):
            img = source.get_image(int(i))
            h, w = img.shape[:2]
            if h > ch or w > cw:
                raise ValueError(
                    f"image {i} ({h}x{w}) exceeds canvas {(ch, cw)}")
            canvas[row, :h, :w] = img
            if with_labels:
                labels[row, :h, :w] = source.get_labels(int(i))
            sizes[row] = (h, w)
        self.sizes_host = sizes
        sh = replicated_sharding or replicated(mesh)
        self.device = {"canvas": jax.device_put(canvas, sh)}
        if with_labels:
            self.device["labels"] = jax.device_put(labels, sh)

    def rows(self, indices: np.ndarray) -> np.ndarray:
        idx = np.asarray(indices, np.int64)
        oob = (idx < 0) | (idx >= len(self.row_of))
        rows = self.row_of[np.where(oob, 0, idx)]
        bad = oob | (rows < 0)
        if bad.any():
            raise KeyError(f"indices not staged on device: {idx[bad][:8]}")
        return rows.astype(np.int32)

    def sizes_of(self, indices: np.ndarray) -> np.ndarray:
        return self.sizes_host[self.rows(indices)]


def gather_part(data: Dict[str, jnp.ndarray], part: Dict[str, jnp.ndarray],
                with_labels: bool) -> Dict[str, jnp.ndarray]:
    """TRACED: materialise one raw stream part from the resident store.

    ``part`` is the index-mode host batch ({'idx', 'sizes', matrices});
    the canvases (and labels for the supervised stream) are gathered from
    HBM inside the fused step program.
    """
    out = {k: v for k, v in part.items() if k != "idx"}
    out["canvas"] = jnp.take(data["canvas"], part["idx"], axis=0)
    if with_labels:
        out["labels"] = jnp.take(data["labels"], part["idx"], axis=0)
    return out
