"""Shared trainer plumbing: model/optimizer/state construction, device
augmentation of host batches, evaluation passes, NaN bail-out, and the
reference's per-epoch log line format
(reference: train_seg_semisup_mask_mt.py:85-144,479-577).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cutmix_seg_tpu.aug.device import augment_batch, border_for_mode
from cutmix_seg_tpu.aug.params import GeomConfig
from cutmix_seg_tpu.core.schedules import make_lr_schedule
from cutmix_seg_tpu.core.train_state import OptimizerConfig, create_train_state
from cutmix_seg_tpu.models import registry
from cutmix_seg_tpu.ops.colour import ColourJitterConfig
from cutmix_seg_tpu.ops.iou import EvaluatorIoU


def epoch_stream_seed(base_seed: int, epoch_i: int) -> int:
    """Epoch-folded base for host-stream seeds.

    Host randomness (sample order, geometric/colour params) must be a pure
    function of (seed, process, epoch) so --resume from an epoch-boundary
    checkpoint is bit-exact; the engine and the multi-seed trainer share
    this fold (the per-stream/per-seed offsets added on top stay well below
    the stride)."""
    return base_seed + epoch_i * 100003


def epoch_colour_key(base_seed: int, epoch_i: int) -> jax.Array:
    """Epoch-folded colour-jitter key — derived from the PROCESS-INDEPENDENT
    base seed: it is a replicated jit input and must be bitwise identical on
    every host (GSPMD same-value rule)."""
    return jax.random.fold_in(jax.random.PRNGKey(base_seed + 40), epoch_i)


def parse_crop_size(crop_size: str):
    if crop_size == "":
        return None
    return tuple(int(x.strip()) for x in crop_size.split(","))


def parse_prop_range(s: str):
    if ":" in s:
        a, b = s.split(":")
        return (float(a.strip()), float(b.strip()))
    v = float(s)
    return (v, v)


def build_model(arch: str, num_classes: int, compute_dtype: str = "bfloat16",
                pretrained: bool = True):
    dtype = {"bfloat16": jnp.bfloat16, "float32": None}[compute_dtype]
    factory = registry.get(arch)
    return factory(num_classes, dtype=dtype, pretrained=pretrained)


def resolve_mean_std(model, ds):
    """Net overrides dataset stats (reference: seg_transforms.get_mean_std)."""
    mean, std = ds.get_mean_std()
    if model.mean is not None:
        mean = model.mean
    if model.std is not None:
        std = model.std
    return np.asarray(mean, np.float64), np.asarray(std, np.float64)


def build_optimizer_config(opt_type, learning_rate, lr_sched, lr_step_epochs,
                           lr_step_gamma, lr_poly_power, total_iters,
                           iters_per_epoch, sgd_momentum, sgd_nesterov,
                           sgd_weight_decay) -> OptimizerConfig:
    sched = make_lr_schedule(
        lr_sched, learning_rate, total_iters, step_epochs=lr_step_epochs,
        step_gamma=lr_step_gamma, poly_power=lr_poly_power,
        iters_per_epoch=iters_per_epoch)
    return OptimizerConfig(
        opt_type=opt_type,
        learning_rate=learning_rate,
        sgd_momentum=sgd_momentum,
        sgd_nesterov=sgd_nesterov,
        sgd_weight_decay=sgd_weight_decay,
        lr_schedule=sched,
    )


def separable_for_geom(geom) -> bool:
    """Whether the warp can run on the separable MXU-matmul path: the
    'crop' / 'crop_scale_hung' families produce diagonal affines unless the
    diagonal (axis-swapping) flip is enabled."""
    return geom.mode in ("crop", "crop_scale_hung") and not geom.hvflip


@dataclasses.dataclass
class DeviceAugmentor:
    """Applies the fused device augmentation to host canvas batches."""

    mean: np.ndarray
    std: np.ndarray
    crop_hw: Tuple[int, int]
    geom_mode: str
    colour: Optional[ColourJitterConfig] = None
    separable: bool = False

    def sup(self, host_batch) -> Dict[str, jnp.ndarray]:
        out = augment_batch(
            jnp.asarray(host_batch["canvas"]),
            jnp.asarray(host_batch["labels"]),
            jnp.asarray(host_batch["m"]),
            jnp.asarray(host_batch["sizes"]),
            jnp.asarray(host_batch["interp"]),
            self.mean, self.std, None,
            out_hw=self.crop_hw, with_labels=True,
            border=border_for_mode(self.geom_mode),
            separable=self.separable,
        )
        return out

    def unsup(self, host_batch, key) -> Dict[str, jnp.ndarray]:
        out = augment_batch(
            jnp.asarray(host_batch["canvas"]),
            None,
            jnp.asarray(host_batch["m"]),
            jnp.asarray(host_batch["sizes"]),
            jnp.asarray(host_batch["interp"]),
            self.mean, self.std, key,
            out_hw=self.crop_hw, with_labels=False,
            colour_cfg=self.colour,
            border=border_for_mode(self.geom_mode),
            separable=self.separable,
        )
        if "image_stu" not in out:
            out["image_stu"] = out["image"]
        return out


def eval_batch_size(batch_size: int, mesh) -> int:
    """Round the eval batch up to a multiple of the data axis so every chip
    takes an equal slice (padding is metric-neutral: all-255 labels)."""
    n_data = mesh.shape["data"]
    return -(-batch_size // n_data) * n_data


def _eval_raw_batch(mesh, batch):
    """Device placement for one raw eval batch, sharded over 'data'. Every
    host iterates the same eval indices, so in multi-host runs each process
    contributes its local slice of the (identical) global batch."""
    from cutmix_seg_tpu.parallel.mesh import shard_global_batch

    return shard_global_batch(mesh, {
        "canvas": batch["canvas"],
        "labels": batch["labels"],
        "sizes": batch["sizes"],
    })


def evaluate(model, model_state, source, indices, batch_size, mesh,
             num_classes, mean, std, block_size, fill_holes=False,
             spatial=False):
    """Full eval pass -> per-class IoU array (reference metric semantics).

    One jitted program per batch (normalise + forward + confusion), sharded
    over the mesh's 'data' axis: the batch size is rounded up to a multiple of
    the axis so every chip takes an equal slice, and the confusion matrix is
    psum-reduced by XLA (eval_batches pads short batches with all-255 labels,
    which cannot perturb the matrix).

    ``spatial=True`` partitions the image H axis over the mesh instead of the
    batch axis (parallel/spatial.py) — the right mapping when validation
    images are high-resolution but the eval batch is smaller than the mesh
    (e.g. full-res Cityscapes on a pod slice). The batch is NOT rounded up;
    image heights are padded to lcm(n_devices, block_h) with ignore labels
    (metric-neutral, same boundary semantics as block padding)."""
    from cutmix_seg_tpu.data.loader import eval_batches
    from cutmix_seg_tpu.eval.evaluator import (
        make_sharded_eval_fn,
        make_sharded_predict_fn,
    )

    ev = EvaluatorIoU(num_classes, fill_holes=fill_holes)

    if spatial:
        if jax.process_count() != 1:
            raise NotImplementedError(
                "spatial eval places H-sharded global arrays; multi-host "
                "runs use batch-parallel eval")
        from cutmix_seg_tpu.parallel.spatial import (
            make_spatial_eval_fn,
            make_spatial_predict_fn,
            pad_batch_h,
            spatial_batch_axis_size,
            spatial_h_axis_size,
        )

        h_mult = int(np.lcm(spatial_h_axis_size(mesh), block_size[0]))
        # 2-D meshes also shard the batch axis: round the batch up to it
        n_b = spatial_batch_axis_size(mesh)
        batch_size = -(-batch_size // n_b) * n_b
        if fill_holes:
            predict = make_spatial_predict_fn(model, mean, std, mesh)
            for batch in eval_batches(source, indices, batch_size, block_size):
                b = pad_batch_h(batch, h_mult)
                pred, y = predict(model_state, {
                    k: b[k] for k in ("canvas", "labels", "sizes")})
                ev.update_batch(np.asarray(pred)[: batch["count"]],
                                np.asarray(y)[: batch["count"]])
        else:
            eval_fn = make_spatial_eval_fn(model, num_classes, mean, std, mesh)
            for batch in eval_batches(source, indices, batch_size, block_size):
                b = pad_batch_h(batch, h_mult)
                cm = eval_fn(model_state, {
                    k: b[k] for k in ("canvas", "labels", "sizes")})
                ev.update_cm(np.asarray(cm))
        return ev.score()

    eval_bs = eval_batch_size(batch_size, mesh)
    if fill_holes:
        # hole filling is a host-side morphological op on the argmax
        predict = make_sharded_predict_fn(model, mean, std, mesh)
        for batch in eval_batches(source, indices, eval_bs, block_size):
            pred, y = predict(model_state, _eval_raw_batch(mesh, batch))
            ev.update_batch(np.asarray(pred)[: batch["count"]],
                            np.asarray(y)[: batch["count"]])
    else:
        eval_fn = make_sharded_eval_fn(model, num_classes, mean, std, mesh)
        for batch in eval_batches(source, indices, eval_bs, block_size):
            cm = eval_fn(model_state, _eval_raw_batch(mesh, batch))
            ev.update_cm(np.asarray(cm))
    return ev.score()


def check_nan(value: float) -> bool:
    """The reference's bail-out (train_seg_semisup_mask_mt.py:469-472)."""
    if np.isnan(value):
        print("NaN detected; network dead, bailing.")
        return True
    return False
