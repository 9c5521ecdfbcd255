"""cutmix_seg_tpu — TPU-native semi-supervised semantic segmentation framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
Britefury/cutmix-semisup-seg (French et al., BMVC 2020: "Semi-supervised semantic
segmentation needs strong, varied perturbations"; French & Mackiewicz: "Colour
augmentation for improved semi-supervised semantic segmentation").

Design stance (NOT a port):
  * One fused, jit-compiled train step per algorithm: student fwd/bwd, teacher fwd,
    mask generation, CutMix blending, consistency loss, optimizer update and EMA
    teacher update all live in a single XLA program.
  * Augmentation runs on-device: geometric warps are batched affine gathers,
    colour jitter is vectorised jnp; the host only decodes and pads.
  * Data parallelism via jax.sharding.Mesh + NamedSharding; gradients and IoU
    accumulators ride ICI collectives inserted by XLA.
  * Hot memory-bound ops (mask rasterisation + CutMix blend) have Pallas TPU
    kernels.

Layout:
  core/      config, train state, schedules, checkpointing, job/run management
  aug/       affine algebra + on-device augmentation pipeline
  masks/     box mask (CutMix/Cutout) parameter sampling + rasterisation
  ops/       resamplers, IoU/confusion, loss kernels (incl. Pallas)
  models/    Flax architectures: DeepLab v2/v3+, ResUNet, DenseUNet + registry
  semisup/   EMA teacher, consistency losses, confidence thresholding, algorithms
  data/      dataset sources, deterministic splits, host-side pipeline
  parallel/  mesh construction and sharding helpers
  train/     CLI trainers (mask_mt, aug_mt, ict, vat_mt, toy2d)
"""

__version__ = "0.1.0"

# Honour JAX_PLATFORMS even when a pre-registered accelerator plugin would
# otherwise win platform selection (on some installs the env var alone is not
# authoritative; jax.config is). Mirrored from tests/conftest.py so the CLI
# trainers behave the same way: `JAX_PLATFORMS=cpu python -m
# cutmix_seg_tpu.train.mask_mt ...` really runs on CPU.
import os as _os

# Only stock platform names: experimental plugins (e.g. 'axon') register
# through a discovery path that jax.config's validation does not know about,
# so forcing them via config would fail where the env var works.
if _os.environ.get("JAX_PLATFORMS") in ("cpu", "tpu", "gpu", "cuda", "rocm"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # backend already initialised: leave selection alone
        pass
