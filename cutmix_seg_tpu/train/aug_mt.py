"""Augmentation-driven consistency trainer.

CLI-compatible with the reference (reference: train_seg_semisup_aug_mt.py):
each unsupervised image is cropped twice with DIFFERENT geometric parameters
(pair mode, with a crop-offset range keeping the crops overlapping); the
teacher's prediction on crop 0 is warped into crop 1's frame for the
consistency loss. ``--aug_offset_range`` sets the pair crop offset and
``--aug_free_scale_rot`` unconstrains the pair's rotation/scale draws.
"""

from __future__ import annotations

import click

from cutmix_seg_tpu.core import job
from cutmix_seg_tpu.semisup.aug_cons import AugConsConfig, make_aug_cons_step
from cutmix_seg_tpu.train.cli_common import common_options
from cutmix_seg_tpu.train.engine import (
    AlgorithmSpec,
    TrainEngine,
    compose_aug_pair,
    fetch_aug_pair,
)


def build_spec(p, **cfg_overrides):
    """(AlgorithmSpec, cfg) — shared by the engine and multi-seed trainers."""
    import dataclasses

    cfg = AugConsConfig(
        cons_loss_fn=p["cons_loss_fn"],
        cons_weight=p["cons_weight"],
        conf_thresh=p["conf_thresh"],
        conf_per_pixel=p["conf_per_pixel"],
        freeze_bn=p["freeze_bn"],
        mean_teacher=p["model"] == "mean_teacher",
        teacher_alpha=p["teacher_alpha"],
        unsup_batch_ratio=p["unsup_batch_ratio"],
        grad_accum=p.get("grad_accum", 1),
    )
    if cfg_overrides:
        cfg = dataclasses.replace(cfg, **cfg_overrides)
    spec = AlgorithmSpec(
        name="aug_mt",
        make_step=lambda model, tx, mesh: make_aug_cons_step(model, tx, cfg),
        unsup_streams=1,
        pair_geom=True,
        fetch=fetch_aug_pair,
        compose=compose_aug_pair,
    )
    return spec, cfg


def train_seg_semisup_aug_mt(ctx: job.RunContext, **p):
    spec, cfg = build_spec(p)
    TrainEngine(ctx, spec, cfg, p).run()


@click.command()
@common_options(with_geom_pair_opts=True)
def experiment(job_desc, **params):
    job.submit("train_seg_semisup_aug_mt", job_desc,
               train_seg_semisup_aug_mt, params)


if __name__ == "__main__":
    experiment()
