"""ICT (Interpolation Consistency Training) baseline trainer.

CLI-compatible with the reference (reference: train_seg_semisup_ict.py):
whole-image per-sample Beta(alpha, alpha) mixup consistency between two draws
from one unsupervised stream.
"""

from __future__ import annotations

import click

from cutmix_seg_tpu.core import job
from cutmix_seg_tpu.semisup.ict import ICTConfig, make_ict_step
from cutmix_seg_tpu.train.cli_common import common_options
from cutmix_seg_tpu.train.engine import (
    AlgorithmSpec,
    TrainEngine,
    compose_mask_pair,
    fetch_ict,
)


def build_spec(p, **cfg_overrides):
    """(AlgorithmSpec, cfg) — shared by the engine and multi-seed trainers."""
    import dataclasses

    cfg = ICTConfig(
        ict_alpha=p["ict_alpha"],
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
        name="ict",
        make_step=lambda model, tx, mesh: make_ict_step(model, tx, cfg),
        unsup_streams=1,
        pair_geom=False,
        fetch=fetch_ict,
        compose=compose_mask_pair,
    )
    return spec, cfg


def train_seg_semisup_ict(ctx: job.RunContext, **p):
    spec, cfg = build_spec(p)
    TrainEngine(ctx, spec, cfg, p).run()


@click.command()
@common_options()
@click.option("--ict_alpha", type=float, default=0.1)
def experiment(job_desc, **params):
    job.submit("train_seg_semisup_ict", job_desc, train_seg_semisup_ict, params)


if __name__ == "__main__":
    experiment()
