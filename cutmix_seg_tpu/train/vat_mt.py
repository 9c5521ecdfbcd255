"""VAT (Virtual Adversarial Training) baseline trainer.

CLI-compatible with the reference (reference: train_seg_semisup_vat_mt.py):
1-step power-iteration adversarial perturbation of the student input, with
fixed or adaptive (image-Jacobian) radius, direction from teacher or student.
"""

from __future__ import annotations

import click

from cutmix_seg_tpu.core import job
from cutmix_seg_tpu.semisup.vat import VATConfig, make_vat_step
from cutmix_seg_tpu.train.cli_common import common_options
from cutmix_seg_tpu.train.engine import (
    AlgorithmSpec,
    TrainEngine,
    compose_mask_single,
    fetch_one_stream,
)


def build_spec(p, **cfg_overrides):
    """(AlgorithmSpec, cfg) — shared by the engine and multi-seed trainers."""
    import dataclasses

    cfg = VATConfig(
        vat_radius=p["vat_radius"],
        adaptive_vat_radius=p["adaptive_vat_radius"],
        vat_dir_from_student=p["vat_dir_from_student"],
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
        name="vat_mt",
        make_step=lambda model, tx, mesh: make_vat_step(model, tx, cfg),
        unsup_streams=1,
        pair_geom=False,
        fetch=fetch_one_stream,
        compose=compose_mask_single,
    )
    return spec, cfg


def train_seg_semisup_vat_mt(ctx: job.RunContext, **p):
    spec, cfg = build_spec(p)
    TrainEngine(ctx, spec, cfg, p).run()


@click.command()
@common_options()
@click.option("--vat_radius", type=float, default=0.5)
@click.option("--adaptive_vat_radius", is_flag=True, default=False)
@click.option("--vat_dir_from_student", is_flag=True, default=False)
def experiment(job_desc, **params):
    job.submit("train_seg_semisup_vat_mt", job_desc,
               train_seg_semisup_vat_mt, params)


if __name__ == "__main__":
    experiment()
