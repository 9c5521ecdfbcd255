"""Export a trained model as a self-contained AOT serving artifact.

Replaces the reference's ``torch.save(eval_net)`` deployment story
(reference: train_seg_semisup_mask_mt.py:533-535) with a ``jax.export``
StableHLO artifact: weights baked in, symbolic batch dimension,
multi-platform (TPU + CPU) lowering, loadable with jax alone.

Typical use, after a run with ``--save_model``::

    python -m cutmix_seg_tpu.tools.export_model \
        --arch resnet101_deeplab_imagenet --num_classes 21 \
        --params results/<job>/<desc>/model.msgpack \
        --hw 321,321 --out model_321.jaxexport
"""

from __future__ import annotations

import click
import numpy as np


@click.command()
@click.option("--arch", type=str, required=True,
              help="architecture registry name (same values as --arch in the trainers)")
@click.option("--num_classes", type=int, required=True)
@click.option("--params", "params_path", type=click.Path(exists=True, dir_okay=False),
              default=None, help="model.msgpack from a --save_model run "
              "(core.checkpoint.export_params); omitted = fresh init (smoke use)")
@click.option("--hw", type=str, default="321,321",
              help="served input resolution H,W (static; batch is symbolic)")
@click.option("--out", "out_path", type=click.Path(dir_okay=False), required=True)
@click.option("--output", type=click.Choice(["argmax", "logits"]), default="argmax")
@click.option("--platforms", type=str, default="cpu,tpu",
              help="comma-separated lowering platforms baked into the artifact")
@click.option("--dtype", type=click.Choice(["bfloat16", "float32"]),
              default="bfloat16", help="compute dtype of the exported forward")
def main(arch, num_classes, params_path, hw, out_path, output, platforms, dtype):
    import jax
    import jax.numpy as jnp

    from cutmix_seg_tpu.core.checkpoint import restore_checkpoint
    from cutmix_seg_tpu.core.train_state import ModelState
    from cutmix_seg_tpu.models import registry
    from cutmix_seg_tpu.serve.export import export_serving_artifact

    h, w = (int(v) for v in hw.split(","))
    model = registry.get(arch)(
        num_classes, dtype=getattr(jnp, dtype), pretrained=False)

    # init at a small block-aligned size: parameter shapes are spatial-size
    # independent for these FCNs, and a full-res init would materialise
    # deployment-resolution activations just to build a template
    bh, bw = model.block_size
    init_hw = (-(-64 // bh) * bh, -(-64 // bw) * bw)
    variables = model.init(jax.random.PRNGKey(0), input_hw=init_hw)
    template = ModelState(params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}))
    if params_path is not None:
        model_state = restore_checkpoint(params_path, template)
    else:
        model_state = template
        click.echo("export_model: no --params given; exporting FRESH weights",
                   err=True)

    path = export_serving_artifact(
        model, model_state, (h, w), out_path, output=output,
        platforms=tuple(p.strip() for p in platforms.split(",")),
        num_classes=num_classes)
    size = np.round(__import__("os").path.getsize(path) / 1e6, 1)
    click.echo(f"export_model: wrote {path} ({size} MB) + {path}.json")


if __name__ == "__main__":
    main()
