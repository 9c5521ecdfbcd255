"""Model tests: forward shapes, the ASPP 2-branch reference quirk, ceil-mode
pooling vs torch, align_corners upsampling vs torch, and torch->flax weight
layout conversion parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from cutmix_seg_tpu.models.common import (
    max_pool_ceil,
    upsample_bilinear_align_corners,
    upsample_nearest_2x,
)


def test_max_pool_ceil_matches_torch():
    rng = np.random.RandomState(0)
    for h, w in [(161, 161), (128, 96), (65, 33)]:
        x = rng.randn(2, h, w, 3).astype(np.float32)
        ours = np.asarray(max_pool_ceil(jnp.asarray(x), 3, 2, 1))
        t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        ref = F.max_pool2d(t, 3, 2, 1, ceil_mode=True).numpy()
        ref = np.transpose(ref, (0, 2, 3, 1))
        assert ours.shape == ref.shape, (h, w)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_upsample_align_corners_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 11, 13, 4).astype(np.float32)
    ours = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), (41, 51)))
    t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    ref = F.interpolate(t, size=(41, 51), mode="bilinear", align_corners=True)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_upsample_nearest_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 5, 7, 2).astype(np.float32)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    ref = np.transpose(F.interpolate(t, scale_factor=2).numpy(), (0, 2, 3, 1))
    np.testing.assert_array_equal(ours, ref)


def test_deeplab2_shapes_and_quirk():
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2

    x = jax.random.normal(jax.random.PRNGKey(42), (1, 65, 65, 3))
    m2 = DeepLab2(num_classes=5, layers=(1, 1, 1, 1), aspp_branches_used=2)
    v2 = m2.init(jax.random.PRNGKey(0), x, train=False)
    y2 = m2.apply(v2, x, train=False)
    assert y2.shape == (1, 65, 65, 5)

    # 2-branch quirk: perturb ASPP branches 2 and 3 — output must not change
    import flax

    v_mod = flax.core.unfreeze(v2)
    for b in ("aspp2", "aspp3"):
        v_mod["params"]["classifier"][b]["bias"] = (
            v_mod["params"]["classifier"][b]["bias"] + 7.0
        )
    y_mod = m2.apply(v_mod, x, train=False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_mod), atol=1e-6)

    # with all 4 branches the perturbation must matter
    m4 = DeepLab2(num_classes=5, layers=(1, 1, 1, 1), aspp_branches_used=4)
    y4a = m4.apply(v2, x, train=False)
    y4b = m4.apply(v_mod, x, train=False)
    assert not np.allclose(np.asarray(y4a), np.asarray(y4b))


@pytest.mark.slow
def test_resunet_shapes():
    from cutmix_seg_tpu.models.resunet import ResUNet

    m = ResUNet(num_classes=3, layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 96, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 64, 96, 3)


def test_denseunet_shapes():
    from cutmix_seg_tpu.models.denseunet import DenseUNet, DenseNetFeatures

    feats = DenseNetFeatures(num_init_features=96, growth_rate=48,
                             block_config=(2, 2, 2, 2))
    x = jnp.zeros((1, 64, 64, 3))
    v = feats.init(jax.random.PRNGKey(0), x, use_running_average=True)
    out, taps = feats.apply(v, x, use_running_average=True)
    assert taps["relu0"].shape[-1] == 96
    # full-size channel plan only holds for the 161 config; here check scales
    assert taps["relu0"].shape[1:3] == (32, 32)
    assert taps["denseblock1"].shape[1:3] == (16, 16)
    assert out.shape[1:3] == (2, 2)


def test_deeplabv3plus_shapes():
    from cutmix_seg_tpu.models.deeplab3 import DeepLabV3Plus

    m = DeepLabV3Plus(num_classes=4, layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 33, 33, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 33, 33, 4)


def test_conv_kernel_conversion_parity():
    """torch Conv2d and flax Conv with the converted kernel must agree."""
    from cutmix_seg_tpu.models.torch_import import _conv_kernel
    import flax.linen as fnn

    rng = np.random.RandomState(3)
    x = rng.randn(1, 9, 9, 4).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 6, 3, padding=2, dilation=2, bias=False)
    ref = tconv(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    kernel = _conv_kernel(tconv.weight.detach().numpy())
    conv = fnn.Conv(6, (3, 3), padding=2, kernel_dilation=2, use_bias=False)
    ours = conv.apply({"params": {"kernel": jnp.asarray(kernel)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


def test_bn_conversion_parity():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 5, 5, 3).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(3)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(rng.randn(3).astype(np.float32)))
        tbn.bias.copy_(torch.tensor(rng.randn(3).astype(np.float32)))
        tbn.running_mean.copy_(torch.tensor(rng.randn(3).astype(np.float32)))
        tbn.running_var.copy_(torch.tensor(rng.uniform(0.5, 2, 3).astype(np.float32)))
    tbn.eval()
    ref = tbn(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    from cutmix_seg_tpu.models.common import batch_norm

    bn = batch_norm(True, "bn")
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
        "batch_stats": {
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy()),
        },
    }
    ours = bn.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_registry_names():
    from cutmix_seg_tpu.models import registry

    expected = {
        "resnet101_deeplab_imagenet",
        "resnet101_deeplab_imagenet_mittal_std",
        "resnet101_deeplab_coco",
        "resnet50unet_imagenet",
        "resnet101unet_imagenet",
        "densenet161unet",
        "densenet161unet_imagenet",
        "resnet101_deeplabv3_imagenet",
        "resnet101_deeplabv3_coco",
        "resnet101_deeplabv3plus_imagenet",
    }
    assert expected.issubset(set(registry.names()))


def test_param_labels_deeplab2():
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2, _param_label

    m = DeepLab2(num_classes=3, layers=(1, 1, 1, 1))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 33, 3)), train=False)
    labels = _param_label(v["params"])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    got = {"/".join(str(getattr(k, "key", k)) for k in path): lab for path, lab in flat}
    assert got["classifier/aspp0/kernel"] == "new"
    assert got["backbone/conv1/kernel"] == "pretrained"
    assert got["backbone/bn1/scale"] == "frozen"
    assert got["backbone/layer1_0/bn1/scale"] == "frozen"
    assert got["backbone/layer1_0/conv1/kernel"] == "pretrained"


@pytest.mark.slow
def test_pspnet_shapes_and_adaptive_pool():
    from cutmix_seg_tpu.models.pspnet import PSPNet, _adaptive_avg_pool

    # adaptive pool parity with torch
    rng = np.random.RandomState(5)
    x = rng.randn(1, 11, 11, 3).astype(np.float32)
    for bins in (1, 2, 3, 6):
        ours = np.asarray(_adaptive_avg_pool(jnp.asarray(x), bins))
        t = torch.nn.functional.adaptive_avg_pool2d(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))), bins).numpy()
        np.testing.assert_allclose(ours, np.transpose(t, (0, 2, 3, 1)), atol=1e-6)

    m = PSPNet(num_classes=4, layers=(1, 1, 1, 1))
    xin = jnp.zeros((1, 33, 33, 3))
    v = m.init(jax.random.PRNGKey(0), xin, train=False)
    y = m.apply(v, xin, train=False)
    assert y.shape == (1, 33, 33, 4)


def test_space_to_batch_dilated_lowering_matches_direct():
    """models/resnet.py dilated_impl='s2b': the space-to-batch lowering of
    the dilated 3x3 convs must share the parameter tree and match the direct
    lowering numerically (perf experiment knob; scripts/space_to_batch_probe)."""
    import jax
    import jax.numpy as jnp

    from cutmix_seg_tpu.models.deeplab2 import DeepLab2

    x = np.random.RandomState(0).normal(0, 1, (2, 41, 41, 3)).astype(np.float32)
    m_direct = DeepLab2(num_classes=5, layers=(1, 1, 2, 1))
    m_s2b = DeepLab2(num_classes=5, layers=(1, 1, 2, 1), dilated_impl="s2b")
    v = m_direct.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    o_direct = m_direct.apply(v, jnp.asarray(x), train=False)
    o_s2b = m_s2b.apply(v, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(o_s2b), np.asarray(o_direct),
                               atol=1e-5)
