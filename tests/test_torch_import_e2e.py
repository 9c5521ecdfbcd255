"""End-to-end pretrained-weight import parity: build a small torch ResNet
with torchvision's exact module naming and forward semantics (V1.5: stride on
conv2, floor max-pool), export its state_dict, convert with the framework's
importer, and compare full-network outputs — validating naming, OIHW->HWIO
layout, BN stats mapping and architecture fidelity in one shot. Also checks
the DenseNet features mapping on a reduced config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from cutmix_seg_tpu.models import torch_import
from cutmix_seg_tpu.models.resnet import ResNetBackbone


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchMiniResNet(nn.Module):
    """torchvision-structured ResNet with layers (1, 1, 1, 1)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, (planes, stride) in enumerate(
            zip((64, 128, 256, 512), (1, 2, 2, 2)), start=1
        ):
            down = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
            setattr(self, f"layer{li}",
                    nn.Sequential(TorchBottleneck(inplanes, planes, stride,
                                                  downsample=down)))
            inplanes = planes * 4

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        taps = {}
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
            taps[f"layer{li}"] = x
        return x, taps


def _randomise_bn(module, rng):
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm2d,)):
            with torch.no_grad():
                m.weight.copy_(torch.tensor(
                    rng.uniform(0.5, 1.5, m.weight.shape[0]).astype(np.float32)))
                m.bias.copy_(torch.tensor(
                    rng.uniform(-0.2, 0.2, m.bias.shape[0]).astype(np.float32)))
                m.running_mean.copy_(torch.tensor(
                    rng.uniform(-0.5, 0.5, m.running_mean.shape[0]).astype(np.float32)))
                m.running_var.copy_(torch.tensor(
                    rng.uniform(0.5, 2.0, m.running_var.shape[0]).astype(np.float32)))


def test_resnet_import_full_network_parity():
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    tnet = TorchMiniResNet()
    _randomise_bn(tnet, rng)
    tnet.eval()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params_u, stats_u = torch_import.map_torch_resnet(sd)

    backbone = ResNetBackbone(layers=(1, 1, 1, 1), strides=(1, 2, 2, 2),
                              dilations=(1, 1, 1, 1), style="torchvision")
    x = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    variables = backbone.init(jax.random.PRNGKey(0), jnp.asarray(x),
                              use_running_average=True)
    variables, n_loaded, n_skipped = torch_import.merge_updates(
        variables, params_u, stats_u)
    assert n_skipped == 0, n_skipped
    # every torch tensor lands except the num_batches_tracked counters
    n_expected = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert n_loaded == n_expected

    out, taps = backbone.apply(variables, jnp.asarray(x),
                               use_running_average=True)
    with torch.no_grad():
        t_out, t_taps = tnet(torch.tensor(np.transpose(x, (0, 3, 1, 2))))

    for name in ("layer1", "layer2", "layer3", "layer4"):
        ours = np.asarray(taps[name])
        ref = np.transpose(t_taps[name].numpy(), (0, 2, 3, 1))
        assert ours.shape == ref.shape, name
        np.testing.assert_allclose(ours, ref, atol=2e-3,
                                   err_msg=f"mismatch at {name}")


@pytest.mark.slow  # quick bar keeps the deeplab2-style full-model parity
def test_densenet_import_features_parity():
    from torch.nn import functional as F

    from cutmix_seg_tpu.models.denseunet import DenseNetFeatures

    class TorchDenseLayer(nn.Module):
        def __init__(self, in_ch, growth, bn_size=4):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(in_ch)
            self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
            self.norm2 = nn.BatchNorm2d(bn_size * growth)
            self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                   bias=False)

        def forward(self, x):
            y = self.conv1(F.relu(self.norm1(x)))
            y = self.conv2(F.relu(self.norm2(y)))
            return torch.cat([x, y], 1)

    class TorchFeatures(nn.Module):
        """torchvision densenet 'features' naming, reduced config (2,2)."""

        def __init__(self, init_f=8, growth=4):
            super().__init__()
            feats = nn.Sequential()
            feats.add_module("conv0", nn.Conv2d(3, init_f, 7, 2, 3, bias=False))
            feats.add_module("norm0", nn.BatchNorm2d(init_f))
            feats.add_module("relu0", nn.ReLU())
            feats.add_module("pool0", nn.MaxPool2d(3, 2, 1))
            ch = init_f
            for bi, n_layers in enumerate((2, 2), start=1):
                block = nn.Sequential()
                for li in range(n_layers):
                    block.add_module(f"denselayer{li + 1}",
                                     TorchDenseLayer(ch + li * growth, growth))
                feats.add_module(f"denseblock{bi}", block)
                ch += n_layers * growth
                if bi < 2:
                    trans = nn.Sequential()
                    trans.add_module("norm", nn.BatchNorm2d(ch))
                    trans.add_module("relu", nn.ReLU())
                    trans.add_module("conv", nn.Conv2d(ch, ch // 2, 1, bias=False))
                    trans.add_module("pool", nn.AvgPool2d(2, 2))
                    feats.add_module(f"transition{bi}", trans)
                    ch //= 2
            feats.add_module("norm5", nn.BatchNorm2d(ch))
            self.features = feats

        def forward(self, x):
            return self.features(x)

    torch.manual_seed(1)
    rng = np.random.RandomState(1)
    tnet = TorchFeatures()
    _randomise_bn(tnet, rng)
    tnet.eval()
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params_u, stats_u = torch_import.map_torch_densenet(sd)

    feats = DenseNetFeatures(num_init_features=8, growth_rate=4,
                             block_config=(2, 2))
    x = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    variables = feats.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           use_running_average=True)
    variables, n_loaded, n_skipped = torch_import.merge_updates(
        variables, params_u, stats_u)
    assert n_skipped == 0
    n_expected = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert n_loaded == n_expected

    out, _ = feats.apply(variables, jnp.asarray(x), use_running_average=True)
    with torch.no_grad():
        ref = tnet(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref, (0, 2, 3, 1)), atol=2e-3)


class TorchCaffeBottleneck(nn.Module):
    """Hung/Caffe-style bottleneck: stride on the FIRST 1x1 conv, and every
    block of a dilated stage uses the stage dilation (reference:
    architectures/deeplab2.py:65-128 semantics)."""

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, stride=stride, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchHungDeepLab(nn.Module):
    """Reduced-depth Hung-style DeepLab v2: Caffe ResNet at output stride 8
    (strides 1,2,1,1; dilations 1,1,2,4; ceil-mode stem pool), layer5 =
    summed ASPP with the faithful 2-branch return-inside-loop quirk, and
    align_corners bilinear upsampling to the input size."""

    def __init__(self, num_classes=5, layers=(2, 2, 3, 2)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1, ceil_mode=True)
        inplanes = 64
        for li, (n, planes, stride, dil) in enumerate(
            zip(layers, (64, 128, 256, 512), (1, 2, 1, 1), (1, 1, 2, 4)),
            start=1,
        ):
            blocks = []
            for bi in range(n):
                down = None
                if bi == 0:
                    down = nn.Sequential(
                        nn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                                  bias=False),
                        nn.BatchNorm2d(planes * 4))
                blocks.append(TorchCaffeBottleneck(
                    inplanes, planes, stride if bi == 0 else 1, dil, down))
                inplanes = planes * 4
            setattr(self, f"layer{li}", nn.Sequential(*blocks))
        self.layer5 = nn.Module()
        self.layer5.conv2d_list = nn.ModuleList([
            nn.Conv2d(2048, num_classes, 3, padding=d, dilation=d, bias=True)
            for d in (6, 12, 18, 24)])

    def forward(self, x):
        from torch.nn import functional as F

        hw = x.shape[2:]
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        # the reference quirk: only branches 0 and 1 are summed
        out = self.layer5.conv2d_list[0](x) + self.layer5.conv2d_list[1](x)
        return F.interpolate(out, size=hw, mode="bilinear", align_corners=True)


def test_deeplab2_style_import_full_model_parity():
    """Full-model parity for the HEADLINE architecture's import path: Caffe
    semantics (stride-on-conv1, full-stage dilation, ceil pool), multi-block
    dilated stages, the Hung layer5 ASPP naming, the 2-branch quirk, and
    align_corners upsampling — torch vs imported flax logits."""
    from cutmix_seg_tpu.models.deeplab2 import DeepLab2

    torch.manual_seed(1)
    rng = np.random.RandomState(1)
    tnet = TorchHungDeepLab()
    _randomise_bn(tnet, rng)
    tnet.eval()

    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    params_u, stats_u = torch_import.map_torch_resnet(sd)
    head_u = torch_import.map_hung_deeplab_classifier(sd)

    model = DeepLab2(num_classes=5, layers=(2, 2, 3, 2))
    x = rng.uniform(-1, 1, size=(2, 65, 65, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables, n1, s1 = torch_import.merge_updates(
        variables, {"backbone": params_u}, {"backbone": stats_u})
    variables, n2, s2 = torch_import.merge_updates(
        variables, {"classifier": head_u}, {})
    assert s1 == 0 and s2 == 0, (s1, s2)
    n_expected = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert n1 + n2 == n_expected

    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = tnet(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)
