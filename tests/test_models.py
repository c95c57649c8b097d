"""Model zoo validation: reduced-depth torch replicas vs the IR builders.

The reference checkpoints are git-lfs stubs, so numerical validation builds
torch networks with the reference architectures at reduced depth, transfers
their random weights through the state-dict converter, and checks forward +
full EBP event parity in float64.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from tests.oracles.torch_ebp import HookEBP
from tests.oracles.nets import (Add, ConcatChannels, MFMConv, MFMLinear,
                                Multiply, Split)
from xfr_tpu.ebp import interpreter as I
from xfr_tpu.models.convert import params_from_state_dict
from xfr_tpu.models.resnet101 import build_resnet101
from xfr_tpu.models.lightcnn import build_lightcnn29v2
from xfr_tpu.models.common import init_params


# -- torch replica of the STR-Janus ResNet (reference resnet.py:111-283) ----


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, stride=stride, bias=True)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=True)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=True)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.add = Add()

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(self.add(out, residual))


class _STResNet(nn.Module):
    def __init__(self, layers, num_classes):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=True)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._stage(64, layers[0], 1)
        self.layer2 = self._stage(128, layers[1], 2)
        self.layer3 = self._stage(256, layers[2], 2)
        self.layer4 = self._stage(512, layers[3], 2)
        self.avgpool = nn.AvgPool2d(7, stride=7)
        self.fc1 = nn.Linear(512 * 4, 512)
        self.multiply = Multiply(50.0)
        self.fc2 = nn.Linear(512, num_classes)

    def _stage(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.AvgPool2d(kernel_size=stride, stride=stride),
                ConcatChannels(planes * 4 // self.inplanes - 1))
        mods = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        mods += [_Bottleneck(self.inplanes, planes) for _ in range(blocks - 1)]
        return nn.Sequential(*mods)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        x = x.view(x.size(0), -1)
        x = self.multiply(F.normalize(self.fc1(x), p=2, dim=1))
        return self.fc2(x)


# -- torch replica of LightCNN-29 v2 (reference lightcnn.py:216-275) --------


class _Resblock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = MFMConv(c, c, 3, 1, 1)
        self.conv2 = MFMConv(c, c, 3, 1, 1)
        self.add = Add()

    def forward(self, x):
        return self.add(self.conv2(self.conv1(x)), x)


class _Group(nn.Module):
    def __init__(self, cin, cout, k, s, p):
        super().__init__()
        self.conv_a = MFMConv(cin, cin, 1, 1, 0)
        self.conv = MFMConv(cin, cout, k, s, p)

    def forward(self, x):
        return self.conv(self.conv_a(x))


class _LightCNN29v2(nn.Module):
    def __init__(self, layers, num_classes):
        super().__init__()
        self.conv1 = MFMConv(1, 48, 5, 1, 2)
        mk = lambda c, n: nn.Sequential(*[_Resblock(c) for _ in range(n)])
        self.block1 = mk(48, layers[0])
        self.group1 = _Group(48, 96, 3, 1, 1)
        self.block2 = mk(96, layers[1])
        self.group2 = _Group(96, 192, 3, 1, 1)
        self.block3 = mk(192, layers[2])
        self.group3 = _Group(192, 128, 3, 1, 1)
        self.block4 = mk(128, layers[3])
        self.group4 = _Group(128, 128, 3, 1, 1)
        self.fc = nn.Linear(8 * 8 * 128, 256)
        self.fc2 = nn.Linear(256, num_classes, bias=False)
        for i in range(1, 5):
            setattr(self, f"maxpool{i}", nn.MaxPool2d(2))
            setattr(self, f"avgpool{i}", nn.AvgPool2d(2))

    def forward(self, x):
        x = self.conv1(x)
        x = self.maxpool1(x) + self.avgpool1(x)
        x = self.group1(self.block1(x))
        x = self.maxpool2(x) + self.avgpool2(x)
        x = self.group2(self.block2(x))
        x = self.maxpool3(x) + self.avgpool3(x)
        x = self.group4(self.block4(self.group3(self.block3(x))))
        x = self.maxpool4(x) + self.avgpool4(x)
        x = x.view(x.size(0), -1)
        fc = self.fc(x)
        x = F.dropout(fc, training=self.training)
        return self.fc2(x)


def _randomize(net, seed):
    gen = torch.Generator().manual_seed(seed)
    for m in net.modules():
        if isinstance(m, (nn.Conv2d, nn.Linear)):
            with torch.no_grad():
                fan = m.weight.shape[0] * int(np.prod(m.weight.shape[2:])
                                              if m.weight.dim() > 2 else 1)
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen)
                               * np.sqrt(2.0 / fan))
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=gen)
                                 * 0.05)
        elif isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=gen)
                               * 0.5 + 0.75)
                m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.05)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * 0.05)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=gen) * 0.5
                    + 0.5)
    return net.double().eval()


# Session-scoped replica cache: the torch twin, conversion, forward
# reference, and the HookEBP oracle are built ONCE per net and shared
# across the subtree-mode parametrizations (the oracle's mode is mutated
# per run — hooks register once; re-wrapping a net double-fires them).


@pytest.fixture(scope="module")
def r101_mini():
    layers = (1, 1, 1, 1)
    tnet = _randomize(_STResNet(layers, 7), 3)
    graph, shapes, enc = build_resnet101(num_classes=7, layers=layers)
    params = params_from_state_dict(shapes, tnet.state_dict(),
                                    dtype=jnp.float64)
    x = torch.randn((1, 3, 224, 224), dtype=torch.float64,
                    generator=torch.Generator().manual_seed(11))
    with torch.no_grad():
        y_ref = tnet(x).numpy()
    oracle = HookEBP(tnet, (_Bottleneck,), eps=1e-12, subtree_mode="all")
    return graph, params, x, y_ref, oracle


@pytest.fixture(scope="module")
def lcnn_mini():
    layers = (1, 1, 1, 1)
    tnet = _randomize(_LightCNN29v2(layers, 9), 4)
    graph, shapes, enc = build_lightcnn29v2(num_classes=9, layers=layers)
    params = params_from_state_dict(shapes, tnet.state_dict(),
                                    dtype=jnp.float64)
    x = torch.rand((1, 1, 128, 128), dtype=torch.float64,
                   generator=torch.Generator().manual_seed(12))
    with torch.no_grad():
        y_ref = tnet(x).numpy()
    oracle = HookEBP(tnet, (MFMConv, MFMLinear, _Resblock, _Group),
                     eps=1e-12, subtree_mode="all")
    return graph, params, x, y_ref, oracle


def _mini_parity(setup, mode, n_classes, stride):
    graph, params, x, y_ref, oracle = setup
    values = I.forward_clean(graph, params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(values[graph.output_id]), y_ref,
                               rtol=1e-9, atol=1e-10)

    oracle.subtree_mode = mode
    Pn = torch.zeros((1, n_classes), dtype=torch.float64)
    Pn[0, 1] = 1.0
    P_ref, names = oracle.run(x, Pn)
    out = I.ebp(graph, params, jnp.asarray(x.numpy()),
                jnp.asarray(Pn.numpy()), subtree_mode=mode, eps=1e-12)
    assert len(P_ref) == graph.n_events
    # Check the saliency-bearing event (P[-2]) and a sample through depth.
    for k in list(range(0, graph.n_events, stride)) + [graph.n_events - 2,
                                                       graph.n_events - 1]:
        np.testing.assert_allclose(
            np.asarray(out[k]), P_ref[k].numpy(), rtol=1e-6, atol=1e-12,
            err_msg=f"event {k} ({names[k]})")


@pytest.mark.parametrize("mode", ["norelu", "all"])
def test_resnet101_mini_parity(r101_mini, mode):
    _mini_parity(r101_mini, mode, n_classes=7, stride=7)


@pytest.mark.parametrize("mode", ["affineonly_with_prior", "all"])
def test_lightcnn_mini_parity(lcnn_mini, mode):
    _mini_parity(lcnn_mini, mode, n_classes=9, stride=5)


def test_fullsize_builds():
    """Full-depth graphs build with the right shapes and event counts."""
    graph, shapes, enc = build_resnet101()
    assert shapes["fc2"]["w"] == (65359, 512)
    assert shapes["layer3.22.conv3"]["w"] == (1024, 256, 1, 1)
    params = init_params(shapes, seed=0)
    x = jnp.zeros((1, 3, 224, 224), jnp.float32)
    values = I.forward_clean(graph, params, x)
    assert values[graph.output_id].shape == (1, 65359)
    assert values[enc].shape == (1, 512)

    graph2, shapes2, enc2 = build_lightcnn29v2()
    assert shapes2["fc"]["w"] == (256, 8192)
    params2 = init_params(shapes2, seed=1)
    v2 = I.forward_clean(graph2, params2,
                         jnp.zeros((1, 1, 128, 128), jnp.float32))
    assert v2[graph2.output_id].shape == (1, 80013)
    assert v2[enc2].shape == (1, 256)
