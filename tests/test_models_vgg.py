"""Parity tests for the VGGFace2 SENet-50-256 and VGG-16 builders against
programmatically-built torch replicas (full-size graphs, float64)."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from tests.oracles.torch_ebp import HookEBP
from xfr_tpu.ebp import interpreter as I
from xfr_tpu.models.convert import params_from_state_dict
from xfr_tpu.models.vggface import build_vgg16
from xfr_tpu.models.vggface2 import build_resnet50_128, build_senet50_256

_STAGES = (("conv2", 3, 64, 256, 1), ("conv3", 4, 128, 512, 2),
           ("conv4", 6, 256, 1024, 2), ("conv5", 3, 512, 2048, 2))


class _VGGFace2Torch(nn.Module):
    """Flat MMdnn-style replica (resnet50_128.py / senet50_256.py)."""

    def __init__(self, embed_dim, se_ratio=None):
        super().__init__()
        self.se_ratio = se_ratio
        add = lambda n, m: setattr(self, n, m)
        add("conv1_7x7_s2", nn.Conv2d(3, 64, 7, 2, 3, bias=False))
        add("conv1_7x7_s2_bn", nn.BatchNorm2d(64))
        self.relu = nn.ReLU(inplace=True)
        self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
        for stage, nblocks, planes, cout, stride in _STAGES:
            cin = {"conv2": 64, "conv3": 256, "conv4": 512,
                   "conv5": 1024}[stage]
            for b in range(1, nblocks + 1):
                p = f"{stage}_{b}"
                s = stride if b == 1 else 1
                add(f"{p}_1x1_reduce", nn.Conv2d(cin if b == 1 else cout,
                                                 planes, 1, s, bias=False))
                add(f"{p}_1x1_reduce_bn", nn.BatchNorm2d(planes))
                add(f"{p}_3x3", nn.Conv2d(planes, planes, 3, 1, 1,
                                          bias=False))
                add(f"{p}_3x3_bn", nn.BatchNorm2d(planes))
                add(f"{p}_1x1_increase", nn.Conv2d(planes, cout, 1,
                                                   bias=False))
                add(f"{p}_1x1_increase_bn", nn.BatchNorm2d(cout))
                if se_ratio:
                    add(f"{p}_1x1_down", nn.Conv2d(cout, cout // se_ratio,
                                                   1))
                    add(f"{p}_1x1_up", nn.Conv2d(cout // se_ratio, cout, 1))
                if b == 1:
                    add(f"{p}_1x1_proj", nn.Conv2d(cin, cout, 1, s,
                                                   bias=False))
                    add(f"{p}_1x1_proj_bn", nn.BatchNorm2d(cout))
        self.pool5 = nn.AvgPool2d(7, 1)
        self.feat_extract = nn.Conv2d(2048, embed_dim, 1, bias=False)
        self.fc1 = nn.Linear(embed_dim, 2, bias=False)

    def forward(self, x):
        g = lambda n: getattr(self, n)
        x = self.pool1(self.relu(g("conv1_7x7_s2_bn")(g("conv1_7x7_s2")(x))))
        for stage, nblocks, planes, cout, stride in _STAGES:
            for b in range(1, nblocks + 1):
                p = f"{stage}_{b}"
                y = self.relu(g(f"{p}_1x1_reduce_bn")(
                    g(f"{p}_1x1_reduce")(x)))
                y = self.relu(g(f"{p}_3x3_bn")(g(f"{p}_3x3")(y)))
                y = g(f"{p}_1x1_increase_bn")(g(f"{p}_1x1_increase")(y))
                if self.se_ratio:
                    se = F.adaptive_avg_pool2d(y, 1)
                    se = self.relu(g(f"{p}_1x1_down")(se))
                    se = torch.sigmoid(g(f"{p}_1x1_up")(se))
                    y = se.expand_as(y) * y
                if b == 1:
                    r = g(f"{p}_1x1_proj_bn")(g(f"{p}_1x1_proj")(x))
                else:
                    r = x
                x = self.relu((r + y) if not self.se_ratio else (y + r))
        x = self.feat_extract(self.pool5(x))
        feat = x.view(x.size(0), -1)
        return self.fc1(feat), feat


class _VGG16Torch(nn.Module):
    """Reference VGGFace replica (vggface.py:54-140).  ``cfg``/``input_hw``
    /``fc_dim`` shrink the net with an identical module/hook sequence."""

    CFG = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

    def __init__(self, num_classes=11, cfg=None, input_hw=224, fc_dim=4096):
        super().__init__()
        self.cfg = self.CFG if cfg is None else tuple(cfg)
        cin = 3
        for bi, (n, cout) in enumerate(self.cfg, start=1):
            for ci in range(1, n + 1):
                setattr(self, f"conv{bi}_{ci}",
                        nn.Conv2d(cin, cout, 3, 1, 1))
                cin = cout
        hw = input_hw
        for _ in self.cfg:
            hw = -(-hw // 2)
        self.fc6 = nn.Linear(self.cfg[-1][1] * hw * hw, fc_dim)
        self.fc7 = nn.Linear(fc_dim, fc_dim)
        self.fc8 = nn.Linear(fc_dim, num_classes)
        self.nonlin = nn.ReLU()
        self.maxpool = nn.MaxPool2d(2, 2, 0, ceil_mode=True)
        self.dropout = nn.Dropout(0.5)

    def forward(self, x):
        for bi, (n, cout) in enumerate(self.cfg, start=1):
            for ci in range(1, n + 1):
                x = self.nonlin(getattr(self, f"conv{bi}_{ci}")(x))
            x = self.maxpool(x)
        x = x.view(x.size(0), -1)
        e6 = self.nonlin(self.fc6(x))
        e7 = self.nonlin(self.fc7(self.dropout(e6)))
        return self.fc8(self.dropout(e7))


def _randomize(net, seed):
    gen = torch.Generator().manual_seed(seed)
    for m in net.modules():
        if isinstance(m, (nn.Conv2d, nn.Linear)):
            with torch.no_grad():
                fan = m.weight.shape[0] * int(
                    np.prod(m.weight.shape[2:]) if m.weight.dim() > 2 else 1)
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
                m.running_mean.copy_(torch.randn(
                    m.running_mean.shape, generator=gen) * 0.05)
                m.running_var.copy_(torch.rand(
                    m.running_var.shape, generator=gen) * 0.5 + 0.5)
    return net.double().eval()


@pytest.mark.parametrize("senet", [False, True])
def test_vggface2_forward_parity(senet):
    embed = 256 if senet else 128
    tnet = _randomize(_VGGFace2Torch(embed, se_ratio=16 if senet else None),
                      5)
    build = build_senet50_256 if senet else build_resnet50_128
    graph, shapes, enc = build(num_classes=2)
    params = params_from_state_dict(shapes, tnet.state_dict(),
                                    dtype=jnp.float64)

    x = torch.randn((1, 3, 224, 224), dtype=torch.float64,
                    generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        y_ref, feat_ref = tnet(x)
    values = I.forward_clean(graph, params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(values[enc]), feat_ref.numpy(),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(values[graph.output_id]),
                               y_ref.numpy(), rtol=1e-8, atol=1e-9)


def test_senet_ebp_raises_on_sigmoid():
    graph, shapes, enc = build_senet50_256()
    from xfr_tpu.models.common import init_params

    params = init_params(shapes, seed=0)
    with pytest.raises(ValueError, match="special case"):
        I.ebp(graph, params, jnp.zeros((1, 3, 224, 224), jnp.float32),
              jnp.zeros((1, 2), jnp.float32), subtree_mode="norelu")


def _vgg16_ebp_parity(cfg, input_hw, fc_dim, events="subset"):
    tnet = _randomize(_VGG16Torch(num_classes=11, cfg=cfg,
                                  input_hw=input_hw, fc_dim=fc_dim), 6)
    graph, shapes, enc = build_vgg16(num_classes=11, cfg=cfg,
                                     input_hw=input_hw, fc_dim=fc_dim)
    params = params_from_state_dict(shapes, tnet.state_dict(),
                                    dtype=jnp.float64)

    x = torch.rand((1, 3, input_hw, input_hw), dtype=torch.float64,
                   generator=torch.Generator().manual_seed(10))
    with torch.no_grad():
        y_ref = tnet(x)
    values = I.forward_clean(graph, params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(values[graph.output_id]),
                               y_ref.numpy(), rtol=1e-8, atol=1e-9)

    oracle = HookEBP(tnet, (), eps=1e-12, subtree_mode="norelu")
    Pn = torch.zeros((1, 11), dtype=torch.float64)
    Pn[0, 2] = 1.0
    P_ref, names = oracle.run(x, Pn)
    out = I.ebp(graph, params, jnp.asarray(x.numpy()),
                jnp.asarray(Pn.numpy()), subtree_mode="norelu", eps=1e-12)
    assert len(P_ref) == graph.n_events
    ks = (range(graph.n_events) if events == "all"
          else [0, 1, 2, 5, graph.n_events - 2, graph.n_events - 1])
    for k in ks:
        np.testing.assert_allclose(
            np.asarray(out[k]), P_ref[k].numpy(), rtol=1e-6, atol=1e-12,
            err_msg=f"event {k} ({names[k]})")


def test_vgg16_forward_parity_fullsize():
    """Full-depth/full-size conversion + forward parity (the conversion
    property needs the real cfg; EBP parity doesn't — see below)."""
    tnet = _randomize(_VGG16Torch(num_classes=11), 6)
    graph, shapes, enc = build_vgg16(num_classes=11)
    params = params_from_state_dict(shapes, tnet.state_dict(),
                                    dtype=jnp.float64)
    x = torch.rand((1, 3, 224, 224), dtype=torch.float64,
                   generator=torch.Generator().manual_seed(10))
    with torch.no_grad():
        y_ref = tnet(x)
    values = I.forward_clean(graph, params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(values[graph.output_id]),
                               y_ref.numpy(), rtol=1e-8, atol=1e-9)


def test_vgg16_ebp_parity_mini():
    """EBP event parity on a reduced VGG-16 with the identical op/event
    sequence (plain conv+bias, ceil-mode maxpools, hooked Dropout, FC
    chain) — checks EVERY event, vs the full-size test's sampled six.
    The full-size variant is the opt-in slow tier (--runslow); it ran at
    224^2 in ~11 min of the 23-min suite for the same schedule property."""
    _vgg16_ebp_parity(cfg=((1, 8), (1, 8), (2, 16), (2, 16), (2, 16)),
                      input_hw=64, fc_dim=32, events="all")


@pytest.mark.slow
def test_vgg16_ebp_parity_fullsize():
    _vgg16_ebp_parity(cfg=None, input_hw=224, fc_dim=4096)
