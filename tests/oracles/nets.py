"""Paired torch / graph-IR test networks with weight transfer.

Each factory returns (torch_module, graphdef, params, containers) where the
torch module is the hook-oracle target and (graphdef, params) is the
equivalent xfr_tpu IR.  The nets exercise every op/fork/inplace pattern used
by the reference model zoo at toy scale.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from xfr_tpu.graph import GraphBuilder


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def conv_params(m):
    p = {"w": _t2j(m.weight)}
    if m.bias is not None:
        p["b"] = _t2j(m.bias)
    return p


def linear_params(m):
    p = {"w": _t2j(m.weight)}
    if m.bias is not None:
        p["b"] = _t2j(m.bias)
    return p


def bn_params(m):
    return {"gamma": _t2j(m.weight), "beta": _t2j(m.bias),
            "mean": _t2j(m.running_mean), "var": _t2j(m.running_var)}


def _randomize_bn(m, gen):
    with torch.no_grad():
        m.weight.copy_(torch.randn(m.weight.shape, generator=gen) * 0.5 + 1.0)
        m.bias.copy_(torch.randn(m.bias.shape, generator=gen) * 0.1)
        m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                         generator=gen) * 0.1)
        m.running_var.copy_(torch.rand(m.running_var.shape,
                                       generator=gen) * 0.5 + 0.5)


# -- custom modules mirroring the reference ---------------------------------


class Add(nn.Module):
    def forward(self, x, y):
        return x + y


class Multiply(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.n = n

    def forward(self, x):
        return x * self.n


class ConcatChannels(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.channels = int(channels)

    def forward(self, x):
        z = torch.zeros(x.size()).type_as(x.data).repeat(
            1, self.channels, 1, 1)
        return torch.cat((x, z), dim=1)


class Split(nn.Module):
    def __init__(self, split_size, dim):
        super().__init__()
        self.split_size = split_size
        self.dim = dim

    def forward(self, x):
        return torch.split(x, self.split_size, self.dim)


class MFMConv(nn.Module):
    """Reference lightcnn.mfm (lightcnn.py:48-62)."""

    def __init__(self, cin, cout, k=3, s=1, p=1):
        super().__init__()
        self.out_channels = cout
        self.filter = nn.Conv2d(cin, 2 * cout, kernel_size=k, stride=s,
                                padding=p)
        self.split = Split(cout, 1)

    def forward(self, x):
        x = self.filter(x)
        out = self.split(x)
        return torch.max(out[0], out[1])


class MFMLinear(nn.Module):
    def __init__(self, fin, fout):
        super().__init__()
        self.filter = nn.Linear(fin, 2 * fout)
        self.split = Split(fout, 1)

    def forward(self, x):
        x = self.filter(x)
        out = self.split(x)
        return torch.max(out[0], out[1])


# -- net 1: plain chain ------------------------------------------------------


class ChainNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 4, 3, padding=1, bias=True)
        self.bn1 = nn.BatchNorm2d(4)
        self.relu1 = nn.ReLU(inplace=True)
        self.pool1 = nn.MaxPool2d(2)
        self.conv2 = nn.Conv2d(4, 6, 3, padding=1, stride=2, bias=True)
        self.relu2 = nn.ReLU()
        self.pool2 = nn.AvgPool2d(2)
        self.fc1 = nn.Linear(6 * 2 * 2, 8)
        self.fc2 = nn.Linear(8, 5)

    def forward(self, x):
        x = self.pool1(self.relu1(self.bn1(self.conv1(x))))
        x = self.pool2(self.relu2(self.conv2(x)))
        x = x.view(x.size(0), -1)
        return self.fc2(self.fc1(x))


def make_chain(seed=0):
    gen = torch.Generator().manual_seed(seed)
    net = ChainNet().eval()
    for m in net.modules():
        if isinstance(m, (nn.Conv2d, nn.Linear)):
            with torch.no_grad():
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen)
                               * 0.3)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=gen)
                                 * 0.1)
        elif isinstance(m, nn.BatchNorm2d):
            _randomize_bn(m, gen)
    net = net.double()

    g = GraphBuilder("chain")
    x = g.conv2d(0, 3, 4, 3, padding=1, name="conv1")
    x = g.batchnorm2d(x, 4, name="bn1")
    x = g.relu(x, inplace=True)
    x = g.maxpool2d(x, 2)
    x = g.conv2d(x, 4, 6, 3, stride=2, padding=1, name="conv2")
    x = g.relu(x)
    x = g.avgpool2d(x, 2)
    x = g.flatten(x)
    x = g.linear(x, 24, 8, name="fc1")
    x = g.linear(x, 8, 5, name="fc2")
    graph = g.finalize(x)

    params = {
        "conv1": conv_params(net.conv1), "bn1": bn_params(net.bn1),
        "conv2": conv_params(net.conv2),
        "fc1": linear_params(net.fc1), "fc2": linear_params(net.fc2),
    }
    return net, graph, params, ()


# -- net 2: resnet-like with Bottleneck fork, ConcatChannels, Multiply -------


class ToyBottleneck(nn.Module):
    """Reference Bottleneck at toy scale (resnet.py:111-149)."""

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, stride=stride, bias=True)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=True)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 2, 1, bias=True)
        self.bn3 = nn.BatchNorm2d(planes * 2)
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


class ResLikeNet(nn.Module):
    def __init__(self, stride=2):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 4, 3, padding=1, bias=True)
        self.bn1 = nn.BatchNorm2d(4)
        self.relu = nn.ReLU(inplace=True)
        downsample = nn.Sequential(
            nn.AvgPool2d(kernel_size=stride, stride=stride),
            ConcatChannels(8 // 4 - 1),
        )
        self.layer1 = nn.Sequential(
            ToyBottleneck(4, 4, stride=stride, downsample=downsample))
        self.avgpool = nn.AvgPool2d(4, stride=4)
        self.fc1 = nn.Linear(8 * 2 * 2, 8)
        self.multiply = Multiply(50.0)
        self.fc2 = nn.Linear(8, 5, bias=False)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.layer1(x)
        x = self.avgpool(x)
        x = x.view(x.size(0), -1)
        x = self.fc1(x)
        x = F.normalize(x, p=2, dim=1)
        x = self.multiply(x)
        return self.fc2(x)


def make_reslike(seed=0, stride=2):
    gen = torch.Generator().manual_seed(seed)
    net = ResLikeNet(stride=stride).eval()
    for m in net.modules():
        if isinstance(m, (nn.Conv2d, nn.Linear)):
            with torch.no_grad():
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen)
                               * 0.3)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=gen)
                                 * 0.1)
        elif isinstance(m, nn.BatchNorm2d):
            _randomize_bn(m, gen)
    net = net.double()

    b = net.layer1[0]
    g = GraphBuilder("reslike")
    x = g.conv2d(0, 3, 4, 3, padding=1, name="conv1")
    x = g.batchnorm2d(x, 4, name="bn1")
    x = g.relu(x, inplace=True)
    blk_in = x
    # torch call order within ToyBottleneck.forward:
    y = g.conv2d(blk_in, 4, 4, 1, stride=stride, name="b_conv1")
    y = g.batchnorm2d(y, 4, name="b_bn1")
    y = g.relu(y, inplace=True)
    y = g.conv2d(y, 4, 4, 3, padding=1, name="b_conv2")
    y = g.batchnorm2d(y, 4, name="b_bn2")
    y = g.relu(y, inplace=True)
    y = g.conv2d(y, 4, 8, 1, name="b_conv3")
    y = g.batchnorm2d(y, 8, name="b_bn3")
    r = g.avgpool2d(blk_in, stride, stride=stride)
    r = g.concat_zero_channels(r, 1)
    y = g.add(y, r)
    y = g.relu(y, inplace=True)
    y = g.avgpool2d(y, 4, stride=4)
    y = g.flatten(y)
    y = g.linear(y, 8 * 2 * 2, 8, name="fc1")
    y = g.l2normalize(y)
    y = g.multiply_const(y, 50.0)
    y = g.linear(y, 8, 5, bias=False, name="fc2")
    graph = g.finalize(y)

    params = {
        "conv1": conv_params(net.conv1), "bn1": bn_params(net.bn1),
        "b_conv1": conv_params(b.conv1), "b_bn1": bn_params(b.bn1),
        "b_conv2": conv_params(b.conv2), "b_bn2": bn_params(b.bn2),
        "b_conv3": conv_params(b.conv3), "b_bn3": bn_params(b.bn3),
        "fc1": linear_params(net.fc1), "fc2": linear_params(net.fc2),
    }
    return net, graph, params, (ToyBottleneck,)


# -- net 3: LightCNN-like (mfm, maxpool+avgpool pairs) -----------------------


class MFMNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = MFMConv(1, 4, 3, 1, 1)
        self.maxpool1 = nn.MaxPool2d(2)
        self.avgpool1 = nn.AvgPool2d(2)
        self.conv2 = MFMConv(4, 6, 3, 1, 1)
        self.maxpool2 = nn.MaxPool2d(2)
        self.avgpool2 = nn.AvgPool2d(2)
        self.fc = MFMLinear(6 * 4 * 4, 8)
        self.fc2 = nn.Linear(8, 5, bias=False)
        self.training = False

    def forward(self, x):
        x = self.conv1(x)
        x = self.maxpool1(x) + self.avgpool1(x)
        x = self.conv2(x)
        x = self.maxpool2(x) + self.avgpool2(x)
        x = x.view(x.size(0), -1)
        fc = self.fc(x)
        x = F.dropout(fc, training=self.training)
        return self.fc2(x)


def make_mfm(seed=0):
    gen = torch.Generator().manual_seed(seed)
    net = MFMNet().eval()
    for m in net.modules():
        if isinstance(m, (nn.Conv2d, nn.Linear)):
            with torch.no_grad():
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen)
                               * 0.3)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=gen)
                                 * 0.1)
    net = net.double()

    g = GraphBuilder("mfm")
    x = g.mfm_conv(0, 1, 4, 3, padding=1, name="conv1")
    a = g.maxpool2d(x, 2)
    b = g.avgpool2d(x, 2)
    x = g.funcadd(a, b)
    x = g.mfm_conv(x, 4, 6, 3, padding=1, name="conv2")
    a = g.maxpool2d(x, 2)
    b = g.avgpool2d(x, 2)
    x = g.funcadd(a, b)
    x = g.flatten(x)
    x = g.mfm_linear(x, 6 * 4 * 4, 8, name="fc")
    x = g.dropout_eval(x)
    x = g.linear(x, 8, 5, bias=False, name="fc2")
    graph = g.finalize(x)

    params = {
        "conv1": conv_params(net.conv1.filter),
        "conv2": conv_params(net.conv2.filter),
        "fc": linear_params(net.fc.filter),
        "fc2": linear_params(net.fc2),
    }
    return net, graph, params, (MFMConv, MFMLinear)


ALL_NETS = {
    "chain": (make_chain, (1, 3, 16, 16)),
    "reslike": (make_reslike, (1, 3, 16, 16)),
    "mfm": (make_mfm, (1, 1, 16, 16)),
}
