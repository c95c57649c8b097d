"""Detector structural parity vs the reference's readable MMdnn defs.

The reference ships the Faster R-CNN as converted-Caffe KitModels
(python/strface/models/detection/{bottom,rpn,top}_layers.py) plus pickled
module weights.  This test parses those sources and asserts our graph-IR
builders reproduce every conv / batchnorm / dense one-for-one — names
(= state_dict keys, so pickled weights convert mechanically), channel
sizes, kernel/stride, bias presence, and BN eps — plus the res5
dilation-2 and pool1 asymmetric-pad details only visible in the forward
bodies.
"""

import os
import re

import numpy as np
import pytest

from xfr_tpu.detection.network import (build_rpn, build_rpn_bbox,
                                       build_top, build_trunk)

REF = "/root/reference/python/strface/models/detection"

_CONV = re.compile(
    r"self\.(\w+) = self\.__conv\(2, name='[^']+', in_channels=(\d+), "
    r"out_channels=(\d+), kernel_size=\((\d+), (\d+)\), "
    r"stride=\((\d+), (\d+)\), groups=1, bias=(True|False)\)")
_BN = re.compile(
    r"self\.(\w+) = self\.__batch_normalization\(2, '[^']+', "
    r"num_features=(\d+), eps=([\d.e+-]+)")
_DENSE = re.compile(
    r"self\.(\w+) = self\.__dense\(name = '[^']+', in_features = (\d+), "
    r"out_features = (\d+), bias = (True|False)\)")


def _parse(path):
    src = open(path).read()
    convs = {m[0]: dict(cin=int(m[1]), cout=int(m[2]),
                        kernel=(int(m[3]), int(m[4])),
                        stride=(int(m[5]), int(m[6])), bias=m[7] == "True")
             for m in _CONV.findall(src)}
    bns = {m[0]: dict(features=int(m[1]), eps=float(m[2]))
           for m in _BN.findall(src)}
    dense = {m[0]: dict(fin=int(m[1]), fout=int(m[2]), bias=m[3] == "True")
             for m in _DENSE.findall(src)}
    return convs, bns, dense


def _graph_attrs(graph):
    return {n.pname: n.attrs_dict for n in graph.nodes if n.pname}


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_trunk_matches_bottom_layers():
    convs, bns, dense = _parse(os.path.join(REF, "bottom_layers.py"))
    assert not dense
    graph, shapes = build_trunk()
    attrs = _graph_attrs(graph)

    ours_convs = {p for p in shapes if "w" in shapes[p]
                  and len(shapes[p]["w"]) == 4}
    ours_bns = {p for p in shapes if "gamma" in shapes[p]}
    assert ours_convs == set(convs), (
        ours_convs ^ set(convs))
    assert ours_bns == set(bns), (ours_bns ^ set(bns))

    for name, c in convs.items():
        w = shapes[name]["w"]
        assert w == (c["cout"], c["cin"]) + c["kernel"], (name, w, c)
        assert ("b" in shapes[name]) == c["bias"], name
        assert attrs[name]["stride"] == c["stride"], (
            name, attrs[name]["stride"], c["stride"])
    for name, b in bns.items():
        assert shapes[name]["gamma"] == (b["features"],), name
        assert np.isclose(attrs[name]["eps"], b["eps"], rtol=1e-9), name

    # pool1: right/bottom-only pad + 3x3/2 (bottom_layers.py :227-228)
    pool = [n for n in graph.nodes if n.op == "maxpool2d"]
    assert len(pool) == 1
    a = pool[0].attrs_dict
    assert (a["kernel"], a["stride"], a["padding"], a["ceil_mode"]) == \
        ((3, 3), (2, 2), (0, 0), True)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_rpn_matches_rpn_layers():
    convs, _, _ = _parse(os.path.join(REF, "rpn_layers.py"))
    graph, shapes = build_rpn()
    _, bbox_shapes = build_rpn_bbox()
    merged = {**shapes, **bbox_shapes}
    assert set(merged) == set(convs)
    for name, c in convs.items():
        assert merged[name]["w"] == (c["cout"], c["cin"]) + c["kernel"]
        assert ("b" in merged[name]) == c["bias"]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_top_matches_top_layers():
    convs, bns, dense = _parse(os.path.join(REF, "top_layers.py"))
    graph, shapes, _ = build_top()
    attrs = _graph_attrs(graph)

    ours_convs = {p for p in shapes
                  if "w" in shapes[p] and len(shapes[p]["w"]) == 4}
    ours_dense = {p for p in shapes
                  if "w" in shapes[p] and len(shapes[p]["w"]) == 2}
    ours_bns = {p for p in shapes if "gamma" in shapes[p]}
    assert ours_convs == set(convs)
    assert ours_bns == set(bns)
    assert ours_dense == set(dense)

    for name, c in convs.items():
        assert shapes[name]["w"] == (c["cout"], c["cin"]) + c["kernel"]
        assert ("b" in shapes[name]) == c["bias"]
        assert attrs[name]["stride"] == c["stride"], name
    for name, d in dense.items():
        assert shapes[name]["w"] == (d["fout"], d["fin"])
        assert ("b" in shapes[name]) == d["bias"]
    # res5 3x3s run dilation-2, padding-2 (top_layers.py forward F.conv2d)
    src = open(os.path.join(REF, "top_layers.py")).read()
    for name in ours_convs:
        if name.endswith("_branch2b"):
            assert attrs[name].get("dilation") == (2, 2), name
            assert attrs[name]["padding"] == (2, 2), name
            assert ("padding=(2,2), dilation=2" in src)


def test_detector_state_dict_roundtrip():
    """A torch-layout state_dict with the MMdnn attribute names converts
    mechanically (the documented pickle import path)."""
    from xfr_tpu.detection.network import load_from_torch_state_dicts

    def synth_sd(shapes, seed):
        rng = np.random.RandomState(seed)
        sd = {}
        for pname, keys in shapes.items():
            if "gamma" in keys:
                sd[pname + ".weight"] = rng.randn(*keys["gamma"])
                sd[pname + ".bias"] = rng.randn(*keys["beta"])
                sd[pname + ".running_mean"] = rng.randn(*keys["mean"])
                sd[pname + ".running_var"] = rng.rand(*keys["var"]) + 0.5
            else:
                sd[pname + ".weight"] = rng.randn(*keys["w"])
                if "b" in keys:
                    sd[pname + ".bias"] = rng.randn(*keys["b"])
        return sd

    _, trunk_shapes = build_trunk()
    rpn_graph, rpn_shapes = build_rpn()
    _, rpn_bbox_shapes = build_rpn_bbox()
    _, top_shapes, _ = build_top()
    params = load_from_torch_state_dicts(
        synth_sd(trunk_shapes, 0),
        synth_sd({**rpn_shapes, **rpn_bbox_shapes}, 1),
        synth_sd(top_shapes, 2))
    assert set(params) == {"trunk", "rpn", "top"}
    w = np.asarray(params["trunk"]["res4b22_branch2c"]["w"])
    assert w.shape == (1024, 256, 1, 1) and np.isfinite(w).all()
