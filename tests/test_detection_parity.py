"""Numerical parity of the detection network vs the reference's executable
MMdnn KitModels.

The reference distributes its Faster R-CNN as whole-module torch pickles,
but the MMdnn-converted *source* for all three stages is runnable torch
code (reference: python/strface/models/detection/{bottom,rpn,top}_layers.py).
We instantiate those KitModels with synthetic weights (injected by
monkeypatching their module-level ``load_weights``), feed the resulting
``state_dict()`` through our documented import path
(``load_from_torch_state_dicts``), and assert float64 forward parity of
trunk, RPN and top stages.  This catches transposed kernels, wrong pads,
BN eps drift, and the asymmetric pool1 / dilated-res5 quirks that the
structural test alone cannot.
"""

import importlib.util
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from xfr_tpu.detection import network as D
from xfr_tpu.ebp import interpreter as I

REF_DIR = "/root/reference/python/strface/models/detection"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not present")


def _synth_weights(param_shapes, rng, rename=()):
    """MMdnn-style weights dict from our builder's param-shape template."""
    rename = dict(rename)
    d = {}
    for pname, shapes in param_shapes.items():
        key = rename.get(pname, pname)
        if "gamma" in shapes:  # batchnorm: scale/bias/mean/var
            d[key] = {
                "scale": rng.randn(*shapes["gamma"]).astype(np.float32),
                "bias": rng.randn(*shapes["beta"]).astype(np.float32),
                "mean": (rng.randn(*shapes["mean"]) * 0.1).astype(
                    np.float32),
                "var": (rng.rand(*shapes["var"]) + 0.5).astype(np.float32),
            }
        else:  # conv / dense: weights (+ bias)
            d[key] = {"weights":
                      (rng.randn(*shapes["w"]) * 0.1).astype(np.float32)}
            if "b" in shapes:
                d[key]["bias"] = (rng.randn(*shapes["b"]) * 0.1).astype(
                    np.float32)
    return d


def _load_kit(pyname, weights):
    """Instantiate a reference KitModel with injected synthetic weights."""
    path = os.path.join(REF_DIR, pyname + ".py")
    spec = importlib.util.spec_from_file_location("ref_" + pyname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.load_weights = lambda f: weights  # bypass np.load pickle path
    return mod.KitModel("synthetic").double().eval()


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(42)


def test_trunk_forward_parity(rng):
    graph, shapes = D.build_trunk()
    weights = _synth_weights(shapes, rng)
    kit = _load_kit("bottom_layers", weights)

    x = torch.randn(1, 3, 64, 64, dtype=torch.float64,
                    generator=torch.Generator().manual_seed(0))
    with torch.no_grad():
        feats_ref = kit(x).numpy()

    params = D.load_from_torch_state_dicts(
        kit.state_dict(), _rpn_sd(rng), _top_sd(rng),
        dtype=jnp.float64)["trunk"]
    feats = np.asarray(I.forward_clean(
        graph, params, jnp.asarray(x.numpy()))[graph.output_id])
    assert feats.shape == feats_ref.shape == (1, 1024, 4, 4)
    np.testing.assert_allclose(feats, feats_ref, rtol=1e-8, atol=1e-10)


def _rpn_sd(rng):
    _, s1 = D.build_rpn()
    _, s2 = D.build_rpn_bbox()
    w = _synth_weights({**s1, **s2}, rng,
                       rename={"rpn_conv_3x3": "rpn_conv/3x3"})
    kit = _load_kit("rpn_layers", w)
    return kit.state_dict()


def _top_sd(rng):
    _, shapes, _ = D.build_top()
    kit = _load_kit("top_layers", _synth_weights(shapes, rng))
    return kit.state_dict()


def test_rpn_forward_parity(rng):
    rg, s1 = D.build_rpn()
    rbg, s2 = D.build_rpn_bbox()
    weights = _synth_weights({**s1, **s2}, rng,
                             rename={"rpn_conv_3x3": "rpn_conv/3x3"})
    kit = _load_kit("rpn_layers", weights)

    feats = torch.randn(1, 1024, 6, 7, dtype=torch.float64,
                        generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        cls_ref, bbox_ref = (t.numpy() for t in kit(feats))

    params = D.load_from_torch_state_dicts(
        _bottom_sd(rng), kit.state_dict(), _top_sd(rng),
        dtype=jnp.float64)["rpn"]
    xj = jnp.asarray(feats.numpy())
    cls = np.asarray(I.forward_clean(rg, params, xj)[rg.output_id])
    bbox = np.asarray(I.forward_clean(rbg, params, xj)[rbg.output_id])
    assert cls.shape == cls_ref.shape == (1, 18, 6, 7)
    assert bbox.shape == bbox_ref.shape == (1, 36, 6, 7)
    np.testing.assert_allclose(cls, cls_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(bbox, bbox_ref, rtol=1e-9, atol=1e-11)


def _bottom_sd(rng):
    _, shapes = D.build_trunk()
    kit = _load_kit("bottom_layers", _synth_weights(shapes, rng))
    return kit.state_dict()


def test_top_forward_parity(rng):
    tg, shapes, cls_t = D.build_top()
    weights = _synth_weights(shapes, rng)
    kit = _load_kit("top_layers", weights)

    roi = torch.randn(3, 1024, 14, 14, dtype=torch.float64,
                      generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        bbox_ref, prob_ref, score_ref = (t.numpy() for t in kit(roi))

    params = D.load_from_torch_state_dicts(
        _bottom_sd(rng), _rpn_sd(rng), kit.state_dict(),
        dtype=jnp.float64)["top"]
    values = I.forward_clean(tg, params, jnp.asarray(roi.numpy()))
    bbox = np.asarray(values[tg.output_id])
    score = np.asarray(values[cls_t])
    prob = np.asarray(jnp.asarray(
        torch.softmax(torch.tensor(score), dim=1).numpy()))
    assert bbox.shape == bbox_ref.shape == (3, 8)
    assert score.shape == score_ref.shape == (3, 2)
    np.testing.assert_allclose(bbox, bbox_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(score, score_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(prob, prob_ref, rtol=1e-8, atol=1e-10)


def test_bbox_delta_clip():
    """Huge uncalibrated dw/dh decode to finite boxes (BBOX_XFORM_CLIP)."""
    from xfr_tpu.detection import boxes as B

    boxes = np.array([[10.0, 10.0, 50.0, 60.0]])
    deltas = np.array([[0.1, -0.2, 80.0, 90.0]])  # exp(80) overflows
    with np.errstate(over="raise"):
        pred = B.bbox_transform_inv(boxes, deltas)
    assert np.isfinite(pred).all()
    # clip binds at log(1000/16): width <= 1000/16 * anchor width
    w = pred[0, 2] - pred[0, 0]
    assert w <= (1000.0 / 16.0) * 41.0 + 1
    # small deltas unaffected
    small = B.bbox_transform_inv(boxes, np.array([[0.1, -0.2, 0.3, -0.4]]))
    np.testing.assert_allclose(
        small[0, 2] - small[0, 0],
        np.exp(0.3) * 41.0, rtol=1e-6)
