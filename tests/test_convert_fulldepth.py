"""Full-depth weight-conversion validation for the two flagship matchers.

The reduced-depth parity tests (tests/test_models.py) validate the EBP
semantics; these validate the *converter key-naming at production depth*:
a full-depth torch state_dict (ResNet-101 layers (3,4,23,3), LightCNN-29v2
layers (1,2,3,4)) pushed through params_from_state_dict must reproduce the
torch forward exactly — a naming slip in any deep layer (e.g.
``layer3.17.conv2``) fails here (reference checkpoints: resnet.py:278,
lightcnn.py:300-303).
"""

import numpy as np
import torch

import jax.numpy as jnp

from tests.test_models import _LightCNN29v2, _STResNet, _randomize
from xfr_tpu.ebp import interpreter as I
from xfr_tpu.models.convert import params_from_state_dict
from xfr_tpu.models.lightcnn import build_lightcnn29v2
from xfr_tpu.models.resnet101 import build_resnet101


def test_resnet101_fulldepth_forward_parity():
    layers = (3, 4, 23, 3)  # reference resnet101v6 (resnet.py:268)
    tnet = _randomize(_STResNet(layers, 17), 21)
    graph, shapes, enc = build_resnet101(num_classes=17, layers=layers)
    # every deep-layer key must resolve (strict shape check)
    assert "layer3.17.conv2" in shapes and "layer4.2.bn3" in shapes
    params = params_from_state_dict(shapes, tnet.state_dict(),
                                    dtype=jnp.float64)

    x = torch.randn((1, 3, 224, 224), dtype=torch.float64,
                    generator=torch.Generator().manual_seed(31))
    with torch.no_grad():
        y_ref = tnet(x).numpy()
    values = I.forward_clean(graph, params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(values[graph.output_id]), y_ref,
                               rtol=1e-8, atol=1e-9)
    # embedding head too (pre-classifier L2*50 feature)
    with torch.no_grad():
        feats = tnet.multiply(torch.nn.functional.normalize(
            tnet.fc1(tnet.avgpool(tnet.layer4(tnet.layer3(tnet.layer2(
                tnet.layer1(tnet.maxpool(tnet.relu(tnet.bn1(
                    tnet.conv1(x))))))))).flatten(1)), p=2, dim=1)).numpy()
    np.testing.assert_allclose(np.asarray(values[enc]), feats,
                               rtol=1e-8, atol=1e-9)


def test_lightcnn_fulldepth_forward_parity():
    layers = (1, 2, 3, 4)  # reference LightCNN_29Layers_v2 (lightcnn.py:295)
    tnet = _randomize(_LightCNN29v2(layers, 13), 22)
    graph, shapes, enc = build_lightcnn29v2(num_classes=13, layers=layers)
    assert ("block3.2.conv2.filter" in shapes and
            "block4.3.conv1.filter" in shapes)
    params = params_from_state_dict(shapes, tnet.state_dict(),
                                    dtype=jnp.float64)

    x = torch.rand((1, 1, 128, 128), dtype=torch.float64,
                   generator=torch.Generator().manual_seed(32))
    with torch.no_grad():
        y_ref = tnet(x).numpy()
    values = I.forward_clean(graph, params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(values[graph.output_id]), y_ref,
                               rtol=1e-8, atol=1e-9)


def test_runtime_init_params_absent_from_checkpoint():
    """The real resnet50_128.pth carries NO fc1 — the reference builds it
    at runtime (whitebox.py:216-229) — so conversion must initialize a
    runtime_init param instead of raising, and still convert it when a
    replica does provide it."""
    import pytest

    from xfr_tpu.models import convert

    shapes = {"conv1": {"w": (4, 3, 3, 3)}, "fc1": {"w": (2, 4)}}
    sd = {"conv1.weight": np.zeros((4, 3, 3, 3), np.float32)}
    with pytest.raises(KeyError, match="fc1"):
        convert.params_from_state_dict(shapes, sd)
    params = convert.params_from_state_dict(shapes, sd,
                                            runtime_init=("fc1",))
    assert params["fc1"]["w"].shape == (2, 4)
    sd["fc1.weight"] = np.ones((2, 4), np.float32)
    params = convert.params_from_state_dict(shapes, sd,
                                            runtime_init=("fc1",))
    np.testing.assert_array_equal(np.asarray(params["fc1"]["w"]), 1.0)
