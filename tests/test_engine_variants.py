"""Engine-level smoke + property tests for the less-traveled EBP variants:
public layerwise EBP (argmax/elementwise) and all 8 deprecated
layerwise-contrastive prior modes."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.fixtures import make_toy_wbnet


@pytest.fixture(scope="module")
def wb_and_probe():
    wb = make_toy_wbnet(subtree_mode="all", seed=3)
    rng = np.random.RandomState(3)
    probe = jnp.asarray(rng.rand(1, 3, 224, 224), jnp.float32)
    return wb, probe


@pytest.mark.parametrize("mode", ["argmax", "elementwise"])
def test_layerwise_ebp(wb_and_probe, mode):
    wb, probe = wb_and_probe
    k_layer = wb._n_events // 2
    kwargs = dict(k_poschannel=2, mwp=True)
    if mode == "elementwise":
        kwargs["k_element"] = 0
    P = wb.layerwise_ebp(probe, k_layer, mode=mode, **kwargs)
    assert P.shape == (56, 56)  # toy net P[-2] plane (stride-4 conv1)
    assert np.isfinite(P).all()
    assert P.min() >= 0

    with pytest.raises(ValueError):
        wb.layerwise_ebp(probe, k_layer, mode="nope")


@pytest.mark.parametrize("mode", ["copy", "mean", "product", "argmax",
                                  "argmax_product", "percentile",
                                  "percentile_argmax", "elementwise"])
def test_layerwise_contrastive_ebp_modes(wb_and_probe, mode):
    wb, probe = wb_and_probe
    k_layer = wb._n_events // 2
    with pytest.warns(UserWarning, match="deprecated"):
        P = wb.layerwise_contrastive_ebp(
            probe, k_poschannel=2, k_negchannel=3, k_layer=k_layer,
            mode=mode, percentile=80, k_element=0,
            gradlayer=None, mwp=True)
    assert P.shape == (56, 56)
    assert np.isfinite(P).all()

    with pytest.warns(UserWarning):
        with pytest.raises(ValueError):
            wb.layerwise_contrastive_ebp(probe, 2, 3, k_layer, mode="nope")


def test_argmax_layerwise_concentrates(wb_and_probe):
    """argmax-prior layerwise EBP restricts mass relative to full EBP."""
    wb, probe = wb_and_probe
    Pn = jnp.asarray(np.eye(5, dtype=np.float32)[2:3])
    full = wb.ebp(probe, Pn, mwp=True)
    lw = wb.layerwise_ebp(probe, wb._n_events - 4, mode="argmax",
                          k_poschannel=2, mwp=True)
    # a single-subtree prior yields no more total mass than the full EBP
    assert lw.sum() <= full.sum() * (1 + 1e-3)


def test_network_adapter_contract(wb_and_probe):
    """WhiteboxNetwork abstract-contract methods (reference:
    whitebox.py:58-71): encode returns the embedding tensor, classify the
    logits, clear is a safe no-op."""
    wb, probe = wb_and_probe
    net = wb.net
    emb = np.asarray(net.encode(probe))
    assert emb.shape == (1, net.embed_dim or emb.shape[1])
    logits = np.asarray(net.classify(probe))
    assert logits.shape == (1, net.num_classes())
    # eager vs jit fusion differ at ~1e-6 relative
    np.testing.assert_allclose(
        emb, np.asarray(wb.encode(probe)), rtol=1e-4, atol=1e-5)
    net.clear()  # no-op, must not raise or change state
    np.testing.assert_allclose(
        np.asarray(net.classify(probe)), logits, rtol=0, atol=0)
