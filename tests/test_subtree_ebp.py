"""Parity of Whitebox.subtree_ebp vs a torch-hook oracle.

The deprecated reference engine's unique method (resnetEBP.py:286-340):
truncated-contrastive EBP injected per candidate event, candidates scored
by injected-prior peakiness (max(prior/sum(prior)) * numel), zero-map
scores dropped (ebp_ver>1), topk by ascending argsort, selected
blurred+normalized planes summed then sum-normalized.

The oracle implements those exact semantics on the HookEBP torch oracle
(float64), so prior construction (percentile-mass mask formula,
resnetEBP.py:273-283), injection, scoring, selection, merging and
normalization are all validated event-by-event against torch.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.oracles.torch_ebp import HookEBP
from tests.oracles import nets as N
from xfr_tpu.ebp.engine import Whitebox, WhiteboxNetwork


def _setup(netname, subtree_mode, seed=0):
    make, shape = N.ALL_NETS[netname]
    tnet, graph, params, containers = make(seed)
    x = torch.randn(shape, generator=torch.Generator().manual_seed(11),
                    dtype=torch.float64)
    net = WhiteboxNetwork(graph, params, encode_tensor=graph.output_id,
                          classifier_pname="fc2", num_classes=5,
                          name=netname)
    wb = Whitebox(net, ebp_version=6, ebp_subtree_mode=subtree_mode,
                  eps=1e-12)
    oracle = HookEBP(tnet, containers, eps=1e-12, subtree_mode=subtree_mode)
    return wb, oracle, x


def _onehot(k, n=5):
    P = torch.zeros((1, n), dtype=torch.float64)
    P[0, k] = 1.0
    return P


def oracle_subtree_ebp(wb, oracle, x, kpos, kneg, percentile, mode, topk):
    """resnetEBP.py:286-340 semantics on the torch-hook oracle."""
    P_mate, _ = oracle.run(x, _onehot(kpos))
    P_nonmate, _ = oracle.run(x, _onehot(kneg))
    n_ev = len(P_mate)

    maps, scores = [], []
    for k in range(n_ev - 1):
        Pm = P_mate[k].numpy().astype(np.float64)
        C = np.maximum(Pm - P_nonmate[k].numpy(), 0.0)
        # percentile-mass mask, reference sort-cumsum form
        # (resnetEBP.py:273-279)
        flat = Pm.flatten()
        order = np.argsort(flat, kind="stable")
        csum = np.cumsum(flat[order])
        m = np.zeros_like(flat)
        m[order] = (csum > (percentile / 100.0) * csum[-1])
        prior = m.reshape(Pm.shape) * C
        if mode == "percentile_argmax":
            prior = prior * (prior == prior.max())
        scores.append(
            (prior.max() / (1e-12 + prior.sum())) * prior.size)

        priors = [None] * n_ev
        priors[k] = torch.tensor(prior, dtype=torch.float64)
        P, _ = oracle.run(x, torch.zeros((1, 5), dtype=torch.float64),
                          priors=priors)
        pooled = P[n_ev - 2].numpy().sum(axis=1)[0]
        if pooled.max() <= 0:  # zero-saliency-map masking (ebp_ver>1)
            scores[-1] = 0.0
        maps.append(wb._mwp_to_saliency(pooled.astype(np.float32)))

    scores = np.asarray(scores)
    k_sub = [int(k) for k in np.argsort(scores, kind="stable")[-topk:]]
    smap = np.sum(np.stack([maps[k] for k in k_sub], axis=0), axis=0)
    smap = smap / max(smap.sum(), 1e-12)
    return smap, [float(scores[k]) for k in k_sub], k_sub


@pytest.mark.parametrize("netname", list(N.ALL_NETS))
@pytest.mark.parametrize("mode", ["percentile_argmax", "percentile"])
def test_subtree_ebp_oracle_parity(netname, mode):
    wb, oracle, x = _setup(netname, "all")
    topk = 3
    smap_ref, scores_ref, k_ref = oracle_subtree_ebp(
        wb, oracle, x, 2, 3, percentile=20, mode=mode, topk=topk)
    smap, scores, k_sub = wb.subtree_ebp(
        jnp.asarray(x.numpy()), 2, 3, percentile=20, mode=mode, topk=topk)
    assert k_sub == k_ref
    np.testing.assert_allclose(scores, scores_ref, rtol=1e-6)
    np.testing.assert_allclose(smap, smap_ref, rtol=1e-5, atol=1e-9)


def test_subtree_ebp_topk1_default():
    """Reference default call shape: percentile=20, percentile_argmax,
    topk=1 (resnetEBP.py:286-288)."""
    wb, oracle, x = _setup("chain", "all")
    smap_ref, scores_ref, k_ref = oracle_subtree_ebp(
        wb, oracle, x, 2, 3, percentile=20, mode="percentile_argmax",
        topk=1)
    smap, scores, k_sub = wb.subtree_ebp(jnp.asarray(x.numpy()), 2, 3)
    assert k_sub == k_ref
    np.testing.assert_allclose(scores, scores_ref, rtol=1e-6)
    np.testing.assert_allclose(smap, smap_ref, rtol=1e-5, atol=1e-9)
    assert smap.shape == smap_ref.shape
    np.testing.assert_allclose(smap.sum(), 1.0, rtol=1e-5)


def test_subtree_ebp_rejects_non_percentile_mode():
    wb, _, x = _setup("chain", "all")
    with pytest.raises(AssertionError):
        wb.subtree_ebp(jnp.asarray(x.numpy()), 2, 3, mode="argmax")


def test_subtree_ebp_tied_maxima():
    """Exact tied maxima in the percentile_argmax prior: duplicate conv1
    output channels 0/1 (identical filters, bn stats, and conv2 input
    weights) so their MWP planes tie element-for-element, and boost them
    so the tied planes hold the maximum.  The reference's argmax keeps
    ALL ties (resnetEBP.py:278-280: ``prior * (1 - ne(prior, max))``);
    the engine must match the oracle's scores (v/(n_ties*v) * numel),
    selection, and maps via its exact tied-prior fallback."""
    make, shape = N.ALL_NETS["chain"]
    tnet, graph, params, containers = make(0)
    with torch.no_grad():
        tnet.conv1.weight[0] *= 10.0
        tnet.conv1.weight[1] = tnet.conv1.weight[0]
        tnet.conv1.bias[1] = tnet.conv1.bias[0]
        tnet.conv1.weight[2:] *= 0.05  # tied planes must hold the max
        tnet.conv1.bias[2:] *= 0.05
        for attr in ("weight", "bias", "running_mean", "running_var"):
            getattr(tnet.bn1, attr)[1] = getattr(tnet.bn1, attr)[0]
        tnet.conv2.weight[:, 1] = tnet.conv2.weight[:, 0]
    params = dict(params)
    params["conv1"] = N.conv_params(tnet.conv1)
    params["bn1"] = N.bn_params(tnet.bn1)
    params["conv2"] = N.conv_params(tnet.conv2)

    net = WhiteboxNetwork(graph, params, encode_tensor=graph.output_id,
                          classifier_pname="fc2", num_classes=5,
                          name="chain-tied")
    wb = Whitebox(net, ebp_version=6, ebp_subtree_mode="all", eps=1e-12)
    oracle = HookEBP(tnet, containers, eps=1e-12, subtree_mode="all")
    x = torch.rand(shape, generator=torch.Generator().manual_seed(21),
                   dtype=torch.float64)

    # confirm the construction really produces tied maxima somewhere
    elems, vals, scores, ties = wb._subtree_rank_fn(True)(
        wb.net.params, wb._as_input(jnp.asarray(x.numpy())),
        jnp.stack([wb._onehot(2), wb._onehot(3)]), 20.0)
    assert (np.asarray(ties)[np.asarray(vals) > 0] > 1).any(), \
        "channel surgery produced no ties; test needs a new construction"

    smap_ref, scores_ref, k_ref = oracle_subtree_ebp(
        wb, oracle, x, 2, 3, percentile=20, mode="percentile_argmax",
        topk=3)
    smap, scores, k_sub = wb.subtree_ebp(
        jnp.asarray(x.numpy()), 2, 3, percentile=20,
        mode="percentile_argmax", topk=3)
    assert k_sub == k_ref
    np.testing.assert_allclose(scores, scores_ref, rtol=1e-6)
    np.testing.assert_allclose(smap, smap_ref, rtol=1e-5, atol=1e-9)
