"""Weighted-subtree sweep equivalence: the static-event-order batched
sweep (interpreter.ebp_backward_allevents) must reproduce the traced
per-candidate injected sweep (engine._wsebp_inject_fn) exactly — both
implement the reference's serial per-layer prior-injected layerwise EBP
re-runs (reference: python/xfr/models/whitebox.py:699-703)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.fixtures import make_toy_wbnet


def _setup(subtree_mode):
    wb = make_toy_wbnet(num_classes=4, seed=3, subtree_mode=subtree_mode)
    rng = np.random.RandomState(7)
    probe = jnp.asarray(rng.rand(1, 3, 224, 224), jnp.float32)
    em = rng.rand(12).astype(np.float32)
    en = rng.rand(12).astype(np.float32)
    em /= np.linalg.norm(em)
    en /= np.linalg.norm(en)
    wb.net.set_triplet_classifier(em, en)
    return wb, probe


@pytest.mark.parametrize(
    "subtree_mode", ["all", "norelu", "affineonly", "affineonly_with_prior"])
def test_sweep_matches_traced_inject(subtree_mode):
    wb, probe = _setup(subtree_mode)
    n_ev = wb._n_events

    _, idxs, vals = wb._wsebp_grad_fn()(
        wb.net.params, probe, wb._onehot(0), gating=True)
    elems = jnp.asarray(np.asarray(idxs).astype(np.int32))
    injvals = jnp.asarray(np.asarray(vals, np.float32))

    # traced path, all candidates in event order
    ev_ids = jnp.arange(n_ev - 1, dtype=jnp.int32)
    P_old, max_old = wb._wsebp_inject_fn()(
        wb.net.params, probe, ev_ids, elems, injvals)

    for n_buckets in (1, 3):
        P_new, max_new = wb._wsebp_sweep_fn(n_buckets=n_buckets)(
            wb.net.params, probe, elems, injvals)
        np.testing.assert_allclose(
            np.asarray(P_new), np.asarray(P_old), rtol=1e-5, atol=1e-7,
            err_msg=f"mode={subtree_mode} n_buckets={n_buckets}")
        np.testing.assert_allclose(
            np.asarray(max_new), np.asarray(max_old), rtol=1e-5, atol=1e-7)


def test_weighted_subtree_end_to_end_unchanged():
    """Full weighted_subtree_ebp via the new sweep == explicit
    max_candidates=all path via the old traced sweep."""
    wb, probe = _setup("all")
    n_ev = wb._n_events
    s_new, maps_new, scores_new, k_new = wb.weighted_subtree_ebp(
        probe, 0, 1, topk=3, subtree_mode="all")
    s_old, maps_old, scores_old, k_old = wb.weighted_subtree_ebp(
        probe, 0, 1, topk=3, subtree_mode="all",
        max_candidates=n_ev - 1)
    assert k_new == k_old
    np.testing.assert_allclose(scores_new, scores_old, rtol=1e-6)
    np.testing.assert_allclose(s_new, s_old, rtol=1e-4, atol=1e-8)
    for a, b in zip(maps_new, maps_old):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-8)


@pytest.mark.parametrize("gating", [True, False])
def test_weighted_subtree_batch_matches_single(gating):
    """weighted_subtree_ebp_batch under the interleaved classifier equals
    per-probe weighted_subtree_ebp with each probe's 2-class classifier."""
    wb = make_toy_wbnet(num_classes=4, seed=5, subtree_mode="all")
    rng = np.random.RandomState(11)
    B = 3
    probes = jnp.asarray(rng.rand(B, 3, 224, 224), jnp.float32)
    ems = rng.rand(B, 12).astype(np.float32)
    ens = rng.rand(B, 12).astype(np.float32)
    ems /= np.linalg.norm(ems, axis=1, keepdims=True)
    ens /= np.linalg.norm(ens, axis=1, keepdims=True)

    singles = []
    for i in range(B):
        wb.net.set_triplet_classifier(ems[i], ens[i])
        singles.append(wb.weighted_subtree_ebp(
            probes[i:i + 1], 0, 1, topk=3, subtree_mode="all",
            do_mated_similarity_gating=gating))

    wb.set_triplet_classifier_batch(ems, ens)
    batch = wb.weighted_subtree_ebp_batch(
        probes, topk=3, subtree_mode="all",
        do_mated_similarity_gating=gating, return_subtree_maps=True)

    for (s_s, maps_s, sc_s, k_s), (s_b, maps_b, sc_b, k_b) in zip(
            singles, batch):
        assert k_s == k_b
        np.testing.assert_allclose(sc_b, sc_s, rtol=1e-5)
        np.testing.assert_allclose(s_b, s_s, rtol=1e-4, atol=1e-7)
        for a, b in zip(maps_s, maps_b):
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-7)


def test_fused_batch_scan_matches_single():
    """The scan-batched fused path (launch_weighted_subtree_ebp_batch with
    mesh=None: one program, shared batch-B forward captures) equals
    per-probe weighted_subtree_ebp with each probe's 2-class classifier."""
    wb = make_toy_wbnet(num_classes=4, seed=5, subtree_mode="all")
    rng = np.random.RandomState(13)
    B = 3
    probes = jnp.asarray(rng.rand(B, 3, 224, 224), jnp.float32)
    ems = rng.rand(B, 12).astype(np.float32)
    ens = rng.rand(B, 12).astype(np.float32)
    ems /= np.linalg.norm(ems, axis=1, keepdims=True)
    ens /= np.linalg.norm(ens, axis=1, keepdims=True)

    singles = []
    for i in range(B):
        wb.net.set_triplet_classifier(ems[i], ens[i])
        singles.append(wb.weighted_subtree_ebp(
            probes[i:i + 1], 0, 1, topk=3, subtree_mode="all",
            return_subtree_maps=False))

    wb.set_triplet_classifier_batch(ems, ens)
    batch = wb.weighted_subtree_ebp_batch(
        probes, topk=3, subtree_mode="all", return_subtree_maps=False)

    for (s_s, _, sc_s, k_s), (s_b, _, sc_b, k_b) in zip(singles, batch):
        assert k_s == k_b
        np.testing.assert_allclose(sc_b, sc_s, rtol=1e-5)
        np.testing.assert_allclose(s_b, s_s, rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("do_max", [False, True])
def test_fused_select_merge_matches_host_path(do_max):
    """The fused sweep+selection+merge kernel (used when
    return_subtree_maps=False) equals the host-side selection path."""
    wb, probe = _setup("norelu")
    host = wb.weighted_subtree_ebp(
        probe, 0, 1, topk=3, subtree_mode="norelu",
        do_max_subtree=do_max, return_subtree_maps=True)
    fused = wb.weighted_subtree_ebp(
        probe, 0, 1, topk=3, subtree_mode="norelu",
        do_max_subtree=do_max, return_subtree_maps=False)
    assert fused[3] == host[3]  # k_subtree_valid
    np.testing.assert_allclose(fused[2], host[2], rtol=1e-6)
    np.testing.assert_allclose(fused[0], host[0], rtol=1e-4, atol=1e-7)
    assert fused[1] == []


def test_fused_select_merge_fewer_than_topk():
    """When fewer than topk candidates are valid, selection keeps them
    all (reference keeps the last <=topk valid entries)."""
    wb, probe = _setup("norelu")
    host = wb.weighted_subtree_ebp(
        probe, 0, 1, topk=200, subtree_mode="norelu",
        return_subtree_maps=True)
    fused = wb.weighted_subtree_ebp(
        probe, 0, 1, topk=200, subtree_mode="norelu",
        return_subtree_maps=False)
    assert fused[3] == host[3]
    np.testing.assert_allclose(fused[0], host[0], rtol=1e-4, atol=1e-7)


def test_fully_batched_sweep_matches_scan():
    """The probe-batched walk (one [rows, B, ...] batch per op, no scan)
    equals the scan-batched path exactly."""
    wb = make_toy_wbnet(num_classes=4, seed=5, subtree_mode="all")
    rng = np.random.RandomState(17)
    B = 3
    probes = jnp.asarray(rng.rand(B, 3, 224, 224), jnp.float32)
    ems = rng.rand(B, 12).astype(np.float32)
    ens = rng.rand(B, 12).astype(np.float32)
    ems /= np.linalg.norm(ems, axis=1, keepdims=True)
    ens /= np.linalg.norm(ens, axis=1, keepdims=True)
    wb.set_triplet_classifier_batch(ems, ens)

    scores_d, idxs_d, vals_d = wb._wsebp_grad_batch_fn()(
        wb.net.params, probes, gating=True)
    idxs32 = idxs_d.astype(jnp.int32)

    m_scan, s_scan = wb._wsebp_sweep_select_scan_fn(3, False)(
        wb.net.params, probes, idxs32, vals_d, scores_d)
    m_bat, s_bat = wb._wsebp_sweep_select_batch_fn(3, False)(
        wb.net.params, probes, idxs32, vals_d, scores_d)
    np.testing.assert_array_equal(np.asarray(s_bat), np.asarray(s_scan))
    np.testing.assert_allclose(np.asarray(m_bat), np.asarray(m_scan),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("subtree_mode", ["all", "norelu"])
def test_cascade_matches_bucketed(subtree_mode):
    """The cascaded growing-row walk (round-5: one full-depth walk, rows
    joining at bucket frontiers) is the bucketed walk's row-sliced
    restriction — outputs must match to float tolerance, single-probe
    and probe-batched."""
    wb, probe = _setup(subtree_mode)

    _, idxs, vals = wb._wsebp_grad_fn()(
        wb.net.params, probe, wb._onehot(0), gating=True)
    elems = jnp.asarray(np.asarray(idxs).astype(np.int32))
    injvals = jnp.asarray(np.asarray(vals, np.float32))

    outs = {}
    for casc in (False, True):
        wb.wsebp_cascade = casc
        outs[casc] = wb._wsebp_sweep_fn(n_buckets=4)(
            wb.net.params, probe, elems, injvals)
    np.testing.assert_allclose(
        np.asarray(outs[True][0]), np.asarray(outs[False][0]),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(outs[True][1]), np.asarray(outs[False][1]),
        rtol=1e-5, atol=1e-7)

    # probe-batched scan path (the production program)
    rng = np.random.RandomState(11)
    B = 2
    probes = jnp.asarray(rng.rand(B, 3, 224, 224), jnp.float32)
    em = rng.rand(B, 12).astype(np.float32)
    en = rng.rand(B, 12).astype(np.float32)
    wb.set_triplet_classifier_batch(
        em / np.linalg.norm(em, axis=1, keepdims=True),
        en / np.linalg.norm(en, axis=1, keepdims=True))
    res = {}
    for casc in (False, True):
        wb.wsebp_cascade = casc
        res[casc] = wb.weighted_subtree_ebp_batch(
            probes, topk=3, subtree_mode=subtree_mode)
    for (sm_c, *_), (sm_b, *_) in zip(res[True], res[False]):
        np.testing.assert_allclose(np.asarray(sm_c), np.asarray(sm_b),
                                   rtol=1e-5, atol=1e-7)
