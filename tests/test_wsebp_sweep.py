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
