"""Probe-batched triplet EBP equals the per-probe 2-class runs.

The batch trick: B per-probe classifiers interleave into one [2B, D]
matrix; each probe's cotangent selects its own rows, and linearity of the
classifier makes the MWP flow identical to the individual 2-class runs.
"""

import numpy as np

import jax.numpy as jnp

from tests.fixtures import make_toy_wbnet


def test_batched_matches_per_probe():
    wb = make_toy_wbnet(subtree_mode="all", seed=0)
    rng = np.random.RandomState(0)
    B = 3
    probes = jnp.asarray(rng.rand(B, 3, 224, 224), jnp.float32)
    refs = np.asarray(wb.encode(
        jnp.asarray(rng.rand(2 * B, 3, 224, 224), jnp.float32)))
    refs = refs / np.linalg.norm(refs, axis=1, keepdims=True)
    mates, nonmates = refs[:B], refs[B:]

    # per-probe reference results
    singles_mean, singles_con, singles_trunc = [], [], []
    for i in range(B):
        wb.net.set_triplet_classifier(mates[i], nonmates[i])
        Pn = jnp.ones((1, 2), jnp.float32)
        # meanEBP uses all-ones over the 2 classes
        Pn_masked = jnp.asarray(np.array([[1.0, 1.0]], np.float32))
        singles_mean.append(wb.ebp(probes[i:i + 1], Pn_masked))
        singles_con.append(wb.contrastive_ebp(probes[i:i + 1], 0, 1))
        singles_trunc.append(
            wb.truncated_contrastive_ebp(probes[i:i + 1], 0, 1,
                                         percentile=20))

    # batched results
    wb.set_triplet_classifier_batch(mates, nonmates)
    batch_mean = wb.ebp_batch(probes)
    batch_con = wb.contrastive_ebp_batch(probes)
    batch_trunc = wb.contrastive_ebp_batch(probes, truncate_percent=20)

    for i in range(B):
        np.testing.assert_allclose(batch_mean[i], singles_mean[i],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(batch_con[i], singles_con[i],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(batch_trunc[i], singles_trunc[i],
                                   rtol=1e-4, atol=1e-6)


def test_fused_both_matches_separate():
    """contrastive_ebp_batch_both == the two separate batched calls."""
    wb = make_toy_wbnet(subtree_mode="all", seed=1)
    rng = np.random.RandomState(1)
    B = 3
    probes = jnp.asarray(rng.rand(B, 3, 224, 224), jnp.float32)
    refs = np.asarray(wb.encode(
        jnp.asarray(rng.rand(2 * B, 3, 224, 224), jnp.float32)))
    refs = refs / np.linalg.norm(refs, axis=1, keepdims=True)
    wb.set_triplet_classifier_batch(refs[:B], refs[B:])
    sep_con = wb.contrastive_ebp_batch(probes)
    sep_trunc = wb.contrastive_ebp_batch(probes, truncate_percent=20)
    both_con, both_trunc = wb.contrastive_ebp_batch_both(
        probes, truncate_percent=20)
    for i in range(B):
        np.testing.assert_allclose(both_con[i], sep_con[i],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(both_trunc[i], sep_trunc[i],
                                   rtol=1e-5, atol=1e-7)


def test_percentile_mass_mask_matches_sorted_reference():
    """The bit-bisection threshold equals the sort+cumsum formulation
    (reference: whitebox.py:550-555) including ties and edge percentiles."""
    from xfr_tpu.ebp.engine import _percentile_mass_mask

    rng = np.random.RandomState(0)
    cases = [
        rng.rand(7, 13).astype(np.float32),
        np.repeat(rng.rand(40).astype(np.float32), 5).reshape(10, 20),  # ties
        np.zeros((5, 5), np.float32),
        rng.exponential(size=(64, 56, 56)).astype(np.float32),
    ]
    for arr in cases:
        for pct in (0.0, 20.0, 80.0, 100.0):
            got = np.asarray(_percentile_mass_mask(jnp.asarray(arr), pct))
            # float64 ground truth (the f32 sequential cumsum itself
            # wobbles by an element at the boundary in dense data)
            flat = np.sort(arr.reshape(-1).astype(np.float64))
            csum = np.cumsum(flat)
            target = pct / 100.0 * csum[-1]
            thresh = flat[int(np.argmax(csum >= target))]
            want = (arr.astype(np.float64) >= thresh).astype(np.float32)
            n_diff = int((got != want).sum())
            # any disagreement must be confined to boundary-value ties
            # from f32-vs-f64 summation order
            assert n_diff <= 2, (pct, n_diff)
            if n_diff:
                window = np.abs(arr[got != want] - thresh) / max(thresh,
                                                                 1e-12)
                assert window.max() < 1e-4, (pct, window.max())
