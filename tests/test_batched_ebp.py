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
