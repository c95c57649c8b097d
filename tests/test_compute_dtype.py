"""bfloat16 compute path: same saliency structure as float32 within
tolerance (opt-in fast path for generation throughput)."""

import numpy as np

import jax.numpy as jnp

from tests.fixtures import make_toy_wbnet


def test_bf16_matches_f32_structure():
    wb32 = make_toy_wbnet(subtree_mode="all", seed=0)
    wb16 = make_toy_wbnet(subtree_mode="all", seed=0)
    wb16.compute_dtype = jnp.bfloat16

    rng = np.random.RandomState(0)
    probe = jnp.asarray(rng.rand(1, 3, 224, 224), jnp.float32)
    Pn = jnp.asarray(np.eye(5, dtype=np.float32)[2:3])

    s32 = wb32.ebp(probe, Pn)
    s16 = wb16.ebp(probe, Pn)
    assert s16.shape == s32.shape
    # same mass distribution within bf16 tolerance
    corr = np.corrcoef(s32.ravel(), s16.ravel())[0, 1]
    assert corr > 0.99, corr

    c32 = wb32.contrastive_ebp(probe, 2, 3)
    c16 = wb16.contrastive_ebp(probe, 2, 3)
    # contrastive = difference of nearly-equal distributions, so bf16
    # rounding amplifies: structurally similar but visibly perturbed —
    # bf16 is recommended for meanEBP / weighted-subtree, not contrastive
    assert np.corrcoef(c32.ravel(), c16.ravel())[0, 1] > 0.9

    e = np.asarray(wb32.encode(jnp.asarray(rng.rand(2, 3, 224, 224),
                                           jnp.float32)))
    for wb in (wb32, wb16):
        wb.net.set_triplet_classifier(e[0] / np.linalg.norm(e[0]),
                                      e[1] / np.linalg.norm(e[1]))
    m32, _, _, k32 = wb32.weighted_subtree_ebp(probe, 0, 1, topk=3,
                                               subtree_mode="all",
                                               verbose=False)
    m16, _, _, k16 = wb16.weighted_subtree_ebp(probe, 0, 1, topk=3,
                                               subtree_mode="all",
                                               verbose=False)
    assert np.isfinite(m16).all()
    # subtree ranking should broadly agree
    assert len(set(k32) & set(k16)) >= 2, (k32, k16)


def test_wsebp_dtype_bf16_quality_gate():
    """wsebp_dtype=bfloat16 (generation CLI default) keeps f32 numerics
    everywhere except the candidate sweep; the merged weighted-subtree
    map must stay structurally equal to the all-f32 map."""
    wb32 = make_toy_wbnet(subtree_mode="all", seed=2)
    wb16 = make_toy_wbnet(subtree_mode="all", seed=2)
    wb16.wsebp_dtype = jnp.bfloat16

    rng = np.random.RandomState(2)
    probe = jnp.asarray(rng.rand(1, 3, 224, 224), jnp.float32)
    e = np.asarray(wb32.encode(jnp.asarray(rng.rand(2, 3, 224, 224),
                                           jnp.float32)))
    em, en = (e[0] / np.linalg.norm(e[0])), (e[1] / np.linalg.norm(e[1]))
    for wb in (wb32, wb16):
        wb.net.set_triplet_classifier(em, en)
    m32, _, sc32, k32 = wb32.weighted_subtree_ebp(
        probe, 0, 1, topk=3, subtree_mode="all")
    m16, _, sc16, k16 = wb16.weighted_subtree_ebp(
        probe, 0, 1, topk=3, subtree_mode="all")
    # ranking pass runs f32 in both: identical scores
    np.testing.assert_allclose(sc16, sc32, rtol=1e-6)
    # selection (maxes>0 from the bf16 sweep) must broadly agree
    assert len(set(k32) & set(k16)) >= 2, (k32, k16)
    corr = np.corrcoef(m32.ravel(), m16.ravel())[0, 1]
    assert corr > 0.98, corr


def test_contrastive_dtype_pinning_makes_bf16_safe():
    """compute_dtype=bfloat16 + contrastive_dtype=float32 (the generation
    CLI mapping for --compute-dtype bfloat16) reproduces the all-f32
    contrastive/truncated maps exactly, while mean/wsebp run bf16."""
    wb32 = make_toy_wbnet(subtree_mode="all", seed=3)
    wbmx = make_toy_wbnet(subtree_mode="all", seed=3)
    wbmx.compute_dtype = jnp.bfloat16
    wbmx.contrastive_dtype = jnp.float32

    rng = np.random.RandomState(3)
    probe = jnp.asarray(rng.rand(1, 3, 224, 224), jnp.float32)
    c32 = wb32.contrastive_ebp(probe, 2, 3)
    cmx = wbmx.contrastive_ebp(probe, 2, 3)
    np.testing.assert_array_equal(cmx, c32)
    t32 = wb32.truncated_contrastive_ebp(probe, 2, 3, percentile=20)
    tmx = wbmx.truncated_contrastive_ebp(probe, 2, 3, percentile=20)
    np.testing.assert_array_equal(tmx, t32)

    # batched fused path too
    e = np.asarray(wb32.encode(jnp.asarray(rng.rand(4, 3, 224, 224),
                                           jnp.float32)))
    e = e / np.linalg.norm(e, axis=1, keepdims=True)
    for wb in (wb32, wbmx):
        wb.set_triplet_classifier_batch(e[:2], e[2:])
    c32b, t32b = wb32.contrastive_ebp_batch_both(
        jnp.concatenate([probe] * 2), 20)
    cmxb, tmxb = wbmx.contrastive_ebp_batch_both(
        jnp.concatenate([probe] * 2), 20)
    for a, b in zip(c32b + t32b, cmxb + tmxb):
        np.testing.assert_array_equal(b, a)
