"""Blackbox STRise engine tests: mask pipeline stats, blur parity, and a
synthetic end-to-end localization check through a host black_box_fn."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xfr_tpu.blackbox import masks as M
from xfr_tpu.blackbox.strise import STRise, _l2_similarity


def test_gaussian_blur_matches_scipy():
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(0)
    img = rng.rand(31, 29).astype(np.float32)
    for sigma in (0.8, 2.0, 5.0):
        got = np.asarray(M.gaussian_blur(jnp.asarray(img), sigma))
        ref = gaussian_filter(img, sigma, mode="nearest")
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    # channel-last RGB
    img3 = rng.rand(24, 24, 3).astype(np.float32)
    got = np.asarray(M.gaussian_blur(jnp.asarray(img3), 2.0))
    ref = gaussian_filter(img3, (2.0, 2.0, 0), mode="nearest")
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_sparse_grid_sampling_respects_prior_support():
    key = jax.random.PRNGKey(0)
    probs = np.zeros((6, 6), np.float32)
    probs[2:4, 2:4] = 0.25  # support = 4 cells
    grids = np.asarray(M.sample_sparse_grids(key, jnp.asarray(probs),
                                             num_masks=64, num_elements=2))
    assert grids.shape == (64, 6, 6)
    # exactly two zeros per mask, all inside the support
    zeros = 1.0 - grids
    assert np.all(zeros.sum(axis=(1, 2)) == 2)
    support = np.zeros((6, 6), bool)
    support[2:4, 2:4] = True
    assert np.all(zeros[:, ~support] == 0)
    # without replacement: no cell hit twice in one mask
    assert zeros.max() == 1.0


def test_make_masks_shapes_and_range():
    key = jax.random.PRNGKey(1)
    prior = np.ones((64, 64), np.float32)
    masks = np.asarray(M.make_masks(key, jnp.asarray(prior), num_masks=16,
                                    mask_scale=8, num_elements=1,
                                    prior_type="uniform"))
    assert masks.shape == (16, 64, 64)
    assert masks.min() >= -1e-6 and masks.max() <= 1 + 1e-6
    # each mask hides roughly one cell of ~(64/8)^2=64 px (bilinear softened)
    hidden = (1.0 - masks).sum(axis=(1, 2))
    assert np.all(hidden > 10) and np.all(hidden < 300)


def _patch_signature(img, y0=32, x0=32, s=48):
    return img[..., y0:y0 + s, x0:x0 + s, :].mean(axis=(-3, -2, -1))


def test_strise_synthetic_localization():
    """A planted bright patch is the only identity evidence; the saliency
    map must concentrate on it."""
    rng = np.random.RandomState(0)
    probe = np.full((224, 224, 3), 30, np.uint8)
    probe[32:80, 32:80] = 220  # discriminative patch

    ref = probe.copy()
    gal = np.full((224, 224, 3), 30, np.uint8)  # non-mate: no patch

    def bb_fn(probes, gallery):
        p = np.stack([np.asarray(x, np.float64) for x in probes])
        g = np.stack([np.asarray(x, np.float64) for x in gallery])
        ps = _patch_signature(p / 255.0)
        gs = _patch_signature(g / 255.0)
        return 1.0 - np.abs(ps[:, None] - gs[None, :])

    st = STRise(probe=probe, refs=[ref], gallery=[gal],
                black_box_fn=bb_fn, prior_type="uniform",
                num_masks=300, mask_scale=28, num_mask_elements=1,
                mask_fill_type="gray", seed=3)
    st.evaluate()

    sal = st.saliency_map
    assert sal.shape == (224, 224)
    assert np.isfinite(sal).all()
    inside = sal[32:80, 32:80].mean()
    outside_mask = np.ones((224, 224), bool)
    outside_mask[20:92, 20:92] = False
    outside = sal[outside_mask].mean()
    assert inside > outside + 0.2, (inside, outside)


def test_l2_similarity_range():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 16)
    y = rng.randn(3, 16)
    s = _l2_similarity(x, y)
    assert s.shape == (4, 3)
    assert np.all(s <= 1.0) and np.all(s >= 0.0)  # unit vectors: dist<=2
    np.testing.assert_allclose(_l2_similarity(x, x).diagonal(), 1.0,
                               atol=1e-12)


def test_strise_save_gallery(tmp_path):
    """save_gallery writes a montage image (reference: blackbox.py:500)."""
    probe = np.zeros((224, 224, 3), np.uint8)
    probe[0, 0] = 255
    gal = [np.full((224, 224, 3), v, np.uint8) for v in (10, 120, 240)]
    st = STRise(probe=probe, refs=[probe], gallery=gal,
                black_box_fn=lambda a, b: np.ones((len(a), len(b))),
                prior_type="uniform", num_masks=4)
    out = tmp_path / "gallery.png"
    st.save_gallery(str(out))
    assert out.exists() and out.stat().st_size > 0


def test_strise_save_gallery_empty(tmp_path):
    """Empty gallery produces an empty montage instead of crashing in
    plt.subplots (the reference raises on nrows=0)."""
    probe = np.zeros((224, 224, 3), np.uint8)
    probe[0, 0] = 255
    st = STRise(probe=probe, refs=[probe], gallery=[],
                black_box_fn=lambda a, b: np.ones((len(a), max(1, len(b)))),
                prior_type="uniform", num_masks=4)
    out = tmp_path / "gallery_empty.png"
    st.save_gallery(str(out))
    assert out.exists() and out.stat().st_size > 0


def test_strise_validation_errors():
    probe = np.zeros((224, 224, 3), np.uint8)
    probe[0, 0] = 255
    with pytest.raises(ValueError):
        STRise(probe=probe, refs=[probe], black_box_fn=lambda a, b: None,
               prior_type="nope")
    with pytest.raises(ValueError):
        STRise(probe=probe, refs=[probe])  # no black box
    with pytest.raises(ValueError):
        STRise(refs=[probe], black_box_fn=lambda a, b: None)  # no probe


def test_apply_masks_using_image():
    """apply_masks_using_image blends probe<->image under every mask
    (reference: blackbox.py:338-345)."""
    probe = np.full((224, 224, 3), 200, np.uint8)
    st = STRise(probe=probe, refs=[probe],
                black_box_fn=lambda a, b: np.ones((len(a), len(b))),
                prior_type="uniform", num_masks=6, mask_scale=16)
    st.priors[st.prior_type]()
    st.generate_sparse_masks()
    fill = np.zeros((224, 224, 3), np.float32)
    out = st.apply_masks_using_image(fill)
    assert out.shape == (6, 224, 224, 3)
    masks = st.masks
    expect = np.broadcast_to(masks[..., None] * 200.0, out.shape)
    np.testing.assert_allclose(out, expect, atol=1e-3)


def test_fused_scorer_shared_across_instances():
    """Two STRise instances over a shared net_dict must reuse ONE traced
    scorer program (generation builds one STRise per probe; a per-instance
    jit wrapper re-traces the encode graph every map)."""
    from tests.fixtures import make_toy_wbnet

    wb = make_toy_wbnet(num_classes=4, seed=0)
    net_dict = {("resnetv6_pytorch", 6): wb}
    probe = np.zeros((224, 224, 3), np.uint8)
    probe[0, 0] = 255
    sts = [STRise(probe=probe, refs=[probe], black_box="resnetv6_pytorch",
                  net_dict=net_dict, prior_type="uniform", num_masks=4)
           for _ in range(2)]
    for st in sts:
        st.resnet_net = wb
    assert sts[0]._fused_scorer() is sts[1]._fused_scorer()


def test_launch_evaluate_matches_evaluate():
    """launch_evaluate()/finish() is a pure enqueue/drain split of
    evaluate(): identical saliency maps and scores, builtin and external
    matcher paths."""
    from tests.fixtures import make_toy_wbnet

    probe = np.full((224, 224, 3), 30, np.uint8)
    probe[32:80, 32:80] = 220
    gal = np.full((224, 224, 3), 30, np.uint8)

    # builtin fused-scorer path (toy net injected via net_dict)
    wb = make_toy_wbnet(num_classes=4, seed=0)
    net_dict = {("resnetv6_pytorch", 6): wb}
    kwargs = dict(probe=probe, refs=[probe], gallery=[gal],
                  black_box="resnetv6_pytorch", net_dict=net_dict,
                  prior_type="uniform", num_masks=64, mask_scale=28,
                  num_mask_elements=1, mask_fill_type="gray", seed=5)
    st_a = STRise(**kwargs)
    st_a.evaluate()
    st_b = STRise(**kwargs)
    finish = st_b.launch_evaluate()
    smap = finish()
    np.testing.assert_array_equal(st_b.saliency_map, smap)
    # public result fields must be WRITABLE numpy (not read-only
    # device_get views): create_save_smap and reference-style callers
    # normalize maps in place
    assert st_b.saliency_map.flags.writeable
    assert st_b.mask_scores.flags.writeable
    assert st_b.masked_probe_ref_scores.flags.writeable
    np.testing.assert_allclose(smap, st_a.saliency_map, rtol=1e-6)
    np.testing.assert_allclose(st_b.mask_scores, st_a.mask_scores,
                               rtol=1e-6, atol=1e-7)
    # the fused one-fetch finish must populate every score attribute
    np.testing.assert_array_equal(st_b.masked_probe_ref_scores,
                                  st_a.masked_probe_ref_scores)
    np.testing.assert_array_equal(st_b.masked_probe_gallery_scores,
                                  st_a.masked_probe_gallery_scores)
    np.testing.assert_array_equal(st_b.original_probe_ref_scores,
                                  st_a.original_probe_ref_scores)
    np.testing.assert_array_equal(st_b.original_probe_gallery_scores,
                                  st_a.original_probe_gallery_scores)

    # two launches in flight before either finishes (generation pipeline)
    st_c = STRise(**kwargs)
    st_d = STRise(**kwargs)
    f_c = st_c.launch_evaluate()
    f_d = st_d.launch_evaluate()
    np.testing.assert_allclose(f_c(), st_a.saliency_map, rtol=1e-6)
    np.testing.assert_allclose(f_d(), st_a.saliency_map, rtol=1e-6)

    # external host-matcher path
    def bb_fn(probes, gallery):
        p = np.stack([np.asarray(x, np.float64).mean(axis=(0, 1))
                      for x in probes])
        g = np.stack([np.asarray(x, np.float64).mean(axis=(0, 1))
                      for x in gallery])
        return 1.0 - np.abs(p.mean(1)[:, None] - g.mean(1)[None, :]) / 255.

    kw2 = dict(probe=probe, refs=[probe], gallery=[gal],
               black_box_fn=bb_fn, prior_type="uniform", num_masks=32,
               mask_scale=28, num_mask_elements=1,
               mask_fill_type="gray", seed=7)
    st_e = STRise(**kw2)
    st_e.evaluate()
    st_f = STRise(**kw2)
    np.testing.assert_allclose(st_f.launch_evaluate()(),
                               st_e.saliency_map, rtol=1e-6)


def test_fused_launch_drain_contract():
    """_score_masks_launch's returned drain must honor its contract even
    when the fused finisher armed (want_fused_finish=True): the fused
    program computes the probe/ref/gallery scores on device, so a drain
    that ran the generic path would read attributes that were never set
    (or stale ones from a previous probe on a reused instance)."""
    from tests.fixtures import make_toy_wbnet

    probe = np.full((224, 224, 3), 30, np.uint8)
    probe[32:80, 32:80] = 220
    gal = np.full((224, 224, 3), 30, np.uint8)
    wb = make_toy_wbnet(num_classes=4, seed=0)
    net_dict = {("resnetv6_pytorch", 6): wb}
    kwargs = dict(probe=probe, refs=[probe], gallery=[gal],
                  black_box="resnetv6_pytorch", net_dict=net_dict,
                  prior_type="uniform", num_masks=64, mask_scale=28,
                  num_mask_elements=1, mask_fill_type="gray", seed=5)
    st_a = STRise(**kwargs)
    st_a.evaluate()

    st = STRise(**kwargs)
    st.priors[st.prior_type]()
    st.generate_masks()
    st.apply_masks()
    drain = st._score_masks_launch(want_fused_finish=True)
    assert st._fused_finish is not None  # the fused path really armed
    drain()  # caller follows the documented drain contract
    np.testing.assert_allclose(st.mask_scores, st_a.mask_scores,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(st.original_probe_ref_scores,
                                  st_a.original_probe_ref_scores)
    np.testing.assert_array_equal(st.original_probe_gallery_scores,
                                  st_a.original_probe_gallery_scores)
    np.testing.assert_array_equal(st.masked_probe_ref_scores,
                                  st_a.masked_probe_ref_scores)
    # the fused drain also sets the map (documented superset)
    np.testing.assert_allclose(st.saliency_map, st_a.saliency_map,
                               rtol=1e-6)


def test_scan_scorer_matches_chunked():
    """The single-program scanned mask scorer (single-chip path) must
    agree with the per-chunk fused scorer it replaced."""
    import jax.numpy as jnp
    from tests.fixtures import make_toy_wbnet

    probe = np.full((224, 224, 3), 30, np.uint8)
    probe[32:80, 32:80] = 220
    gal = np.full((224, 224, 3), 30, np.uint8)
    wb = make_toy_wbnet(num_classes=4, seed=0)
    st = STRise(probe=probe, refs=[probe], gallery=[gal],
                black_box="resnetv6_pytorch",
                net_dict={("resnetv6_pytorch", 6): wb},
                prior_type="uniform", num_masks=96, mask_scale=28,
                num_mask_elements=1, mask_fill_type="gray", seed=5,
                batch_size=32)
    st.priors[st.prior_type]()
    st.generate_masks()
    st.apply_masks()
    st.score_masks()  # scan path (mesh is None, 3 chunks in one scan)
    assert ("strise_scan_scorer", wb.net.encode_tensor, 3, 32,
            float(wb.eps), None) in wb._jit_cache
    scan_ref = np.array(st.masked_probe_ref_scores)
    scan_gal = np.array(st.masked_probe_gallery_scores)

    scorer = st._fused_scorer()
    probe_d = jnp.asarray(st.probe, jnp.float32)
    ref_e = jnp.asarray(st._embed_collection(wb, st.refs), jnp.float32)
    gal_e = jnp.asarray(st._embed_collection(wb, [gal]), jnp.float32)
    rs, gs = [], []
    for i in range(0, 96, 32):
        r, g = scorer(wb.net.params, st._masks_dev[i:i + 32], probe_d,
                      st._fill_dev, ref_e, gal_e)
        rs.append(np.asarray(r))
        gs.append(np.asarray(g))
    np.testing.assert_allclose(scan_ref, np.concatenate(rs), rtol=2e-6,
                               atol=1e-6)
    np.testing.assert_allclose(scan_gal, np.concatenate(gs), rtol=2e-6,
                               atol=1e-6)


def test_embed_memo_reuses_collection_embeds():
    """refs/gallery embeds are constant across the probes of a job:
    the content-hash memo on the shared net must return identical
    embeddings without recomputing, and a changed collection must miss."""
    from tests.fixtures import make_toy_wbnet

    probe = np.full((224, 224, 3), 40, np.uint8)
    probe[50:90, 60:100] = 210
    ref = np.full((224, 224, 3), 70, np.uint8)
    ref[40:100, 50:110] = 190
    gal = np.full((224, 224, 3), 25, np.uint8)
    wb = make_toy_wbnet(num_classes=4, seed=1)
    kw = dict(black_box="resnetv6_pytorch",
              net_dict={("resnetv6_pytorch", 6): wb},
              prior_type="uniform", num_masks=32, mask_scale=28,
              num_mask_elements=1, mask_fill_type="gray", seed=3,
              batch_size=32)

    st1 = STRise(probe=probe, refs=[ref], gallery=[gal], **kw)
    st1.evaluate()
    memo = wb._bb_embed_memo
    assert len(memo) == 3  # refs, gallery, [probe]
    # a second instance over the same job: same memo entries, same scores
    st2 = STRise(probe=probe, refs=[ref], gallery=[gal], **kw)
    st2.evaluate()
    assert len(wb._bb_embed_memo) == 3
    np.testing.assert_array_equal(st1.mask_scores, st2.mask_scores)
    np.testing.assert_allclose(np.asarray(st1.saliency_map),
                               np.asarray(st2.saliency_map))
    # memoized value is bitwise what _embed_collection computes
    np.testing.assert_array_equal(
        st2._embed_collection_memo(wb, [gal]),
        st2._embed_collection(wb, [gal]))
    # [gal] IS the memoized gallery collection (content-addressed);
    # a genuinely new collection adds exactly one entry
    st2._embed_collection_memo(wb, [probe, gal])
    assert len(wb._bb_embed_memo) == 4  # +[probe, gal]


def test_score_precision_high_path():
    """STRise(score_precision='high') (reference-grade f32 ranking,
    CLI --score-precision high) must compile its own kernel-cache entry
    and produce scores matching the default path on CPU (where matmul
    precision is a no-op, the two programs are numerically equivalent)."""
    from tests.fixtures import make_toy_wbnet

    probe = np.full((224, 224, 3), 40, np.uint8)
    probe[60:120, 60:120] = 210
    gal = np.full((224, 224, 3), 25, np.uint8)
    wb = make_toy_wbnet(num_classes=4, seed=2)
    kw = dict(probe=probe, refs=[probe], gallery=[gal],
              black_box="resnetv6_pytorch",
              net_dict={("resnetv6_pytorch", 6): wb},
              prior_type="uniform", num_masks=64, mask_scale=28,
              num_mask_elements=1, mask_fill_type="gray", seed=9,
              batch_size=32)

    st_def = STRise(**kw)
    st_def.evaluate()
    st_hi = STRise(score_precision="high", **kw)
    assert st_hi.score_precision == "high"
    st_hi.evaluate()

    # distinct cached programs: the precision lands in the kernel key
    keys = [k for k in wb._jit_cache
            if k[0] == "strise_scan_scorer"]
    assert {k[-1] for k in keys} == {None, "high"}

    assert np.isfinite(st_hi.mask_scores).all()
    assert np.isfinite(np.asarray(st_hi.saliency_map)).all()
    np.testing.assert_allclose(np.asarray(st_hi.mask_scores),
                               np.asarray(st_def.mask_scores),
                               rtol=1e-5, atol=1e-6)
