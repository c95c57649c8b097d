"""Inpainting-game protocol tests with a synthetic patch-identity embedder."""

import numpy as np
import pytest

from xfr_tpu.inpainting_game import (
    HidingGame, classified_as_inpainted_twin, create_threshold_masks,
    intersect_over_union_thresholded_saliency)

PCT = np.arange(0, 101)


def test_percent_density_masks_cover_mass():
    rng = np.random.RandomState(0)
    smap = rng.rand(32, 32) ** 3
    smap /= smap.sum()
    masks = create_threshold_masks(smap, "percent-density",
                                   percentiles=PCT, seed=0)
    assert masks.shape == (101, 32, 32)
    assert masks[0].sum() == 0          # 0% of mass
    assert masks[-1].all()              # 100% of mass
    # nested: each mask contains the previous
    for t in range(1, 101):
        assert np.all(masks[t] >= masks[t - 1])
    # mass covered by mask t ~= t percent
    for t in (10, 50, 90):
        mass = smap[masks[t]].sum() / smap.sum()
        assert abs(mass * 100 - t) < 1.5, (t, mass)


def test_percent_density_exclude_zero_elements():
    smap = np.zeros((16, 16))
    smap[:4, :4] = 1.0
    masks = create_threshold_masks(smap, "percent-density",
                                   percentiles=PCT, seed=0,
                                   include_zero_elements=False)
    # masks can never extend beyond the nonzero support except at 100%
    support = smap > 0
    for t in range(0, 100):
        assert not masks[t][~support].any(), t


class _PatchNet:
    """Identity evidence = mean of the 8x8 top-left patch (CHW inputs)."""

    def embeddings(self, images, norm=True):
        images = np.asarray(images)
        patch = images[:, :, :8, :8].mean(axis=(1, 2, 3))
        e = np.stack([patch, np.ones_like(patch)], axis=1)
        if norm:
            e = e / np.linalg.norm(e, axis=1, keepdims=True)
        return e


def _norm(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def test_classified_as_inpainted_twin_flip_order():
    orig = np.zeros((3, 32, 32))
    orig[:, :8, :8] = 1.0        # bright identity patch
    twin = np.zeros((3, 32, 32))  # inpainted: patch removed

    og = _norm([1.0, 1.0])
    ig = _norm([0.0, 1.0])

    focused = np.zeros((32, 32))
    focused[:8, :8] = 1.0        # saliency on the evidence
    uniform = np.ones((32, 32))

    net = _PatchNet()
    cls_f, _, _, _, masks_f = classified_as_inpainted_twin(
        net, orig, twin, og, ig, focused, "percent-density",
        percentiles=PCT, seed=0, return_transitions=True)
    cls_u, _, _, _, masks_u = classified_as_inpainted_twin(
        net, orig, twin, og, ig, uniform, "percent-density",
        percentiles=PCT, seed=0, return_transitions=True)

    assert not cls_f[0] and not cls_u[0]
    assert cls_f[-1] and cls_u[-1]  # full inpainting flips identity
    # percent-density allocates by saliency MASS; the discriminating
    # quantity is how much image AREA must be replaced before the flip.
    area_f = masks_f[np.argmax(cls_f)].mean()
    area_u = masks_u[np.argmax(cls_u)].mean()
    assert area_f < 0.1 and area_u > 0.3, (area_f, area_u)


def test_twin_assertion_on_bad_gallery():
    orig = np.ones((3, 16, 16))
    twin = np.zeros((3, 16, 16))
    net = _PatchNet()
    with pytest.raises(AssertionError):
        # swapped galleries: mask-0 blend already "twin"
        classified_as_inpainted_twin(
            net, orig, twin, _norm([0.0, 1.0]), _norm([1.0, 1.0]),
            np.ones((16, 16)), "percent-density", percentiles=PCT, seed=0)


def test_iou_thresholded_saliency():
    gt = np.zeros((20, 20), bool)
    gt[5:10, 5:10] = True
    smap = gt.astype(np.float64)  # perfect saliency
    iou, fpos, tpos = intersect_over_union_thresholded_saliency(
        smap, gt, "percent-density", percentiles=PCT, seed=0,
        return_fpos=True, return_tpos=True)
    assert iou.shape == (101,)
    assert iou.max() > 0.95          # at the matching mass, IoU ~ 1
    assert fpos[iou.argmax()] <= 1
    assert tpos[-1] == gt.sum()


def test_hiding_game_runs():
    rng = np.random.RandomState(0)
    smap = rng.rand(16, 16)
    img = rng.rand(16, 16, 3)

    def masking_fn(masks, image):
        return masks[..., None] * image[None]

    def scoring_fn(masked):
        return masked.mean(axis=(1, 2, 3))

    hg = HidingGame(smap, img, masking_fn, scoring_fn, delta_pct=10.0)
    pcts, scores = hg.evaluate()
    assert len(pcts) == len(scores) == 11
    # hiding more of the image monotonically removes mass
    assert scores[0] >= scores[-1]


def test_device_blend_path_matches_host():
    """classified_as_inpainted_twin's device fast path (bit-packed masks,
    on-device blend+encode via Whitebox.blend_embeddings) is bit-identical
    to the host float64 blend path: binary-mask blending is a per-pixel
    select."""
    import jax.numpy as jnp
    from tests.fixtures import make_toy_wbnet

    wb = make_toy_wbnet(num_classes=4, seed=1)
    rng = np.random.RandomState(5)
    orig = (rng.rand(3, 224, 224) * 50).astype(np.float64)
    inp = orig + rng.rand(3, 224, 224) * 30
    smap = rng.rand(224, 224)
    smap[40:120, 60:160] += 4.0
    smap /= smap.sum()

    def embed(im):
        e = np.asarray(wb.embeddings(np.asarray(im, np.float32)[None]))
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    og, ig = embed(orig), embed(inp)

    class HostOnly:
        """Shim hiding blend_embeddings -> exercises the host path."""

        def embeddings(self, x, norm=True):
            return wb.embeddings(x, norm=norm)

    kwargs = dict(original_gal_embed=og, inpaint_gal_embed=ig,
                  saliency_map=smap,
                  mask_threshold_method="percent-density",
                  percentiles=PCT, seed=3, include_zero_elements=False)
    cls_h, pg_h, pr_h = classified_as_inpainted_twin(
        HostOnly(), orig, inp, **kwargs)
    cls_d, pg_d, pr_d = classified_as_inpainted_twin(
        wb, orig, inp, **kwargs)
    np.testing.assert_array_equal(cls_d, cls_h)
    np.testing.assert_array_equal(pg_d, pg_h)
    np.testing.assert_array_equal(pr_d, pr_h)

    # blurred (soft) masks must keep taking the host path
    cls_b, _, _ = classified_as_inpainted_twin(
        wb, orig, inp, original_gal_embed=og, inpaint_gal_embed=ig,
        saliency_map=smap, mask_threshold_method="percent-density",
        percentiles=PCT, seed=3, mask_blur_sigma=2.0)
    assert not cls_b[0]


def test_blend_embeddings_nonmono_fallback_matches_host():
    """Non-monotone mask families cannot use the enter-count program and
    must fall back to the bit-packed path — equality vs host blends."""
    from tests.fixtures import make_toy_wbnet

    wb = make_toy_wbnet(num_classes=4, seed=2)
    rng = np.random.RandomState(11)
    orig = (rng.rand(3, 224, 224) * 50).astype(np.float32)
    inp = orig + (rng.rand(3, 224, 224) * 30).astype(np.float32)
    masks = rng.rand(5, 224, 224) > 0.5  # random: not nested
    assert not np.all(masks[1:] >= masks[:-1])

    dev = wb.blend_embeddings(orig, inp, masks, norm=False)
    blends = np.where(masks[:, None], inp[None], orig[None])
    host = np.asarray(wb.embeddings(blends, norm=False))
    np.testing.assert_array_equal(dev, host.reshape(dev.shape))


def test_blend_embeddings_mono_program_matches_host():
    """Monotone (threshold) families take the single-scan enter-count
    program; embeddings must still equal the host blends exactly."""
    from tests.fixtures import make_toy_wbnet

    wb = make_toy_wbnet(num_classes=4, seed=2)
    rng = np.random.RandomState(12)
    orig = (rng.rand(3, 224, 224) * 50).astype(np.float32)
    inp = orig + (rng.rand(3, 224, 224) * 30).astype(np.float32)
    smap = rng.rand(224, 224)
    smap /= smap.sum()
    masks = create_threshold_masks(smap, "percent-density",
                                   percentiles=PCT, seed=5)
    assert np.all(masks[1:] >= masks[:-1])

    dev = wb.blend_embeddings(orig, inp, masks, norm=False)
    bs_m = min(wb.blend_batch,
               -(-len(masks) // wb.batch_size) * wb.batch_size)
    assert ("blend_encode_mono", len(masks), bs_m, float(wb.eps),
            None) in wb._jit_cache
    blends = np.where(masks[:, None], inp[None], orig[None])
    host = np.asarray(wb.embeddings(blends, norm=False))
    np.testing.assert_array_equal(dev, host.reshape(dev.shape))


def test_launch_classified_matches_sync_and_memo_is_safe():
    """launch + finish == the synchronous call, and the content-hash
    upload memo never confuses two different probe pairs of identical
    shape."""
    from xfr_tpu.inpainting_game import launch_classified_as_inpainted_twin
    from tests.fixtures import make_toy_wbnet

    wb = make_toy_wbnet(num_classes=4, seed=3)
    rng = np.random.RandomState(13)

    def unit(seed):
        r = np.random.RandomState(seed)
        orig = (r.rand(3, 224, 224) * 50).astype(np.float64)
        inp = orig + r.rand(3, 224, 224) * 30
        smap = r.rand(224, 224)
        smap[40:120, 60:160] += 4.0
        smap /= smap.sum()

        def embed(im):
            e = np.asarray(wb.embeddings(
                np.asarray(im, np.float32)[None]))
            return e / np.linalg.norm(e, axis=1, keepdims=True)

        return dict(original_imT=orig, inpaint_imT=inp,
                    original_gal_embed=embed(orig),
                    inpaint_gal_embed=embed(inp), saliency_map=smap,
                    mask_threshold_method="percent-density",
                    percentiles=PCT, seed=3,
                    include_zero_elements=False)

    u1, u2 = unit(20), unit(21)
    for u in (u1, u2, u1):  # revisit u1: memo must return its own pair
        sync = classified_as_inpainted_twin(wb, **u)
        fin = launch_classified_as_inpainted_twin(wb, **u)
        launched = fin()
        for a, b in zip(sync, launched):
            np.testing.assert_array_equal(a, b)
    assert len(wb._upload_memo) == 4  # 2 pairs x (orig, inp)


def test_iou_searchsorted_matches_mask_formulation():
    """The sort+searchsorted IoU must produce the identical integers as
    the direct [T,H,W] mask formulation for every threshold method and
    zero-element mode (ties broken by the same seeded noise plane)."""
    from xfr_tpu.inpainting_game.protocol import (
        create_threshold_masks, intersect_over_union_thresholded_saliency)

    rng = np.random.RandomState(3)
    smap = rng.rand(63, 57)
    smap[smap < 0.3] = 0.0  # real zeros for the exclude-zero mode
    smap /= smap.sum()
    gt = np.zeros((63, 57), bool)
    gt[10:30, 12:40] = True
    percentiles = np.unique(np.append(np.arange(0, 100, 7), [0, 100]))

    for method in ("percent-density", "percentile"):
        for inc0 in (True, False):
            kw = dict(percentiles=percentiles, seed=11,
                      include_zero_elements=inc0)
            iou, fp, tp = intersect_over_union_thresholded_saliency(
                smap, gt, method, return_fpos=True, return_tpos=True,
                **kw)
            masks = create_threshold_masks(smap, method, **kw)
            inter = (gt[None] & masks).sum(axis=(1, 2))
            union = (gt[None] | masks).sum(axis=(1, 2))
            np.testing.assert_array_equal(tp, inter)
            np.testing.assert_array_equal(
                fp, (~gt[None] & masks).sum(axis=(1, 2)))
            np.testing.assert_array_equal(iou, inter / (union + 1e-9))


def test_counts_path_matches_mask_blend_path():
    """launch_classified_as_inpainted_twin's searchsorted enter-count
    plane must classify identically to the materialized-mask device
    path (and the host float64 path, covered elsewhere)."""
    import jax
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.inpainting_game.protocol import (
        _threshold_plane, launch_classified_as_inpainted_twin)

    wb = make_toy_wbnet(num_classes=4, seed=2)
    rng = np.random.RandomState(5)
    orig = rng.rand(3, 224, 224).astype(np.float32) * 50
    inp = orig + rng.rand(3, 224, 224).astype(np.float32) * 30
    smap = rng.rand(224, 224)
    smap /= smap.sum()
    percentiles = np.unique(np.append(np.arange(0, 100, 3), [0, 100]))

    def embed(x):
        e = np.asarray(wb.embeddings(x[None]))
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    og, ig = embed(orig), embed(inp)
    fin = launch_classified_as_inpainted_twin(
        wb, orig, inp, og, ig, smap,
        mask_threshold_method="percent-density",
        percentiles=percentiles, seed=7, include_zero_elements=False)
    cls_counts, pg_c, pr_c = fin()

    # force the materialized-mask device path via the bit-packed
    # (non-mono declared) branch: same masks, chunked programs
    plane, thr = _threshold_plane(
        smap, "percent-density", percentiles=percentiles, seed=7,
        include_zero_elements=False)
    masks = plane[None] > thr[:, None, None]
    fin2 = wb.launch_blend_embeddings(orig, inp, masks, norm=True)
    e2 = fin2()
    e2 = e2 / np.linalg.norm(e2, axis=1, keepdims=True)
    pr2 = np.linalg.norm(e2 - og, axis=1)
    pg2 = np.linalg.norm(e2 - ig, axis=1)
    np.testing.assert_array_equal(pg_c, pg2)
    np.testing.assert_array_equal(pr_c, pr2)
    np.testing.assert_array_equal(cls_counts, pg2 < pr2)


def test_twin_cls_batch_matches_single_units():
    """TwinClsBatch (one multi-map scanned program per probe) must return
    exactly what per-map launch_classified_as_inpainted_twin returns —
    each scan step's [bs,...] encode batch is identical to the
    single-map program's."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.inpainting_game.protocol import (
        TwinClsBatch, launch_classified_as_inpainted_twin)

    wb = make_toy_wbnet(num_classes=4, seed=2)
    rng = np.random.RandomState(11)
    orig = rng.rand(3, 224, 224).astype(np.float32) * 50
    inp = orig + rng.rand(3, 224, 224).astype(np.float32) * 30
    smaps = []
    for _ in range(3):
        s = rng.rand(224, 224)
        s /= s.sum()
        smaps.append(s)
    percentiles = np.unique(np.append(np.arange(0, 100, 4), [0, 100]))

    def embed(x):
        e = np.asarray(wb.embeddings(x[None]))
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    og, ig = embed(orig), embed(inp)
    kw = dict(mask_threshold_method="percent-density",
              percentiles=percentiles, seed=7,
              include_zero_elements=False)

    batch = TwinClsBatch(wb, orig, inp, og, ig, **kw)
    fins = [batch.launch(s) for s in smaps]
    batch.flush()
    multi = [f() for f in fins]
    # post-flush launches transparently fall back to the single path
    extra = batch.launch(smaps[0])()

    for s, (cls_m, pg_m, pr_m) in zip(smaps, multi):
        cls_s, pg_s, pr_s = launch_classified_as_inpainted_twin(
            wb, orig, inp, og, ig, s, **kw)()
        np.testing.assert_array_equal(cls_m, cls_s)
        np.testing.assert_allclose(pg_m, pg_s, rtol=0, atol=1e-6)
        np.testing.assert_allclose(pr_m, pr_s, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(extra[0], multi[0][0])


def test_multi_pair_program_matches_single_pair():
    """launch_blend_embeddings_counts_multi_pair (cross-probe batched
    eval program) must return the same embeddings as the per-pair
    counts program for every (map, pair) — each scan step slices its
    own pair but the [bs,...] encode batch is otherwise identical."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.inpainting_game.protocol import _threshold_plane

    wb = make_toy_wbnet(num_classes=4, seed=2)
    rng = np.random.RandomState(13)
    pairs = []
    for _ in range(2):
        o = rng.rand(3, 224, 224).astype(np.float32) * 50
        pairs.append((o, o + rng.rand(3, 224, 224).astype(np.float32) * 30))
    percentiles = np.unique(np.append(np.arange(0, 100, 4), [0, 100]))

    counts_all, T = [], None
    for _ in range(4):  # 2 maps per pair
        s = rng.rand(224, 224)
        s /= s.sum()
        plane, thr = _threshold_plane(
            s, "percent-density", percentiles=percentiles, seed=7,
            include_zero_elements=False)
        counts_all.append(np.searchsorted(
            np.sort(thr), plane.ravel(), side="left").astype(np.uint8))
        T = len(thr)
    counts_all = np.stack(counts_all)
    pair_idx = np.array([0, 0, 1, 1], np.int32)

    got = wb.launch_blend_embeddings_counts_multi_pair(
        [p[0] for p in pairs], [p[1] for p in pairs], counts_all,
        pair_idx, T, norm=False)()
    assert got.shape[0] == 4 and got.shape[1] == T
    for m in range(4):
        o, i = pairs[pair_idx[m]]
        ref = wb.launch_blend_embeddings_counts(
            o, i, counts_all[m], T, norm=False)()
        np.testing.assert_array_equal(got[m], ref)
