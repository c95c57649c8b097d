"""Round-3 fast-path programs compose with the device mesh: the eval
counts / multi-map blend+encode programs and the STRise scanned scorer
run the SAME program shape under ``use_mesh`` / ``STRise(mesh=)`` with
their independent step axes sharded over 'dp' (shard_map), and reproduce
the single-device results.  8 virtual CPU devices via conftest.

Closes round-3 VERDICT item #1: ``--mesh auto`` must not change which
eval/BB program runs (protocol.py previously fell back to the slow
single-map blend path under a mesh)."""

import numpy as np
import pytest

import jax

from xfr_tpu.parallel.mesh import make_mesh


needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _image_pair(rng, hw=224):
    orig = rng.rand(3, hw, hw).astype(np.float32)
    inp = rng.rand(3, hw, hw).astype(np.float32)
    return orig, inp


@needs8
def test_counts_blend_sharded_matches_single():
    """launch_blend_embeddings_counts under a mesh == single device,
    including a T that does not divide into a dp-multiple of chunks."""
    from tests.fixtures import make_toy_wbnet

    rng = np.random.RandomState(0)
    orig, inp = _image_pair(rng)
    T = 13  # bs_m=min(blend_batch=32, ceil(13/8)*8)=16 -> 1 chunk,
    # padded to 8 chunks under dp=8 (exercises non-dp-multiple padding)
    counts = rng.randint(0, T + 1, size=(224 * 224,)).astype(np.uint8)

    wb = make_toy_wbnet(seed=1)
    wb.batch_size = 8
    ref = wb.launch_blend_embeddings_counts(orig, inp, counts, T)()

    wb2 = make_toy_wbnet(seed=1)
    wb2.batch_size = 8
    wb2.use_mesh(make_mesh((8, 1), ("dp", "mp")))
    out = wb2.launch_blend_embeddings_counts(orig, inp, counts, T)()

    assert out.shape == ref.shape == (T, 12)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


@needs8
def test_counts_multi_sharded_matches_single():
    """launch_blend_embeddings_counts_multi under a mesh == single device
    (flat step sequence sharded over dp, M*nchunk not a dp multiple)."""
    from tests.fixtures import make_toy_wbnet

    rng = np.random.RandomState(1)
    orig, inp = _image_pair(rng)
    T, M = 11, 3  # 3 maps x 2 chunks = 6 steps -> padded to 8
    counts = rng.randint(0, T + 1, size=(M, 224 * 224)).astype(np.uint8)

    wb = make_toy_wbnet(seed=2)
    wb.batch_size = 8
    ref = wb.launch_blend_embeddings_counts_multi(orig, inp, counts, T)()

    wb2 = make_toy_wbnet(seed=2)
    wb2.batch_size = 8
    wb2.use_mesh(make_mesh((8, 1), ("dp", "mp")))
    out = wb2.launch_blend_embeddings_counts_multi(orig, inp, counts, T)()

    assert out.shape == ref.shape == (M, T, 12)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)


@needs8
def test_twin_cls_device_path_active_under_mesh():
    """launch_classified_as_inpainted_twin keeps the exact-counts device
    path under a mesh (it no longer falls back to mask materialization)
    and matches the host float64 blend path."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.inpainting_game.protocol import (
        _host_classified_as_inpainted_twin, create_threshold_masks,
        launch_classified_as_inpainted_twin)

    rng = np.random.RandomState(2)
    orig, inp = _image_pair(rng)
    smap = rng.rand(224, 224).astype(np.float64)
    smap /= smap.sum()
    percentiles = np.arange(0, 101, 10)
    gal_o = rng.rand(12)
    gal_i = rng.rand(12)
    gal_o /= np.linalg.norm(gal_o)
    gal_i /= np.linalg.norm(gal_i)
    # make mask-0 classify as original: gal_o near the orig embedding
    wb = make_toy_wbnet(seed=3)
    wb.batch_size = 8
    e0 = wb.embeddings(orig[None])[0]
    gal_o = e0 / np.linalg.norm(e0)

    masks = create_threshold_masks(smap, "percent-density",
                                   percentiles=percentiles, seed=0)
    ref = _host_classified_as_inpainted_twin(wb, orig, inp, gal_o, gal_i,
                                             masks)

    wb2 = make_toy_wbnet(seed=3)
    wb2.batch_size = 8
    wb2.use_mesh(make_mesh((8, 1), ("dp", "mp")))
    out = launch_classified_as_inpainted_twin(
        wb2, orig, inp, gal_o, gal_i, smap, "percent-density",
        percentiles=percentiles, seed=0)()

    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-5, atol=1e-6)


@needs8
def test_twin_cls_batch_multi_program_under_mesh():
    """TwinClsBatch uses the batched multi-map counts program under a
    mesh and matches the single-map launches."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.inpainting_game.protocol import (
        TwinClsBatch, launch_classified_as_inpainted_twin)

    rng = np.random.RandomState(3)
    orig, inp = _image_pair(rng)
    percentiles = np.arange(0, 101, 10)
    smaps = []
    for _ in range(3):
        s = rng.rand(224, 224).astype(np.float64)
        smaps.append(s / s.sum())
    wb = make_toy_wbnet(seed=4)
    wb.batch_size = 8
    e0 = wb.embeddings(orig[None])[0]
    gal_o = e0 / np.linalg.norm(e0)
    gal_i = rng.rand(12)
    gal_i /= np.linalg.norm(gal_i)

    refs = [launch_classified_as_inpainted_twin(
        wb, orig, inp, gal_o, gal_i, s, "percent-density",
        percentiles=percentiles, seed=0)() for s in smaps]

    wb2 = make_toy_wbnet(seed=4)
    wb2.batch_size = 8
    wb2.use_mesh(make_mesh((8, 1), ("dp", "mp")))
    batch = TwinClsBatch(wb2, orig, inp, gal_o, gal_i, "percent-density",
                         percentiles=percentiles, seed=0)
    finishes = [batch.launch(s) for s in smaps]
    batch.flush()
    # the batch really used the multi-map program (not single fallbacks)
    assert len(batch._counts) == 3
    for fin, ref in zip(finishes, refs):
        for a, b in zip(fin(), ref):
            np.testing.assert_allclose(np.asarray(a, np.float64),
                                       np.asarray(b, np.float64),
                                       rtol=1e-5, atol=1e-6)


@needs8
def test_strise_scan_scorer_and_fused_finish_under_mesh():
    """STRise(mesh=) runs the scanned scorer (sharded over dp) and the
    fused launch_evaluate finish, reproducing the single-chip scan path's
    scores and map."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.blackbox import STRise

    rng = np.random.RandomState(5)
    probe = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
    refs = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    gallery = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
               for _ in range(2)]

    def build(mesh, wb):
        return STRise(probe=probe, refs=refs, gallery=gallery,
                      black_box="resnetv4_pytorch",
                      net_dict={("resnetv4_pytorch", 6): wb},
                      prior_type="uniform", num_masks=48, mask_scale=12,
                      num_mask_elements=2, seed=0, batch_size=16,
                      mesh=mesh)

    s_ref = build(None, make_toy_wbnet(seed=6))
    smap_ref = s_ref.launch_evaluate()()
    assert s_ref._fused_finish is None  # consumed

    mesh = make_mesh((8, 1), ("dp", "mp"))
    s_sh = build(mesh, make_toy_wbnet(seed=6))
    smap_sh = s_sh.launch_evaluate()()

    # 48 masks / bs=16 -> 3 chunks, padded to 8 under dp: pad discarded
    np.testing.assert_allclose(s_sh.masked_probe_ref_scores,
                               s_ref.masked_probe_ref_scores,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s_sh.mask_scores, s_ref.mask_scores,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(smap_sh, smap_ref, rtol=1e-4, atol=1e-5)


@needs8
def test_analysis_stack_identical_under_mesh(tmp_path):
    """The full analysis stack (generation -> make_inpaintinggame_plots ->
    results.csv) produces identical CLS curves and headline metrics with
    and without a mesh — the CLI-level form of verdict #1's 'done'
    criterion (--mesh auto must not change results or which programs
    run).  Saliency maps are generated once un-meshed; the analysis runs
    twice with separate cache/output dirs."""
    import os

    import pandas as pd

    from tests.fixtures import make_mini_dataset, make_toy_wbnet
    from xfr_tpu.inpainting_game import generate as G
    from xfr_tpu.inpainting_game.analysis import (
        make_inpaintinggame_plots, human_net_labels_)

    data_dir = str(tmp_path / "data")
    smaps_dir = str(tmp_path / "smaps")
    os.makedirs(data_dir)
    os.makedirs(smaps_dir)
    make_mini_dataset(data_dir, net_name="toynet", mask_ids=(2,))

    wb = make_toy_wbnet(subtree_mode="all")
    G.generate_wb_smaps(
        wb, "toynet", "img/p1", 1, "00002", subtree_mode_weighted="all",
        ebp_ver=6, overwrite=False, data_dir=data_dir, smaps_dir=smaps_dir)

    methods = ["meanEBP_mode=all_v06_cpu",
               "contrastive_triplet_ebp_mode=all_v06_cpu",
               "inpaintingMask"]
    labels = dict(human_net_labels_)
    labels["toynet"] = "ToyNet"

    def analyze(net, tag):
        out_dir = str(tmp_path / ("out_" + tag))
        cache_dir = str(tmp_path / ("cache_" + tag))
        os.makedirs(out_dir)
        os.makedirs(cache_dir)
        params = dict(
            threshold_type="percent-density", output_dir=out_dir,
            output_subdir=None, cache_dir=cache_dir, smap_root=smaps_dir,
            data_dir=data_dir, NET=["toynet"], SUBJECT_ID=[1],
            MASK_ID=[2], METHOD=list(methods), IMG_BASENAME=None,
            reprocess=False, seed=42, include_zero_saliency=True,
            mask_blur_sigma=0, balance_masks=True,
            ignore_missing_saliency_maps=False)
        ncls = make_inpaintinggame_plots({"toynet": net}, params,
                                         human_net_labels=labels)
        res = pd.read_csv(os.path.join(out_dir, "results.csv"))
        return ncls, res

    ncls_ref, res_ref = analyze(wb, "single")

    wb2 = make_toy_wbnet(subtree_mode="all")
    wb2.use_mesh(make_mesh((8, 1), ("dp", "mp")))
    ncls_sh, res_sh = analyze(wb2, "mesh")

    assert list(res_sh["method"]) == list(res_ref["method"])
    for col in ("all,far=1e-2", "all,far=5e-2"):
        np.testing.assert_allclose(res_sh[col].values, res_ref[col].values,
                                   rtol=1e-6, atol=1e-9)
    for a, b in zip(ncls_sh["CLS_AS_TWIN"], ncls_ref["CLS_AS_TWIN"]):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-6, atol=1e-9)
