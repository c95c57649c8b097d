"""End-to-end inpainting game on a synthetic mini dataset: whitebox +
blackbox saliency generation -> analysis -> results.csv, through the full
driver stack (generation file conventions, caching, plots)."""

import glob
import os

import numpy as np
import pytest

from tests.fixtures import make_mini_dataset, make_toy_wbnet


@pytest.fixture(scope="module")
def game_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("ipg")
    data_dir = str(root / "data")
    smaps_dir = str(root / "smaps")
    out_dir = str(root / "out")
    cache_dir = str(root / "cache")
    for d in (data_dir, smaps_dir, out_dir, cache_dir):
        os.makedirs(d, exist_ok=True)
    make_mini_dataset(data_dir, net_name="toynet", mask_ids=(2, 5))
    wb = make_toy_wbnet(subtree_mode="all")
    return dict(data_dir=data_dir, smaps_dir=smaps_dir, out_dir=out_dir,
                cache_dir=cache_dir, wb=wb)


def test_generate_and_analyze(game_env):
    from xfr_tpu.inpainting_game import generate as G
    from xfr_tpu.inpainting_game.analysis import (
        make_inpaintinggame_plots, human_net_labels_)

    wb = game_env["wb"]

    # -- whitebox generation for both masks --------------------------------
    for mask_id in ("%05d" % 2, "%05d" % 5):
        G.generate_wb_smaps(
            wb, "toynet", "img/p1", 1, mask_id,
            subtree_mode_weighted="all", ebp_ver=6, overwrite=False,
            data_dir=game_env["data_dir"], smaps_dir=game_env["smaps_dir"])

    smaps = sorted(glob.glob(os.path.join(
        game_env["smaps_dir"], "toynet/subject_ID_1/img/p1/inpainted/*.npz")))
    names = [os.path.basename(f) for f in smaps]
    # 4 methods x 2 masks, reference slug conventions
    assert len(smaps) == 8, names
    assert "00002-meanEBP_mode=all_v06_cpu-saliency.npz" in names
    assert "00002-contrastive_triplet_ebp_mode=all_v06_cpu-saliency.npz" \
        in names
    assert ("00002-trunc_contrastive_triplet_ebp_mode=all_v06_pct20_cpu-"
            "saliency.npz") in names
    assert ("00002-weighted_subtree_triplet_ebp_mode=all,all_v06_top32_cpu-"
            "saliency.npz") in names
    for f in smaps:
        sm = np.load(f)["saliency_map"]
        assert sm.shape == (224, 224) and np.isfinite(sm).all()
        # overlay written next to it
        assert os.path.exists(f.replace("-saliency.npz",
                                        "-saliency-overlay.png"))

    # idempotency: second run skips recomputation (files untouched)
    mtimes = {f: os.path.getmtime(f) for f in smaps}
    G.generate_wb_smaps(
        wb, "toynet", "img/p1", 1, "00002", subtree_mode_weighted="all",
        ebp_ver=6, overwrite=False, data_dir=game_env["data_dir"],
        smaps_dir=game_env["smaps_dir"])
    assert all(os.path.getmtime(f) == mtimes[f] for f in smaps)

    # -- blackbox generation ------------------------------------------------
    def bb_fn(probes, gallery):
        return _toy_bb_fn(wb, probes, gallery)

    for mask_id in ("00002", "00005"):
        G.generate_bb_smaps(
            bb_fn, wb.convert_from_numpy, "toynet", "img/p1", 1, mask_id,
            ebp_ver=6, overwrite=False, num_masks=200,
            prior_type="uniform",
            data_dir=game_env["data_dir"], smaps_dir=game_env["smaps_dir"])
    bb_maps = glob.glob(os.path.join(
        game_env["smaps_dir"],
        "toynet/subject_ID_1/img/p1/inpainted/*bbox-rise*.npz"))
    assert len(bb_maps) == 2
    assert os.path.basename(bb_maps[0]).split("-", 1)[1] == \
        "bbox-rise-2elem_blur=4_scale_12-saliency.npz"

    # -- cross-net pseudo-method: meanEBP_VGG reads the 'vgg' net's plain
    # meanEBP maps (reference plot_inpainting_game.py:983-987) — stage
    # them by copying the toynet meanEBP maps into the vgg tree
    import shutil
    for mid in ("00002", "00005"):
        src = os.path.join(
            game_env["smaps_dir"], "toynet/subject_ID_1/img/p1/inpainted",
            "%s-meanEBP_mode=all_v06_cpu-saliency.npz" % mid)
        dst_dir = os.path.join(game_env["smaps_dir"],
                               "vgg/subject_ID_1/img/p1/inpainted")
        os.makedirs(dst_dir, exist_ok=True)
        shutil.copy(src, os.path.join(dst_dir,
                                      "%s-meanEBP-saliency.npz" % mid))

    # -- analysis + plots ----------------------------------------------------
    methods = [
        "meanEBP_mode=all_v06_cpu",
        "contrastive_triplet_ebp_mode=all_v06_cpu",
        "weighted_subtree_triplet_ebp_mode=all,all_v06_top32_cpu",
        "bbox-rise-2elem_blur=4_scale_12",
        "inpaintingMask",
        "meanEBP_VGG",
    ]
    params = dict(
        threshold_type="percent-density",
        output_dir=game_env["out_dir"], output_subdir=None,
        cache_dir=game_env["cache_dir"],
        smap_root=game_env["smaps_dir"],
        data_dir=game_env["data_dir"],
        NET=["toynet"], SUBJECT_ID=[1], MASK_ID=[2, 5],
        METHOD=methods, IMG_BASENAME=None,
        reprocess=False, seed=42, include_zero_saliency=True,
        mask_blur_sigma=0, balance_masks=True,
        ignore_missing_saliency_maps=False)
    labels = dict(human_net_labels_)
    labels["toynet"] = "ToyNet"

    net_dict = {"toynet": wb}
    ncls = make_inpaintinggame_plots(net_dict, params,
                                     human_net_labels=labels)

    # per (method x mask) rows
    assert len(ncls) == len(methods) * 2
    assert set(ncls["MASK_ID"]) == {2, 5}
    # results.csv with the headline columns
    import pandas as pd

    res = pd.read_csv(os.path.join(game_env["out_dir"], "results.csv"))
    assert set(methods) == set(res["method"])
    assert "all,far=1e-2" in res.columns and "all,far=5e-2" in res.columns
    vals = res[["all,far=1e-2", "all,far=5e-2"]].values
    assert np.isfinite(vals).all() and (vals >= 0).all() and \
        (vals <= 1).all()
    # groundtruth pseudo-method should dominate (sanity of the metric)
    gt = res.loc[res["method"] == "inpaintingMask", "all,far=5e-2"].iloc[0]
    others = res.loc[res["method"] != "inpaintingMask", "all,far=5e-2"]
    assert gt >= others.max() - 1e-9, (gt, others.tolist())

    # plots + pickle artifacts
    assert os.path.exists(os.path.join(
        game_env["out_dir"],
        "inpainted_twin_game_balanced-by-mask-net-split.png"))
    assert os.path.exists(os.path.join(game_env["cache_dir"],
                                       "nonmate-cls.pkl"))
    # dataset-stats figure + identity-flip overlay export (reference
    # make_inpaintinggame_plots tail, plot_inpainting_game.py:171-287)
    assert os.path.exists(os.path.join(game_env["out_dir"],
                                       "datasets-stats-toynet.png"))
    idflips = glob.glob(os.path.join(
        game_env["out_dir"], "toynet/mask-*/*/*-idflip.png"))
    # every (mask, method) group with a flipping row exports overlays
    assert len(idflips) >= len(methods), idflips
    import imageio.v2 as imageio
    rgb = imageio.imread(idflips[0])
    assert rgb.shape == (224, 224, 3) and rgb.max() > 0

    # cache reuse: re-run analysis, CLS curves identical
    ncls2 = make_inpaintinggame_plots(net_dict, dict(params),
                                      human_net_labels=labels)
    for a, b in zip(ncls["CLS_AS_TWIN"], ncls2["CLS_AS_TWIN"]):
        np.testing.assert_array_equal(a, b)


def _toy_bb_fn(wb, probes, gallery):
    """Embedding-similarity scorer through the toy net (host contract)."""
    from xfr_tpu.utils.image import image_loader

    def embed(images):
        ims = []
        for im in image_loader(list(images)):
            arr = np.asarray(im, np.float64)
            if arr.max() > 1.5:
                arr = arr / 255.0
            ims.append(arr.transpose(2, 0, 1))
        e = wb.embeddings(np.stack(ims).astype(np.float32))
        return e

    pe = embed(probes)
    ge = embed(gallery)
    return 1.0 - 0.5 * np.linalg.norm(pe[:, None] - ge[None], axis=2)


def test_batched_generation_matches_serial(game_env, tmp_path):
    """generate_wb_smaps_batched writes numerically-equal maps to the
    serial driver (and fixes the meanEBP classifier-leak the serial path
    guards against via reset_classifier)."""
    from xfr_tpu.inpainting_game import generate as G

    wb = game_env["wb"]
    serial_dir = str(tmp_path / "smaps_serial")
    batch_dir = str(tmp_path / "smaps_batched")
    os.makedirs(serial_dir, exist_ok=True)
    os.makedirs(batch_dir, exist_ok=True)

    for mid in ("%05d" % 2, "%05d" % 5):
        G.generate_wb_smaps(
            wb, "toynet", "img/p1", 1, mid, subtree_mode_weighted="all",
            ebp_ver=6, overwrite=True, data_dir=game_env["data_dir"],
            smaps_dir=serial_dir)

    jobs = [(1, "%05d" % 2, "img/p1"), (1, "%05d" % 5, "img/p1")]
    n = G.generate_wb_smaps_batched(
        wb, "toynet", jobs, subtree_mode_weighted="all", ebp_ver=6,
        overwrite=True, data_dir=game_env["data_dir"], smaps_dir=batch_dir,
        batch_size=2)
    assert n == 2

    # tail group: 2 jobs at batch_size=3 exercises the duplicate-first-job
    # padding (one canonical compiled shape); results must be unchanged
    pad_dir = str(tmp_path / "smaps_padded")
    os.makedirs(pad_dir, exist_ok=True)
    n = G.generate_wb_smaps_batched(
        wb, "toynet", jobs, subtree_mode_weighted="all", ebp_ver=6,
        overwrite=True, data_dir=game_env["data_dir"], smaps_dir=pad_dir,
        batch_size=3)
    assert n == 2

    serial_maps = sorted(glob.glob(os.path.join(
        serial_dir, "toynet/subject_ID_1/img/p1/inpainted/*-saliency.npz")))
    serial_maps = [f for f in serial_maps if "bbox-rise" not in f]
    assert len(serial_maps) == 8
    for f in serial_maps:
        a = np.load(f)["saliency_map"]
        for other in (batch_dir, pad_dir):
            g = f.replace(serial_dir, other)
            assert os.path.exists(g), g
            b = np.load(g)["saliency_map"]
            # atol 1e-5: the truncated percentile-mass boundary can flip a
            # few pixels under float cumsum reassociation
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-5,
                                       err_msg=os.path.basename(g))


def test_batched_generation_failure_isolation(game_env, tmp_path):
    """A bad job (nonexistent image base) must not abort the batched run:
    the good jobs' maps land on disk and the failure surfaces at the end
    (serial driver / reference-pool semantics)."""
    from xfr_tpu.inpainting_game import generate as G

    wb = game_env["wb"]
    out = str(tmp_path / "smaps_fail")
    os.makedirs(out, exist_ok=True)
    jobs = [(1, "%05d" % 2, "img/NO_SUCH_IMAGE"),
            (1, "%05d" % 2, "img/p1"), (1, "%05d" % 5, "img/p1")]
    with pytest.raises(RuntimeError, match="NO_SUCH_IMAGE|failed"):
        G.generate_wb_smaps_batched(
            wb, "toynet", jobs, subtree_mode_weighted="all", ebp_ver=6,
            overwrite=True, data_dir=game_env["data_dir"],
            smaps_dir=out, batch_size=2)
    maps = glob.glob(os.path.join(
        out, "toynet/subject_ID_1/img/p1/inpainted/*-saliency.npz"))
    assert len(maps) == 8  # 4 methods x the 2 good jobs still generated

    # meanEBP-only invocation (lazy em/en path: no triplet encodes)
    out2 = str(tmp_path / "smaps_mean")
    os.makedirs(out2, exist_ok=True)
    n = G.generate_wb_smaps_batched(
        wb, "toynet", jobs[1:], subtree_mode_weighted="all", ebp_ver=6,
        overwrite=True, method="meanEBP",
        data_dir=game_env["data_dir"], smaps_dir=out2, batch_size=2)
    assert n == 2
    maps = glob.glob(os.path.join(
        out2, "toynet/subject_ID_1/img/p1/inpainted/*-saliency.npz"))
    assert len(maps) == 2 and all("meanEBP" in m for m in maps)
