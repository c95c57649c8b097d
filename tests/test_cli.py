"""CLI driver tests: job-table construction, sharding, and a full
generate-wb run through the argparse surface on the synthetic dataset."""

import glob
import os

import numpy as np
import pytest

from tests.fixtures import make_mini_dataset, make_toy_wbnet


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data_dir = str(root / "data")
    smaps_dir = str(root / "smaps")
    os.makedirs(data_dir)
    os.makedirs(smaps_dir)
    make_mini_dataset(data_dir, net_name="toynet", mask_ids=(2, 5))
    return dict(data_dir=data_dir, smaps_dir=smaps_dir)


def test_job_table_and_sharding(cli_env):
    from xfr_tpu.cli.generate_wb_saliency import build_job_table, shard_jobs

    jobs = build_job_table(["toynet"], None, None, None, cli_env["data_dir"])
    assert len(jobs) == 2  # one probe image x two masks
    assert {j["mask_id"] for j in jobs} == {"00002", "00005"}
    assert all(j["img_base"] == "img/p1" for j in jobs)

    # mask filtering accepts ints and zero-padded strings
    jobs2 = build_job_table(["toynet"], None, ["00002"], None,
                            cli_env["data_dir"])
    assert len(jobs2) == 1 and jobs2[0]["mask_id"] == "00002"
    jobs3 = build_job_table(["toynet"], [1], [5], None, cli_env["data_dir"])
    assert len(jobs3) == 1

    # deterministic disjoint covering shards
    shards = [shard_jobs(jobs, i, 2) for i in range(2)]
    assert sorted(map(str, shards[0] + shards[1])) == sorted(map(str, jobs))
    assert not (set(map(str, shards[0])) & set(map(str, shards[1])))


def test_generate_wb_cli_end_to_end(cli_env, monkeypatch):
    """Drive the argparse surface with the toy net patched into the
    factory."""
    from xfr_tpu.cli import generate_wb_saliency as cli
    from xfr_tpu.models import factory

    wb = make_toy_wbnet(subtree_mode="all")

    def fake_create(net_name, **kw):
        assert net_name == "toynet"
        return wb

    monkeypatch.setattr(factory, "create_wbnet", fake_create)
    monkeypatch.setattr("xfr_tpu.models.create_wbnet", fake_create)

    cli.main([
        "--net", "toynet", "--method", "meanEBP",
        "--data-dir", cli_env["data_dir"],
        "--saliency-dir", cli_env["smaps_dir"],
        "--shard-index", "0", "--num-shards", "1",
    ])
    maps = glob.glob(os.path.join(
        cli_env["smaps_dir"],
        "toynet/subject_ID_1/img/p1/inpainted/*meanEBP*-saliency.npz"))
    assert len(maps) == 2
    for f in maps:
        sm = np.load(f)["saliency_map"]
        assert np.isfinite(sm).all() and sm.shape == (224, 224)


def test_fit_match_threshold():
    from xfr_tpu.inpainting_game.dists import fit_match_threshold

    rng = np.random.RandomState(0)
    # FPR=1e-4 needs enough nonmates to be representable on the ROC grid
    mate = np.abs(rng.randn(2000) * 0.1 + 0.4)
    nonmate = np.abs(rng.randn(50000) * 0.1 + 1.4)
    thresh, alpha, fpr, tpr = fit_match_threshold(mate, nonmate)
    # threshold accepts nearly all mates at ~zero false accepts
    assert (mate <= thresh).mean() > 0.95
    assert (nonmate <= thresh).mean() <= 2e-3
    assert alpha > 0  # P(nonmate) increases with distance
    # Platt scaling classifies the bulk correctly
    p_mate = 1 / (1 + np.exp(-alpha * (mate - thresh)))
    p_nonmate = 1 / (1 + np.exp(-alpha * (nonmate - thresh)))
    assert p_mate.mean() < 0.5 < p_nonmate.mean()


def test_eccv20_figure1_synthetic(tmp_path, monkeypatch):
    """Figure-1 montage generation on a synthetic face directory."""
    import PIL.Image

    from xfr_tpu.cli.eccv20 import FaceDirectory, figure1

    rng = np.random.RandomState(0)
    for sid in range(4):
        d = tmp_path / "data" / ("s%02d" % sid)
        os.makedirs(d)
        base = (rng.rand(260, 260, 3) * 100 + 60).astype(np.uint8)
        base[60 + 10 * sid:120 + 10 * sid, 80:180] = 220 - 30 * sid
        for k in range(2):
            img = np.clip(base.astype(int) +
                          rng.randint(-10, 10, base.shape),
                          0, 255).astype(np.uint8)
            PIL.Image.fromarray(img).save(d / ("im%d.jpg" % k))

    wb = make_toy_wbnet(subtree_mode="all")
    ds = FaceDirectory(str(tmp_path / "data"))
    assert len(ds.subjects()) == 4
    outs = figure1(wb, ds, output_dir=str(tmp_path), n_subjects=3,
                   methods=("none", "ebp"))
    for f in outs:
        assert os.path.exists(f)
        im = PIL.Image.open(f)
        assert im.size[0] > 400  # 4x4 grid of 112px tiles


def test_eccv20_all_figures_synthetic(tmp_path):
    """Figures 1-5 (sub-figures a..e + composite f) on a toy corpus
    (reference: eval/eccv20.py:265-549)."""
    import PIL.Image

    from xfr_tpu.cli.eccv20 import (FaceDirectory, figure1, figure2,
                                    figure3, figure4, figure5)

    rng = np.random.RandomState(1)
    for sid in range(4):
        d = tmp_path / "data" / ("s%02d" % sid)
        os.makedirs(d)
        # strongly distinct identities (a too-uniform corpus makes
        # mate/nonmate gradients agree and weighted-subtree correctly
        # finds no valid subtree, as the reference would)
        base = (rng.rand(260, 260, 3) * 60 + 40).astype(np.uint8)
        base = np.roll(base, sid, axis=2)
        base[40 + 30 * sid:100 + 30 * sid, 60:200, sid % 3] = 240
        base[150:200, 40 + 40 * sid:90 + 40 * sid] = 30 + 60 * sid
        for k in range(3):
            img = np.clip(base.astype(int) +
                          rng.randint(-10, 10, base.shape),
                          0, 255).astype(np.uint8)
            PIL.Image.fromarray(img).save(d / ("im%d.jpg" % k))

    wb = make_toy_wbnet(subtree_mode="all")
    ds = FaceDirectory(str(tmp_path / "data"))
    methods = ("none", "ebp", "weighted-subtree")
    kw = dict(output_dir=str(tmp_path), n_subjects=2, methods=methods)
    outs = []
    outs += figure1(wb, ds, **kw)
    outs += figure2(wb, ds, topk=2, **kw)
    outs += figure3(wb, ds, **kw)
    outs += figure4(wb, ds, topk=2, **kw)
    outs += figure5(wb, ds, **kw)
    # 5 figures x (3 methods + composite f)
    assert len(outs) == 5 * (len(methods) + 1)
    names = {os.path.basename(f) for f in outs}
    for fig in "12345":
        assert ("figure%sa_2.jpg" % fig) in names
        assert ("figure%sf_2.jpg" % fig) in names
    for f in outs:
        assert os.path.exists(f) and PIL.Image.open(f).size[0] > 200


def test_subject_dists_cli_ijbc_fixture(tmp_path, monkeypatch):
    """xfr-calc-subject-dists + xfr-calc-match-threshold end-to-end on a
    synthetic IJB-C-shaped corpus (reference:
    eval/calculate_subject_dists_inpaintinggame.py,
    inpainting_game/net_mate_nonmate_dists.py:55-144)."""
    import imageio.v2 as imageio
    import pandas as pd

    from xfr_tpu.cli import calc_match_threshold, calc_subject_dists

    # IJB-C-shaped fixture: protocols/ijbc_metadata.csv + images
    rng = np.random.RandomState(9)
    rows = []
    os.makedirs(tmp_path / "protocols")
    os.makedirs(tmp_path / "images")
    # 4 subjects x 2 sightings: the smallest corpus that still exercises
    # mate pairs, nonmate pools, and the 2-seed output naming (each extra
    # image costs a full-net CPU embedding; 6x3 measured 105 s)
    for sid in range(1, 5):
        base = (rng.rand(240, 240, 3) * 120 + 40).astype(np.uint8)
        base[30 * sid // 2:120, 40:200, sid % 3] = 230
        for k in range(2):
            img = np.clip(base.astype(int) +
                          rng.randint(-12, 12, base.shape),
                          0, 255).astype(np.uint8)
            fn = "images/s%d_%d.png" % (sid, k)
            imageio.imwrite(tmp_path / fn, img)
            rows.append({"SUBJECT_ID": sid, "FILENAME": fn,
                         "FACE_X": 8, "FACE_Y": 8, "FACE_WIDTH": 220,
                         "FACE_HEIGHT": 220})
    pd.DataFrame(rows).to_csv(
        tmp_path / "protocols" / "ijbc_metadata.csv", index=False)

    monkeypatch.setenv("IJBC_PATH", str(tmp_path))
    out_dir = str(tmp_path / "out")
    calc_subject_dists.main([
        "--net", "resnetv4_pytorch", "--seeds", "0", "1",
        "--num-subjects", "4", "--num-nonmates", "3",
        "--output", out_dir])

    npzs = sorted(os.listdir(out_dir))
    assert npzs == ["dists_net=resnetv4_pytorch_seed=0.npz",
                    "dists_net=resnetv4_pytorch_seed=1.npz"]
    d = np.load(os.path.join(out_dir,
                             "dists_net=resnetv4_pytorch_seed=0.npz"))
    assert d["mate_dists"].ndim == 1 and len(d["mate_dists"]) >= 2
    assert len(d["nonmate_dists"]) >= 6
    assert np.isfinite(d["mate_dists"]).all()

    # chain into the threshold-calibration CLI on the written npzs
    calc_match_threshold.main(["resnetv4_pytorch", "--dists-dir", out_dir])
    assert os.path.exists(os.path.join(out_dir, "roc.png"))


def test_filter_dataset_cli(tmp_path, monkeypatch):
    """xfr-filter-dataset writes filtered_masks_threshold-{net}.csv on the
    synthetic mini dataset (reference: eval/filter_inpaintinggame_for_net)."""
    import pandas as pd

    import xfr_tpu.models
    from tests.fixtures import make_mini_dataset
    from xfr_tpu.cli import filter_dataset

    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    # mask 0 doubles as the ORIGINAL_PATTERN (00000_truth.png)
    make_mini_dataset(data_dir, net_name="toynet", mask_ids=(0, 2))

    wb = make_toy_wbnet(subtree_mode="all")
    # calibrate the match threshold to the toy net's distance scale
    # (production uses xfr-calc-match-threshold for this): separability
    # needs pr_dist < thr < twin_pr_dist
    pr = np.linalg.norm(
        wb.embeddings([os.path.join(
            data_dir, "aligned/1/img/p1/inpainted/00000_truth.png")])[0] -
        wb.embeddings([os.path.join(
            data_dir, "aligned/1/img/ref0/inpainted/00000_truth.png")])[0])
    tpr = np.linalg.norm(
        wb.embeddings([os.path.join(
            data_dir, "aligned/1/img/p1/inpainted/00000_out_0.png")])[0] -
        wb.embeddings([os.path.join(
            data_dir, "aligned/1/img/ref0/inpainted/00000_truth.png")])[0])
    wb.match_threshold = float((pr + tpr) / 2)
    monkeypatch.setattr(xfr_tpu.models, "create_wbnet",
                        lambda name, **kw: wb)
    monkeypatch.setattr(xfr_tpu, "inpaintgame2_dir", data_dir)

    filter_dataset.main(["toynet", "--data-dir", data_dir,
                         "--mask-ids", "0", "2"])
    out = os.path.join(data_dir, "filtered_masks_threshold-toynet.csv")
    assert os.path.exists(out)
    df = pd.read_csv(out)
    assert set(df.columns) >= {"SUBJECT_ID", "MASK_ID",
                               "ORIGINAL_BASENAME", "OriginalFile",
                               "InpaintingFile", "TRIPLET_SET"}
    assert len(df) > 0
    assert set(df["TRIPLET_SET"]) == {"PROBE", "REF"}


def test_hiding_game_cli(tmp_path, monkeypatch):
    """xfr-hiding-game scores generated saliency maps into a csv."""
    import pandas as pd

    import xfr_tpu.models
    from tests.fixtures import make_mini_dataset
    from xfr_tpu.cli import hiding_game
    from xfr_tpu.inpainting_game import generate as G

    data_dir = str(tmp_path / "data")
    smaps_dir = str(tmp_path / "smaps")
    out_dir = str(tmp_path / "out")
    for d in (data_dir, smaps_dir, out_dir):
        os.makedirs(d)
    make_mini_dataset(data_dir, net_name="toynet", mask_ids=(2,))

    wb = make_toy_wbnet(subtree_mode="all")
    # MASK_ID as a zero-padded string: file naming interop depends on it
    G.generate_wb_smaps(wb, "toynet", "img/p1", 1, "00002",
                        subtree_mode_weighted="all", ebp_ver=6,
                        overwrite=True, method="meanEBP",
                        data_dir=data_dir, smaps_dir=smaps_dir)

    monkeypatch.setattr(xfr_tpu.models, "create_wbnet",
                        lambda name, **kw: wb)
    hiding_game.main(["--net", "toynet",
                      "--method", "meanEBP_mode=all_v06_cpu",
                      "--data-dir", data_dir,
                      "--saliency-dir", smaps_dir,
                      "--output", out_dir, "--delta-pct", "25"])
    out_csv = os.path.join(out_dir,
                           "hiding-game-meanEBP_mode=all_v06_cpu.csv")
    assert os.path.exists(out_csv)
    df = pd.read_csv(out_csv)
    assert len(df) > 0
    assert {"hidden_pct", "score"} <= set(df.columns)
    assert np.isfinite(df["score"]).all()


def test_warm_cache_smoke():
    """warm_cache compiles every canonical production program (injected
    toy net keeps it CPU-fast); each step must run and report a time."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.cli.warm_cache import warm

    wb = make_toy_wbnet(num_classes=6, seed=2)
    steps = warm(net_name="resnetv4_pytorch", batch_size=2, bb=True,
                 num_masks=16, verbose=False, wb=wb)
    names = [n for n, _ in steps]
    assert any("meanEBP" in n for n in names)
    assert any("wsebp" in n for n in names)
    assert any("blend" in n for n in names)
    assert any("multi-map" in n for n in names)
    assert any("blackbox" in n for n in names)
    assert all(dt >= 0 for _, dt in steps)
    # the eval/BB steps must warm the PRODUCTION program signatures: the
    # classifier shape is part of every program's signature (and hence
    # its persistent-cache key) even for encode-only programs, so the
    # wsebp step's [2B,D] triplet classifier must have been reset before
    # the blend/blackbox steps traced
    assert wb.net.num_classes() == 6


def test_warm_cache_covers_registry():
    """The warm-cache invariant, mechanized (round-3 verdict #6): every
    program family flagged warm=True in xfr_tpu.utils.programs must be
    BUILT by warm(), and warm() must not build families the registry
    calls lazy (that would mean a production-path program shipped without
    a registry decision).  Adding a canonical-shape program without a
    warm step — or a warm step that silently stops building its program —
    fails here; building an *unregistered* family raises in
    Whitebox._kernel itself.  With >1 visible device (the 8-dev test
    env), warm()'s --mesh auto pass must additionally build exactly the
    warm_mesh families (round-4 ADVICE: the shard_map default-path
    programs were never pre-seeded)."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.cli.warm_cache import warm
    from xfr_tpu.utils import programs

    wb = make_toy_wbnet(num_classes=6, seed=3)
    programs.BUILT.clear()
    programs.RECORD = True
    try:
        warm(net_name="resnetv4_pytorch", batch_size=2, bb=True,
             num_masks=16, verbose=False, wb=wb)
    finally:
        programs.RECORD = False
    # warm() must not permanently re-route the caller-provided wb onto
    # auto_mesh: its mesh pass saves/restores the prior (un-meshed) state
    assert wb.mesh is None
    built = set(programs.BUILT)
    programs.BUILT.clear()
    expected = programs.warm_set() | programs.warm_mesh_set()
    assert built == expected, (
        "warm_cache coverage drifted from the registry.\n"
        "flagged warm but not built by warm(): %s\n"
        "built by warm() but flagged lazy: %s" % (
            sorted(expected - built),
            sorted(built - expected)))


def test_warm_cache_restores_caller_mesh():
    """The other arm of warm()'s save/restore: a wb that arrives ALREADY
    meshed must leave on its own mesh (not auto_mesh's), with its rounded
    batch size intact and a sharded program still runnable."""
    import jax

    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.cli.warm_cache import warm
    from xfr_tpu.parallel.mesh import make_mesh

    wb = make_toy_wbnet(num_classes=6, seed=4)
    mesh2 = make_mesh((2, 1), ("dp", "mp"),
                      devices=jax.devices()[:2])  # != auto_mesh's 8-dev
    wb.use_mesh(mesh2)
    bs = wb.batch_size
    warm(net_name="resnetv4_pytorch", batch_size=2, bb=False,
         verbose=False, wb=wb)
    assert wb.mesh is mesh2
    assert wb.batch_size == bs
    rng = np.random.RandomState(0)
    emb = wb.embeddings(rng.rand(3, 3, 224, 224).astype(np.float32))
    assert emb.shape == (3, 12) and np.isfinite(emb).all()


def test_unregistered_program_family_raises():
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.utils import programs

    wb = make_toy_wbnet(num_classes=4, seed=0)
    with pytest.raises(KeyError, match="unregistered"):
        wb._kernel(("totally_new_family", 1), lambda: (lambda: None))
    # registered families never raise
    for fam in programs.PROGRAMS:
        programs.note_build(fam)


def test_unpack_dataset_cli(tmp_path):
    """xfr-unpack-dataset extracts subj-*.tar.gz into IJBC/ (reference
    data/inpainting-game/unpack-aligned.sh), idempotently."""
    import tarfile

    from xfr_tpu.cli import unpack_dataset

    ijbc = tmp_path / "IJBC"
    (ijbc / "aligned").mkdir(parents=True)
    # two subject archives whose payload lands under aligned/<ID>/
    for subj in ("101", "202"):
        src = tmp_path / "src" / "aligned" / subj
        src.mkdir(parents=True)
        (src / "img.png").write_bytes(b"fake")
        with tarfile.open(str(ijbc / ("subj-%s.tar.gz" % subj)),
                          "w:gz") as tf:
            tf.add(str(src), arcname="aligned/%s" % subj)

    done = unpack_dataset.unpack_aligned(str(tmp_path), verbose=False)
    assert done == ["101", "202"]
    assert (ijbc / "aligned" / "101" / "img.png").read_bytes() == b"fake"

    # idempotent: second run skips everything unless --force
    assert unpack_dataset.unpack_aligned(str(tmp_path), verbose=False) == []

    # pre-PEP-706 interpreters: a fully-unpacked tree stays a no-op
    # (defensive startup calls / resumes keep working), but any run that
    # would actually extract fails closed BEFORE opening an archive
    with pytest.MonkeyPatch.context() as mp:
        mp.delattr(tarfile, "data_filter")
        assert unpack_dataset.unpack_aligned(str(tmp_path),
                                             verbose=False) == []
        with pytest.raises(RuntimeError, match="data_filter"):
            unpack_dataset.unpack_aligned(str(tmp_path), force=True,
                                          verbose=False)

    assert unpack_dataset.unpack_aligned(str(tmp_path), force=True,
                                         verbose=False) == ["101", "202"]

    # the argparse main drives the same path
    unpack_dataset.main(["--dataset-dir", str(tmp_path), "--force"])

    # archives with escaping paths are refused
    evil = ijbc / "subj-303.tar.gz"
    with tarfile.open(str(evil), "w:gz") as tf:
        p = tmp_path / "x.txt"
        p.write_text("nope")
        tf.add(str(p), arcname="../evil.txt")
    with pytest.raises(ValueError):
        unpack_dataset.unpack_aligned(str(tmp_path), force=True,
                                      verbose=False)

    # symlink-member escapes (link inside, target outside) are refused by
    # the tarfile data filter even though the member path itself is clean
    evil.unlink()
    link = ijbc / "subj-404.tar.gz"
    with tarfile.open(str(link), "w:gz") as tf:
        ti = tarfile.TarInfo("aligned/404/link")
        ti.type = tarfile.SYMTYPE
        ti.linkname = "/etc"
        tf.addfile(ti)
    with pytest.raises(tarfile.FilterError):
        unpack_dataset.unpack_aligned(str(tmp_path), force=True,
                                      verbose=False)
    link.unlink()

    # missing IJBC/ gives a clear error
    with pytest.raises(FileNotFoundError):
        unpack_dataset.unpack_aligned(str(tmp_path / "nowhere"))


def test_bb_cli_score_precision_default_is_high(tmp_path, monkeypatch):
    """The BB generation CLI defaults to score_precision='high' (round-3
    verdict #7: the eval stage's product is mask RANKING, which the fast
    default degrades on low-spread workloads) and maps 'default' to the
    library ctor's None.  Wiring-level test: generate_bb_smaps is
    monkeypatched to capture the kwarg."""
    from tests.fixtures import make_mini_dataset
    from xfr_tpu.cli import generate_bb_saliency as B
    from xfr_tpu.inpainting_game import generate as G

    make_mini_dataset(str(tmp_path), net_name="resnetv4_pytorch",
                      mask_ids=(2,))
    seen = []

    def fake_generate(*a, **kw):
        seen.append(kw["score_precision"])

    monkeypatch.setattr(G, "generate_bb_smaps", fake_generate)
    base = ["--data-dir", str(tmp_path),
            "--saliency-dir", str(tmp_path / "smaps"),
            "--mask", "2", "--mesh", "off"]
    B.main(base)
    assert seen and all(p == "high" for p in seen)

    seen.clear()
    B.main(base + ["--score-precision", "default"])
    assert seen and all(p is None for p in seen)
