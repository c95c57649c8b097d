"""Repo-owned golden saliency maps (the reference pins demo outputs as
cached JPEGs, demo/whitebox/*.jpg + README.md:92; upstream .pth files are
git-lfs stubs, so these goldens pin the deterministic-random-init path
instead: same engine, same event schedule, reproducible weights).

Regenerate after an intentional numerics change (runs through pytest so
the environment — x64, virtual device count — matches the comparison
exactly):

    XFR_REGEN_GOLDENS=1 python -m pytest tests/test_demo_goldens.py -q
"""

import os

import numpy as np

import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "demo", "whitebox_goldens.npz")


def _demo_face_arr():
    """The synthetic demo face (demo/test_whitebox.py:_demo_face)."""
    rng = np.random.RandomState(0)
    img = (rng.rand(256, 256, 3) * 40 + 80).astype(np.uint8)
    img[60:200, 70:190] = 190
    img[100:120, 95:115] = 60
    img[100:120, 150:170] = 60
    img[150:180, 120:140] = 120
    return img


def _golden_maps():
    """name -> float32 saliency map for the pinned demo scenarios."""
    from xfr_tpu.models import create_wbnet

    face = _demo_face_arr()
    maps = {}

    wb = create_wbnet("resnetv4_pytorch")
    x = wb.convert_from_numpy(face)
    P0 = np.zeros((1, wb.net.num_classes()), np.float32)
    P0[0, 0] = 1.0
    maps["ebp"] = wb.ebp(x, jnp.asarray(P0))
    maps["mean_ebp"] = wb.ebp(
        x, jnp.ones((1, wb.net.num_classes()), jnp.float32)
        / wb.net.num_classes())
    maps["contrastive_ebp"] = wb.contrastive_ebp(x, 0, 100)
    maps["truncated_contrastive_ebp"] = wb.truncated_contrastive_ebp(
        x, 0, 100, percentile=20)
    maps["layerwise_ebp_k37"] = wb.layerwise_ebp(
        x, k_layer=37, mode="argmax", k_poschannel=0)

    # triplet scenarios against deterministic encodings of shifted faces
    mate = np.roll(face, 3, axis=0)
    nonmate = 255 - face
    em = np.asarray(wb.encode(wb.convert_from_numpy(mate)))[0]
    en = np.asarray(wb.encode(wb.convert_from_numpy(nonmate)))[0]
    wb.net.set_triplet_classifier(em / 2500.0, en / 2500.0)
    maps["contrastive_triplet_ebp"] = wb.contrastive_ebp(x, 0, 1)
    maps["layerwise_contrastive_ebp_mean"] = wb.layerwise_contrastive_ebp(
        x, 0, 1, k_layer=37, mode="mean")

    wb5 = create_wbnet("resnetv4_pytorch", ebp_version=5)
    wb5.net.set_triplet_classifier(em, en)
    smap, _, _, _ = wb5.weighted_subtree_ebp(
        x, 0, 1, topk=8, subtree_mode="all", max_candidates=16,
        return_subtree_maps=False)
    maps["weighted_subtree_ebp_top8"] = smap

    wl = create_wbnet("lightcnn", ebp_subtree_mode="affineonly")
    maps["ebp_lightcnn"] = wl.ebp(
        wl.net.preprocess(face),
        jnp.asarray(np.eye(wl.net.num_classes(), dtype=np.float32)[:1]))

    wv = create_wbnet("vggface2_resnet50")
    maps["ebp_resnet50_128"] = wv.ebp(
        wv.net.preprocess(face),
        jnp.asarray(np.eye(wv.net.num_classes(), dtype=np.float32)[:1]))

    return {k: np.asarray(v, np.float32) for k, v in maps.items()}


def test_demo_goldens_regression():
    if os.environ.get("XFR_REGEN_GOLDENS"):
        maps = _golden_maps()
        np.savez_compressed(GOLDEN_PATH, **maps)
        print("wrote %s" % GOLDEN_PATH)
        return
    assert os.path.exists(GOLDEN_PATH), \
        "goldens missing — run: XFR_REGEN_GOLDENS=1 python -m pytest " \
        "tests/test_demo_goldens.py"
    golden = dict(np.load(GOLDEN_PATH))
    maps = _golden_maps()
    assert set(maps) == set(golden), (set(maps), set(golden))
    for name, m in maps.items():
        g = golden[name]
        assert m.shape == g.shape, (name, m.shape, g.shape)
        # normalized maps; tolerance absorbs BLAS/version-level drift but
        # fails on any semantic change to the event schedule or rules
        np.testing.assert_allclose(
            m, g, rtol=1e-3, atol=1e-5 * max(g.max(), 1e-12),
            err_msg=name)


