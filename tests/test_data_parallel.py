"""Tests for data pipelines (transforms, triplet loader) and multi-host job
partitioning."""

import os

import numpy as np
import PIL.Image
import pytest


def _img(seed=0, size=(300, 260)):
    rng = np.random.RandomState(seed)
    return PIL.Image.fromarray(
        (rng.rand(size[1], size[0], 3) * 255).astype(np.uint8))


def test_prepare_image_fn_shapes():
    from xfr_tpu.data.transforms import prepare_image_fn

    prep = prepare_image_fn(jitter=False)
    out = prep(_img())
    assert out.size == (224, 224)

    prep_j = prepare_image_fn(jitter=True, seed=0)
    out1 = prep_j(_img())
    out2 = prep_j(_img())
    assert out1.size == (224, 224)
    # jitter draws differ between calls
    assert not np.array_equal(np.asarray(out1), np.asarray(out2))


def test_twocrop_ensemble():
    from xfr_tpu.data.transforms import (generate_twocrop_ensemble,
                                         resnet101v4_preprocess_twocrop_ensemble)

    crops = generate_twocrop_ensemble()(_img())
    assert len(crops) == 6
    assert all(c.size == (224, 224) for c in crops)
    # flips pair up
    np.testing.assert_array_equal(
        np.asarray(crops[1]), np.asarray(crops[0])[:, ::-1])

    arr = resnet101v4_preprocess_twocrop_ensemble()(_img())
    assert arr.shape == (6, 3, 224, 224)


def test_induce_artifacts_and_named_pipelines():
    from xfr_tpu.data.transforms import (create_transforms,
                                         generate_induce_artifacts)

    art = generate_induce_artifacts((30, 60), (0.5, 0.9), seed=0)
    out = art(_img())
    assert out.size == _img().size

    from xfr_tpu.models.resnet101 import preprocess_resnet101

    for name in ("minimal", "grayscale", "invert-grayscale",
                 "blur-grayscale"):
        t = create_transforms(preprocess_resnet101, name, jitter=False,
                              blur_radius=1.5, seed=0)
        x = t(_img())
        assert x.shape == (1, 3, 224, 224)

    with pytest.raises(RuntimeError):
        create_transforms(preprocess_resnet101, "nope", jitter=False)


def test_triplet_loader(tmp_path):
    import pandas as pd

    from xfr_tpu.data.triplet import TripletDataLoader

    root = str(tmp_path)
    rows = []
    for trip, base in (("PROBE", "p"), ("REF", "r0"), ("REF", "r1")):
        orig = "im_%s_orig.png" % base
        inp = "im_%s_inp.png" % base
        for f in (orig, inp):
            _img(hash(f) % 100, (64, 64)).save(os.path.join(root, f))
        rows.append({"SUBJECT_ID": 1, "MASK_ID": 2, "TRIPLET_SET": trip,
                     "OriginalFile": orig, "InpaintingFile": inp})
    csv = os.path.join(root, "filtered.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    ds = TripletDataLoader(csv, data_root=root)
    assert len(ds) == 1
    probe, mates, nonmates = ds[0]
    assert probe.shape == (1, 64, 64, 3)
    assert mates.shape == (2, 64, 64, 3)
    assert nonmates.shape == (2, 64, 64, 3)

    # net-preprocess transforms return batch-carrying [1,C,H,W]: the
    # loader must not double-batch them
    from xfr_tpu.models.resnet101 import preprocess_resnet101

    ds2 = TripletDataLoader(csv, data_root=root,
                            transform=lambda im: preprocess_resnet101(
                                np.asarray(im)))
    probe, mates, _ = ds2[0]
    assert probe.shape == (1, 3, 224, 224)
    assert mates.shape == (2, 3, 224, 224)

    # a single matching REF row collapses to a pandas Series under
    # MultiIndex .loc — the loader must still iterate it
    csv1 = os.path.join(root, "filtered_one_ref.csv")
    pd.DataFrame(rows[:2]).to_csv(csv1, index=False)
    ds3 = TripletDataLoader(csv1, data_root=root)
    probe, mates, nonmates = ds3[0]
    assert mates.shape == (1, 64, 64, 3)
    assert nonmates.shape == (1, 64, 64, 3)


def test_partition_jobs():
    from xfr_tpu.parallel.distributed import partition_jobs

    jobs = list(range(17))
    shards = [partition_jobs(jobs, i, 4) for i in range(4)]
    assert sorted(sum(shards, [])) == jobs
    assert max(map(len, shards)) - min(map(len, shards)) <= 1

    # shared-seed shuffle: same permutation on every worker
    a = partition_jobs(jobs, 0, 4, shuffle=True, seed=7)
    b = partition_jobs(jobs, 0, 4, shuffle=True, seed=7)
    assert a == b
    shuffled = [partition_jobs(jobs, i, 4, shuffle=True, seed=7)
                for i in range(4)]
    assert sorted(sum(shuffled, [])) == jobs


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from xfr_tpu.models.checkpoint import load_params, save_params
    from xfr_tpu.models.common import init_params
    from xfr_tpu.graph import GraphBuilder

    g = GraphBuilder("t")
    x = g.conv2d(0, 3, 4, 3, padding=1, name="c")
    x = g.linear(g.flatten(x), 4 * 8 * 8, 5, name="fc")
    params = init_params(g.param_shapes, seed=0)

    path = save_params(params, str(tmp_path / "ckpt"))
    restored = load_params(path)
    for pname, p in params.items():
        for k, v in p.items():
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(restored[pname][k]))


def test_strface_shim():
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.strface import encode_centercrop

    wb = make_toy_wbnet()
    img = (np.random.RandomState(0).rand(224, 224, 3) * 255).astype(np.uint8)
    e = encode_centercrop(wb, img)
    assert e.shape == (12,)
    assert np.isfinite(e).all()


def test_timer_and_profiling():
    from xfr_tpu.utils.profiling import Timer

    t = Timer()
    with t.time("a"):
        pass
    with t.time("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()
