"""cache_npz / cache_npz_launch semantics (reference: utils.py:204-263)."""

import numpy as np

from xfr_tpu.utils import cache_npz, cache_npz_launch


def test_cache_npz_launch_roundtrip(tmp_path):
    calls = {"launch": 0, "finish": 0}

    def launch():
        calls["launch"] += 1

        def finish():
            calls["finish"] += 1
            return (np.array([True, False]), np.array([1.0, 2.0]),
                    np.array([3.0, 4.0]))

        return finish

    sd = {"thr": np.arange(3)}
    fin = cache_npz_launch("unit", launch, cache_dir=str(tmp_path),
                           save_dict_=sd)
    # miss: launch ran eagerly, the cache write happens at finish time
    assert calls == {"launch": 1, "finish": 0}
    cls, pg, pr = fin()
    assert calls == {"launch": 1, "finish": 1}

    # hit: value comes back without launching
    fin2 = cache_npz_launch("unit", launch, cache_dir=str(tmp_path),
                            save_dict_=sd)
    cls2, pg2, pr2 = fin2()
    assert calls == {"launch": 1, "finish": 1}
    np.testing.assert_array_equal(cls2, cls)
    np.testing.assert_array_equal(pg2, pg)
    np.testing.assert_array_equal(pr2, pr)

    # the sync variant reads the same cache file
    got = cache_npz("unit", lambda: (_ for _ in ()).throw(AssertionError),
                    cache_dir=str(tmp_path), save_dict_=sd)
    np.testing.assert_array_equal(np.asarray(got)[1], pg)

    # stale save_dict invalidates: launch runs again
    fin3 = cache_npz_launch("unit", launch, cache_dir=str(tmp_path),
                            save_dict_={"thr": np.arange(4)})
    assert calls["launch"] == 2
    fin3()
    assert calls["finish"] == 2

    # reprocess_ forces a re-launch even with matching inputs
    cache_npz_launch("unit", launch, cache_dir=str(tmp_path),
                     reprocess_=True,
                     save_dict_={"thr": np.arange(4)})()
    assert calls == {"launch": 3, "finish": 3}


def test_corrupt_cache_recomputes(tmp_path):
    """A run killed mid np.savez leaves a truncated/garbage npz; a
    resumable cache must treat it as a miss and recompute, not crash
    every subsequent resume (zipfile.BadZipFile / EOFError are not
    IOError subclasses)."""
    import os

    calls = {"n": 0}

    def fun():
        calls["n"] += 1
        return np.arange(3)

    fpath = os.path.join(str(tmp_path), "unit.npz")
    for garbage in (b"", b"not a zip file at all"):
        with open(fpath, "wb") as f:
            f.write(garbage)
        got = cache_npz("unit", fun, cache_dir=str(tmp_path))
        np.testing.assert_array_equal(got, np.arange(3))
    assert calls["n"] == 2  # each corrupt file recomputed once
    # and the rewritten cache now hits
    cache_npz("unit", fun, cache_dir=str(tmp_path))
    assert calls["n"] == 2


def test_barrier_rejects_stale_markers(tmp_path):
    """barrier_via_files: same-tag reuse within a run is generation-
    namespaced; a marker left by a previous run raises instead of
    silently satisfying the barrier."""
    import pytest

    from xfr_tpu.parallel.distributed import _BARRIER_GEN, barrier_via_files

    _BARRIER_GEN.clear()
    barrier_via_files(str(tmp_path), "sync", timeout_s=5)
    barrier_via_files(str(tmp_path), "sync", timeout_s=5)  # gen 2: fine
    _BARRIER_GEN.clear()  # simulate a fresh run against the same dir
    with pytest.raises(RuntimeError, match="stale barrier marker"):
        barrier_via_files(str(tmp_path), "sync", timeout_s=5)


def test_mask_grid_capacity_guard():
    """Asking for more mask elements than the clipped prior grid can
    supply must fail at trace time (the reference's np.random.choice
    raises; the zero-sync device sampler would silently pick
    zero-probability cells)."""
    import pytest

    from xfr_tpu.blackbox import masks as M

    # 224/28 -> 8x8 grid, 50%-clip keeps ~32 cells
    M.check_grid_capacity((224, 224), 28, 32)
    with pytest.raises(ValueError, match="num_mask_elements"):
        M.check_grid_capacity((224, 224), 28, 33)
    M.check_grid_capacity((224, 224), 28, 64, pct=0.0)  # uniform prior


def test_resize_early_return_scale():
    """Same-shape resize must apply the same preserve_range normalization
    as the resized path (a 255x output-scale inconsistency otherwise)."""
    from xfr_tpu.utils.image import resize

    img = np.full((8, 8), 128, np.uint8)
    same = resize(img, (8, 8), preserve_range=False)
    scaled = resize(img, (4, 4), preserve_range=False)
    assert abs(float(same.max()) - 128 / 255.0) < 1e-6
    assert abs(float(scaled.max()) - 128 / 255.0) < 1e-6
    # preserve_range (the default) keeps raw values on both paths
    assert float(resize(img, (8, 8)).max()) == 128.0
