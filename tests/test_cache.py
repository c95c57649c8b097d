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
