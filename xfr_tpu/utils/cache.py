"""Content-checked npz result cache (reference: python/xfr/utils.py:204-263).

The analysis passes of the inpainting game are resumable because every
expensive per-(net, subject, mask, probe, method) result is cached under a
parameter-slug filename with its defining inputs stored alongside — a cache
hit is only honored when the stored inputs match.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def cache_npz(fn, fun, cache_dir, *args, **kwargs):
    """Memoize ``fun(*args, **kwargs)`` into ``cache_dir/fn.npz``.

    kwargs:
      reprocess_: force recomputation.
      save_dict_: dict of arrays saved with (and validated against) the cache.
    """
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    fn = fn.replace("/", "_")
    fpath = os.path.join(cache_dir, fn + ".npz")
    try:
        if kwargs.get("reprocess_"):
            raise IOError  # force reprocessing
        npdata = np.load(fpath, allow_pickle=True)
        if "save_dict_" in kwargs:
            for key, val in kwargs["save_dict_"].items():
                if not np.array_equal(npdata[key], val):
                    raise IOError  # stale cache: inputs changed
        return npdata["arr_0"]
    except (IOError, KeyError, FileNotFoundError):
        kwargs.pop("reprocess_", None)
        save_dict = dict(kwargs.pop("save_dict_", {}))
        ret = fun(*args, **kwargs)
        # Ragged tuple results (e.g. (iou, fp, neg, tp, pos)) must be stored
        # as object arrays, like legacy numpy did implicitly.  Convert BEFORE
        # np.savez — a save that raises mid-write leaves a corrupt zip.
        try:
            save_dict["arr_0"] = np.asanyarray(ret)
        except ValueError:
            arr = np.empty(len(ret), dtype=object)
            for i, v in enumerate(ret):
                arr[i] = v
            save_dict["arr_0"] = arr
        np.savez(fpath, **save_dict)
        return ret
