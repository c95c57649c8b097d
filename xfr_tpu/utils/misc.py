"""Small utilities ported from the reference grab-bag
(reference: python/xfr/utils.py:265-540)."""

from __future__ import annotations

import os
import shutil

import numpy as np


def set_default_print_env(var, default=None):
    """Set-and-echo an environment variable (utils.py:265-274)."""
    if default is not None and var not in os.environ:
        os.environ[var] = default
    if var in os.environ:
        print("%s=%s" % (var, os.environ[var]))
        return os.environ[var]
    print("%s=<not set>" % var)
    return None


def copy_files(paths, output_dir):
    """Copy files into a run directory with path-encoding names
    (utils.py:501-513)."""
    for path in paths:
        assert len(path) > 1, ("Make sure you pass a list of paths and not "
                               "a single string!")
        path = os.path.abspath(path)
        shutil.copy2(path, os.path.join(output_dir,
                                        path.replace("/", "%")))


def denormalize(x, std, mean):
    """Invert normalization and clamp to [0,1] (utils.py:357-360)."""
    return np.clip(np.asarray(x) * std + mean, 0.0, 1.0)


def init_random_seed(manual_seed=None):
    """Seed host RNGs; returns the seed.  JAX randomness is functional
    (explicit PRNG keys), so only numpy/python state is global
    (utils.py:371-382)."""
    import random

    seed = manual_seed if manual_seed is not None else \
        random.randint(1, 10000)
    print("use random seed: {}".format(seed))
    random.seed(seed)
    np.random.seed(seed)
    return seed


def visible_devices():
    """The JAX replacement for normalize_gpus/CUDA_VISIBLE_DEVICES
    bookkeeping (utils.py:515-540): placement is owned by JAX; this just
    reports the device list."""
    import jax

    return list(jax.devices())
