"""Shared model-zoo helpers: parameter initialization and shape utilities."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def init_params(param_shapes, seed=0, dtype=jnp.float32, scale=None):
    """Random parameters for a GraphBuilder's param_shapes template.

    Used for benchmarks and tests when the original torch checkpoints (git-lfs
    blobs, not vendored) are unavailable.  Conv/linear weights get He-style
    init like the reference (resnet.py:191-198); BN is identity-ish with
    small perturbations so EBP denominators stay well-conditioned.
    """
    rng = np.random.RandomState(seed)
    params = {}
    for pname, shapes in param_shapes.items():
        p = {}
        for key, shp in shapes.items():
            if key == "w":
                fan_out = shp[0] * (np.prod(shp[2:]) if len(shp) > 2 else 1)
                std = scale or np.sqrt(2.0 / fan_out)
                p[key] = jnp.asarray(rng.randn(*shp) * std, dtype)
            elif key == "b":
                p[key] = jnp.asarray(rng.randn(*shp) * 0.01, dtype)
            elif key == "gamma":
                p[key] = jnp.asarray(1.0 + 0.1 * rng.randn(*shp), dtype)
            elif key == "beta":
                p[key] = jnp.asarray(0.05 * rng.randn(*shp), dtype)
            elif key == "mean":
                p[key] = jnp.asarray(0.05 * rng.randn(*shp), dtype)
            elif key == "var":
                p[key] = jnp.asarray(0.5 + 0.5 * rng.rand(*shp), dtype)
            else:
                raise KeyError(key)
        params[pname] = p
    return params


def cast_params(params, dtype):
    return {k: {kk: jnp.asarray(vv, dtype) for kk, vv in v.items()}
            for k, v in params.items()}
