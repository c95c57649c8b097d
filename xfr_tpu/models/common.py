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


def init_params_device(param_shapes, seed=0, dtype=jnp.float32, scale=None):
    """init_params generated ON DEVICE as one jitted program.

    The numpy variant materializes ~280 MB on host and uploads it — on a
    slow device link (axon tunnel ~30 MB/s) that alone costs ~20 s of
    every fresh CLI process.  Same distribution family (He-style conv,
    identity-ish BN), deterministic in ``seed`` via the JAX PRNG (values
    differ from the numpy variant)."""
    import jax

    names = sorted(param_shapes)

    def build():
        key = jax.random.PRNGKey(seed)
        params = {}
        for i, pname in enumerate(names):
            shapes = param_shapes[pname]
            p = {}
            for j, (k, shp) in enumerate(sorted(shapes.items())):
                kk = jax.random.fold_in(jax.random.fold_in(key, i), j)
                if k == "w":
                    fan_out = shp[0] * (np.prod(shp[2:])
                                        if len(shp) > 2 else 1)
                    # Python float: a np.float64 scalar is not weakly
                    # typed and would promote the whole tree to f64
                    # under jax_enable_x64
                    std = float(scale or np.sqrt(2.0 / fan_out))
                    p[k] = jax.random.normal(kk, shp, dtype) * std
                elif k == "b":
                    p[k] = jax.random.normal(kk, shp, dtype) * 0.01
                elif k == "gamma":
                    p[k] = 1.0 + 0.1 * jax.random.normal(kk, shp, dtype)
                elif k == "beta":
                    p[k] = 0.05 * jax.random.normal(kk, shp, dtype)
                elif k == "mean":
                    p[k] = 0.05 * jax.random.normal(kk, shp, dtype)
                elif k == "var":
                    p[k] = 0.5 + 0.5 * jax.random.uniform(kk, shp, dtype)
                else:
                    raise KeyError(k)
            params[pname] = p
        return params

    return jax.jit(build)()


def cast_params(params, dtype):
    return {k: {kk: jnp.asarray(vv, dtype) for kk, vv in v.items()}
            for k, v in params.items()}
