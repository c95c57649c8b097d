"""Maxpool 3x3/s2 formulation A/B: the stem pool costs ~0.95 ms/chunk of
the ~11 ms encode chunk (tools/_encode_anatomy.py), ~8x above a VPU
floor.  max is associative, so a separable (1x3 then 3x1) decomposition
and a 9-slice elementwise-max are EXACTLY equal (same tie-free values).

Run on the TPU chip: python tools/_pool_ab.py
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import xfr_tpu  # noqa: F401

NEG = np.float32(-np.inf)


def timed(f, args, n=5):
    r = f(*args)
    jax.tree.map(np.asarray, r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
        jax.tree.map(np.asarray, r)
    return (time.time() - t0) / n


def pool_ref(y):
    return jax.lax.reduce_window(
        y, NEG, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)])


def pool_sep(y):
    r = jax.lax.reduce_window(
        y, NEG, jax.lax.max, (1, 1, 1, 3), (1, 1, 1, 2),
        [(0, 0), (0, 0), (0, 0), (1, 1)])
    return jax.lax.reduce_window(
        r, NEG, jax.lax.max, (1, 1, 3, 1), (1, 1, 2, 1),
        [(0, 0), (0, 0), (1, 1), (0, 0)])


def pool_slices(y):
    B, C, H, W = y.shape
    yp = jnp.pad(y, [(0, 0), (0, 0), (1, 2), (1, 2)],
                 constant_values=NEG)
    out = None
    for u in range(3):
        for v in range(3):
            s = jax.lax.slice(yp, (0, 0, u, v),
                              (B, C, u + H + 1, v + W + 1), (1, 1, 2, 2))
            out = s if out is None else jnp.maximum(out, s)
    return out


def pool_sep_slices(y):
    B, C, H, W = y.shape
    yp = jnp.pad(y, [(0, 0), (0, 0), (0, 0), (1, 2)],
                 constant_values=NEG)
    r = None
    for v in range(3):
        s = jax.lax.slice(yp, (0, 0, 0, v), (B, C, H, v + W + 1),
                          (1, 1, 1, 2))
        r = s if r is None else jnp.maximum(r, s)
    rp = jnp.pad(r, [(0, 0), (0, 0), (1, 2), (0, 0)],
                 constant_values=NEG)
    out = None
    for u in range(3):
        s = jax.lax.slice(rp, (0, 0, u, 0),
                          (B, C, u + H + 1, rp.shape[3]), (1, 1, 2, 1))
        out = s if out is None else jnp.maximum(out, s)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--nchunk", type=int, default=24)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    bs, nc, it = args.bs, args.nchunk, args.iters

    rng = np.random.RandomState(0)
    ys = jnp.asarray(rng.rand(nc, bs, 64, 112, 112).astype(np.float32))

    variants = [("reduce_window 3x3 (baseline)", pool_ref),
                ("separable 1x3+3x1", pool_sep),
                ("9-slice max", pool_slices),
                ("separable slices 3+3", pool_sep_slices)]

    ref = np.asarray(jax.jit(pool_ref)(ys[0]))
    for name, f in variants[1:]:
        out = np.asarray(jax.jit(f)(ys[0]))
        print("%-30s exact-equal: %s" % (name, bool((out == ref).all())),
              flush=True)

    # null: scan + input read floor
    def null_fn(ys):
        def body(c, y):
            return c, y.sum()
        _, s = jax.lax.scan(body, 0, ys)
        return s

    floor = timed(jax.jit(null_fn), (ys,), it) / nc * 1e3
    print("\nscanned whole-program (ms/chunk, [%d,64,112,112] f32):" % bs)
    print("  %-30s %8.3f ms" % ("(null: scan+read)", floor))
    for name, f in variants:
        def fn(ys, f=f):
            def body(c, y):
                return c, f(y).sum()
            _, s = jax.lax.scan(body, 0, ys)
            return s
        dt = timed(jax.jit(fn), (ys,), it) / nc * 1e3
        print("  %-30s %8.3f ms  (pool %6.3f)" % (name, dt, dt - floor),
              flush=True)


if __name__ == "__main__":
    main()
