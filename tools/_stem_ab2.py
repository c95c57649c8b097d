"""Stem A/B round 2: the full stem (conv1 + bn + relu + maxpool) per
formulation, each kept in its natural layout end-to-end and transposed
to NCHW only at the 56x56 boundary (the 112x112 transpose is 205 MB).
Numerics checked vs the reference stem at highest precision.

Run on the TPU chip: python tools/_stem_ab2.py
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import xfr_tpu  # noqa: F401
from xfr_tpu.models import create_wbnet

try:
    from tools._stem_ab import s2d_weights
except ImportError:  # run as python tools/_stem_ab2.py
    from _stem_ab import s2d_weights


def timed(f, args, n=5):
    r = f(*args)
    jax.tree.map(np.asarray, r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
        jax.tree.map(np.asarray, r)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--nchunk", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    bs, nc, it = args.bs, args.nchunk, args.iters

    wb = create_wbnet("resnetv6_pytorch", ebp_version=6)
    params = wb.net.params
    w7, b7 = params["conv1"]["w"], params["conv1"]["b"]
    pbn = params["bn1"]
    w7n = np.asarray(w7, np.float32)
    w2 = jnp.asarray(s2d_weights(w7n))
    w2_hwio = jnp.transpose(w2, (2, 3, 1, 0))
    w7_hwio = jnp.transpose(w7, (2, 3, 1, 0))

    scale = pbn["gamma"] / jnp.sqrt(pbn["var"] + 1e-5)
    shift = pbn["beta"] - pbn["mean"] * scale
    scale_b = scale * 1.0
    shift_b = shift + b7 * scale  # fold conv bias through bn

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.rand(nc, bs, 3, 224, 224).astype(np.float32) * 2
                     - 1)
    NEG = np.float32(-np.inf)

    def pool_nchw(y):
        return jax.lax.reduce_window(
            y, NEG, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
            [(0, 0), (0, 0), (1, 1), (1, 1)])

    def pool_nhwc(y):
        return jax.lax.reduce_window(
            y, NEG, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

    def stem_ref(x):
        y = jax.lax.conv_general_dilated(
            x, w7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = y * scale_b[None, :, None, None] + shift_b[None, :, None, None]
        return pool_nchw(jnp.maximum(y, 0))

    def _to_nhwc_blocks(x):
        B = x.shape[0]
        return x.reshape(B, 3, 112, 2, 112, 2).transpose(
            0, 2, 4, 1, 3, 5).reshape(B, 112, 112, 12)

    def stem_s2d_nhwc(x):
        y = jax.lax.conv_general_dilated(
            _to_nhwc_blocks(x), w2_hwio, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y * scale_b + shift_b, 0)
        return jnp.transpose(pool_nhwc(y), (0, 3, 1, 2))

    def stem_nhwc(x):
        y = jax.lax.conv_general_dilated(
            jnp.transpose(x, (0, 2, 3, 1)), w7_hwio, (2, 2),
            [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y * scale_b + shift_b, 0)
        return jnp.transpose(pool_nhwc(y), (0, 3, 1, 2))

    def stem_s2d_nhwc_bf16(x):
        y = jax.lax.conv_general_dilated(
            _to_nhwc_blocks(x).astype(jnp.bfloat16),
            w2_hwio.astype(jnp.bfloat16), (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y * scale_b + shift_b, 0)
        return jnp.transpose(pool_nhwc(y), (0, 3, 1, 2))

    # strided-slice im2col: [147, M] X [147->64] without patch padding
    taps = []
    xpad_spec = [(0, 0), (0, 0), (3, 4), (3, 4)]  # 224+7 -> strided ok

    def stem_slice_mm(x):
        B = x.shape[0]
        xp = jnp.pad(x, xpad_spec)
        cols = []
        for u in range(7):
            for v in range(7):
                cols.append(jax.lax.slice(
                    xp, (0, 0, u, v), (B, 3, u + 223, v + 223),
                    (1, 1, 2, 2)))  # [B,3,112,112]
        p = jnp.stack(cols, 1).reshape(B, 49 * 3, 112, 112)
        # weight order must match stack order: tap-major, channel-minor
        wmat = jnp.transpose(w7, (2, 3, 1, 0)).reshape(147, 64)
        y = jax.lax.dot_general(
            p.reshape(B, 147, 112 * 112), wmat,
            (((1,), (0,)), ((), ())))  # [B, 112*112, 64]
        y = jnp.maximum(y.reshape(B, 112, 112, 64) * scale_b + shift_b, 0)
        return jnp.transpose(pool_nhwc(y), (0, 3, 1, 2))

    variants = [("ref NCHW conv+bn+relu+pool", stem_ref),
                ("s2d NHWC end-to-end", stem_s2d_nhwc),
                ("NHWC end-to-end", stem_nhwc),
                ("s2d NHWC bf16 conv", stem_s2d_nhwc_bf16),
                ("slice-im2col dot", stem_slice_mm)]

    with jax.default_matmul_precision("highest"):
        ref = np.asarray(jax.jit(stem_ref)(xs[0]))
        for name, f in variants[1:]:
            if "bf16" in name:
                continue
            out = np.asarray(jax.jit(f)(xs[0]))
            err = np.abs(out - ref).max() / np.abs(ref).max()
            print("%-28s rel err %.2e" % (name, err), flush=True)
    out = np.asarray(jax.jit(stem_s2d_nhwc_bf16)(xs[0]))
    err = np.abs(out - ref).max() / np.abs(ref).max()
    print("%-28s rel err %.2e (bf16: expected ~1e-2)" % (
        "s2d NHWC bf16 conv", err), flush=True)

    print("\nscanned whole-program full stem (ms/chunk, bs=%d):" % bs)
    for name, f in variants:
        def fn(xs, f=f):
            def body(c, x):
                return c, f(x).astype(jnp.float32).sum()
            _, s = jax.lax.scan(body, 0, xs)
            return s
        dt = timed(jax.jit(fn), (xs,), it) / nc * 1e3
        print("  %-28s %8.3f ms" % (name, dt), flush=True)


if __name__ == "__main__":
    main()
