"""Stem-conv formulation sweep: conv1 7x7/s2 on [bs,3,224,224] is ~29%
of the ResNet-101 encode wall at ~2% MXU (tools/_encode_anatomy.py).
Whole-program scanned A/B of candidate formulations, each checked for
numerical equality vs the reference stem at highest precision.

Run on the TPU chip: python tools/_stem_ab.py
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import xfr_tpu  # noqa: F401
from xfr_tpu.models import create_wbnet


def timed(f, args, n=5):
    r = f(*args)
    jax.tree.map(np.asarray, r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
        jax.tree.map(np.asarray, r)
    return (time.time() - t0) / n


def s2d_weights(w7n):
    """W2[o, c*4+rr*2+rc, q, s] = W7[o, c, 2q+rr-1, 2s+rc-1]."""
    co = w7n.shape[0]
    w2 = np.zeros((co, 12, 4, 4), np.float32)
    for rr in range(2):
        for rc in range(2):
            for q in range(4):
                u = 2 * q + rr - 1
                if not (0 <= u <= 6):
                    continue
                for s in range(4):
                    v = 2 * s + rc - 1
                    if not (0 <= v <= 6):
                        continue
                    for c in range(3):
                        w2[:, c * 4 + rr * 2 + rc, q, s] = w7n[:, c, u, v]
    return w2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--nchunk", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    bs, nc, it = args.bs, args.nchunk, args.iters

    wb = create_wbnet("resnetv6_pytorch", ebp_version=6)
    w7 = wb.net.params["conv1"]["w"]
    w7n = np.asarray(w7, np.float32)
    w2 = jnp.asarray(s2d_weights(w7n))

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.rand(nc, bs, 3, 224, 224).astype(np.float32) * 2
                     - 1)

    def conv_ref(x):
        return jax.lax.conv_general_dilated(
            x, w7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    def s2d_nchw(x):
        B = x.shape[0]
        xb = x.reshape(B, 3, 112, 2, 112, 2).transpose(
            0, 1, 3, 5, 2, 4).reshape(B, 12, 112, 112)
        return jax.lax.conv_general_dilated(
            xb, w2, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    w2_hwio = jnp.transpose(w2, (2, 3, 1, 0))  # [4,4,12,64]

    def s2d_nhwc(x):
        B = x.shape[0]
        # -> NHWC block layout [B,112,112,12], channel = c*4+rr*2+rc
        xb = x.reshape(B, 3, 112, 2, 112, 2).transpose(
            0, 2, 4, 1, 3, 5).reshape(B, 112, 112, 12)
        y = jax.lax.conv_general_dilated(
            xb, w2_hwio, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.transpose(y, (0, 3, 1, 2))

    # im2col matmul: patches [B,112,112,147] @ [147,64]
    wmat = jnp.asarray(
        w7n.reshape(64, -1).T)  # [cin*kh*kw=147, 64] (OIHW flatten)

    def im2col(x):
        B = x.shape[0]
        p = jax.lax.conv_general_dilated_patches(
            x, (7, 7), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))  # [B,147,112,112]
        p = jnp.transpose(p, (0, 2, 3, 1))
        y = jnp.dot(p, wmat)  # [B,112,112,64]
        return jnp.transpose(y, (0, 3, 1, 2))

    # s2d + im2col: patches are 4x4x12=192 -> [B,112,112,192] @ [192,64]
    w2mat = jnp.asarray(np.asarray(w2).reshape(64, -1).T)

    def s2d_mm(x):
        B = x.shape[0]
        xb = x.reshape(B, 3, 112, 2, 112, 2).transpose(
            0, 1, 3, 5, 2, 4).reshape(B, 12, 112, 112)
        p = jax.lax.conv_general_dilated_patches(
            xb, (4, 4), (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        p = jnp.transpose(p, (0, 2, 3, 1))
        y = jnp.dot(p, w2mat)
        return jnp.transpose(y, (0, 3, 1, 2))

    variants = [("7x7/s2 NCHW (baseline)", conv_ref),
                ("s2d 4x4/s1 NCHW", s2d_nchw),
                ("s2d 4x4/s1 NHWC", s2d_nhwc),
                ("im2col matmul 147", im2col),
                ("s2d im2col matmul 192", s2d_mm)]

    with jax.default_matmul_precision("highest"):
        ref = np.asarray(jax.jit(conv_ref)(xs[0]))
        for name, f in variants[1:]:
            out = np.asarray(jax.jit(f)(xs[0]))
            err = np.abs(out - ref).max() / np.abs(ref).max()
            print("%-28s rel err %.2e" % (name, err))

    print("\nscanned whole-program (ms/chunk, bs=%d):" % bs)
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
