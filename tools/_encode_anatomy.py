"""Per-depth anatomy of the ResNet-101 encode — the proven wall of BOTH
the BB scorer and the eval stage (~40% MXU per tools/_bb_roofline.py).

Method: the encode scan's per-chunk cost is decomposed by timing PREFIX
programs of the real graph — jit(forward up to tensor t, return
values[t].sum()) — XLA dead-code-eliminates everything past the cut, so
each timing is the exact production program truncated at that depth.
All timings are whole scanned programs over pre-blended chunks resident
in HBM (per-step varying x; standalone one-chunk timings are pure
dispatch on axon — round-3 ledger).

Then an A/B of the classic TPU stem fix: conv 7x7/s2 on a 3-channel
input runs the MXU at ~147/8-lane occupancy; space-to-depth(2) turns it
into conv 4x4/s1 on 12 channels with rearranged zero-padded weights
(MLPerf ResNet trick) — numerically the same sum, different
association.  If the stem is a significant slice of the encode wall,
this is the lever; if not, the wall is the bottleneck stages and the
40%-MXU figure is the conv stack itself.

Run on the TPU chip: python tools/_encode_anatomy.py
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import xfr_tpu  # noqa: F401  (persistent compilation cache)
from xfr_tpu.models import create_wbnet
from xfr_tpu.ebp import interpreter as I


def timed(f, args, n=5):
    r = f(*args)
    jax.tree.map(np.asarray, r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
        jax.tree.map(np.asarray, r)  # force transfer (axon async queue)
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)   # scorer chunk size
    ap.add_argument("--nchunk", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    bs, nc, it = args.bs, args.nchunk, args.iters

    wb = create_wbnet("resnetv6_pytorch", ebp_version=6)
    graph, params = wb.net.graph, wb.net.params
    enc_t = wb.net.encode_tensor

    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.rand(nc, bs, 3, 224, 224).astype(np.float32) * 2
                     - 1)

    # ---- cut points: stem pieces + each bottleneck-stage boundary -------
    cuts = []
    last_prefix = None
    for node in graph.nodes:
        if node.pname:
            prefix = node.pname.split(".")[0]
            if prefix != last_prefix:
                if last_prefix is not None:
                    cuts.append((last_prefix, prev_out))
                last_prefix = prefix
            prev_out = node.out
    cuts.append((last_prefix, prev_out))
    # insert the maxpool boundary (no pname): first non-pname node after
    # conv1/bn1
    for ni, node in enumerate(graph.nodes):
        if node.op == "maxpool2d":
            cuts.insert(
                [i for i, (nm, _) in enumerate(cuts)
                 if nm.startswith("layer")][0],
                ("maxpool", node.out))
            break
    cuts = [(n, t) for n, t in cuts if not n.startswith("fc")]
    cuts.append(("encode", enc_t))

    def prefix_scan(t):
        def fn(params, xs):
            def body(c, x):
                v = I.forward_clean(graph, params, x)
                return c, v[t].astype(jnp.float32).sum()
            _, s = jax.lax.scan(body, 0, xs)
            return s
        return jax.jit(fn)

    print("prefix-program anatomy (bs=%d, %d chunks, ms per CHUNK):" % (
        bs, nc))
    print("%-12s %10s %10s" % ("cut", "cum ms", "delta ms"))

    # null program: scan + input read + dispatch floor (everything that
    # is NOT model compute); the first cut's delta is vs this.
    def null_fn(params, xs):
        def body(c, x):
            return c, x.sum()
        _, s = jax.lax.scan(body, 0, xs)
        return s

    prev = timed(jax.jit(null_fn), (params, xs), it) / nc * 1e3
    print("%-12s %10.3f %10s" % ("(null)", prev, "-"), flush=True)
    for name, t in cuts:
        dt = timed(prefix_scan(t), (params, xs), it) / nc * 1e3
        print("%-12s %10.3f %10.3f" % (name, dt, dt - prev), flush=True)
        prev = dt

    # ---- space-to-depth stem A/B ----------------------------------------
    # conv1 7x7/s2 pad3 (+bias) + bn1 + relu + maxpool 3x3/s2 pad1, the
    # real stem ops with the real params.
    p1 = params["conv1"]
    w7, b7 = p1["w"], p1.get("b")
    pbn = params["bn1"]

    def bn_relu_pool(y):
        scale = pbn["gamma"] / jnp.sqrt(pbn["var"] + 1e-5)
        y = y * scale[None, :, None, None] + (
            pbn["beta"] - pbn["mean"] * scale)[None, :, None, None]
        y = jnp.maximum(y, 0)
        return jax.lax.reduce_window(
            y, np.float32(-np.inf), jax.lax.max, (1, 1, 3, 3),
            (1, 1, 2, 2), [(0, 0), (0, 0), (1, 1), (1, 1)])

    def stem_ref(x):
        y = jax.lax.conv_general_dilated(
            x, w7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return bn_relu_pool(y + b7[None, :, None, None])

    # rearranged weights: W2[o, c*4+rr*2+rc, q, s] = W7[o, c, 2q+rr-1,
    # 2s+rc-1] (zero where the 7-tap index falls outside 0..6)
    w7n = np.asarray(w7, np.float32)
    w2 = np.zeros((64, 12, 4, 4), np.float32)
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
    w2 = jnp.asarray(w2)

    def stem_s2d(x):
        B = x.shape[0]
        xb = x.reshape(B, 3, 112, 2, 112, 2).transpose(
            0, 1, 3, 5, 2, 4).reshape(B, 12, 112, 112)
        y = jax.lax.conv_general_dilated(
            xb, w2, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return bn_relu_pool(y + b7[None, :, None, None])

    # equality (f32 HIGHEST so the compare isn't swamped by bf16 passes)
    with jax.default_matmul_precision("highest"):
        a = np.asarray(jax.jit(stem_ref)(xs[0]))
        b = np.asarray(jax.jit(stem_s2d)(xs[0]))
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    print("\nstem s2d rel err (highest precision): %.2e" % err)

    def scan_of(stem):
        def fn(xs):
            def body(c, x):
                return c, stem(x).astype(jnp.float32).sum()
            _, s = jax.lax.scan(body, 0, xs)
            return s
        return jax.jit(fn)

    dt_ref = timed(scan_of(stem_ref), (xs,), it) / nc * 1e3
    dt_s2d = timed(scan_of(stem_s2d), (xs,), it) / nc * 1e3
    print("stem-only scan:  7x7/s2 %.3f ms/chunk   s2d 4x4/s1 %.3f "
          "ms/chunk  (%.2fx)" % (dt_ref, dt_s2d, dt_ref / max(dt_s2d,
                                                              1e-9)))


if __name__ == "__main__":
    main()
