"""Decompose make_masks (~241 ms/map of device time at 6528 masks — the
second-largest BB stage after the scan scorer) and A/B crop formulations.

Stages (each timed as its own jit, fetch-forced):
  (a) prior_to_grid + Gumbel-top-k sampling -> [n,gh,gw] grids
  (b) resize [n,19,19] -> [n,236,236]
  (c) crop: vmapped dynamic_slice (current) vs take_along_axis rows+cols
  (d) fused upsample+crop: vmapped scale_and_translate (no 236^2
      intermediate) -- numerics vs (b)+(c) printed (max abs diff)

Run on the TPU chip: python tools/_mask_gen_ab.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import xfr_tpu  # noqa: F401
from xfr_tpu.blackbox import masks as M

N = 6528
SCALE = 12
H = W = 224


def timed(f, args, n=10, label=""):
    r = f(*args)
    jax.tree.map(np.asarray, r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
        # tiny forced fetch (block_until_ready returns immediately on
        # axon's async queue)
        np.asarray(jax.tree.leaves(r)[0].reshape(-1)[:1])
    dt = (time.time() - t0) / n
    print("%-52s %8.1f ms" % (label, dt * 1e3), flush=True)
    return r


def main():
    rng = np.random.RandomState(0)
    prior = rng.rand(H, W).astype(np.float32)
    prior /= prior.sum()
    key = jax.random.PRNGKey(0)

    # full pipeline (current)
    full = lambda key, prior: M.make_masks(key, prior, N, SCALE, 2,
                                           "mean_ebp", True)
    timed(full, (key, jnp.asarray(prior)), label="make_masks FULL (current)")

    # (a) sampling only
    @jax.jit
    def sample(key, prior):
        kg, ks = jax.random.split(key)
        gp = M.prior_to_grid(prior, SCALE, "mean_ebp")
        return M.sample_sparse_grids(kg, gp, N, 2), ks

    grids, ks = timed(sample, (key, jnp.asarray(prior)),
                      label="(a) prior+gumbel-top-k sampling")
    grids = jax.block_until_ready(grids)
    gh, gw = grids.shape[1:]
    hh, ww = H + SCALE, W + SCALE
    shifts = jax.block_until_ready(
        jax.random.randint(ks, (N, 2), 0, SCALE))

    # (b) resize only
    @jax.jit
    def up(grids):
        return M.resize_bilinear(grids, (hh, ww))

    big = timed(up, (grids,), label="(b) resize [n,%d,%d]->[n,%d,%d]" % (
        gh, gw, hh, ww))
    big = jax.block_until_ready(big)

    # (c1) crop via vmapped dynamic_slice (current)
    @jax.jit
    def crop_ds(big, shifts):
        def crop(m, s):
            return jax.lax.dynamic_slice(m, (s[0], s[1]), (H, W))
        return jax.vmap(crop)(big, shifts)

    out_ds = timed(crop_ds, (big, shifts),
                   label="(c1) crop: vmapped dynamic_slice (current)")

    # (c2) crop via take_along_axis rows then cols
    @jax.jit
    def crop_ta(big, shifts):
        rows = shifts[:, 0:1] + jnp.arange(H, dtype=shifts.dtype)[None]
        cols = shifts[:, 1:2] + jnp.arange(W, dtype=shifts.dtype)[None]
        g = jnp.take_along_axis(big, rows[:, :, None], axis=1)
        return jnp.take_along_axis(g, cols[:, None, :], axis=2)

    out_ta = timed(crop_ta, (big, shifts),
                   label="(c2) crop: take_along_axis rows+cols")
    print("   c2 vs c1 max|diff| = %.3g" % float(
        jnp.max(jnp.abs(out_ta - out_ds))))

    # (c3) crop via onehot matmuls (rowsel @ big @ colsel per mask)
    @jax.jit
    def crop_mm(big, shifts):
        rows = shifts[:, 0:1] + jnp.arange(H, dtype=shifts.dtype)[None]
        cols = shifts[:, 1:2] + jnp.arange(W, dtype=shifts.dtype)[None]
        rsel = jax.nn.one_hot(rows, hh, dtype=big.dtype)  # [n,H,hh]
        csel = jax.nn.one_hot(cols, ww, dtype=big.dtype)  # [n,W,ww]
        return jnp.einsum("nrh,nhw,ncw->nrc", rsel, big, csel)

    out_mm = timed(crop_mm, (big, shifts),
                   label="(c3) crop: one-hot matmul select")
    print("   c3 vs c1 max|diff| = %.3g" % float(
        jnp.max(jnp.abs(out_mm - out_ds))))

    # (d) fused upsample+crop: per-mask interpolation weight matrices.
    # resize linear [gh]->[hh] samples source coord (j+0.5)*gh/hh - 0.5
    # for output j; the crop takes j+s, so sample coords shift by s.
    # Build [H,gh] row weights and [W,gw] col weights PER MASK (tiny),
    # contract grids with both (einsum -> batched matmuls, no 236^2
    # intermediate, no gather).
    def wmat(out_px, src_px, full_px, shift):
        # linear-interp weights for output pixels 0..out_px-1 of the
        # SHIFTED crop window out of a virtual [full_px] upsample
        j = jnp.arange(out_px, dtype=jnp.float32) + shift.astype(
            jnp.float32)
        c = (j + 0.5) * (src_px / full_px) - 0.5
        c = jnp.clip(c, 0.0, src_px - 1.0)
        lo = jnp.clip(jnp.floor(c), 0, src_px - 1)
        frac = c - lo
        lo = lo.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, src_px - 1)
        onehot_lo = jax.nn.one_hot(lo, src_px, dtype=jnp.float32)
        onehot_hi = jax.nn.one_hot(hi, src_px, dtype=jnp.float32)
        return onehot_lo * (1 - frac)[:, None] + onehot_hi * frac[:, None]

    @jax.jit
    def up_crop_fused(grids, shifts):
        def one(g, s):
            wr = wmat(H, gh, hh, s[0])  # [H,gh]
            wc = wmat(W, gw, ww, s[1])  # [W,gw]
            return wr @ g @ wc.T

        return jax.vmap(one)(grids, shifts)

    out_f = timed(up_crop_fused, (grids, shifts),
                  label="(d) fused upsample+crop (weight matmuls)")
    print("   d  vs c1 max|diff| = %.3g" % float(
        jnp.max(jnp.abs(out_f - out_ds))))




def ab_full():
    """Whole-program interleaved A/B of full make_masks variants (the
    per-stage timings above are dispatch/window-noise dominated on axon;
    only whole programs interleaved in one session are trustworthy)."""
    from functools import partial

    rng = np.random.RandomState(0)
    prior = jnp.asarray((rng.rand(H, W) / (H * W)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    cur = lambda key, prior: M.make_masks(key, prior, N, SCALE, 2,
                                          "mean_ebp", True)

    @partial(jax.jit, static_argnums=())
    def ta(key, prior):
        kg2, ks2 = jax.random.split(key)
        gp = M.prior_to_grid(prior, SCALE, "mean_ebp")
        grids = M.sample_sparse_grids(kg2, gp, N, 2)
        hh, ww = H + SCALE, W + SCALE
        big = M.resize_bilinear(grids, (hh, ww))
        shifts = jax.random.randint(ks2, (N, 2), 0, SCALE)
        rows = shifts[:, 0:1] + jnp.arange(H, dtype=shifts.dtype)[None]
        cols = shifts[:, 1:2] + jnp.arange(W, dtype=shifts.dtype)[None]
        g = jnp.take_along_axis(big, rows[:, :, None], axis=1)
        return jnp.take_along_axis(g, cols[:, None, :], axis=2)

    @partial(jax.jit, static_argnums=())
    def fused(key, prior):
        kg2, ks2 = jax.random.split(key)
        gp = M.prior_to_grid(prior, SCALE, "mean_ebp")
        grids = M.sample_sparse_grids(kg2, gp, N, 2)
        gh, gw = grids.shape[1:]
        hh, ww = H + SCALE, W + SCALE
        shifts = jax.random.randint(ks2, (N, 2), 0, SCALE)

        def wmat(out_px, src_px, full_px, shift):
            j = jnp.arange(out_px, dtype=jnp.float32) + shift.astype(
                jnp.float32)
            c = (j + 0.5) * (src_px / full_px) - 0.5
            c = jnp.clip(c, 0.0, src_px - 1.0)
            lo = jnp.clip(jnp.floor(c), 0, src_px - 1)
            frac = c - lo
            lo = lo.astype(jnp.int32)
            hi = jnp.minimum(lo + 1, src_px - 1)
            return (jax.nn.one_hot(lo, src_px, dtype=jnp.float32)
                    * (1 - frac)[:, None]
                    + jax.nn.one_hot(hi, src_px, dtype=jnp.float32)
                    * frac[:, None])

        def one(g, s):
            return wmat(H, gh, hh, s[0]) @ g @ wmat(W, gw, ww, s[1]).T

        return jax.vmap(one)(grids, shifts)

    variants = [("current (vmap dynamic_slice crop)", cur),
                ("take_along_axis crop (bit-exact)", ta),
                ("fused weight-matmul (no 236^2)", fused)]
    outs = {}
    for name, f in variants:  # compile + warm
        outs[name] = f(key, prior)
        np.asarray(jax.tree.leaves(outs[name])[0].reshape(-1)[:1])
    for name, f in variants[1:]:
        print("  %s vs current max|diff| = %.3g" % (
            name, float(jnp.max(jnp.abs(outs[name]
                                        - outs[variants[0][0]])))))
    del outs
    rounds = 6
    tm = {name: [] for name, _ in variants}
    for _ in range(rounds):
        for name, f in variants:
            t0 = time.time()
            r = f(key, prior)
            np.asarray(r.reshape(-1)[:1])
            tm[name].append(time.time() - t0)
    for name, _ in variants:
        t = np.array(tm[name]) * 1e3
        print("%-44s median %7.1f ms  (min %6.1f max %6.1f)" % (
            name, np.median(t), t.min(), t.max()), flush=True)


if __name__ == "__main__":
    import sys
    if "--ab-full" in sys.argv:
        ab_full()
    else:
        main()
