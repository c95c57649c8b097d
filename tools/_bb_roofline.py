"""Roofline accounting for the blackbox STRise map (round-3 verdict #2).

The BB claim "1.115 s / 6,500-mask map = the scan-program bound" was
asserted, not decomposed.  This tool decomposes the map the way
_wsebp_roofline.py decomposed the wsebp sweep: XLA cost_analysis
(flops / bytes) + measured wall per stage on the chip, plus ablations of
the scan scorer itself:

  - full scan scorer (blend + preprocess + encode + similarity)
  - encode-only scan (pre-blended inputs): isolates the blend+preprocess
  - blend+preprocess-only scan (no encode): the HBM-side of the step
  - per-chunk batch-size sweep at fixed total masks
  - prior / mask-sampling / fill / select+combine stage programs

v5e peaks: 197 TFLOP/s bf16, 819 GB/s HBM.

Run on the TPU chip: python tools/_bb_roofline.py [--num-masks 6528]
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import xfr_tpu  # noqa: F401  (persistent compilation cache)
from xfr_tpu.models import create_wbnet
from xfr_tpu.blackbox import STRise
from xfr_tpu.blackbox.strise import _encode_and_score
from xfr_tpu.models.resnet101 import preprocess_resnet101_batch

PEAK_BF16 = 197e12
PEAK_HBM = 819e9


def timed(f, args, n=5, fetch=True):
    r = f(*args)
    jax.tree.map(np.asarray, r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
        # force a host transfer: block_until_ready returns immediately
        # on axon's async queue
        jax.tree.map(np.asarray, r)
    return (time.time() - t0) / n


def cost(f, args):
    comp = jax.jit(f).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def row(name, dt, flops, byts):
    fl_r, by_r = flops / dt, byts / dt
    bound = ("HBM %.0f%%" % (100 * by_r / PEAK_HBM)
             if by_r / PEAK_HBM > fl_r / PEAK_BF16
             else "MXU %.0f%%" % (100 * fl_r / PEAK_BF16))
    print("%-40s %9.2f %9.1f %9.2f %8.2f %8.0f %8s" % (
        name, dt * 1e3, flops / 1e9, byts / 1e9, fl_r / 1e12, by_r / 1e9,
        bound), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-masks", type=int, default=6528)  # 102*64
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    wb = create_wbnet("resnetv6_pytorch", ebp_version=6)
    rng = np.random.RandomState(0)
    probe_im = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
    refs = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    gals = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    st = STRise(probe=probe_im, refs=refs, gallery=gals,
                black_box="resnetv6_pytorch",
                net_dict={("resnetv6_pytorch", 6): wb,
                          ("resnetv4_pytorch", None): wb},
                mask_scale=12, num_mask_elements=2, mask_fill_type="blur",
                blur_fill_sigma_percent=4, num_masks=args.num_masks,
                seed=0, prior_type="mean_ebp")
    st.resnet_net = wb

    # stage setup exactly like launch_evaluate
    st.priors[st.prior_type]()
    st.generate_masks()
    st.apply_masks()
    masks = st._masks_dev
    n, bs = st.num_masks, st.batch_size
    pad = (-n) % bs
    if pad:
        masks = jnp.concatenate(
            [masks, jnp.zeros((pad,) + masks.shape[1:], masks.dtype)])
    nchunk = (n + pad) // bs
    probe = jnp.asarray(st.probe, jnp.float32)
    fill = st._fill_dev
    ref_e = jnp.asarray(st._embed_collection_memo(wb, st.refs), jnp.float32)
    gal_e = jnp.asarray(st._embed_collection_memo(wb, st.gallery),
                        jnp.float32)
    graph, enc = wb.net.graph, wb.net.encode_tensor
    params = wb.net.params

    print("num_masks=%d bs=%d nchunk=%d" % (n, bs, nchunk))
    print("%-40s %9s %9s %9s %8s %8s %8s" % (
        "stage", "ms", "GFLOP", "GB", "TFLOP/s", "GB/s", "bound"))

    it = args.iters

    # NB XLA cost_analysis counts a while/scan BODY ONCE (trip count is
    # not folded in), so for scanned programs we report body cost x
    # nchunk.  (The first run of this tool missed that and concluded the
    # scan was "HBM 1%"; corrected it is ~42% MXU.)

    # ---- full map stage programs ----------------------------------------
    # 1) full scan scorer
    scan = st._fused_scorer_scan(nchunk, bs)
    masks_c = masks.reshape(nchunk, bs, *masks.shape[1:])
    a = (params, masks_c, probe, fill, ref_e, gal_e)
    fl, by = cost(lambda *x: scan(*x), a)
    row("scan scorer FULL", timed(scan, a, it), fl * nchunk, by * nchunk)

    # 2) encode-only: (a) ONE standalone chunk (no scan; separates the
    #    encode's own rate from any scan-structure cost), (b) an honest
    #    scan over nchunk PRE-BLENDED chunks resident in HBM (per-step
    #    varying x — a loop-invariant x gets hoisted and times ONE encode)
    def blend_chunk(mchunk):
        return preprocess_resnet101_batch(
            mchunk[..., None] * probe + (1 - mchunk[..., None]) * fill)

    x_pre1 = jax.jit(blend_chunk)(masks_c[0])

    def enc_one(params, x, ref_e, gal_e):
        return _encode_and_score(graph, enc, params, x, ref_e, gal_e)

    f1 = jax.jit(enc_one)
    a1 = (params, x_pre1, ref_e, gal_e)
    fl1, by1 = cost(enc_one, a1)
    dt1 = timed(f1, a1, it)
    row("encode ONE chunk standalone", dt1, fl1, by1)
    print("%-40s %9.2f   (x nchunk: the no-scan encode bound)" % (
        "  -> x %d chunks" % nchunk, dt1 * nchunk * 1e3), flush=True)

    # half the chunks (full 102 x 38 MB pre-blended = 3.9 GB OOMs next to
    # the masks + scan working set); the per-chunk rate is what matters
    nc2 = nchunk // 2
    x_pre = jax.jit(lambda mc: jax.lax.map(blend_chunk, mc))(masks_c[:nc2])
    jax.block_until_ready(x_pre)

    def enc_only(params, xs, ref_e, gal_e):
        def body(c, x):
            return c, _encode_and_score(graph, enc, params, x, ref_e,
                                        gal_e)
        _, (rs, gs) = jax.lax.scan(body, 0, xs)
        return rs.reshape(nc2 * bs, -1), gs.reshape(nc2 * bs, -1)

    f = jax.jit(enc_only)
    a2 = (params, x_pre, ref_e, gal_e)
    fl, by = cost(enc_only, a2)
    row("encode-only scan (%d pre-blended chunks)" % nc2,
        timed(f, a2, it), fl * nc2, by * nc2)
    del x_pre, a2  # ~2 GB

    # 3) blend+preprocess-only scan
    def blend_only(masks_c, probe, fill):
        def body(c, mchunk):
            blends = (mchunk[..., None] * probe +
                      (1.0 - mchunk[..., None]) * fill)
            x = preprocess_resnet101_batch(blends)
            return c, (x.sum(axis=(1, 2, 3)),)  # consume, tiny output
        _, (s,) = jax.lax.scan(body, 0, masks_c)
        return s

    f = jax.jit(blend_only)
    a3 = (masks_c, probe, fill)
    fl, by = cost(blend_only, a3)
    row("blend+preprocess-only scan", timed(f, a3, it), fl * nchunk,
        by * nchunk)

    # 4) prior (pooled EBP + blur + resize), mask sampling, fill,
    #    select+combine
    def prior():
        st.mean_ebp_prior()
        return np.asarray(st.prior)

    t0 = time.time()
    for _ in range(it):
        prior()
    row("mean-EBP prior (stage)", (time.time() - t0) / it, 0, 0)

    t0 = time.time()
    for _ in range(it):
        st.generate_masks()
        np.asarray(st._masks_dev[0, 0, 0])
        st._masks_dev_cache = st._masks_dev  # keep
    row("mask sampling (stage)", (time.time() - t0) / it, 0, 0)

    comb = st._select_combine_fn(n)
    rs, gs = scan(*a)
    pe = wb.encode(jnp.concatenate(
        [preprocess_resnet101_batch(jnp.asarray(st.probe, jnp.float32)[
            None]), jnp.zeros((wb.batch_size - 1, 3, 224, 224))]))[:1]
    flat_ref = ref_e.reshape(len(refs), -1)
    flat_gal = gal_e.reshape(len(gals), -1)
    a4 = (masks, rs, gs, pe.reshape(1, -1), flat_ref, flat_gal)
    fl, by = cost(lambda *x: comb(*x), a4)
    row("select+combine", timed(comb, a4, it), fl, by)

    # ---- scan chunk-size sweep at fixed total -----------------------------
    print("\nchunk-size sweep (total %d masks):" % (n + pad))
    for bs2 in (32, 64, 128, 256):
        if (n + pad) % bs2:
            continue
        nc2 = (n + pad) // bs2
        scan2 = st._fused_scorer_scan(nc2, bs2)
        mc2 = masks.reshape(nc2, bs2, *masks.shape[1:])
        dt = timed(scan2, (params, mc2, probe, fill, ref_e, gal_e), 3)
        print("  bs=%-4d nchunk=%-4d  %8.1f ms  (%.2f ms/chunk)" % (
            bs2, nc2, dt * 1e3, dt * 1e3 / nc2), flush=True)

    # ---- precision A/B ----------------------------------------------------
    print("\nprecision A/B (full scan):")
    for prec in (None, "high", "highest"):
        st.score_precision = prec
        wb._jit_cache.pop(("strise_scan_scorer", enc, nchunk, bs, prec),
                          None)
        scan3 = st._fused_scorer_scan(nchunk, bs)
        dt = timed(scan3, a, 3)
        print("  %-8s %8.1f ms" % (prec, dt * 1e3), flush=True)


if __name__ == "__main__":
    main()
