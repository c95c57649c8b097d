"""Roofline accounting for the whitebox mix's device programs.

For each production kernel (batched ranking pass, fused
contrastive+truncated, meanEBP pooled, scan-batched wsebp sweep) this
lowers the jitted program, reads XLA's cost analysis (flops / bytes
accessed), measures sustained wall time on the chip, and reports
achieved FLOP/s and HBM GB/s against v5e peaks — turning the round-2
"~60 ms/probe floor" estimate into a measured table.

v5e peaks used: 197 TFLOP/s bf16 (f32 convs run as bf16_3x ~ 1/3 of
that), 819 GB/s HBM.

Run on the TPU chip: python tools/_wsebp_roofline.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import xfr_tpu  # noqa: F401  (persistent compilation cache)
from xfr_tpu.models import create_wbnet

PEAK_BF16 = 197e12
PEAK_HBM = 819e9


def main():
    wb = create_wbnet("resnetv6_pytorch")
    wb.wsebp_dtype = jnp.bfloat16  # production CLI default
    rng = np.random.RandomState(0)
    B = 8
    probes = jnp.asarray(rng.rand(B, 3, 224, 224) * 50, jnp.float32)
    em = np.asarray(wb.encode(probes[:2])).mean(0)
    en = np.asarray(wb.encode(probes[2:4])).mean(0)
    em /= np.linalg.norm(em)
    en /= np.linalg.norm(en)
    wb.set_triplet_classifier_batch(np.tile(em, (B, 1)),
                                    np.tile(en, (B, 1)))

    scores_d, idxs_d, vals_d = wb._wsebp_grad_batch_fn()(
        wb.net.params, probes, gating=True)
    idxs32 = idxs_d.astype(jnp.int32)

    progs = {}

    def outer(callee, *args):
        f = jax.jit(lambda *a: callee(*a))
        lowered = f.lower(*args)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return f, ca

    # 1) scan-batched fused sweep+select+merge (the dominant kernel)
    sweep = wb._wsebp_sweep_select_scan_fn(32, False)
    progs["wsebp sweep (B=8 scan, bf16)"] = outer(
        sweep, wb.net.params, probes, idxs32, vals_d, scores_d)

    # 2) batched ranking pass
    grad = wb._wsebp_grad_batch_fn()
    progs["wsebp ranking pass (B=8)"] = outer(
        lambda p, x: grad(p, x, gating=True), wb.net.params, probes)

    # 3) fused contrastive+truncated (both maps, one program)
    ctb = wb._contrastive_both_fn()
    Pns = wb._batch_cotangents(B, "contrastive")
    progs["contrastive+trunc both (B=8)"] = outer(
        ctb, wb.net.params, probes, Pns, jnp.float32(20.0))

    # 4) meanEBP pooled (full classifier)
    wb.net.reset_classifier()
    params_full = dict(wb.net.params)
    pooled = wb._ebp_pooled_fn()
    Pn_mean = jnp.ones((B, wb.net.num_classes()), jnp.float32)
    # transfer only the pooled [B,H,W] plane like the production path —
    # fetching the full per-channel P dominates on the slow device link
    progs["meanEBP pooled (B=8)"] = outer(
        lambda p, x, Pn: pooled(p, x, Pn)[0], params_full, probes, Pn_mean)
    wb.set_triplet_classifier_batch(np.tile(em, (B, 1)),
                                    np.tile(en, (B, 1)))

    args_by_name = {
        "wsebp sweep (B=8 scan, bf16)": (wb.net.params, probes, idxs32,
                                         vals_d, scores_d),
        "wsebp ranking pass (B=8)": (wb.net.params, probes),
        "contrastive+trunc both (B=8)": (wb.net.params, probes, Pns,
                                         jnp.float32(20.0)),
        "meanEBP pooled (B=8)": (params_full, probes, Pn_mean),
    }

    print("%-32s %9s %9s %9s %8s %8s %8s" % (
        "kernel", "ms", "GFLOP", "GB", "TFLOP/s", "GB/s", "bound"))
    for name, (f, ca) in progs.items():
        args = args_by_name[name]
        r = f(*args)
        jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "shape")
                     else a, r)
        n = 5
        t0 = time.time()
        for _ in range(n):
            r = f(*args)
            jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "shape")
                         else a, r)
        dt = (time.time() - t0) / n
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        fl_r = flops / dt
        by_r = byts / dt
        bound = ("HBM %.0f%%" % (100 * by_r / PEAK_HBM)
                 if by_r / PEAK_HBM > fl_r / PEAK_BF16
                 else "MXU %.0f%%" % (100 * fl_r / PEAK_BF16))
        print("%-32s %9.2f %9.1f %9.2f %8.1f %8.0f %8s" % (
            name, dt * 1e3, flops / 1e9, byts / 1e9, fl_r / 1e12,
            by_r / 1e9, bound))


if __name__ == "__main__":
    main()
