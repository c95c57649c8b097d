"""A/B on the real chip: cascaded growing-row wsebp sweep walk vs the
round-2 bucketed walks (full-depth ResNet-101, B=8, production bf16
scan program, topk=32, n_buckets=12).

The sweep is per-op-dispatch bound (round-3 roofline: 3% MXU / 14% HBM
across ~3000 small walk ops); the cascade merges the 12 buckets' walks
below their shared frontiers into ONE full-depth walk whose row batch
grows at bucket frontiers — ~(n_buckets+1)/2 x fewer walk ops with
identical per-row math.  Whole-program INTERLEAVED timing (the only
trustworthy timing on axon).
"""
import time

import numpy as np
import jax.numpy as jnp

import xfr_tpu  # noqa: F401
from xfr_tpu.models import create_wbnet


def main():
    wb = create_wbnet("resnetv6_pytorch")
    wb.wsebp_dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    B = 8
    probes = jnp.asarray(rng.rand(B, 3, 224, 224) * 50, jnp.float32)
    em = rng.rand(B, 512).astype(np.float32)
    en = rng.rand(B, 512).astype(np.float32)
    wb.set_triplet_classifier_batch(
        em / np.linalg.norm(em, axis=1, keepdims=True),
        en / np.linalg.norm(en, axis=1, keepdims=True))
    scores_d, idxs_d, vals_d = wb._wsebp_grad_batch_fn()(
        wb.net.params, probes, gating=True)
    idxs32 = idxs_d.astype(jnp.int32)

    fns, maps = {}, {}
    for casc in (False, True):
        wb.wsebp_cascade = casc
        f = wb._wsebp_sweep_select_scan_fn(32, False)
        t0 = time.time()
        m, s = f(wb.net.params, probes, idxs32, vals_d, scores_d)
        maps[casc] = np.asarray(m)
        print("cascade=%s compile+run %.1f s" % (casc, time.time() - t0),
              flush=True)
        fns[casc] = f

    err = np.abs(maps[True] - maps[False]).max() / max(
        maps[False].max(), 1e-9)
    print("max rel err cascade vs bucketed: %.2e" % err, flush=True)

    # interleaved whole-program timing, 4 rounds
    times = {False: [], True: []}
    for r in range(4):
        for casc in (False, True):
            t0 = time.time()
            m, s = fns[casc](wb.net.params, probes, idxs32, vals_d,
                             scores_d)
            np.asarray(m)
            times[casc].append(time.time() - t0)
    for casc in (False, True):
        t = np.asarray(times[casc])
        print("cascade=%s: median %.1f ms/batch-8 (%.1f ms/probe -> "
              "sweep-only bound %.1f maps/s at 4 maps/probe)  raw %s"
              % (casc, np.median(t) * 1e3, np.median(t) * 1e3 / B,
                 4 * B / np.median(t),
                 [round(float(x) * 1e3, 1) for x in t]), flush=True)


if __name__ == "__main__":
    main()
