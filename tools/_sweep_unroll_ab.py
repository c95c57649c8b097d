"""A/B on the real chip: lax.scan unroll of the wsebp sweep steps
(full-depth ResNet-101, B=8, production bf16, chunk=1)."""
import sys
import time
import numpy as np
import jax.numpy as jnp

import xfr_tpu  # noqa: F401
from xfr_tpu.models import create_wbnet


def main():
    unrolls = [int(c) for c in (sys.argv[1:] or ["1", "2", "4"])]
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

    ref = None
    for u in unrolls:
        f = wb._wsebp_sweep_select_scan_fn(32, False, unroll=u)
        t0 = time.time()
        try:
            m, s = f(wb.net.params, probes, idxs32, vals_d, scores_d)
            np.asarray(m)
        except Exception as e:
            print("unroll %d FAILED: %s" % (u, str(e)[:160]), flush=True)
            continue
        print("unroll %d compile+run %.1f s" % (u, time.time() - t0),
              flush=True)
        n = 5
        t0 = time.time()
        for _ in range(n):
            m, s = f(wb.net.params, probes, idxs32, vals_d, scores_d)
            mm = np.asarray(m)
        dt = (time.time() - t0) / n
        print("unroll %d: %.1f ms/batch-8 (%.1f ms/probe) -> mix bound "
              "%.1f maps/s" % (u, dt * 1e3, dt * 1e3 / B, 4.0 * B / dt),
              flush=True)
        if ref is None:
            ref = mm
        else:
            print("  max rel err vs unroll-1: %.2e"
                  % (np.abs(mm - ref).max() / max(ref.max(), 1e-9)),
                  flush=True)


if __name__ == "__main__":
    main()
