"""A/B: per-method twin-cls programs vs one probe-level multi-map program.

The eval stage's unit (101-threshold blend+encode) is dominated by
per-program dispatch on the device link; a probe's 4 method maps share
the image pair, so batching them into one M*T-row scan (TwinClsBatch)
should amortize that cost ~4x.  Measures both paths with the production
one-group-in-flight overlap and checks result equality.

Run on the TPU chip: python tools/_eval_multi_ab.py
"""

import time

import numpy as np

from xfr_tpu.models import create_wbnet
from xfr_tpu.inpainting_game import protocol as ipg


def main():
    wb = create_wbnet("resnetv6_pytorch")
    rng = np.random.RandomState(0)
    percentiles = np.unique(np.sort(np.append(np.arange(0, 100, 1),
                                              [0, 100])))

    pairs = []
    for _ in range(2):
        orig = (rng.rand(3, 224, 224) * 50).astype(np.float32)
        inp = orig + (rng.rand(3, 224, 224) * 30).astype(np.float32)
        pairs.append((orig, inp))

    def embed(ims):
        e = np.asarray(wb.embeddings(np.stack(ims)))
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        m = e.mean(axis=0, keepdims=True)
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    gals = [(embed([o + rng.rand(3, 224, 224).astype(np.float32)
                    for _ in range(2)]),
             embed([i + rng.rand(3, 224, 224).astype(np.float32)
                    for _ in range(2)]))
            for o, i in pairs]
    smaps = []
    for _ in range(4):
        smap = rng.rand(224, 224).astype(np.float64)
        smap[60:120, 80:150] += 4.0
        smap /= smap.sum()
        smaps.append(smap)

    kw = dict(mask_threshold_method="percent-density",
              percentiles=percentiles, seed=7,
              include_zero_elements=False)

    # ---- path A: 4 single-map units, one in flight (current bench) ----
    def launch_single(k):
        orig, inp = pairs[k // 4 % 2]
        og, ig = gals[k // 4 % 2]
        return ipg.launch_classified_as_inpainted_twin(
            wb, orig, inp, og, ig, smaps[k % 4], **kw)

    launch_single(0)()  # compile
    wb._upload_memo.clear()
    n = 16
    t0 = time.time()
    pend = launch_single(0)
    ref_cls = {}
    for k in range(1, n):
        fin = launch_single(k)
        ref_cls[k - 1] = pend()[0]
        pend = fin
    ref_cls[n - 1] = pend()[0]
    dt_a = (time.time() - t0) / n
    print(f"A single-map units: {dt_a*1e3:.1f} ms/unit "
          f"({1/dt_a:.1f} evals/s)")

    # ---- path B: probe-level TwinClsBatch (4 maps/program), one probe
    # group in flight ----
    def launch_group(p):
        orig, inp = pairs[p % 2]
        og, ig = gals[p % 2]
        batch = ipg.TwinClsBatch(wb, orig, inp, og, ig, **kw)
        fins = [batch.launch(s) for s in smaps]
        batch.flush()
        return fins

    [f() for f in launch_group(0)]  # compile
    wb._upload_memo.clear()
    ngrp = n // 4
    t0 = time.time()
    pend = launch_group(0)
    got = []
    for p in range(1, ngrp):
        nxt = launch_group(p)
        got.extend(f()[0] for f in pend)
        pend = nxt
    got.extend(f()[0] for f in pend)
    dt_b = (time.time() - t0) / n
    print(f"B multi-map groups: {dt_b*1e3:.1f} ms/unit "
          f"({1/dt_b:.1f} evals/s)  speedup {dt_a/dt_b:.2f}x")

    # ---- equality: multi-map program vs single-map program ----
    mism = sum(not np.array_equal(ref_cls[k], got[k]) for k in range(n))
    print(f"cls_twin equality: {n - mism}/{n} units identical")
    # embeddings-level check on one group
    orig, inp = pairs[0]
    og, ig = gals[0]
    batch = ipg.TwinClsBatch(wb, orig, inp, og, ig, **kw)
    fins = [batch.launch(s) for s in smaps]
    batch.flush()
    multi = batch._embeds()
    for i, s in enumerate(smaps):
        plane, thr = ipg._threshold_plane(
            s, "percent-density", percentiles=percentiles, seed=7,
            include_zero_elements=False)
        counts = np.searchsorted(np.sort(thr), plane.ravel(),
                                 side="left").astype(np.uint8)
        single = wb.launch_blend_embeddings_counts(
            orig, inp, counts, len(thr))()
        d = np.abs(multi[i] - single).max()
        print(f"  map {i}: max |multi - single| embed diff = {d:.3e}"
              f"{'  (BIT-IDENTICAL)' if d == 0 else ''}")


if __name__ == "__main__":
    main()
