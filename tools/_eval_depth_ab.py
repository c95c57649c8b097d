"""A/B on the real chip (verdict r4 #7): eval-stage launch depth — how
many probe groups stay in flight before draining the oldest.

Round 4's bench showed a >0.6 s mid-run service stall (min 6.1 evals/s
in BENCH_r04) that a single in-flight group cannot ride over: when the
compile-service hiccups the drain, the device queue empties.  Depth 2
keeps a second group's programs enqueued so the device keeps working
through a stalled host round trip.

Whole-pipeline INTERLEAVED timing (the only trustworthy timing on
axon): alternate complete depth-1 / depth-2 pipeline runs, report
per-group medians.
"""
import time

import numpy as np


def run_depth(wb, rng, depth, n_groups=12):
    """bench.bench_eval's exact workload with ``depth`` groups in
    flight (depth 1 == the shipped loop)."""
    from xfr_tpu.inpainting_game import protocol as ipg

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
    gt = np.zeros((224, 224), bool)
    gt[60:120, 80:150] = True
    kw = dict(mask_threshold_method="percent-density",
              percentiles=percentiles, seed=7,
              include_zero_elements=False)

    def launch_group(p):
        orig, inp = pairs[p % 2]
        og, ig = gals[p % 2]
        batch = ipg.TwinClsBatch(wb, orig, inp, og, ig, **kw)
        fins = []
        for smap in smaps:
            fins.append(batch.launch(smap))
            iou = ipg.intersect_over_union_thresholded_saliency(
                smap, gt, "percent-density", percentiles=percentiles,
                seed=7, include_zero_elements=False)
            assert np.isfinite(iou).all()
        batch.flush()
        return fins

    [f() for f in launch_group(0)]  # warmup
    wb._upload_memo.clear()

    times = []
    t0 = time.time()
    pend = [launch_group(p) for p in range(depth)]
    for p in range(depth, n_groups):
        pend.append(launch_group(p))
        for f in pend.pop(0):
            f()
        t1 = time.time()
        times.append(t1 - t0)
        t0 = t1
    while pend:
        for f in pend.pop(0):
            f()
        times.append(time.time() - t0)
        t0 = time.time()
    return times


def main():
    from xfr_tpu.models import create_wbnet

    wb = create_wbnet("resnetv6_pytorch")
    rng = np.random.RandomState(0)
    allt = {1: [], 2: []}
    for r in range(3):
        for depth in (1, 2):
            t = run_depth(wb, rng, depth)
            allt[depth].extend(t)
            print("round %d depth %d: median %.1f ms/group  raw %s"
                  % (r, depth, np.median(t) * 1e3,
                     [round(x * 1e3) for x in t]), flush=True)
    for depth in (1, 2):
        t = np.asarray(allt[depth])
        print("depth %d overall: median %.1f ms/group -> %.1f evals/s, "
              "p90 %.1f ms" % (depth, np.median(t) * 1e3,
                               4.0 / np.median(t),
                               np.percentile(t, 90) * 1e3), flush=True)


if __name__ == "__main__":
    main()
