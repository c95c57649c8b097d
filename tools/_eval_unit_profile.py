"""Break down the eval probe-group cost after TwinClsBatch batching.

Measures, on the real chip:
  (a) host: threshold-plane + counts build per map
  (b) host: IoU curve per map (sort+searchsorted path)
  (c) device: the M=4 multi-map blend+encode program wall (forced fetch)
  (d) full group launch+drain wall (the bench unit)

Run: python tools/_eval_unit_profile.py
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
    orig = (rng.rand(3, 224, 224) * 50).astype(np.float32)
    inp = orig + (rng.rand(3, 224, 224) * 30).astype(np.float32)

    def embed(ims):
        e = np.asarray(wb.embeddings(np.stack(ims)))
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        m = e.mean(axis=0, keepdims=True)
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    og = embed([orig + rng.rand(3, 224, 224).astype(np.float32)
                for _ in range(2)])
    ig = embed([inp + rng.rand(3, 224, 224).astype(np.float32)
                for _ in range(2)])
    smaps = []
    for _ in range(4):
        s = rng.rand(224, 224).astype(np.float64)
        s[60:120, 80:150] += 4.0
        s /= s.sum()
        smaps.append(s)
    gt = np.zeros((224, 224), bool)
    gt[60:120, 80:150] = True
    kw = dict(mask_threshold_method="percent-density",
              percentiles=percentiles, seed=7,
              include_zero_elements=False)

    # (a) plane+counts
    t0 = time.time()
    n = 20
    for i in range(n):
        plane, thr = ipg._threshold_plane(
            smaps[i % 4], "percent-density", percentiles=percentiles,
            seed=7, include_zero_elements=False)
        counts = np.searchsorted(np.sort(thr), plane.ravel(),
                                 side="left").astype(np.uint8)
    t_plane = (time.time() - t0) / n
    print(f"(a) plane+counts build: {t_plane*1e3:.1f} ms/map")

    # (b) IoU curve
    t0 = time.time()
    for i in range(n):
        ipg.intersect_over_union_thresholded_saliency(
            smaps[i % 4], gt, "percent-density", percentiles=percentiles,
            seed=7, include_zero_elements=False)
    t_iou = (time.time() - t0) / n
    print(f"(b) IoU curve:          {t_iou*1e3:.1f} ms/map")

    # (c) device program wall: counts prebuilt, fetch forced
    cmats = []
    for s in smaps:
        plane, thr = ipg._threshold_plane(
            s, "percent-density", percentiles=percentiles, seed=7,
            include_zero_elements=False)
        cmats.append(np.searchsorted(np.sort(thr), plane.ravel(),
                                     side="left").astype(np.uint8))
    cmat = np.stack(cmats)
    T = len(percentiles)
    fin = wb.launch_blend_embeddings_counts_multi(orig, inp, cmat, T)
    fin()  # compile
    t0 = time.time()
    reps = 6
    for _ in range(reps):
        wb.launch_blend_embeddings_counts_multi(orig, inp, cmat, T)()
    t_dev = (time.time() - t0) / reps
    print(f"(c) M=4 multi program (launch+fetch): {t_dev*1e3:.1f} ms/group"
          f" = {t_dev/4*1e3:.1f} ms/map")

    # (c') blend_batch sweep for the multi program (single-map optimum
    # was 32; with 16 scan steps the per-step tradeoff may shift)
    for bsz in (32, 64, 128):
        old = wb.blend_batch
        wb.blend_batch = bsz
        try:
            wb.launch_blend_embeddings_counts_multi(orig, inp, cmat, T)()
            t0 = time.time()
            for _ in range(reps):
                wb.launch_blend_embeddings_counts_multi(
                    orig, inp, cmat, T)()
            t_b = (time.time() - t0) / reps
            print(f"(c') multi program blend_batch={bsz}: "
                  f"{t_b*1e3:.1f} ms/group")
        finally:
            wb.blend_batch = old

    # (d) full group unit (bench shape), one group in flight
    def group():
        b = ipg.TwinClsBatch(wb, orig, inp, og, ig, **kw)
        fins = [b.launch(s) for s in smaps]
        for s in smaps:
            ipg.intersect_over_union_thresholded_saliency(
                s, gt, "percent-density", percentiles=percentiles,
                seed=7, include_zero_elements=False)
        b.flush()
        return fins

    [f() for f in group()]
    t0 = time.time()
    ngr = 8
    pend = group()
    for _ in range(ngr - 1):
        nxt = group()
        [f() for f in pend]
        pend = nxt
    [f() for f in pend]
    t_full = (time.time() - t0) / ngr
    print(f"(d) full group pipelined: {t_full*1e3:.1f} ms/group = "
          f"{t_full/4*1e3:.1f} ms/unit ({4/t_full:.1f} evals/s)")


if __name__ == "__main__":
    main()
