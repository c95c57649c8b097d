"""A/B: per-probe multi-map eval programs vs cross-probe multi-pair ones.

After probe-level method batching (TwinClsBatch: 4 maps/program) the eval
unit decomposes as C + D/4 where D is the per-program dispatch+drain cost
(A/B'd in tools/_eval_multi_ab.py: C ~= 22 ms, D ~= 33 ms).  Batching G
probes' maps into ONE program with stacked image pairs
(launch_blend_embeddings_counts_multi_pair) cuts that to C + D/(4G).
Measures G=1 (current production) vs G=2 and G=4 with the production
one-group-in-flight overlap, and checks the multi-pair program's
embeddings are bit-identical to the single-pair multi program's.

Run on the TPU chip: python tools/_eval_xprobe_ab.py
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

    n_probes = 8
    n_methods = 4
    pairs = []
    for _ in range(n_probes):
        orig = (rng.rand(3, 224, 224) * 50).astype(np.float32)
        inp = orig + (rng.rand(3, 224, 224) * 30).astype(np.float32)
        pairs.append((orig, inp))
    smaps = []
    for _ in range(n_probes * n_methods):
        smap = rng.rand(224, 224).astype(np.float64)
        smap[60:120, 80:150] += 4.0
        smap /= smap.sum()
        smaps.append(smap)

    def plane_counts(smap):
        plane, thr = ipg._threshold_plane(
            smap, "percent-density", percentiles=percentiles, seed=7,
            include_zero_elements=False)
        counts = np.searchsorted(np.sort(thr), plane.ravel(),
                                 side="left").astype(np.uint8)
        return counts, len(thr)

    counts_all = []
    T = None
    for s in smaps:
        c, T = plane_counts(s)
        counts_all.append(c)
    counts_all = np.stack(counts_all)  # [n_probes*n_methods, H*W]

    def run_path(G, n_iters=2):
        """One flight group = G probes x n_methods maps; one group in
        flight.  Returns (ms/unit, embeds list in unit order)."""
        ngrp = n_probes // G

        def launch(g):
            p0 = g * G
            if G == 1:
                return wb.launch_blend_embeddings_counts_multi(
                    pairs[p0][0], pairs[p0][1],
                    counts_all[p0 * n_methods:(p0 + 1) * n_methods], T)
            idx = np.repeat(np.arange(G, dtype=np.int32), n_methods)
            return wb.launch_blend_embeddings_counts_multi_pair(
                [pairs[p0 + k][0] for k in range(G)],
                [pairs[p0 + k][1] for k in range(G)],
                counts_all[p0 * n_methods:(p0 + G) * n_methods], idx, T)

        launch(0)()  # compile
        best = None
        embeds = None
        for _ in range(n_iters):
            wb._upload_memo.clear()
            got = []
            t0 = time.time()
            pend = launch(0)
            for g in range(1, ngrp):
                nxt = launch(g)
                got.append(pend())
                pend = nxt
            got.append(pend())
            dt = (time.time() - t0) / (n_probes * n_methods)
            best = dt if best is None else min(best, dt)
            embeds = np.concatenate(got)  # [n_units, T, D]
        return best, embeds

    dt1, ref = run_path(1)
    print(f"G=1 (per-probe multi): {dt1*1e3:.1f} ms/unit "
          f"({1/dt1:.1f} evals/s)")
    for G in (2, 4):
        dtg, got = run_path(G)
        d = np.abs(got - ref).max()
        print(f"G={G} (multi-pair): {dtg*1e3:.1f} ms/unit "
              f"({1/dtg:.1f} evals/s)  speedup {dt1/dtg:.2f}x  "
              f"max|diff|={d:.3e}{'  BIT-IDENTICAL' if d == 0 else ''}")


if __name__ == "__main__":
    main()
