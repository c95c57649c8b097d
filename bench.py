"""Benchmark: the three stages of the inpainting-game pipeline on one TPU
chip, each against the reference's published wall-clock for the same
workload (reference README.md:166: WB generation ~36 h, BB generation
~18 h, analysis "a couple of hours", all on 1x Titan X).

Prints one JSON line per metric; the whitebox line is LAST (the driver
records the final line) and is ALSO printed first, right after it is
measured, so a run truncated by a slow remote-compile window still ends
on the north-star whitebox metric instead of a mislabeled BB/eval line.

Baseline derivations (documented assumptions, ~1.3k filtered probe-mask
units for the resnetv4 split):

* Whitebox 4-map eval mix (meanEBP + contrastive + truncated pct-20 +
  weighted-subtree top-32): two independent estimates agree on ~100 s per
  mix on a Titan X — (a) the weighted-subtree sweep alone is ~379 serial
  layerwise EBP re-runs, each 3 forwards + 1 backward of ResNet-101 @224
  (~65 ms/pass f32) ~= 95 s; (b) 36 h over ~1.3k units.  Baseline
  = 4 maps / 100 s = 0.04 maps/s.
* Blackbox STRise map (6,500 masks, mean-EBP prior, blur fill, scale 12,
  2 elements — generate_blackbox_saliency.py defaults): 18 h over the
  same ~1.3k units = 49.8 s/map = 0.0201 maps/s.
* Eval stage: per probe x method, the analysis computes the
  percent-density threshold sweep (101 blend embeddings + twin
  classification) plus the IoU curve (plot_inpainting_game.py:1125-1161).
  "A couple of hours" (2 h) over ~1.3k units x 4 methods = 1.38 s per
  probe-method eval = 0.72 evals/s.
"""

import json
import time

import numpy as np

BASELINE_WB_MAPS_PER_SEC = 0.04     # Titan X, standard 4-map mix
BASELINE_BB_MAPS_PER_SEC = 0.0201   # Titan X, 6500-mask STRise map
BASELINE_EVAL_PER_SEC = 0.72        # Titan X-era, twin-cls + IoU sweep


def _emit(metric, times, unit, baseline, per=1, bound=None):
    """One JSON metric line.  per-iteration wall seconds ``times`` (each
    covering ``per`` units).  When given, the headline ``value`` is the
    MEDIAN of per-iteration rates: one axon compile-service stall halved
    the round-4 eval headline (BENCH_r04 15.4 vs steady 25-40 evals/s),
    so the number of record must be stall-robust.  The mean rate and
    min/max/raw times stay as fields so a reader can tell a real
    regression from service noise.  ``bound``: known architectural rate
    bound for context (e.g. the WB sweep-only bound)."""
    rec = {"metric": metric, "unit": unit}
    t = np.asarray(times, np.float64)
    value = per / float(np.median(t))
    rec["mean"] = round(per * len(t) / float(t.sum()), 4)
    rec["min"] = round(per / float(t.max()), 4)
    rec["max"] = round(per / float(t.min()), 4)
    rec["iter_times_s"] = [round(float(x), 4) for x in t]
    rec["value"] = round(value, 4)
    rec["vs_baseline"] = round(value / baseline, 2)
    if bound is not None:
        rec["bound"] = bound
    print(json.dumps(rec), flush=True)


def bench_blackbox(wb, rng, n_maps=5, num_masks=6500, mesh=None,
                   score_precision=None):
    """Sustained BB map rate with the production launch/finish pipeline
    (map k's host post overlaps map k+1's device scoring queue).
    ``mesh``: run the STRise scorer's mesh path (tools/_mesh1_ab.py uses
    a 1-device mesh to prove the shard_map wrapper costs nothing on a
    real chip).  ``score_precision``: None = library ctor default (fast
    scan); 'high' = the xfr-generate-bb CLI default (ranking-grade
    bf16_3x matmuls, ~2.15x the scan cost — round-4 roofline)."""
    from xfr_tpu.blackbox import STRise

    # distinct probe per map (like production generation: refs/gallery
    # repeat across a job's probes — and hit the embed memo — but each
    # probe is new)
    probes = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
              for _ in range(n_maps + 2)]
    refs = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    gals = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    # one net serves matcher + mean-EBP prior (the CLI's net_dict reuse)
    net_dict = {("resnetv6_pytorch", 6): wb,
                ("resnetv4_pytorch", None): wb}

    def launch(seed):
        st = STRise(probe=probes[seed % len(probes)], refs=refs,
                    gallery=gals,
                    black_box="resnetv6_pytorch", net_dict=net_dict,
                    mask_scale=12, num_mask_elements=2,
                    mask_fill_type="blur", blur_fill_sigma_percent=4,
                    num_masks=num_masks, seed=seed,
                    prior_type="mean_ebp", mesh=mesh,
                    score_precision=score_precision)
        return st.launch_evaluate()

    smap = launch(0)()  # warmup / compile
    assert np.isfinite(smap).all()

    times = []
    t0 = time.time()
    pend = launch(1)
    for s in range(2, n_maps + 1):
        fin = launch(s)
        smap = pend()  # forces the host transfer: honest timing on axon
        t1 = time.time()
        times.append(t1 - t0)
        t0 = t1
        pend = fin
    smap = pend()
    times.append(time.time() - t0)
    assert np.isfinite(smap).all()
    return times


def bench_eval(wb, rng, n_groups=10):
    """Sustained probe-method eval rate: percent-density threshold sweep
    (101 blends + twin classification) + IoU curve, exactly the analysis
    stage's per-unit work AND overlap: all 4 method maps of a probe batch
    into ONE multi-map blend+encode program (TwinClsBatch), the host IoU
    curves compute while it runs, and one probe group stays in flight
    (analysis.py run_inpaintinggame_analysis)."""
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
        smap[60:120, 80:150] += 4.0  # salient region
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
            fin_cls = batch.launch(smap)
            iou = ipg.intersect_over_union_thresholded_saliency(
                smap, gt, "percent-density", percentiles=percentiles,
                seed=7, include_zero_elements=False)
            assert np.isfinite(iou).all()
            fins.append(fin_cls)
        batch.flush()
        return fins

    cls = [f()[0] for f in launch_group(0)]  # warmup / compile
    assert all(len(c) == len(percentiles) for c in cls)
    wb._upload_memo.clear()  # first timed group re-pays its upload

    # one probe group in flight, like run_inpaintinggame_analysis:
    # group p+1 launches (and computes its host IoU curves) before
    # group p drains
    times = []
    t0 = time.time()
    pend = launch_group(0)
    for p in range(1, n_groups):
        nxt = launch_group(p)
        for f in pend:
            f()
        t1 = time.time()
        times.append(t1 - t0)
        t0 = t1
        pend = nxt
    for f in pend:
        f()
    times.append(time.time() - t0)
    return times


def bench_whitebox(wb, rng, n_iters=6):
    """The inpainting-game standard per-probe 4-map method mix on the
    flagship STR-Janus ResNet-101+L2 matcher
    (generate_whitebox_saliency.py:316-411), probe-batched B=8 via the
    production launch-all-then-drain pipeline."""
    import jax.numpy as jnp

    probe_seed = rng.rand(2, 3, 224, 224) * 50
    mates = jnp.asarray(probe_seed, jnp.float32)
    nonmates = jnp.asarray(rng.rand(2, 3, 224, 224) * 50, jnp.float32)

    # triplet classifier from averaged/normalized encodings
    # (generate_whitebox_saliency.py:46-75)
    em = np.asarray(wb.encode(mates)).mean(0)
    en = np.asarray(wb.encode(nonmates)).mean(0)
    em /= np.linalg.norm(em)
    en /= np.linalg.norm(en)

    B = 8
    probes = jnp.asarray(rng.rand(B, 3, 224, 224) * 50, jnp.float32)
    mates_b = np.tile(em / 2500.0, (B, 1))
    nonmates_b = np.tile(en / 2500.0, (B, 1))

    def launch_mix():
        # Launch-all-then-drain, mirroring generate_wb_smaps_batched:
        # every method's device programs enqueue before any sync.
        # Classifier swaps between launches are safe: each launch
        # captures the params it was given.
        wb.net.reset_classifier()
        Pn_mean = jnp.ones((B, wb.net.num_classes()), jnp.float32)
        pooled_dev, _ = wb._ebp_pooled_fn()(wb.net.params, probes, Pn_mean)
        wb.set_triplet_classifier_batch(mates_b, nonmates_b)
        finish_ct = wb.launch_contrastive_ebp_batch_both(
            probes, truncate_percent=20)
        wb.set_triplet_classifier_batch(np.tile(em, (B, 1)),
                                        np.tile(en, (B, 1)))
        finish_ws = wb.launch_weighted_subtree_ebp_batch(
            probes, topk=32, subtree_mode="norelu")
        return pooled_dev, finish_ct, finish_ws

    def drain(st):
        pooled_dev, finish_ct, finish_ws = st
        pooled = np.asarray(pooled_dev, np.float32)
        s1 = [wb._mwp_to_saliency(pooled[i]) for i in range(B)]
        s2, s3 = finish_ct()
        s4 = [r[0] for r in finish_ws()]
        return s1 + s2 + s3 + s4

    drain(launch_mix())  # warmup / compile
    # Double-buffered groups exactly like the generation pipeline
    # (generate_wb_smaps_batched): group i's host drain (transfers +
    # saliency post) overlaps group i+1's device queue.
    times = []
    t0 = time.time()
    prev = launch_mix()
    for _ in range(n_iters - 1):
        st = launch_mix()
        out = drain(prev)
        t1 = time.time()
        times.append(t1 - t0)
        t0 = t1
        prev = st
    out = drain(prev)
    times.append(time.time() - t0)
    for s in out:
        assert np.isfinite(s).all()
    return times


def main():
    import jax.numpy as jnp
    from xfr_tpu.models import create_wbnet

    wb = create_wbnet("resnetv6_pytorch")
    # production default: weighted-subtree sweep in bfloat16
    # (xfr-generate-wb-saliency --wsebp-dtype bfloat16), everything else
    # float32
    wb.wsebp_dtype = jnp.bfloat16
    rng = np.random.RandomState(0)

    # The whitebox mix (the north-star metric) runs and prints FIRST so a
    # run truncated by a slow compile-service window still ends on a
    # whitebox JSON line; it is re-emitted at the end because the driver
    # records the LAST line.
    wb_metric = ("whitebox EBP saliency maps/sec/chip (4-map eval mix, "
                 "ResNet-101+L2)")
    # bound: the wsebp sweep standalone measures 66.5 ms/probe -> 60.1
    # maps/s sweep-only (tools/_wsebp_roofline.py; CLAUDE.md round-3)
    wbt = bench_whitebox(wb, rng)
    _emit(wb_metric, wbt, "maps/sec/chip", BASELINE_WB_MAPS_PER_SEC,
          per=32, bound=60.1)
    # restore the full classifier: the BB prior's Pn shape (and every
    # encode program signature) depends on net.num_classes()
    wb.net.reset_classifier()

    bbt = bench_blackbox(wb, rng)
    _emit("blackbox STRise saliency maps/sec/chip (6500 masks, mean-EBP "
          "prior, blur fill, ResNet-101+L2 fused scorer)",
          bbt, "maps/sec/chip", BASELINE_BB_MAPS_PER_SEC, per=1)

    # The xfr-generate-bb CLI defaults score_precision='high' (ranking-
    # grade bf16_3x matmuls; the library ctor default is the fast scan) —
    # record the PRODUCTION generation rate too, not just the fast one.
    bbht = bench_blackbox(wb, rng, n_maps=3, score_precision="high")
    _emit("blackbox STRise saliency maps/sec/chip (6500 masks, "
          "score_precision=high — the xfr-generate-bb CLI default)",
          bbht, "maps/sec/chip", BASELINE_BB_MAPS_PER_SEC, per=1)

    evt = bench_eval(wb, rng)
    _emit("inpainting-game eval probe-method evals/sec/chip "
          "(percent-density sweep: 101 blend embeddings + twin-cls + IoU)",
          evt, "evals/sec/chip", BASELINE_EVAL_PER_SEC, per=4)

    _emit(wb_metric, wbt, "maps/sec/chip", BASELINE_WB_MAPS_PER_SEC,
          per=32, bound=60.1)


if __name__ == "__main__":
    main()
