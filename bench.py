"""Benchmark: whitebox EBP saliency generation throughput on one TPU chip.

Measures the inpainting-game standard per-probe method mix on the flagship
STR-Janus ResNet-101+L2 matcher (the workload behind the reference's
"~36 hours on 1x Titan X" whitebox stage, reference README.md:166):

  per probe: meanEBP + contrastive + truncated-contrastive (pct 20)
             + weighted-subtree (topk=32, all subtree candidates)
  = 4 saliency maps (generate_whitebox_saliency.py:316-411).

Baseline derivation (documented assumptions): the reference generates 4 maps
per filtered (probe, mask) unit.  Two independent estimates agree the
reference spends ~100 s per 4-map mix on a Titan X: (a) the weighted-subtree
sweep alone is n_events (~379) serial layerwise EBP re-runs, each 3 forwards
+ 1 backward of ResNet-101 @224 (~65 ms/pass Titan X f32) ~= 95 s; (b) 36 h
over the ~1.3k filtered probe-mask units of the resnetv4 split.  Baseline
throughput = 4 maps / 100 s = 0.04 maps/s/GPU.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_MAPS_PER_SEC = 0.04  # reference Titan X, standard 4-map mix


def main():
    import jax.numpy as jnp
    from xfr_tpu.models import create_wbnet

    wb = create_wbnet("resnetv6_pytorch")
    # production default: weighted-subtree sweep in bfloat16
    # (xfr-generate-wb-saliency --wsebp-dtype bfloat16), everything else
    # float32
    wb.wsebp_dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    probe = jnp.asarray(rng.rand(1, 3, 224, 224) * 50, jnp.float32)
    mates = jnp.asarray(rng.rand(2, 3, 224, 224) * 50, jnp.float32)
    nonmates = jnp.asarray(rng.rand(2, 3, 224, 224) * 50, jnp.float32)

    # triplet classifier from averaged/normalized encodings
    # (generate_whitebox_saliency.py:46-75)
    em = np.asarray(wb.encode(mates)).mean(0)
    en = np.asarray(wb.encode(nonmates)).mean(0)
    em /= np.linalg.norm(em)
    en /= np.linalg.norm(en)

    # Production generation pipeline: mean/contrastive/truncated batch
    # across B probe jobs via the interleaved-classifier trick (exactly
    # equivalent per-probe results — tests/test_batched_ebp.py); the
    # weighted-subtree sweep (per-probe prior injections over all 378
    # candidate events, exact reference semantics) runs per probe.
    B = 8
    probes = jnp.asarray(rng.rand(B, 3, 224, 224) * 50, jnp.float32)
    mates = np.tile(em / 2500.0, (B, 1))
    nonmates = np.tile(en / 2500.0, (B, 1))

    def mix():
        # Launch-all-then-drain, mirroring generate_wb_smaps_batched:
        # every method's device programs enqueue before any sync, so host
        # post-processing overlaps the device queue.
        wb.net.reset_classifier()
        Pn_mean = jnp.ones((B, wb.net.num_classes()), jnp.float32)
        pooled_dev, _ = wb._ebp_pooled_fn()(wb.net.params, probes, Pn_mean)
        wb.set_triplet_classifier_batch(mates, nonmates)
        finish_ct = wb.launch_contrastive_ebp_batch_both(
            probes, truncate_percent=20)
        wb.set_triplet_classifier_batch(np.tile(em, (B, 1)),
                                        np.tile(en, (B, 1)))
        finish_ws = wb.launch_weighted_subtree_ebp_batch(
            probes, topk=32, subtree_mode="norelu")
        pooled = np.asarray(pooled_dev, np.float32)
        s1 = [wb._mwp_to_saliency(pooled[i]) for i in range(B)]
        s2, s3 = finish_ct()
        s4 = [r[0] for r in finish_ws()]
        return s1 + s2 + s3 + s4

    mix()  # warmup / compile
    n_iters = 4
    t0 = time.time()
    for _ in range(n_iters):
        out = mix()
    dt = (time.time() - t0) / n_iters
    for s in out:
        assert np.isfinite(s).all()

    maps_per_sec = 4.0 * B / dt
    print(json.dumps({
        "metric": "whitebox EBP saliency maps/sec/chip (4-map eval mix, "
                  "ResNet-101+L2)",
        "value": round(maps_per_sec, 4),
        "unit": "maps/sec/chip",
        "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
