"""Blackbox (STRise/DISE) inpainting-game saliency generation driver
(reference: eval/generate_inpaintinggame_bb_saliency_maps_multigpu.py).

Builds the black-box scoring function from the whitebox net's embeddings +
L2 similarity (reference :73-101) and runs the sharded job table like the
whitebox driver.
"""

from __future__ import annotations

import argparse
import random
import sys

import numpy as np

import xfr_tpu
from xfr_tpu.cli.generate_wb_saliency import (add_common_args,
                                              build_job_table,
                                              resolve_shards, shard_jobs)


def make_bb_score_fn(wb):
    """Embedding + L2-similarity scorer over host images/paths
    (reference: generate_inpaintinggame_bb_saliency_maps_multigpu.py:73-101).
    """
    def bb_fn(probes, gallery):
        def embed(images):
            if isinstance(images, (list, tuple)) and len(images) and \
                    isinstance(images[0], np.ndarray) and \
                    images[0].ndim == 3 and images[0].shape[2] == 3:
                images = [wb.convert_from_numpy(im)[0] for im in images]
            return wb.embeddings(images)

        pe = embed(probes)
        ge = embed(gallery)
        pe = pe / np.linalg.norm(pe, axis=1, keepdims=True)
        ge = ge / np.linalg.norm(ge, axis=1, keepdims=True)
        return 1.0 - 0.5 * np.linalg.norm(pe[:, None] - ge[None], axis=2)
    return bb_fn


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--net", nargs="+", dest="WB_NET",
                        default=["resnetv4_pytorch"])
    parser.add_argument("--rise-scale", type=int, default=12)
    parser.add_argument("--num-masks", type=int, default=6500)
    parser.add_argument("--mesh", default="auto", choices=["auto", "off"],
                        help="auto: shard mask-scoring chunks over all "
                             "visible devices; off: single-device")
    parser.add_argument("--prior", dest="prior_type", default="mean_ebp",
                        choices=["mean_ebp", "uniform"])
    parser.add_argument("--score-precision", default="high",
                        choices=["default", "high", "highest"],
                        help="matmul precision of the mask-scoring "
                             "encode.  'high' (bf16_3x, the CLI default) "
                             "gives f32-grade mask RANKING — the eval "
                             "stage's product — at ~2.2x the scan cost "
                             "(measured 0.999 top-20%% rank overlap with "
                             "f32 vs 0.74 map correlation for 'default' "
                             "on low-spread workloads); 'default' = "
                             "fastest TPU matmuls (~3e-4 score noise; "
                             "the library ctor default, fine when the "
                             "mask-score spread dwarfs the noise); "
                             "'highest' = full f32")
    args = parser.parse_args(argv)

    from xfr_tpu.models import create_wbnet
    from xfr_tpu.inpainting_game.generate import (BBPipeline,
                                                  generate_bb_smaps)
    from xfr_tpu.parallel.mesh import auto_mesh

    mesh = auto_mesh() if args.mesh == "auto" else None

    data_dir = args.data_dir or xfr_tpu.inpaintgame2_dir
    jobs = build_job_table(args.WB_NET, args.SUBJECT_ID, args.MASK_ID,
                           args.filter_img_nums, data_dir)
    shard_index, num_shards = resolve_shards(args)
    jobs = shard_jobs(jobs, shard_index, num_shards)
    if args.shuffle:
        random.shuffle(jobs)
    print("worker %d/%d: %d jobs" % (shard_index, num_shards, len(jobs)))

    BUILTIN = ("resnetv4_pytorch", "resnetv6_pytorch")
    wbnets = {}
    net_dict = {}
    failures = []
    # one pipeline across all jobs: job k's writes overlap job k+1's
    # device scoring queue
    pipeline = BBPipeline()
    for job in jobs:
        if job["net"] not in wbnets:
            wbnets[job["net"]] = create_wbnet(job["net"], ebp_version=6)
            net_dict[(job["net"], 6)] = wbnets[job["net"]]
            if job["net"] == "resnetv4_pytorch":
                # STRise.mean_ebp_prior looks up ('resnetv4_pytorch',
                # None): alias the resident net so the default prior
                # doesn't build a SECOND full ResNet-101 (params, kernel
                # cache, cold compiles) per process.  (Other matchers
                # keep the reference semantics: the prior net is
                # specifically resnetv4, so it must be constructed.)
                net_dict[("resnetv4_pytorch", None)] = wbnets[job["net"]]
        wb = wbnets[job["net"]]
        # builtin matchers get the fused on-device scorer; others keep the
        # host embeddings contract (reference bb driver path)
        scorer = ((job["net"], net_dict) if job["net"] in BUILTIN
                  else make_bb_score_fn(wb))
        try:
            generate_bb_smaps(
                scorer, wb.convert_from_numpy, job["net"],
                job["img_base"], job["subject_id"], job["mask_id"],
                ebp_ver=6, overwrite=args.overwrite,
                rise_scale=args.rise_scale, num_masks=args.num_masks,
                prior_type=args.prior_type, data_dir=data_dir,
                smaps_dir=args.saliency_dir, mesh=mesh,
                pipeline=pipeline,
                score_precision=(None if args.score_precision == "default"
                                 else args.score_precision))
        except Exception as e:
            print("Job failed: %r (%s)" % (job, e))
            failures.append((job, repr(e)))
    pipeline.drain()
    # pending-map failures are recorded under their OWN label by the
    # pipeline (a map drains during a later job's push; attributing its
    # error to that job, or aborting that job's probes, would be wrong)
    failures.extend(pipeline.failures)
    if failures:
        print("\n%d failed jobs:" % len(failures))
        for f in failures:
            print("  %r" % (f,))
        sys.exit(1)


if __name__ == "__main__":
    main()
