"""Whitebox inpainting-game saliency generation driver
(reference: eval/generate_inpaintinggame_wb_saliency_maps_multigpu.py).

The reference scales with one process per GPU fed by a GPU-id queue; here
one process drives one TPU (or a whole slice through jax), and multi-host
runs partition the (net, subject, mask, image) job table deterministically
with --shard-index/--num-shards (or JAX distributed process index), keeping
the reference's shared-filesystem idempotency (--shuffle still supported
for heterogeneous fleets).
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import xfr_tpu


def build_job_table(nets, subject_ids, mask_ids, img_nums, data_dir):
    """Enumerate (net, subject, mask, img_base) jobs from the filtered CSVs
    (reference driver: run_experiments, :121-243)."""
    import pandas as pd

    jobs = []
    for net_name in nets:
        ds = pd.read_csv(os.path.join(
            data_dir, "filtered_masks_threshold-{}.csv".format(net_name)))
        ds = ds.loc[ds["TRIPLET_SET"] == "PROBE"]
        if subject_ids is not None:
            ds = ds.loc[ds["SUBJECT_ID"].isin([int(s) for s in subject_ids])]
        for (sid, mask_id, base), _ in ds.groupby(
                ["SUBJECT_ID", "MASK_ID", "ORIGINAL_BASENAME"]):
            if mask_ids is not None and \
                    int(mask_id) not in [int(m) for m in mask_ids]:
                continue
            if img_nums is not None:
                num = os.path.basename(base)
                if num not in [str(i) for i in img_nums]:
                    continue
            jobs.append(dict(net=net_name, subject_id=int(sid),
                             mask_id="%05d" % int(mask_id), img_base=base))
    return jobs


def shard_jobs(jobs, shard_index, num_shards):
    return [j for i, j in enumerate(jobs) if i % num_shards == shard_index]


def add_common_args(parser):
    parser.add_argument("--subjects", nargs="+", dest="SUBJECT_ID",
                        default=None,
                        help="restrict processing to specific subjects")
    parser.add_argument("--img-num", nargs="*", dest="filter_img_nums",
                        default=None,
                        help="restrict processing to specific image numbers")
    parser.add_argument("--mask", nargs="+", dest="MASK_ID",
                        default=["{:05}".format(m) for m in range(10)],
                        help="restrict processing to specific masks, "
                             "zero padded")
    parser.add_argument("--overwrite", action="store_true",
                        help="force recalculation of saliency maps")
    parser.add_argument("--shuffle", action="store_true",
                        help="randomize job order (multi-machine runs over "
                             "a shared filesystem)")
    parser.add_argument("--shard-index", type=int, default=None,
                        help="this worker's shard (default: JAX process "
                             "index)")
    parser.add_argument("--num-shards", type=int, default=None,
                        help="total workers (default: JAX process count)")
    parser.add_argument("--data-dir", default=None,
                        help="inpainting-game dataset root")
    parser.add_argument("--saliency-dir", default=None,
                        help="saliency map output root")


def resolve_shards(args):
    if args.shard_index is not None or args.num_shards is not None:
        return args.shard_index or 0, args.num_shards or 1
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--net", nargs="+", dest="WB_NET",
                        default=["resnetv4_pytorch"])
    parser.add_argument("--method", nargs="+", dest="METHOD",
                        default=["meanEBP", "contrastive",
                                 "weighted-subtree"])
    parser.add_argument("--ebp-ver", nargs="+", dest="EBP_VER",
                        default=["6"], help="EBP version (leave as default)")
    parser.add_argument("--init-ebp-subtree-mode", nargs="+",
                        dest="INIT_EBP_SUBTREE_MODE", default=[None],
                        help="subtree mode for the Whitebox constructor")
    parser.add_argument("--subtree-mode-weighted", nargs="+",
                        dest="EBP_SUBTREE_MODE_WEIGHTED", default=[None],
                        help="subtree mode for weighted_subtree_ebp")
    parser.add_argument("--wsebp-max-candidates", type=int, default=None,
                        help="cap on weighted-subtree candidate layers "
                             "(None = all, exact reference semantics)")
    parser.add_argument("--batch-size", type=int, default=8,
                        help="probe batch for the batched generation "
                             "pipeline (0 = serial per-job reference flow)")
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="on-device EBP dtype; bfloat16 ~halves the "
                             "weighted-subtree sweep but perturbs "
                             "contrastive maps (see Whitebox docstring)")
    parser.add_argument("--mesh", default="auto", choices=["auto", "off"],
                        help="auto: one process shards probe batches over "
                             "all visible devices (dp mesh); off: "
                             "single-device")
    parser.add_argument("--contrastive-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="dtype for the contrastive/truncated backward "
                             "passes (default: float32 — bf16 rounding "
                             "dominates the near-equal-map difference, so "
                             "--compute-dtype bfloat16 keeps these f32)")
    parser.add_argument("--wsebp-dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="dtype for the weighted-subtree candidate "
                             "sweep only (default bfloat16: ~1.5x faster, "
                             "quality-gated vs float32 in "
                             "tests/test_compute_dtype.py; contrastive/"
                             "mean paths keep --compute-dtype)")
    args = parser.parse_args(argv)

    from xfr_tpu.models import create_wbnet
    from xfr_tpu.inpainting_game.generate import (generate_wb_smaps,
                                                  generate_wb_smaps_batched)

    data_dir = args.data_dir or xfr_tpu.inpaintgame2_dir
    jobs = build_job_table(args.WB_NET, args.SUBJECT_ID, args.MASK_ID,
                           args.filter_img_nums, data_dir)
    shard_index, num_shards = resolve_shards(args)
    jobs = shard_jobs(jobs, shard_index, num_shards)
    if args.shuffle:
        random.shuffle(jobs)
    print("worker %d/%d: %d jobs" % (shard_index, num_shards, len(jobs)))

    ebp_ver = int(args.EBP_VER[0])
    init_mode = args.INIT_EBP_SUBTREE_MODE[0]
    weighted_mode = args.EBP_SUBTREE_MODE_WEIGHTED[0]

    import jax.numpy as jnp
    from xfr_tpu.parallel.mesh import auto_mesh
    mesh = auto_mesh() if args.mesh == "auto" else None
    cdtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else None
    wsdtype = jnp.bfloat16 if args.wsebp_dtype == "bfloat16" else jnp.float32
    ctdtype = (jnp.bfloat16 if args.contrastive_dtype == "bfloat16"
               else jnp.float32)

    if args.batch_size and args.batch_size > 0:
        # batched pipeline: mean/contrastive/truncated batch across jobs
        failures = []
        for net_name in {j["net"] for j in jobs}:
            wb = create_wbnet(net_name, ebp_version=ebp_ver,
                              ebp_subtree_mode=init_mode)
            if cdtype is not None:
                wb.compute_dtype = cdtype
            wb.wsebp_dtype = wsdtype
            wb.contrastive_dtype = ctdtype
            if mesh is not None:
                wb.use_mesh(mesh)
            net_jobs = [(j["subject_id"], j["mask_id"], j["img_base"])
                        for j in jobs if j["net"] == net_name]
            for method in args.METHOD:
                try:
                    generate_wb_smaps_batched(
                        wb, net_name, net_jobs,
                        subtree_mode_weighted=(weighted_mode or
                                               wb.ebp_subtree_mode()),
                        ebp_ver=ebp_ver, overwrite=args.overwrite,
                        method=method,
                        wsebp_max_candidates=args.wsebp_max_candidates,
                        data_dir=data_dir, smaps_dir=args.saliency_dir,
                        batch_size=args.batch_size)
                except Exception as e:
                    # keep going like the serial branch: a failed (net,
                    # method) pass must not drop the remaining methods/
                    # nets of this shard (completed maps are on disk)
                    print("Batched pass failed: net=%s method=%s (%s)"
                          % (net_name, method, e))
                    failures.append((net_name, method, repr(e)))
        if failures:
            print("\n%d failed batched passes:" % len(failures))
            for f in failures:
                print("  %r" % (f,))
            sys.exit(1)
        return

    wbnets = {}
    failures = []
    for job in jobs:
        if job["net"] not in wbnets:
            wbnets[job["net"]] = create_wbnet(
                job["net"], ebp_version=ebp_ver,
                ebp_subtree_mode=init_mode)
            if cdtype is not None:
                wbnets[job["net"]].compute_dtype = cdtype
            wbnets[job["net"]].wsebp_dtype = wsdtype
            wbnets[job["net"]].contrastive_dtype = ctdtype
            if mesh is not None:
                wbnets[job["net"]].use_mesh(mesh)
        wb = wbnets[job["net"]]
        wmode = weighted_mode or wb.ebp_subtree_mode()
        for method in args.METHOD:
            try:
                generate_wb_smaps(
                    wb, job["net"], job["img_base"], job["subject_id"],
                    job["mask_id"], subtree_mode_weighted=wmode,
                    ebp_ver=ebp_ver, overwrite=args.overwrite,
                    method=method,
                    wsebp_max_candidates=args.wsebp_max_candidates,
                    data_dir=data_dir, smaps_dir=args.saliency_dir)
            except Exception as e:  # keep going like the reference pool
                print("Job failed: %r (%s)" % (job, e))
                failures.append((job, method, repr(e)))
    if failures:
        print("\n%d failed jobs:" % len(failures))
        for f in failures:
            print("  %r" % (f,))
        sys.exit(1)


if __name__ == "__main__":
    main()
