"""Real-chip A/B: the mesh-native fast paths under a 1-device mesh vs
the single-chip programs, on all three bench stages.

With one physical chip this is the only *hardware* mesh timing
available: the 8-device CPU sim executes shard_map partitions
sequentially (CLAUDE.md round-3 dead end), so it cannot say what the
mesh wrapper costs.  A dp=1 mesh runs the exact shard_map program
structure (sharded step axes, GSPMD partitioning pass, psum in the BB
select/combine) with the per-device shard equal to the whole problem —
if its rates match the single-chip paths within axon noise (~±15%),
``--mesh auto`` provably keeps the round-3/4 throughput story per chip,
and multi-chip scaling is the independent per-device work sharded by
tests/test_mesh_fastpaths parity.

Run SOLO on the chip (1-core host — never concurrently with pytest):
    python tools/_mesh1_ab.py [--stages wb,bb,eval] [--order sms]

--order sms runs single, mesh, single to bracket service drift.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from xfr_tpu.models import create_wbnet  # noqa: E402
from xfr_tpu.parallel.mesh import make_mesh  # noqa: E402


def run(tag, stages, wb_iters, bb_maps, eval_groups):
    wb = create_wbnet("resnetv6_pytorch")
    wb.wsebp_dtype = jnp.bfloat16  # bench.py production default
    mesh = None
    if tag == "mesh":
        mesh = make_mesh((1, 1), ("dp", "mp"), devices=jax.devices()[:1])
        wb.use_mesh(mesh)
    rng = np.random.RandomState(0)
    out = {}
    if "wb" in stages:
        t = bench.bench_whitebox(wb, rng, n_iters=wb_iters)
        out["wb_maps_per_s"] = {"rate": round(32 * len(t) / sum(t), 2),
                                "median": round(32 / float(np.median(t)), 2),
                                "times": [round(x, 3) for x in t]}
    wb.net.reset_classifier()
    if "bb" in stages:
        t = bench.bench_blackbox(wb, rng, n_maps=bb_maps, mesh=mesh)
        out["bb_maps_per_s"] = {"rate": round(len(t) / sum(t), 3),
                                "median": round(1 / float(np.median(t)), 3),
                                "times": [round(x, 3) for x in t]}
    if "eval" in stages:
        t = bench.bench_eval(wb, rng, n_groups=eval_groups)
        out["eval_per_s"] = {"rate": round(4 * len(t) / sum(t), 2),
                             "median": round(4 / float(np.median(t)), 2),
                             "times": [round(x, 3) for x in t]}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="wb,bb,eval")
    ap.add_argument("--order", default="sm",
                    help="run order, one letter per pass: s=single m=mesh")
    ap.add_argument("--wb-iters", type=int, default=4)
    ap.add_argument("--bb-maps", type=int, default=3)
    ap.add_argument("--eval-groups", type=int, default=6)
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    results = []
    for ch in args.order:
        tag = {"s": "single", "m": "mesh"}[ch]
        r = run(tag, stages, args.wb_iters, args.bb_maps, args.eval_groups)
        results.append({"tag": tag, **r})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
