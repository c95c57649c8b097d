"""A/B blend_batch (mono blend+encode scan step rows) through the FULL
eval unit (bench.bench_eval) on the chip.

The T=101 percent-density sweep runs nchunk x bs scan rows: bs=32 pads
101 -> 128 rows (21% wasted encodes); bs=34 -> 102 (1%), bs=26 -> 104
(3%) at one fewer / same dispatch count.  Only whole-unit timings are
trustworthy on axon (the 128-row step looked 11% faster standalone but
was 10-15% slower through the unit).

Run: python tools/_blend_bs_ab.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    from xfr_tpu.models import create_wbnet
    import bench

    wb = create_wbnet("resnetv6_pytorch")
    wb.wsebp_dtype = jnp.bfloat16

    for bs in (32, 34, 26, 36):
        wb.blend_batch = bs
        rng = np.random.RandomState(0)
        t = bench.bench_eval(wb, rng, n_groups=12)
        ev = 4 * len(t) / sum(t)
        rows = -(-101 // bs) * bs
        print(f"blend_batch={bs:3d} ({rows} rows) "
              f"{ev:6.2f} evals/s  ({1000.0/ev:6.1f} ms/unit)", flush=True)


if __name__ == "__main__":
    main()
