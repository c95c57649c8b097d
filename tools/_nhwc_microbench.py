"""NCHW vs NHWC layout microbench for the wsebp sweep's conv work.

The sweep's cost is conv vjps (dgrad wrt input) with the candidate rows
as the batch axis.  Representative ResNet-101 shapes at the per-bucket
row count (378 candidates / 12 buckets ~ 32 rows).  Round-1 suggested
trying NHWC for the conv-transpose chain; this measures it in isolation.

All shapes chain inside ONE jitted program (repeated REPS times,
scalar output) so per-dispatch link latency (~45 ms on axon) cannot
pollute the comparison — a per-call variant showed every 1x1 conv at a
flat ~45 ms regardless of FLOPs/layout/dtype, i.e. pure dispatch.

Run on the TPU chip: python tools/_nhwc_microbench.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import xfr_tpu  # noqa: F401  (persistent compilation cache)

SHAPES = [  # (C_in, C_out, HW, k)
    (256, 64, 56, 1), (64, 64, 56, 3), (512, 128, 28, 1),
    (128, 128, 28, 3), (1024, 256, 14, 1), (256, 256, 14, 3),
    (2048, 512, 7, 1), (512, 512, 7, 3),
]
ROWS = 32
REPS = 8


def build(dn, dtype, mode):
    rng = np.random.RandomState(0)
    xs, ws, gs = [], [], []
    for (ci, co, hw, k) in SHAPES:
        if dn[0] == "NCHW":
            xs.append(jnp.asarray(rng.rand(ROWS, ci, hw, hw), dtype))
            gs.append(jnp.asarray(rng.rand(ROWS, co, hw, hw), dtype))
            ws.append(jnp.asarray(rng.rand(co, ci, k, k), dtype))
        else:
            xs.append(jnp.asarray(rng.rand(ROWS, hw, hw, ci), dtype))
            gs.append(jnp.asarray(rng.rand(ROWS, hw, hw, co), dtype))
            ws.append(jnp.asarray(rng.rand(k, k, ci, co), dtype))

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=dn)

    @jax.jit
    def prog(xs, ws, gs):
        acc = jnp.zeros((), jnp.float32)
        for r in range(REPS):
            for x, w, g in zip(xs, ws, gs):
                xr = x + acc.astype(x.dtype)  # serialize reps
                if mode == "fwd":
                    y = conv(xr, w)
                    acc = acc + y.astype(jnp.float32).sum() * 1e-12
                else:
                    _, vjp = jax.vjp(lambda xx: conv(xx, w), xr)
                    dx = vjp(g)[0]
                    acc = acc + dx.astype(jnp.float32).sum() * 1e-12
        return acc

    return prog, (xs, ws, gs)


def flops(mode):
    f = 0
    for (ci, co, hw, k) in SHAPES:
        f += 2 * ROWS * hw * hw * ci * co * k * k
    return f * REPS


def main():
    print("device:", jax.devices()[0])
    for dtype in (jnp.float32, jnp.bfloat16):
        for mode in ("fwd", "dgrad"):
            line = []
            for name, dn in (("NCHW", ("NCHW", "OIHW", "NCHW")),
                             ("NHWC", ("NHWC", "HWIO", "NHWC"))):
                prog, args = build(dn, dtype, mode)
                np.asarray(prog(*args))  # compile+run
                n = 10
                t0 = time.time()
                for _ in range(n):
                    r = prog(*args)
                np.asarray(r)
                dt = (time.time() - t0) / n
                line.append("%s %7.2f ms (%5.1f TFLOP/s)"
                            % (name, dt * 1e3, flops(mode) / dt / 1e12))
            print("%s %-5s  %s" % (dtype.__name__, mode, "   ".join(line)))


if __name__ == "__main__":
    main()
