"""Pallas TPU kernel: fused sparse-mask upsample + shift + blend +
preprocess for STRise.

The jnp pipeline materializes [N, H, W] float masks in HBM (1.3 GB at
N=6500) and re-reads them to blend each chunk
(xfr_tpu/blackbox/masks.py:upsample_shift_masks + strise blend).  This
kernel computes each masked, mean-subtracted probe directly from the tiny
[gh, gw] binary grid:

  bilinear upsample is separable, so the mask is two small matmuls
  m = R @ grid @ C^T, where R[H, gh] / C[W, gw] are interpolation matrices
  built in-kernel from the per-mask random crop shift; the blend with the
  fill image and the mean subtraction fuse into the same VMEM tile.

One program per mask; probe/fill stay resident in VMEM across the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_matrix(n_out, n_in, big, shift):
    """[n_out, n_in] bilinear interpolation weights for sampling a length
    ``n_in`` signal at the half-pixel-centered grid of a length ``big``
    upsample, cropped starting at ``shift`` (jax.image.resize 'linear'
    semantics with clamped edges)."""
    scale = n_in / big
    # TPU iota must be integer; cast after
    i = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0) \
        .astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1) \
        .astype(jnp.float32)
    src = (i + shift.astype(jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, n_in - 1.0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src - k))


def _blend_kernel(grid_ref, shift_ref, probe_ref, fill_ref, mean_ref,
                  out_ref, *, big_h, big_w, H, W):
    # CHW layout throughout: an HWC VMEM buffer pads the 3-channel lane
    # dim to 128 (25 MB per image) and blows the 16 MB VMEM budget.
    grid = grid_ref[0]                   # [gh, gw]
    gh, gw = grid.shape
    i = pl.program_id(0)
    sx = shift_ref[i, 0]                 # row shift
    sy = shift_ref[i, 1]                 # col shift

    R = _interp_matrix(H, gh, big_h, sx)          # [H, gh]
    C = _interp_matrix(W, gw, big_w, sy)          # [W, gw]
    m = jnp.dot(jnp.dot(R, grid, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST),
                C.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [H, W]

    for c in range(3):                   # static channel loop
        blend = m * probe_ref[c] + (1.0 - m) * fill_ref[c]
        out_ref[0, c] = blend - mean_ref[0, c]


@functools.partial(jax.jit, static_argnames=("mask_scale", "interpret"))
def fused_mask_blend_preprocess(grids, shifts, probe, fill, mean,
                                mask_scale=12, interpret=False):
    """[N,gh,gw] grids + [N,2] shifts + [H,W,3] probe/fill + [3] mean ->
    [N,3,H,W] preprocessed masked probes.

    Equivalent to upsample_shift_masks + blend + (x - mean).transpose but
    without materializing the [N,H,W] masks in HBM.
    """
    n, gh, gw = grids.shape
    H, W, _ = probe.shape
    big_h, big_w = H + mask_scale, W + mask_scale

    kernel = functools.partial(_blend_kernel, big_h=big_h, big_w=big_w,
                               H=H, W=W)
    probe_chw = jnp.transpose(probe.astype(jnp.float32), (2, 0, 1))
    fill_chw = jnp.transpose(fill.astype(jnp.float32), (2, 0, 1))
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, gh, gw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # shifts: full [N,2]
            pl.BlockSpec((3, H, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, H, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mean: [1,3]
        ],
        out_specs=pl.BlockSpec((1, 3, H, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3, H, W), jnp.float32),
        interpret=interpret,
    )(grids.astype(jnp.float32), shifts.astype(jnp.int32),
      probe_chw, fill_chw, jnp.asarray(mean, jnp.float32).reshape(1, 3))
