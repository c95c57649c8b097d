"""Pallas fused mask-blend kernel vs the reference jnp pipeline
(interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from xfr_tpu.blackbox import masks as M
from xfr_tpu.blackbox.pallas_blend import fused_mask_blend_preprocess


def test_fused_blend_matches_jnp_pipeline():
    rng = np.random.RandomState(0)
    n, scale = 6, 12
    H = W = 96
    gh = gw = int(np.ceil(H / scale))
    grids = (rng.rand(n, gh, gw) > 0.2).astype(np.float32)
    shifts = rng.randint(0, scale, (n, 2)).astype(np.int32)
    probe = (rng.rand(H, W, 3) * 255).astype(np.float32)
    fill = np.asarray(M.gaussian_blur(jnp.asarray(probe), 4.0))
    mean = np.array([122.782, 117.001, 104.298], np.float32)

    # reference path: upsample to (H+s, W+s), crop at shift, blend, preprocess
    big = np.asarray(M.resize_bilinear(jnp.asarray(grids),
                                       (H + scale, W + scale)))
    expected = np.zeros((n, 3, H, W), np.float32)
    for i in range(n):
        m = big[i, shifts[i, 0]:shifts[i, 0] + H,
                shifts[i, 1]:shifts[i, 1] + W]
        blend = m[:, :, None] * probe + (1 - m[:, :, None]) * fill
        expected[i] = (blend - mean).transpose(2, 0, 1)

    got = np.asarray(fused_mask_blend_preprocess(
        jnp.asarray(grids), jnp.asarray(shifts), jnp.asarray(probe),
        jnp.asarray(fill), mean, mask_scale=scale, interpret=True))

    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3)
