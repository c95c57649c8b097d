"""Device-side sparse mask generation and image filling for STRise.

The reference generates masks on host with per-mask python loops
(reference: python/xfr/models/blackbox.py:299-364): prior-weighted
``np.random.choice`` without replacement per mask, per-mask skimage resize
with a random crop shift, and numpy blending.  Here the whole pipeline is
jittable jnp: without-replacement sampling is the Gumbel-top-k trick
(distributionally exact for categorical sampling without replacement),
upsampling is one batched bilinear resize, shifting is a vmapped
dynamic-slice, and blending/preprocessing fuse into the scoring forward.

Known divergences from the reference (documented, tolerance-level):
  * JAX PRNG, not numpy MT19937 — seeded notebook goldens can't bit-match.
  * jax.image.resize 'linear' vs skimage.transform.resize order=1
    boundary handling.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_blur(img, sigma, truncate=4.0):
    """skimage.filters.gaussian equivalent on device: separable gaussian,
    'nearest' (edge) padding.  img: [..., H, W] or [H, W, C] with
    channel_last=True handled by blurring the first two trailing spatial
    axes explicitly."""
    if sigma <= 0:
        return img
    radius = int(truncate * float(sigma) + 0.5)
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (xs / float(sigma)) ** 2)
    k = jnp.asarray(k / k.sum(), img.dtype)

    def blur_axis(a, axis):
        a = jnp.moveaxis(a, axis, -1)
        shp = a.shape
        flat = a.reshape(-1, shp[-1])
        padded = jnp.pad(flat, ((0, 0), (radius, radius)), mode="edge")
        out = jax.vmap(lambda r: jnp.convolve(r, k, mode="valid"))(padded)
        return jnp.moveaxis(out.reshape(shp), -1, axis)

    # Blur the two spatial axes: [H,W], [H,W,C] (channel-last) or [N,H,W].
    if img.ndim == 2 or (img.ndim == 3 and img.shape[-1] in (1, 3, 4)):
        return blur_axis(blur_axis(img, 0), 1)
    return blur_axis(blur_axis(img, 1), 2)


def resize_bilinear(img, shape):
    """jax.image.resize linear wrapper (non-interpolated leading dims)."""
    out_shape = img.shape[:img.ndim - len(shape)] + tuple(shape)
    return jax.image.resize(img, out_shape, method="linear")


def prior_to_grid(prior, mask_scale, prior_type="mean_ebp", pct=50.0):
    """Prior map [H,W] -> normalized sampling grid [gh,gw]
    (reference: blackbox.py:299-318): downscale with anti-aliasing, clip
    below the pct-percentile to zero, optionally binarize (uniform prior),
    normalize to a distribution."""
    h, w = prior.shape
    gh = int(math.ceil(h / mask_scale))
    gw = int(math.ceil(w / mask_scale))
    # anti-aliased downscale (skimage recipe: gaussian with
    # sigma=(factor-1)/2, then interpolate)
    factor = max(h / gh, w / gw)
    sig = max(0.0, (factor - 1) / 2.0)
    blurred = gaussian_blur(jnp.asarray(prior, jnp.float32), sig)
    grid = resize_bilinear(blurred, (gh, gw))

    threshold = jnp.percentile(grid, pct)
    grid = jnp.where(grid < threshold, 0.0, grid)
    if prior_type == "uniform":
        grid = (grid > 0).astype(jnp.float32)
    return grid / jnp.sum(grid)


def check_grid_capacity(prior_shape, mask_scale, num_elements, pct=50.0):
    """Static guard for the sparse-mask sampler: the pct-percentile prior
    clip (prior_to_grid) keeps only ~the top (100-pct)% of grid cells, so
    asking for more elements than that makes Gumbel-top-k silently pick
    -inf (zero-probability) cells in index order — garbage masks.  The
    reference fails loudly here (np.random.choice replace=False raises
    'Fewer non-zero entries in p than size', blackbox.py:320-323); the
    zero-sync device pipeline cannot count positives per prior, so the
    guaranteed-capacity bound is checked at trace time instead."""
    gh = int(math.ceil(prior_shape[0] / mask_scale))
    gw = int(math.ceil(prior_shape[1] / mask_scale))
    avail = int(math.ceil(gh * gw * (100.0 - pct) / 100.0))
    if num_elements > avail:
        raise ValueError(
            "num_mask_elements=%d exceeds the %dx%d sampling grid's "
            "guaranteed positive cells after the %g%%-percentile prior "
            "clip (~%d): raise mask_scale resolution or lower "
            "num_mask_elements" % (num_elements, gh, gw, pct, avail))


def sample_sparse_grids(key, grid_probs, num_masks, num_elements):
    """[num_masks, gh, gw] binary grids with ``num_elements`` zeros each,
    cells chosen without replacement with probability proportional to
    ``grid_probs`` (Gumbel-top-k; reference: blackbox.py:320-323).
    Callers should pre-validate with :func:`check_grid_capacity` (this
    runs under jit, where a data-dependent raise is impossible)."""
    gh, gw = grid_probs.shape
    logp = jnp.where(grid_probs > 0, jnp.log(grid_probs), -jnp.inf)
    gumbel = jax.random.gumbel(key, (num_masks, gh * gw), jnp.float32)
    _, idx = jax.lax.top_k(logp.reshape(1, -1) + gumbel, num_elements)
    hit = jax.nn.one_hot(idx, gh * gw, dtype=jnp.float32).sum(axis=1)
    return (1.0 - hit).reshape(num_masks, gh, gw)


def upsample_shift_masks(key, grids, input_size, mask_scale,
                         random_shift=True):
    """Bilinear-upsample binary grids to (input+scale)^2 and crop a randomly
    shifted input_size window (reference: blackbox.py:325-336)."""
    n, gh, gw = grids.shape
    hh, ww = input_size[0] + mask_scale, input_size[1] + mask_scale
    big = resize_bilinear(grids, (hh, ww))
    if not random_shift:
        return resize_bilinear(grids, tuple(input_size))
    shifts = jax.random.randint(key, (n, 2), 0, mask_scale)

    def crop(m, s):
        return jax.lax.dynamic_slice(m, (s[0], s[1]), tuple(input_size))

    return jax.vmap(crop)(big, shifts)


from functools import partial


@partial(jax.jit, static_argnums=(2, 3))
def upsample_shift_masks_static(grids, shifts, input_size, mask_scale):
    """upsample_shift_masks with precomputed shifts (pallas-path lazy mask
    materialization)."""
    hh, ww = input_size[0] + mask_scale, input_size[1] + mask_scale
    big = resize_bilinear(grids, (hh, ww))

    def crop(m, s):
        return jax.lax.dynamic_slice(m, (s[0], s[1]), tuple(input_size))

    return jax.vmap(crop)(big, shifts)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def make_masks(key, prior, num_masks, mask_scale, num_elements,
               prior_type="mean_ebp", random_shift=True):
    """Full mask pipeline: prior [H,W] -> masks [N,H,W] float in [0,1].

    jitted end-to-end (one ~60 ms device launch for 6500 masks; the same
    pipeline dispatched eagerly costs >1 s in op-by-op overhead)."""
    # a uniform prior binarizes to all-ones after the clip (every cell
    # equals the percentile), so its capacity is the whole grid
    check_grid_capacity(prior.shape, mask_scale, num_elements,
                        pct=0.0 if prior_type == "uniform" else 50.0)
    kg, ks = jax.random.split(jnp.asarray(key))
    grid_probs = prior_to_grid(prior, mask_scale, prior_type)
    grids = sample_sparse_grids(kg, grid_probs, num_masks, num_elements)
    return upsample_shift_masks(ks, grids, prior.shape, mask_scale,
                                random_shift)
