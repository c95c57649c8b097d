"""Break down the inpainting-game eval unit (~206 ms at round-3 bench):
mask creation (host), packbits, image upload, bits upload, device
blend+encode, final transfer, IoU host work.  Run on the real chip."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from xfr_tpu.models import create_wbnet
from xfr_tpu.inpainting_game import protocol as ipg


def t(label, fn, n=5):
    fn()  # warm
    t0 = time.time()
    for _ in range(n):
        out = fn()
    dt = (time.time() - t0) / n * 1000
    print(f"{label:44s} {dt:8.1f} ms")
    return out


def main():
    wb = create_wbnet("resnetv6_pytorch", ebp_version=6)
    rng = np.random.RandomState(0)
    percentiles = np.unique(np.sort(np.append(np.arange(0, 100, 1),
                                              [0, 100])))
    orig = (rng.rand(3, 224, 224) * 50).astype(np.float32)
    inp = orig + (rng.rand(3, 224, 224) * 30).astype(np.float32)
    smap = rng.rand(224, 224).astype(np.float64)
    smap[60:120, 80:150] += 4.0
    smap /= smap.sum()
    gt = np.zeros((224, 224), bool)
    gt[60:120, 80:150] = True

    def embed(ims):
        e = np.asarray(wb.embeddings(np.stack(ims)))
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        m = e.mean(axis=0, keepdims=True)
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    og = embed([orig + rng.rand(3, 224, 224).astype(np.float32)
                for _ in range(2)])
    ig = embed([inp + rng.rand(3, 224, 224).astype(np.float32)
                for _ in range(2)])

    masks = t("create_threshold_masks", lambda: ipg.create_threshold_masks(
        smap, "percent-density", percentiles=percentiles, seed=7,
        include_zero_elements=False))
    T = masks.shape[0]
    bits = t("packbits", lambda: np.packbits(masks.reshape(T, -1), axis=1))

    t("upload orig+inp (1.2 MB)", lambda: jax.block_until_ready(
        (jnp.asarray(orig), jnp.asarray(inp))))
    t("upload bits (0.6 MB)", lambda: jax.block_until_ready(
        jnp.asarray(bits)))

    # full blend_embeddings
    t("blend_embeddings total", lambda: wb.blend_embeddings(
        orig, inp, masks, norm=True))

    # device-resident inputs: isolate program time
    orig_d = jnp.asarray(orig)
    inp_d = jnp.asarray(inp)
    pad = (-T) % wb.batch_size
    bits_p = np.concatenate([bits, np.zeros((pad, bits.shape[1]),
                                            np.uint8)])
    bits_d = jnp.asarray(bits_p)
    fn = wb._blend_encode_fn()

    def run_dev():
        chunks = [fn(wb.net.params, orig_d, inp_d,
                     bits_d[i:i + wb.batch_size])
                  for i in range(0, T + pad, wb.batch_size)]
        return np.asarray(jnp.concatenate(chunks))

    t("device blend+encode (pre-uploaded)", run_dev)

    t("IoU (host)", lambda: ipg.intersect_over_union_thresholded_saliency(
        smap, gt, "percent-density", percentiles=percentiles, seed=7,
        include_zero_elements=False))

    t("full twin-cls eval", lambda: ipg.classified_as_inpainted_twin(
        wb, orig, inp, og, ig, smap,
        mask_threshold_method="percent-density",
        percentiles=percentiles, seed=7, include_zero_elements=False))

    def full_unit():
        ipg.classified_as_inpainted_twin(
            wb, orig, inp, og, ig, smap,
            mask_threshold_method="percent-density",
            percentiles=percentiles, seed=7, include_zero_elements=False)
        ipg.intersect_over_union_thresholded_saliency(
            smap, gt, "percent-density", percentiles=percentiles, seed=7,
            include_zero_elements=False)

    t("full unit (twin-cls + IoU)", full_unit)


if __name__ == "__main__":
    main()
