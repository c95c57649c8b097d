"""A/B: STRise mask scoring as 102 async chunk dispatches (production)
vs ONE lax.scan program over all chunks.

Run on the TPU chip: python tools/_bb_scan_ab.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import xfr_tpu  # noqa: F401
from xfr_tpu.models import create_wbnet
from xfr_tpu.blackbox import STRise

NUM_MASKS = 6500
BS = 64


def main():
    wb = create_wbnet("resnetv6_pytorch", ebp_version=6)
    rng = np.random.RandomState(0)
    probe = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
    refs = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    gals = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    net_dict = {("resnetv6_pytorch", 6): wb}
    st = STRise(probe=probe, refs=refs, gallery=gals,
                black_box="resnetv6_pytorch", net_dict=net_dict,
                mask_scale=12, num_mask_elements=2,
                mask_fill_type="blur", blur_fill_sigma_percent=4,
                num_masks=NUM_MASKS, seed=0, prior_type="uniform")

    # ---- production path
    st.priors[st.prior_type]()
    st.generate_masks()
    st.apply_masks()
    st.score_masks()  # compile + warm
    t0 = time.time()
    for _ in range(3):
        st.score_masks()
    t_prod = (time.time() - t0) / 3
    ref_scores = np.array(st.masked_probe_ref_scores)
    gal_scores = np.array(st.masked_probe_gallery_scores)

    # ---- scanned path: one program over all chunks
    from xfr_tpu.models.resnet101 import preprocess_resnet101_batch
    from xfr_tpu.blackbox.strise import _encode_and_score

    graph, enc = wb.net.graph, wb.net.encode_tensor
    n = NUM_MASKS
    pad = (-n) % BS
    masks = st._masks_dev
    if pad:
        masks = jnp.concatenate(
            [masks, jnp.zeros((pad,) + masks.shape[1:], masks.dtype)])
    nchunk = (n + pad) // BS
    masks_c = masks.reshape(nchunk, BS, *masks.shape[1:])

    @jax.jit
    def scan_score(params, masks_c, probe, fill, ref_e, gal_e):
        def body(carry, mchunk):
            blends = (mchunk[..., None] * probe +
                      (1.0 - mchunk[..., None]) * fill)
            x = preprocess_resnet101_batch(blends)
            rs, gs = _encode_and_score(graph, enc, params, x, ref_e, gal_e)
            return carry, (rs, gs)

        _, (rs, gs) = jax.lax.scan(body, 0, masks_c)
        return rs.reshape(-1), gs.reshape(-1)

    probe_d = jnp.asarray(st.probe, jnp.float32)
    ref_e = jnp.asarray(st._embed_collection(wb, st.refs), jnp.float32)
    gal_e = jnp.asarray(st._embed_collection(wb, st.gallery), jnp.float32)
    fill_d = st._fill_dev

    rs, gs = scan_score(wb.net.params, masks_c, probe_d, fill_d,
                        ref_e, gal_e)
    np.asarray(rs)  # compile + warm
    t0 = time.time()
    for _ in range(3):
        rs, gs = scan_score(wb.net.params, masks_c, probe_d, fill_d,
                            ref_e, gal_e)
        out = (np.asarray(rs), np.asarray(gs))
    t_scan = (time.time() - t0) / 3

    print(f"production 102-dispatch loop: {t_prod*1000:.0f} ms/map")
    print(f"single scanned program:       {t_scan*1000:.0f} ms/map")
    err = max(np.abs(out[0][:n] - ref_scores).max(),
              np.abs(out[1][:n] - gal_scores).max())
    print(f"max |score diff| vs production: {err:.2e}")


if __name__ == "__main__":
    main()
