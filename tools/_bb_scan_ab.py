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
        return (rs.reshape(nchunk * BS, -1),
                gs.reshape(nchunk * BS, -1))

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
    import sys
    if len(sys.argv) == 1:
        main()


def rank_quality():
    """Rank-overlap quality of each scorer variant vs a 'highest'
    -precision reference: default-precision chunked (production), default
    scan, bf16_3x ('high') scan."""
    import jax

    wb = create_wbnet("resnetv6_pytorch", ebp_version=6)
    rng = np.random.RandomState(0)
    probe = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
    refs = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    gals = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    st = STRise(probe=probe, refs=refs, gallery=gals,
                black_box="resnetv6_pytorch",
                net_dict={("resnetv6_pytorch", 6): wb},
                mask_scale=12, num_mask_elements=2,
                mask_fill_type="blur", blur_fill_sigma_percent=4,
                num_masks=NUM_MASKS, seed=0, prior_type="uniform")
    st.priors[st.prior_type]()
    st.generate_masks()
    st.apply_masks()
    st.score_masks()
    prod = np.array(st.mask_scores)

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

    def make_scan(prec):
        @jax.jit
        def scan_score(params, masks_c, probe, fill, ref_e, gal_e):
            def body(carry, mchunk):
                blends = (mchunk[..., None] * probe +
                          (1.0 - mchunk[..., None]) * fill)
                x = preprocess_resnet101_batch(blends)
                rs, gs = _encode_and_score(graph, enc, params, x,
                                           ref_e, gal_e)
                return carry, (rs, gs)

            _, (rs, gs) = jax.lax.scan(body, 0, masks_c)
            return (rs.reshape(nchunk * BS, -1),
                    gs.reshape(nchunk * BS, -1))

        def run(*a):
            with jax.default_matmul_precision(prec):
                return scan_score(*a)

        return run

    probe_d = jnp.asarray(st.probe, jnp.float32)
    ref_e = jnp.asarray(st._embed_collection(wb, st.refs), jnp.float32)
    gal_e = jnp.asarray(st._embed_collection(wb, st.gallery), jnp.float32)
    fill_d = st._fill_dev

    def triplet(rs, gs):
        # same scoring tail as STRise.triplet_scoring_fn on host
        st.masked_probe_ref_scores = np.asarray(rs)[:n]
        st.masked_probe_gallery_scores = np.asarray(gs)[:n]
        return np.array(st.triplet_scoring_fn())

    out = {}
    for name, prec in (("scan_default", None), ("scan_high", "high"),
                       ("scan_highest", "highest")):
        fn = make_scan(prec) if prec else make_scan("default")
        t0 = time.time()
        rs, gs = fn(wb.net.params, masks_c, probe_d, fill_d, ref_e, gal_e)
        s = triplet(rs, gs)
        dt = time.time() - t0
        # re-time warm
        t0 = time.time()
        rs, gs = fn(wb.net.params, masks_c, probe_d, fill_d, ref_e, gal_e)
        s = triplet(rs, gs)
        dt = time.time() - t0
        out[name] = (s, dt)
        print(f"{name:14s} {dt*1000:6.0f} ms")

    ref_scores = out["scan_highest"][0]
    k = n // 5
    topref = set(np.argsort(ref_scores)[-k:])

    for name in ("scan_default", "scan_high"):
        s = out[name][0]
        ov = len(topref & set(np.argsort(s)[-k:])) / k
        print(f"{name:14s} top-20% overlap vs highest: {ov:.3f}  "
              f"max|ds|={np.abs(s-ref_scores).max():.2e}")
    ovp = len(topref & set(np.argsort(prod)[-k:])) / k
    print(f"{'prod_chunked':14s} top-20% overlap vs highest: {ovp:.3f}  "
          f"max|ds|={np.abs(prod-ref_scores).max():.2e}")


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "quality":
        rank_quality()
        sys.exit(0)


def map_quality():
    """Map-level (not rank-level) quality: the saliency map is a weighted
    combine over all masks, so per-score noise may average out even when
    top-k ranks shuffle.  Compare final maps per scorer variant."""
    import jax

    wb = create_wbnet("resnetv6_pytorch", ebp_version=6)
    rng = np.random.RandomState(0)
    probe = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
    refs = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    gals = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    refs = [np.clip(probe.astype(int) + rng.randint(-20, 20, probe.shape),
                    0, 255).astype(np.uint8) for _ in range(2)]
    st = STRise(probe=probe, refs=refs, gallery=gals,
                black_box="resnetv6_pytorch",
                net_dict={("resnetv6_pytorch", 6): wb},
                mask_scale=12, num_mask_elements=2,
                mask_fill_type="blur", blur_fill_sigma_percent=4,
                num_masks=NUM_MASKS, seed=0, prior_type="uniform")
    st.priors[st.prior_type]()
    st.generate_masks()
    st.apply_masks()

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
            rs, gs = _encode_and_score(graph, enc, params, x,
                                       ref_e, gal_e)
            return carry, (rs, gs)

        _, (rs, gs) = jax.lax.scan(body, 0, masks_c)
        return (rs.reshape(nchunk * BS, -1), gs.reshape(nchunk * BS, -1))

    probe_d = jnp.asarray(st.probe, jnp.float32)
    ref_e_np = st._embed_collection(wb, st.refs)
    gal_e_np = st._embed_collection(wb, st.gallery)
    ref_e = jnp.asarray(ref_e_np, jnp.float32)
    gal_e = jnp.asarray(gal_e_np, jnp.float32)
    fill_d = st._fill_dev
    from xfr_tpu.blackbox.strise import _l2_similarity
    pe = st._embed_collection(wb, [st.probe])
    st.original_probe_ref_scores = _l2_similarity(pe, ref_e_np)
    st.original_probe_gallery_scores = _l2_similarity(pe, gal_e_np)

    maps = {}
    for name, prec in (("scan_default", "default"),
                       ("scan_highest", "highest")):
        with jax.default_matmul_precision(prec):
            rs, gs = scan_score(wb.net.params, masks_c, probe_d, fill_d,
                                ref_e, gal_e)
        st.masked_probe_ref_scores = np.asarray(rs)[:n]
        st.masked_probe_gallery_scores = np.asarray(gs)[:n]
        st.mask_scores = st.triplet_scoring_fn()
        st.compute_saliency_map()
        maps[name] = np.array(st.saliency_map)

    st.score_masks()  # production chunked default
    st.compute_saliency_map()
    maps["prod_chunked"] = np.array(st.saliency_map)

    ref = maps["scan_highest"]
    for name in ("scan_default", "prod_chunked"):
        m = maps[name]
        corr = np.corrcoef(m.ravel(), ref.ravel())[0, 1]
        rel = np.abs(m - ref).max() / (ref.max() - ref.min())
        print(f"{name:14s} map corr vs highest: {corr:.6f}  "
              f"max|dmap|/range: {rel:.2e}")


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "mapq":
        map_quality()
        sys.exit(0)
