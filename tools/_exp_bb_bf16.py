"""Experiment: STRise fused-scorer dtype (f32 vs bf16) on TPU."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from xfr_tpu.blackbox import STRise
    from xfr_tpu.models import create_wbnet

    wb = create_wbnet("resnetv4_pytorch")
    rng = np.random.RandomState(0)
    probe = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
    refs = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    gal = [(rng.rand(224, 224, 3) * 255).astype(np.uint8) for _ in range(2)]

    def build():
        return STRise(probe=probe, refs=refs, gallery=gal,
                      black_box="resnetv4_pytorch",
                      net_dict={("resnetv4_pytorch", 6): wb},
                      prior_type="uniform", num_masks=6500, mask_scale=12,
                      num_mask_elements=2, seed=0)

    s = build()
    s.evaluate()  # sets prior, masks, fill; compiles everything

    def run():
        s.score_masks()
        return s.masked_probe_ref_scores

    t0 = time.time()
    for _ in range(3):
        ref_scores_f32 = run()
    t32 = (time.time() - t0) / 3
    print(f"score_masks f32 (6500 masks): {t32*1000:.0f} ms")

    # monkeypatch a bf16 scorer
    from xfr_tpu.ebp import interpreter as I
    from xfr_tpu.models.resnet101 import preprocess_resnet101_batch
    graph, enc = wb.net.graph, wb.net.encode_tensor

    @jax.jit
    def score_chunk_bf16(params, masks, probe, fill, ref_e, gal_e):
        blends = (masks[..., None] * probe +
                  (1.0 - masks[..., None]) * fill)
        x = preprocess_resnet101_batch(blends).astype(jnp.bfloat16)
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        values = I.forward_clean(graph, params, x)
        e = values[enc].reshape(masks.shape[0], -1).astype(jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        ref_s = 1.0 - 0.5 * jnp.linalg.norm(
            e[:, None, :] - ref_e[None], axis=2)
        gal_s = 1.0 - 0.5 * jnp.linalg.norm(
            e[:, None, :] - gal_e[None], axis=2)
        return ref_s, gal_s

    s._fused_scorer_fn = score_chunk_bf16
    run()
    t0 = time.time()
    for _ in range(3):
        ref_scores_bf16 = run()
    t16 = (time.time() - t0) / 3
    print(f"score_masks bf16 (6500 masks): {t16*1000:.0f} ms")
    d = np.abs(ref_scores_bf16 - ref_scores_f32)
    print(f"score delta: max {d.max():.4g} mean {d.mean():.4g} "
          f"(score std {ref_scores_f32.std():.4g})")
    # rank agreement of the top-20% positive masks (what selection uses)
    r32 = np.argsort(ref_scores_f32.mean(axis=1))[-1300:]
    r16 = np.argsort(ref_scores_bf16.mean(axis=1))[-1300:]
    print("top-20% overlap:", len(set(r32) & set(r16)) / 1300.0)


if __name__ == "__main__":
    main()
