"""Per-component timing of the bench 4-map mix on TPU."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from xfr_tpu.models import create_wbnet

    wb = create_wbnet("resnetv6_pytorch")
    wb.wsebp_dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    mates = jnp.asarray(rng.rand(2, 3, 224, 224) * 50, jnp.float32)
    nonmates = jnp.asarray(rng.rand(2, 3, 224, 224) * 50, jnp.float32)
    em = np.asarray(wb.encode(mates)).mean(0)
    en = np.asarray(wb.encode(nonmates)).mean(0)
    em /= np.linalg.norm(em)
    en /= np.linalg.norm(en)

    B = 8
    probes = jnp.asarray(rng.rand(B, 3, 224, 224) * 50, jnp.float32)
    cmates = np.tile(em / 2500.0, (B, 1))
    cnonmates = np.tile(en / 2500.0, (B, 1))

    def t(label, f, n=3):
        f()  # warmup/compile
        t0 = time.time()
        for _ in range(n):
            out = f()
        dt = (time.time() - t0) / n
        print(f"{label:48s} {dt*1000:8.1f} ms  ({dt*1000/B:6.1f} ms/probe)")
        return out

    # s1: meanEBP
    def s1_device():
        wb.net.reset_classifier()
        Pn_mean = jnp.ones((B, wb.net.num_classes()), jnp.float32)
        pooled, _ = wb._ebp_pooled_fn()(wb.net.params, probes, Pn_mean)
        return np.asarray(pooled, np.float32)

    pooled = t("s1 meanEBP device (pooled+transfer)", s1_device)

    def s1_host():
        return [wb._mwp_to_saliency(pooled[i]) for i in range(B)]

    t("s1 meanEBP host _mwp_to_saliency x8", s1_host)

    # s2/s3: contrastive + truncated fused
    def s23():
        wb.set_triplet_classifier_batch(cmates, cnonmates)
        return wb.contrastive_ebp_batch_both(probes, truncate_percent=20)

    t("s2+s3 contrastive+truncated batch", s23)

    # s4: wsebp
    def s4():
        wb.set_triplet_classifier_batch(np.tile(em, (B, 1)),
                                        np.tile(en, (B, 1)))
        return [r[0] for r in wb.weighted_subtree_ebp_batch(
            probes, topk=32, subtree_mode="norelu",
            return_subtree_maps=False)]

    t("s4 weighted-subtree batch (bf16)", s4)

    # whole mix for reference
    def mix():
        s1 = s1_host()
        a = s23()
        b = s4()
        return s1, a, b

    t("FULL mix", mix, n=2)


if __name__ == "__main__":
    main()
