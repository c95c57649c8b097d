"""Per-stage timing of weighted_subtree_ebp_batch on TPU."""
import time

import numpy as np


def main():
    import jax.numpy as jnp
    from xfr_tpu.models import create_wbnet

    wb = create_wbnet("resnetv6_pytorch")
    wb.wsebp_dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    em = rng.rand(512).astype(np.float32)
    en = rng.rand(512).astype(np.float32)
    em /= np.linalg.norm(em)
    en /= np.linalg.norm(en)

    B = 8
    probes = jnp.asarray(rng.rand(B, 3, 224, 224) * 50, jnp.float32)
    wb.set_triplet_classifier_batch(np.tile(em, (B, 1)),
                                    np.tile(en, (B, 1)))
    wb._ebp_subtree_mode = "norelu"

    def t(label, f, n=3):
        f()
        t0 = time.time()
        for _ in range(n):
            out = f()
        dt = (time.time() - t0) / n
        print(f"{label:52s} {dt*1000:8.1f} ms")
        return out

    x_pad, _ = wb._pad_probe_batch(probes)

    def grad_batch():
        s, i, v = wb._wsebp_grad_batch_fn()(wb.net.params, x_pad, gating=True)
        return (np.asarray(s, np.float32), np.asarray(i),
                np.asarray(v, np.float32))

    scores, idxs, vals = t("grad_batch (ranking pass, B=8)", grad_batch)

    sweep = wb._wsebp_sweep_select_fn(32, False)

    def one_sweep():
        smap, sel = sweep(wb.net.params, probes[0:1],
                          jnp.asarray(idxs[0].astype(np.int32)),
                          jnp.asarray(vals[0]), jnp.asarray(scores[0]))
        return np.asarray(smap), np.asarray(sel)

    t("sweep_select x1 (sync)", one_sweep)

    def serial_sync():
        outs = []
        for i in range(B):
            smap, sel = sweep(wb.net.params, probes[i:i + 1],
                              jnp.asarray(idxs[i].astype(np.int32)),
                              jnp.asarray(vals[i]), jnp.asarray(scores[i]))
            outs.append((np.asarray(smap), np.asarray(sel)))
        return outs

    t("sweep_select x8 serial (sync each)", serial_sync, n=2)

    def enqueue_drain():
        devs = []
        for i in range(B):
            devs.append(sweep(wb.net.params, probes[i:i + 1],
                              jnp.asarray(idxs[i].astype(np.int32)),
                              jnp.asarray(vals[i]), jnp.asarray(scores[i])))
        return [(np.asarray(s), np.asarray(m)) for s, m in devs]

    t("sweep_select x8 enqueue-then-drain", enqueue_drain, n=2)

    def full():
        return wb.weighted_subtree_ebp_batch(
            probes, topk=32, subtree_mode="norelu",
            return_subtree_maps=False)

    t("weighted_subtree_ebp_batch full", full, n=2)


if __name__ == "__main__":
    main()
