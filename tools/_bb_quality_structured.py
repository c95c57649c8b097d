"""Structured-weights validation of the BB fast-default quality claim
(verdict r4 #6).

The STRise library default keeps the fast default-precision scan scorer
on the strength of "real checkpoints have far larger mask-score spreads
than the ~1e-4 random-weight bench spread" (CLAUDE.md round-3).  This
tool manufactures a structured surrogate — fine-tune the deterministic
-init ResNet-101 trunk on a synthetic 32-class task with
train.make_train_step until the loss collapses — and then measures, on
the trained net:

  * the mask-score spread (std / range of the 2048 contrastive mask
    scores), vs the ~1e-4 random-weight spread;
  * top-20% rank overlap and saliency-map correlation of the default
    and 'high' scorers against an f32 'highest' reference.

Decision rule: if default reaches >=0.95 top-20% overlap with 'highest'
on the structured net, the fast library default stands; if it collapses
toward the random-weight 0.74-correlation regime, flip the library
default to 'high'.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from xfr_tpu.models import create_wbnet
from xfr_tpu.train import make_train_step
from xfr_tpu.blackbox import STRise

N_CLASSES = 32
N_PER_CLASS = 12
BATCH = 8
STEPS = 600
NUM_MASKS = 2048


def make_class_images(rng, n_classes, n_per_class):
    """Smooth class-prototype images + per-sample noise, uint8 HWC."""
    from PIL import Image

    protos = []
    for _ in range(n_classes):
        g = (rng.rand(14, 14, 3) * 255).astype(np.uint8)
        im = np.asarray(Image.fromarray(g).resize((224, 224),
                                                  Image.BILINEAR))
        protos.append(im)
    ims, labels = [], []
    for c, p in enumerate(protos):
        for _ in range(n_per_class):
            noise = rng.randn(224, 224, 3) * 20
            ims.append(np.clip(p.astype(np.float32) + noise,
                               0, 255).astype(np.uint8))
            labels.append(c)
    return protos, ims, np.asarray(labels, np.int32)


def rank_overlap(a, b, frac=0.2):
    k = int(len(a) * frac)
    ta = set(np.argsort(a)[::-1][:k].tolist())
    tb = set(np.argsort(b)[::-1][:k].tolist())
    return len(ta & tb) / float(k)


def main():
    rng = np.random.RandomState(0)
    wb = create_wbnet("resnetv6_pytorch")
    net = wb.net

    protos, ims, labels = make_class_images(rng, N_CLASSES, N_PER_CLASS)
    x_all = np.concatenate([np.asarray(net.preprocess(im)) for im in ims])
    x_dev = jnp.asarray(x_all)
    y_dev = jnp.asarray(labels)

    # small trainable classifier in place of the 65359-class head
    cls_rng = np.random.RandomState(1)
    net.params = dict(net.params)
    net.params["fc2"] = {
        "w": jnp.asarray(cls_rng.randn(N_CLASSES, 512) * 0.05, jnp.float32),
        "b": jnp.zeros((N_CLASSES,), jnp.float32)}
    net._num_classes = N_CLASSES

    import optax
    # adam + clip: the Multiply(50)-scaled cosine logits make raw steps
    # blow the trunk into a dead constant-embedding region mid-run
    # (measured: loss 9.3 -> 2.8 by step 180, then emb std -> 0); BN
    # running stats frozen by make_train_step's default.
    step, init = make_train_step(
        net.graph, "fc2",
        optimizer=optax.chain(optax.clip_by_global_norm(1.0),
                              optax.adam(1e-4)))
    params, opt = init(net.params)
    from xfr_tpu.ebp import interpreter as I
    monitor = jax.jit(lambda p, x: I.forward_clean(
        net.graph, p, x)[net.encode_tensor])
    t0 = time.time()
    good = params
    for s in range(STEPS):
        idx = jnp.asarray(rng.randint(0, len(ims), BATCH))
        params, opt, loss = step(params, opt, x_dev[idx], y_dev[idx])
        if s % 30 == 0 or s == STEPS - 1:
            emb = np.asarray(monitor(params, x_dev[:2]))
            print("step %3d loss %.4f  emb finite=%s std %.3f (%.0f s)"
                  % (s, float(loss), np.isfinite(emb).all(), emb.std(),
                     time.time() - t0), flush=True)
            if emb.std() < 1e-2 or not np.isfinite(emb).all():
                print("trunk collapsed at step %d — reverting to last "
                      "good params" % s, flush=True)
                params = good
                break
            good = params

    # trained trunk + the original full classifier back in place
    net.params = dict(params)
    net.params["fc2"] = net._orig_classifier
    net._num_classes = net._orig_num_classes

    # mate/nonmate protocol images from held-out prototype views
    def views(c, n, seed):
        r = np.random.RandomState(seed)
        return [np.clip(protos[c].astype(np.float32) +
                        r.randn(224, 224, 3) * 20, 0,
                        255).astype(np.uint8) for _ in range(n)]

    probe = views(0, 1, 100)[0]
    refs = views(0, 2, 101)          # mates: same class as probe
    gals = views(1, 2, 102)          # nonmates: a different class
    net_dict = {("resnetv6_pytorch", 6): wb,
                ("resnetv4_pytorch", None): wb}

    scores, smaps = {}, {}
    for prec in (None, "high", "highest"):
        st = STRise(probe=probe, refs=refs, gallery=gals,
                    black_box="resnetv6_pytorch", net_dict=net_dict,
                    mask_scale=12, num_mask_elements=2,
                    mask_fill_type="blur", blur_fill_sigma_percent=4,
                    num_masks=NUM_MASKS, seed=7, prior_type="mean_ebp",
                    score_precision=prec)
        t0 = time.time()
        st.evaluate()
        s = np.asarray(st.mask_scores, np.float64).ravel()
        scores[prec] = s
        smaps[prec] = np.asarray(st.saliency_map, np.float64).ravel()
        print("prec=%-7s  %.1f s   spread std %.3e  range %.3e"
              % (prec, time.time() - t0, s.std(), s.max() - s.min()),
              flush=True)

    ref = scores["highest"]
    for prec in (None, "high"):
        ov = rank_overlap(scores[prec], ref)
        mc = np.corrcoef(smaps[prec], smaps["highest"])[0, 1]
        sc = np.corrcoef(scores[prec], ref)[0, 1]
        print("%-7s vs highest: top-20%% overlap %.3f  score corr %.4f  "
              "map corr %.4f" % (prec, ov, sc, mc), flush=True)


if __name__ == "__main__":
    main()
