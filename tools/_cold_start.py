"""Fresh-process cold start: time to first 4-map mix (warm XLA cache)."""
import time

T0 = time.time()


def mark(label):
    print(f"[{time.time()-T0:7.1f}s] {label}", flush=True)


import numpy as np  # noqa: E402

mark("python up")
import jax.numpy as jnp  # noqa: E402
from xfr_tpu.models import create_wbnet  # noqa: E402

mark("imports done")
wb = create_wbnet("resnetv6_pytorch")
wb.wsebp_dtype = jnp.bfloat16
mark("wbnet built")
rng = np.random.RandomState(0)
B = 8
probes = jnp.asarray(rng.rand(B, 3, 224, 224) * 50, jnp.float32)
em = rng.rand(512).astype(np.float32)
en = rng.rand(512).astype(np.float32)
em /= np.linalg.norm(em)
en /= np.linalg.norm(en)

wb.net.reset_classifier()
Pn = jnp.ones((B, wb.net.num_classes()), jnp.float32)
pooled_dev, _ = wb._ebp_pooled_fn()(wb.net.params, probes, Pn)
wb.set_triplet_classifier_batch(np.tile(em / 2500.0, (B, 1)),
                                np.tile(en / 2500.0, (B, 1)))
fct = wb.launch_contrastive_ebp_batch_both(probes, truncate_percent=20)
wb.set_triplet_classifier_batch(np.tile(em, (B, 1)), np.tile(en, (B, 1)))
fws = wb.launch_weighted_subtree_ebp_batch(probes, topk=32,
                                           subtree_mode="norelu")
pooled = np.asarray(pooled_dev, np.float32)
s1 = [wb._mwp_to_saliency(pooled[i]) for i in range(B)]
mark("meanEBP maps done")
s2, s3 = fct()
mark("contrastive+truncated done")
s4 = [r[0] for r in fws()]
mark("weighted-subtree done (first full 4-map mix complete)")
