"""Cold start variant: compile the standard kernel set concurrently."""
import time
from concurrent.futures import ThreadPoolExecutor

T0 = time.time()


def mark(label):
    print(f"[{time.time()-T0:7.1f}s] {label}", flush=True)


import numpy as np  # noqa: E402
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

# Build the four kernel callables (traces happen at call time inside
# each jitted fn; jit compilation itself is triggered lazily).  We force
# compilation concurrently via .lower().compile() on each.
wb.net.reset_classifier()
params_full = wb.net.params
Pn = jnp.ones((B, wb.net.num_classes()), jnp.float32)
pooled_fn = wb._ebp_pooled_fn()

wb.set_triplet_classifier_batch(np.tile(em / 2500.0, (B, 1)),
                                np.tile(en / 2500.0, (B, 1)))
params_ct = wb.net.params
Pns = wb._shard_rows(wb._batch_cotangents(B, "contrastive"), batch_axis=1)
ct_fn = wb._contrastive_both_fn()

wb.set_triplet_classifier_batch(np.tile(em, (B, 1)), np.tile(en, (B, 1)))
params_ws = wb.net.params
wb._ebp_subtree_mode = "norelu"
grad_fn = wb._wsebp_grad_batch_fn()
sweep_fn = wb._wsebp_sweep_select_fn(32, False)
mark("kernel objects built")

elems0 = jnp.zeros((wb.net.graph.n_events - 1,), jnp.int32)
vals0 = jnp.zeros((wb.net.graph.n_events - 1,), jnp.float32)
jobs = [
    ("pooled", lambda: pooled_fn.lower(
        params_full, probes, Pn).compile()),
    ("contrastive", lambda: ct_fn.lower(
        params_ct, probes, Pns, jnp.float32(20.0)).compile()),
    ("grad", lambda: grad_fn.lower(
        params_ws, probes, gating=True).compile()),
    ("sweep", lambda: sweep_fn.lower(
        params_ws, probes[0:1], elems0, vals0, vals0).compile()),
]

with ThreadPoolExecutor(max_workers=4) as ex:
    futs = {name: ex.submit(fn) for name, fn in jobs}
    for name, f in futs.items():
        f.result()
        mark(f"compiled: {name}")

mark("all kernels compiled")

# now the actual mix should be fast
pooled_dev, _ = pooled_fn(params_full, probes, Pn)
wb.net.params = params_ct
fct = wb.launch_contrastive_ebp_batch_both(probes, truncate_percent=20)
wb.net.params = params_ws
fws = wb.launch_weighted_subtree_ebp_batch(probes, topk=32,
                                           subtree_mode="norelu")
pooled = np.asarray(pooled_dev, np.float32)
s1 = [wb._mwp_to_saliency(pooled[i]) for i in range(B)]
s2, s3 = fct()
s4 = [r[0] for r in fws()]
mark("first full 4-map mix complete")
