"""Cold start: warm the kernel set with real concurrent calls."""
import time
from concurrent.futures import ThreadPoolExecutor

T0 = time.time()


def mark(label):
    print(f"[{time.time()-T0:7.1f}s] {label}", flush=True)


import numpy as np
import jax
jax.config.update("jax_log_compiles", True)
import jax.numpy as jnp
from xfr_tpu.models import create_wbnet

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
    ("pooled", lambda: pooled_fn(params_full, probes, Pn)[0]
        .block_until_ready()),
    ("contrastive", lambda: ct_fn(params_ct, probes, Pns,
                                  jnp.float32(20.0))[0]
        .block_until_ready()),
    ("grad", lambda: grad_fn(params_ws, probes, gating=True)[0]
        .block_until_ready()),
    ("sweep", lambda: sweep_fn(params_ws, probes[0:1], elems0, vals0,
                               vals0)[0].block_until_ready()),
]

with ThreadPoolExecutor(max_workers=4) as ex:
    futs = [(name, ex.submit(fn)) for name, fn in jobs]
    for name, f in futs:
        f.result()
        mark(f"warmed: {name}")
mark("all kernels warmed")

pooled_dev, _ = pooled_fn(params_full, probes, Pn)
mark("mix: pooled launched")
wb.net.params = params_ct
fct = wb.launch_contrastive_ebp_batch_both(probes, truncate_percent=20)
mark("mix: contrastive launched")
wb.net.params = params_ws
fws = wb.launch_weighted_subtree_ebp_batch(probes, topk=32,
                                           subtree_mode="norelu")
mark("mix: wsebp launched")
pooled = np.asarray(pooled_dev, np.float32)
s1 = [wb._mwp_to_saliency(pooled[i]) for i in range(B)]
mark("mix: meanEBP maps done")
s2, s3 = fct()
mark("mix: contrastive done")
s4 = [r[0] for r in fws()]
mark("first full 4-map mix complete")

