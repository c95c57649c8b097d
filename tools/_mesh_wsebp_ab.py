"""A/B: mesh-mode weighted-subtree sweep layouts on the 8-device CPU mesh.

A = round-2 mesh path: B per-probe fused launches, candidate rows sharded
    over 'dp' (every device recomputes each probe's forward pair; each
    sweep runs as n_cand/n_dev-row slivers).
B = shard_map path: probes sharded over 'dp', each device running the
    proven single-chip scan-batched recipe on its local probes
    (engine._wsebp_sweep_select_shmap_fn).

Run:  python tools/_mesh_wsebp_ab.py  (forces 8 CPU devices)
"""

import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from xfr_tpu.models import resnet101 as R101  # noqa: E402
from xfr_tpu.models.common import init_params  # noqa: E402
from xfr_tpu.ebp.engine import Whitebox, WhiteboxNetwork  # noqa: E402
from xfr_tpu.parallel.mesh import auto_mesh  # noqa: E402


def make_wb(layers=(1, 1, 1, 1), num_classes=16):
    graph, shapes, enc = R101.build_resnet101(num_classes=num_classes,
                                              layers=layers)
    params = init_params(shapes, seed=0)
    net = WhiteboxNetwork(graph, params, encode_tensor=enc,
                          classifier_pname="fc2", num_classes=num_classes,
                          preprocess=R101.preprocess_resnet101,
                          embed_dim=512, name="r101_small")
    return Whitebox(net, ebp_version=6, ebp_subtree_mode="norelu")


def main():
    wb = make_wb()
    mesh = auto_mesh()
    assert mesh is not None, "need >1 device"
    wb.use_mesh(mesh)
    print("devices:", len(jax.devices()), "n_events:", wb._n_events)

    rng = np.random.RandomState(0)
    B = 8
    probes = jnp.asarray(rng.rand(B, 3, 224, 224), jnp.float32)
    ems = rng.rand(B, 512).astype(np.float32)
    ens = rng.rand(B, 512).astype(np.float32)
    ems /= np.linalg.norm(ems, axis=1, keepdims=True)
    ens /= np.linalg.norm(ens, axis=1, keepdims=True)
    wb.set_triplet_classifier_batch(ems, ens)

    scores_d, idxs_d, vals_d = wb._wsebp_grad_batch_fn()(
        wb.net.params, probes, gating=True)
    idxs32 = idxs_d.astype(jnp.int32)
    topk = 32

    def path_a():
        launches = [wb._wsebp_fused_launch(
            probes[i:i + 1], idxs32[i], vals_d[i], scores_d[i], topk,
            False) for i in range(B)]
        return [np.asarray(sm) for sm, _ in launches]

    def path_b():
        merged, sel = wb._wsebp_sweep_select_shmap_fn(topk, False)(
            wb.net.params, probes, idxs32, vals_d, scores_d)
        return np.asarray(merged), np.asarray(sel)

    # warmup / compile
    a = path_a()
    b = path_b()
    np.testing.assert_allclose(np.stack(a), b[0], rtol=2e-4, atol=1e-7)
    print("paths agree")

    for name, f in (("A rows-over-dp per-probe", path_a),
                    ("B probes-over-dp shard_map", path_b)):
        t0 = time.time()
        n = 3
        for _ in range(n):
            f()
        dt = (time.time() - t0) / n
        print("%-28s %.3f s/batch-%d  (%.1f sweeps/s)"
              % (name, dt, B, B / dt))


if __name__ == "__main__":
    main()
