"""Mesh-sharded execution equals single-device execution (8 virtual CPU
devices via conftest's xla_force_host_platform_device_count)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xfr_tpu.parallel.mesh import (classifier_tp_shardings, make_mesh,
                                   replicate, shard_batch)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_embeddings_match_single_device():
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.ebp import interpreter as I

    wb = make_toy_wbnet()
    graph, enc = wb.net.graph, wb.net.encode_tensor
    rng = np.random.RandomState(0)
    x = rng.rand(16, 3, 224, 224).astype(np.float32)

    @jax.jit
    def embed(params, x):
        e = I.forward_clean(graph, params, x)[enc]
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    ref = np.asarray(embed(wb.net.params, jnp.asarray(x)))

    mesh = make_mesh((8, 1), ("dp", "mp"))
    params_r = replicate(mesh, wb.net.params)
    x_sh, n = shard_batch(mesh, x, axis="dp")
    out = np.asarray(embed(params_r, x_sh))[:n]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tensor_parallel_classifier_matches():
    """Classifier rows sharded over 'mp': logits equal the replicated run
    (GSPMD inserts the collectives)."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.ebp import interpreter as I

    wb = make_toy_wbnet(num_classes=16)
    graph = wb.net.graph
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(4, 3, 224, 224), jnp.float32)

    @jax.jit
    def classify(params, x):
        return I.forward_clean(graph, params, x)[graph.output_id]

    ref = np.asarray(classify(wb.net.params, x))

    mesh = make_mesh((2, 4), ("dp", "mp"))
    shardings = classifier_tp_shardings(mesh, wb.net.params, "fc2",
                                        axis="mp")
    params_sh = jax.tree.map(jax.device_put, wb.net.params, shardings)
    out = np.asarray(classify(params_sh, x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_blackbox_scoring_matches():
    """dp-sharded mask scoring equals unsharded (the blackbox hot path)."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.ebp import interpreter as I

    wb = make_toy_wbnet()
    graph, enc = wb.net.graph, wb.net.encode_tensor
    rng = np.random.RandomState(2)
    masks = rng.rand(16, 224, 224).astype(np.float32)
    probe = jnp.asarray(rng.rand(224, 224, 3), jnp.float32)
    fill = jnp.asarray(rng.rand(224, 224, 3), jnp.float32)
    gal = jnp.asarray(rng.rand(3, 12), jnp.float32)

    @jax.jit
    def score(params, masks, probe, fill, gal):
        blends = masks[..., None] * probe + (1 - masks[..., None]) * fill
        xb = jnp.transpose(blends, (0, 3, 1, 2))
        e = I.forward_clean(graph, params, xb)[enc]
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return 1.0 - 0.5 * jnp.linalg.norm(e[:, None] - gal[None], axis=2)

    ref = np.asarray(score(wb.net.params, jnp.asarray(masks), probe, fill,
                           gal))
    mesh = make_mesh((8, 1), ("dp", "mp"))
    params_r = replicate(mesh, wb.net.params)
    masks_sh, n = shard_batch(mesh, masks, axis="dp")
    out = np.asarray(score(params_r, masks_sh,
                           *replicate(mesh, (probe, fill, gal))))[:n]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
