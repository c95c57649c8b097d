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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_production_batched_paths_under_mesh():
    """The PRODUCTION entry points (Whitebox.use_mesh + embeddings /
    ebp_batch / contrastive_ebp_batch_both / weighted_subtree_ebp_batch)
    give identical results with the probe batch sharded over the dp mesh,
    including a non-divisible batch (padded classifier rows)."""
    from tests.fixtures import make_toy_wbnet

    rng = np.random.RandomState(3)
    B = 6  # deliberately not divisible by 8: exercises padding
    probes = jnp.asarray(rng.rand(B, 3, 224, 224), jnp.float32)
    ems = rng.rand(B, 12).astype(np.float32)
    ens = rng.rand(B, 12).astype(np.float32)
    ems /= np.linalg.norm(ems, axis=1, keepdims=True)
    ens /= np.linalg.norm(ens, axis=1, keepdims=True)

    def run(wb):
        wb.set_triplet_classifier_batch(ems, ens)
        mean = wb.ebp_batch(probes)
        cons, truncs = wb.contrastive_ebp_batch_both(probes, 20)
        ws = [r[0] for r in wb.weighted_subtree_ebp_batch(
            probes, topk=3, subtree_mode="all")]
        emb = wb.embeddings(np.asarray(probes))
        return mean, cons, truncs, ws, emb

    ref = run(make_toy_wbnet(subtree_mode="all", seed=4))

    wb = make_toy_wbnet(subtree_mode="all", seed=4)
    wb.use_mesh(make_mesh((8, 1), ("dp", "mp")))
    out = run(wb)

    np.testing.assert_allclose(out[4], ref[4], rtol=1e-5, atol=1e-6)
    for a, b in zip(ref[:4], out[:4]):
        for ma, mb in zip(a, b):
            np.testing.assert_allclose(mb, ma, rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_strise_score_masks_under_mesh():
    """STRise(mesh=...) shards the fused mask-scoring chunks over dp and
    reproduces the single-device scores and saliency map."""
    from xfr_tpu.blackbox import STRise
    from tests.fixtures import make_toy_wbnet

    rng = np.random.RandomState(5)
    probe = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
    refs = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
            for _ in range(2)]
    gallery = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
               for _ in range(2)]
    wb = make_toy_wbnet(seed=6)

    def build(mesh):
        s = STRise(probe=probe, refs=refs, gallery=gallery,
                   black_box="resnetv4_pytorch",
                   net_dict={("resnetv4_pytorch", 6): wb},
                   prior_type="uniform", num_masks=64, mask_scale=12,
                   num_mask_elements=2, seed=0, batch_size=16, mesh=mesh)
        s.evaluate()
        return s

    ref = build(None)
    # fresh engine per run: use_mesh mutates placement in-place
    wb2 = make_toy_wbnet(seed=6)
    sh = STRise(probe=probe, refs=refs, gallery=gallery,
                black_box="resnetv4_pytorch",
                net_dict={("resnetv4_pytorch", 6): wb2},
                prior_type="uniform", num_masks=64, mask_scale=12,
                num_mask_elements=2, seed=0, batch_size=16,
                mesh=make_mesh((8, 1), ("dp", "mp")))
    sh.evaluate()

    np.testing.assert_allclose(sh.masked_probe_ref_scores,
                               ref.masked_probe_ref_scores,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sh.saliency_map, ref.saliency_map,
                               rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_train_and_eval_step_sharded_match_single():
    """make_train_step / make_eval_step over a (dp, mp) mesh reproduce the
    unsharded step (loss + updated params + top-1 hits)."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.train.finetune import make_eval_step, make_train_step

    wb = make_toy_wbnet(num_classes=8, seed=3)
    graph = wb.net.graph
    rng = np.random.RandomState(3)
    x = rng.rand(8, 3, 224, 224).astype(np.float32)
    y = (np.arange(8) % wb.net.num_classes()).astype(np.int32)

    step1, init1 = make_train_step(graph, wb.net.classifier_pname)
    p1, o1 = init1(wb.net.params)
    p1, o1, loss1 = step1(p1, o1, jnp.asarray(x), jnp.asarray(y))

    mesh = make_mesh((4, 2), ("dp", "mp"))
    wb2 = make_toy_wbnet(num_classes=8, seed=3)
    stepm, initm = make_train_step(graph, wb2.net.classifier_pname,
                                   mesh=mesh)
    pm, om = initm(wb2.net.params)
    x_sh, _ = shard_batch(mesh, x, axis="dp")
    y_sh, _ = shard_batch(mesh, y, axis="dp")
    pm, om, lossm = stepm(pm, om, x_sh, y_sh)
    np.testing.assert_allclose(float(lossm), float(loss1), rtol=1e-5)
    flat1, _ = jax.tree.flatten(p1)
    flatm, _ = jax.tree.flatten(pm)
    for a, b in zip(flatm, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    ev1 = make_eval_step(graph)
    evm = make_eval_step(graph, mesh=mesh)
    l1, h1 = ev1(p1, jnp.asarray(x), jnp.asarray(y))
    lm, hm = evm(pm, x_sh, y_sh)
    np.testing.assert_allclose(float(lm), float(l1), rtol=1e-5)
    assert int(hm) == int(h1)


def test_train_step_freezes_bn_stats_by_default():
    """BatchNorm running stats are statistics, not weights: the default
    train step zeroes their gradients (descending through them collapses
    the trunk — finetune.py docstring); train_bn_stats=True restores the
    raw step."""
    from tests.fixtures import make_toy_wbnet
    from xfr_tpu.train.finetune import make_train_step

    wb = make_toy_wbnet(num_classes=8, seed=3)
    net = wb.net
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 3, 224, 224).astype(np.float32) * 50)
    y = jnp.asarray((np.arange(4) % 8).astype(np.int32))
    bn_keys = [(p, k) for p, lv in net.params.items() for k in lv
               if k in ("mean", "var")]
    assert bn_keys

    step, init = make_train_step(net.graph, net.classifier_pname)
    p, o = init(net.params)
    p, o, loss0 = step(p, o, x, y)
    p, o, loss1 = step(p, o, x, y)
    for pn, k in bn_keys:
        np.testing.assert_array_equal(np.asarray(p[pn][k]),
                                      np.asarray(net.params[pn][k]))
    assert any(not np.array_equal(np.asarray(p[pn]["w"]),
                                  np.asarray(net.params[pn]["w"]))
               for pn, lv in net.params.items() if "w" in lv)
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))

    step2, init2 = make_train_step(net.graph, net.classifier_pname,
                                   train_bn_stats=True)
    p2, o2 = init2(net.params)
    p2, o2, _ = step2(p2, o2, x, y)
    assert any(not np.array_equal(np.asarray(p2[pn][k]),
                                  np.asarray(net.params[pn][k]))
               for pn, k in bn_keys)

    # weight_decay must not defeat the freeze: add_decayed_weights runs
    # inside the optimizer chain AFTER the gradient mask, contributing
    # wd*param to every leaf's update — the step masks the updates too
    step3, init3 = make_train_step(net.graph, net.classifier_pname,
                                   weight_decay=1e-2)
    p3, o3 = init3(net.params)
    p3, o3, _ = step3(p3, o3, x, y)
    for pn, k in bn_keys:
        np.testing.assert_array_equal(np.asarray(p3[pn][k]),
                                      np.asarray(net.params[pn][k]))
