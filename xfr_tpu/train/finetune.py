"""Sharded fine-tuning step for the embedding networks.

The reference ships no training loop (SURVEY.md §2.8) — matchers are frozen
checkpoints.  This module adds the TPU-native capability anyway: a jitted
classification/fine-tune step over a (dp, mp) mesh where the batch shards
over 'dp' and the large classifier (65359 classes for STR-Janus ResNet,
80013 for LightCNN) shards over 'mp' (tensor parallel).  GSPMD inserts the
ICI collectives (all-reduce for grads across dp, all-gather/reduce for the
sharded logits) from the sharding annotations alone.

Pipeline/sequence/expert parallelism have no counterpart in these small
fixed-resolution CNNs (no sequence dim, no MoE); dp + classifier-tp is the
full parallelism surface of this workload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from xfr_tpu.ebp import interpreter as I
from xfr_tpu.parallel.mesh import classifier_tp_shardings, data_sharding


def make_train_step(graph, classifier_pname, mesh=None, dp_axis="dp",
                    mp_axis="mp", learning_rate=1e-3, optimizer=None,
                    weight_decay=0.0, train_bn_stats=False):
    """Returns (step_fn, init_fn).

    step_fn(params, opt_state, x, y) -> (params, opt_state, loss)
      x: [B,C,H,W] images sharded over dp; y: [B] int labels.
    init_fn(params) -> (placed_params, opt_state)

    BatchNorm running statistics (the ``mean``/``var`` leaves of
    batchnorm2d params) are FROZEN by default: they are statistics, not
    weights, and descending the loss through them collapses the trunk
    (blow up ``var`` -> all features shrink -> uniform logits; measured
    in tools/_bb_quality_structured.py).  This is the analog of the
    reference's freeze_batchnorm_stats (xfr/utils.py) — there is no
    stat-UPDATE path here because forward_clean normalizes with the
    stored stats (inference-mode BN), matching how the frozen matcher
    checkpoints were consumed.  ``train_bn_stats=True`` restores the raw
    full-gradient step.
    """
    tx = optimizer or optax.sgd(learning_rate, momentum=0.9)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)

    def loss_fn(params, x, y):
        values = I.forward_clean(graph, params, x)
        logits = values[graph.output_id]
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return jnp.mean(loss)

    def mask_bn_stats(grads):
        if train_bn_stats:
            return grads
        return {
            pname: {k: (jnp.zeros_like(g) if k in ("mean", "var") else g)
                    for k, g in leaves.items()}
            for pname, leaves in grads.items()}

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(mask_bn_stats(grads), opt_state,
                                       params)
        # Mask the UPDATES too, not just the gradients: weight_decay's
        # add_decayed_weights contributes wd*param to every leaf's
        # update regardless of its (zeroed) gradient, which would decay
        # the frozen running stats toward 0.
        params = optax.apply_updates(params, mask_bn_stats(updates))
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step), lambda params: (params, tx.init(params))

    def init_fn(params):
        shardings = classifier_tp_shardings(mesh, params, classifier_pname,
                                            axis=mp_axis)
        params = jax.tree.map(jax.device_put, params, shardings)
        # Optimizer state (momentum buffers) inherits the param shardings
        # through jit's sharding propagation on first step.
        return params, tx.init(params)

    x_sh = data_sharding(mesh, dp_axis, 4)
    y_sh = data_sharding(mesh, dp_axis, 1)
    step_fn = jax.jit(step, in_shardings=(None, None, x_sh, y_sh))
    return step_fn, init_fn


def make_eval_step(graph, mesh=None, dp_axis="dp"):
    """Jitted validation step: (params, x, y) -> (mean loss, top-1 hits).

    Functional analog of the reference's `run_validation`/
    `load_val_batches` (xfr/utils.py:337-355, dead code there); batch
    shards over 'dp' when a mesh is given.  BatchNorm stats are explicit
    params here, so eval is frozen-stats by construction (the reference
    needs freeze_batchnorm_stats for that).
    """

    def step(params, x, y):
        values = I.forward_clean(graph, params, x)
        logits = values[graph.output_id]
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, y))
        hits = jnp.sum(jnp.argmax(logits, axis=-1) == y)
        return loss, hits

    if mesh is None:
        return jax.jit(step)
    x_sh = data_sharding(mesh, dp_axis, 4)
    y_sh = data_sharding(mesh, dp_axis, 1)
    return jax.jit(step, in_shardings=(None, x_sh, y_sh))
