"""A/B the wsebp ranking pass's internal stages on the chip.

The roofline table reads 101.9 GB accessed / 165 ms for the batched
ranking pass (75% of HBM peak), ~12x the naive activation-byte count —
either XLA truly re-materializes that much or cost_analysis
overestimates and the kernel is op-bound with headroom.  Time the
stages in isolation:

  full     : production _wsebp_grad_batch_fn (2 fwd + 2 natural bwd +
             keep-all EBP backward + gathers)
  rank_only: forwards + 2 natural backwards + max/argmax (no P_mate)
  pmate    : forwards + keep-all EBP backward + static-index gathers
  pmate_k1 : forwards + EBP backward keeping ONE event (lower bound for
             a backward that fuses gathers into the walk)

Run on the TPU chip: python tools/_rank_pass_ab.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

import xfr_tpu  # noqa: F401
from xfr_tpu.models import create_wbnet
from xfr_tpu.ebp import interpreter as I


def timed(fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force a transfer
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / iters


def main():
    wb = create_wbnet("resnetv6_pytorch")
    rng = np.random.RandomState(0)
    B = 8
    probes = jnp.asarray(rng.rand(B, 3, 224, 224) * 50, jnp.float32)
    em = np.asarray(wb.encode(probes[:2])).mean(0)
    en = np.asarray(wb.encode(probes[2:4])).mean(0)
    em /= np.linalg.norm(em)
    en /= np.linalg.norm(en)
    wb.set_triplet_classifier_batch(np.tile(em, (B, 1)),
                                    np.tile(en, (B, 1)))

    graph = wb.net.graph
    mode, wbias, eps = (wb._ebp_subtree_mode, wb._ebp_with_bias, wb.eps)
    n_ev = graph.n_events

    full = wb._wsebp_grad_batch_fn()
    dt = timed(partial(full, gating=True), wb.net.params, probes)
    print(f"full ranking pass      {dt*1000:7.1f} ms")

    @jax.jit
    def rank_only(params, x):
        values = I.forward_clean(graph, params, x)
        y = values[graph.output_id]
        ii = jnp.arange(B)
        cot_m = jnp.zeros_like(y).at[ii, 2 * ii].set(1.0)
        cot_n = jnp.zeros_like(y).at[ii, 2 * ii + 1].set(1.0)
        cots = jnp.stack([cot_m, cot_n])
        dAs = jax.vmap(
            lambda c: I.natural_backward(graph, params, values, c))(cots)
        scores, idxs = [], []
        for k in range(n_ev - 1):
            gated = (dAs[k][0] >= 0) * (-dAs[k][1])
            flat = gated.reshape(B, -1)
            scores.append(jnp.max(flat, axis=1))
            idxs.append(jnp.argmax(flat, axis=1))
        return jnp.stack(scores, 1), jnp.stack(idxs, 1)

    dt = timed(rank_only, wb.net.params, probes)
    print(f"rank_only (2 nat bwd)  {dt*1000:7.1f} ms")
    _, idxs = rank_only(wb.net.params, probes)

    @jax.jit
    def pmate(params, x, idxs):
        values = I.forward_clean(graph, params, x)
        posvals = I.forward_positive(graph, params, values,
                                     with_bias=wbias)
        y = values[graph.output_id]
        ii = jnp.arange(B)
        cot_m = jnp.zeros_like(y).at[ii, 2 * ii].set(1.0)
        P_mate = I.ebp_backward(
            graph, params, values, posvals, cot_m, subtree_mode=mode,
            eps=eps, with_bias=wbias, keep=tuple(range(n_ev - 1)))
        vals = [jnp.take_along_axis(P_mate[k].reshape(B, -1),
                                    idxs[:, k][:, None], axis=1)[:, 0]
                for k in range(n_ev - 1)]
        return jnp.stack(vals, 1)

    dt = timed(pmate, wb.net.params, probes, idxs)
    print(f"pmate keep-all+gather  {dt*1000:7.1f} ms")

    @jax.jit
    def pmate_masked(params, x, idxs):
        # Candidate replacement for the 377 tiny take_along_axis ops:
        # extract each event's value as sum(P * (iota == idx)) — an
        # elementwise compare+select+reduce XLA can fuse into the walk
        # (bit-exact: sums one element and N-1 zeros).
        values = I.forward_clean(graph, params, x)
        posvals = I.forward_positive(graph, params, values,
                                     with_bias=wbias)
        y = values[graph.output_id]
        ii = jnp.arange(B)
        cot_m = jnp.zeros_like(y).at[ii, 2 * ii].set(1.0)
        P_mate = I.ebp_backward(
            graph, params, values, posvals, cot_m, subtree_mode=mode,
            eps=eps, with_bias=wbias, keep=tuple(range(n_ev - 1)))
        vals = []
        for k in range(n_ev - 1):
            flat = P_mate[k].reshape(B, -1)
            hit = jnp.arange(flat.shape[1])[None, :] == idxs[:, k][:, None]
            vals.append(jnp.sum(jnp.where(hit, flat, 0.0), axis=1))
        return jnp.stack(vals, 1)

    dt = timed(pmate_masked, wb.net.params, probes, idxs)
    print(f"pmate keep-all+masked  {dt*1000:7.1f} ms")

    @jax.jit
    def pmate_grouped(params, x, idxs):
        # Candidate 2: group events by flattened size, stack each group
        # into [B, G, N], one take_along_axis per group (~#groups ops +
        # one full copy of the keep-all footprint).
        values = I.forward_clean(graph, params, x)
        posvals = I.forward_positive(graph, params, values,
                                     with_bias=wbias)
        y = values[graph.output_id]
        ii = jnp.arange(B)
        cot_m = jnp.zeros_like(y).at[ii, 2 * ii].set(1.0)
        P_mate = I.ebp_backward(
            graph, params, values, posvals, cot_m, subtree_mode=mode,
            eps=eps, with_bias=wbias, keep=tuple(range(n_ev - 1)))
        groups = {}
        for k in range(n_ev - 1):
            flat = P_mate[k].reshape(B, -1)
            groups.setdefault(flat.shape[1], []).append((k, flat))
        vals = [None] * (n_ev - 1)
        for sz, members in groups.items():
            ks = [k for k, _ in members]
            stk = jnp.stack([f for _, f in members], axis=1)  # [B, G, N]
            ix = idxs[:, jnp.asarray(ks)][:, :, None]          # [B, G, 1]
            got = jnp.take_along_axis(stk, ix, axis=2)[:, :, 0]
            for j, k in enumerate(ks):
                vals[k] = got[:, j]
        return jnp.stack(vals, 1)

    dt = timed(pmate_grouped, wb.net.params, probes, idxs)
    print(f"pmate keep-all+grouped {dt*1000:7.1f} ms")

    @jax.jit
    def pmate_k1(params, x):
        values = I.forward_clean(graph, params, x)
        posvals = I.forward_positive(graph, params, values,
                                     with_bias=wbias)
        y = values[graph.output_id]
        ii = jnp.arange(B)
        cot_m = jnp.zeros_like(y).at[ii, 2 * ii].set(1.0)
        kk = n_ev - 2
        P_mate = I.ebp_backward(
            graph, params, values, posvals, cot_m, subtree_mode=mode,
            eps=eps, with_bias=wbias, keep=(kk,))
        return P_mate[kk].sum()

    dt = timed(pmate_k1, wb.net.params, probes)
    print(f"pmate keep-1 (bound)   {dt*1000:7.1f} ms")


if __name__ == "__main__":
    main()
