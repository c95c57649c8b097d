"""Excitation-backprop interpreter over the graph IR.

Replaces the reference's three-forward-pass + autograd-hook machinery
(reference: python/xfr/models/whitebox.py:306-437, 482-504) with two
forward passes and one explicit, statically-scheduled backward walk:

  pass 1 (clean):     values[t]  — the ordinary forward, original weights.
                      a(t) = relu(values[t]) is the reference's self.A
                      (whitebox.py:359).
  pass 2 (positive):  posvals[t] — each *hooked* call computes with ReLU'd
                      weights from the overridden input a(t_in); unhooked
                      functional ops flow through naturally.
                      x(t) = relu(posvals[t]) is the reference's self.X
                      (whitebox.py:326-330).
  backward:           walk nodes in descending call order.  Right before a
                      node's vjp runs, its output tensor's hook chain fires
                      (ascending consumer order), computing
                      p = a * relu(z), optionally overridden by a prior, and
                      rewriting the gradient per the subtree mode
                      (whitebox.py:381-432).  Affine vjps use positive
                      weights; nonlinear vjps linearize at clean values.

Because pass 3 of the reference (mode='ebp') runs the forward with restored
original weights, its activations equal pass 1 — so only two forward passes
are needed here.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from xfr_tpu import ops as O
from xfr_tpu.graph import GraphDef

VALID_SUBTREE_MODES = ("affineonly", "affineonly_with_prior", "norelu", "all")


def forward_clean(graph: GraphDef, params, x):
    """Pass 1: ordinary forward.  Returns per-tensor values."""
    values = [None] * graph.n_tensors
    values[graph.input_id] = x
    for node in graph.nodes:
        p = params.get(node.pname, {}) if node.pname else {}
        xs = tuple(values[i] for i in node.ins)
        values[node.out] = O.apply_op(node.op, p, xs, node.attrs_dict)
    return values


def forward_positive(graph: GraphDef, params, values, with_bias=False):
    """Pass 2: positive-weight forward with per-hooked-call input override.

    Mirrors 'positive_activation' mode (whitebox.py:315-330): each hooked
    call's input is replaced by a = relu(clean input) before computing with
    W+ weights; the value that *naturally* arrived at the call is what the
    reference records as X.  Unhooked ops (normalize/flatten/...) compute on
    the flowing positive values without override.
    """
    posvals = [None] * graph.n_tensors
    posvals[graph.input_id] = values[graph.input_id]
    for node in graph.nodes:
        p = params.get(node.pname, {}) if node.pname else {}
        if node.hooked:
            p = O.positive_params(node.op, p, with_bias=with_bias)
            xs = tuple(jnp.maximum(values[i], 0) for i in node.ins)
        else:
            xs = tuple(posvals[i] for i in node.ins)
        posvals[node.out] = O.apply_op(node.op, p, xs, node.attrs_dict)
    return posvals


def _check_mode(graph, mode):
    if mode not in VALID_SUBTREE_MODES:
        raise ValueError(f'invalid subtree mode "{mode}"')
    for ev in graph.events:
        if ev.is_special:
            raise ValueError(
                'layer "%s" is a special case '
                "(https://arxiv.org/pdf/1608.00507.pdf, eq 5) and is not "
                "supported for EBP" % ev.tag)


def _apply_event_rule(ev, mode, z, a, xpos, eps, prior, inject_spec):
    """One tensor-hook firing: compute the MWP p and the rewritten gradient.

    Implements _backward_ebp (whitebox.py:381-432).  ``prior`` is a static
    override array (or None).  ``inject_spec`` optionally provides a traced
    dynamic one-hot override (event_id, flat_elem, value) used by the
    batched weighted-subtree path; presence is then a traced boolean.
    """
    zh = jnp.maximum(z, 0)
    p = a * zh

    has_static = prior is not None
    if has_static:
        p = jnp.broadcast_to(prior, p.shape).astype(p.dtype)

    if inject_spec is not None:
        ev_id, elem, val = inject_spec
        is_here = (ev_id == ev.idx)
        flat = jnp.zeros((p.size,), p.dtype).at[elem].set(
            val.astype(p.dtype))
        p = jnp.where(is_here, flat.reshape(p.shape), p)
        # Traced presence flag: prior "is not None" iff injected here.
        has_prior = is_here if not has_static else True
    else:
        has_prior = has_static

    if mode == "affineonly":
        g2 = p / (xpos + eps) if ev.is_affine else z
    elif mode == "affineonly_with_prior":
        # zh/p masked where a prior is present (whitebox.py:406-415).
        if inject_spec is not None and not has_static:
            pm = jnp.where(has_prior, (p > 0) * p, p)
            zm = jnp.where(has_prior, (p > 0) * z, zh)
        elif has_static:
            pm = (p > 0) * p
            zm = (p > 0) * z
        else:
            pm, zm = p, zh
        g2 = pm / (xpos + eps) if ev.is_affine else zm
    elif mode == "norelu":
        y = p / (xpos + eps)
        if ev.is_poolrelu:
            if inject_spec is not None and not has_static:
                g2 = jnp.where(has_prior, z, y)
            elif has_static:
                g2 = z
            else:
                g2 = y
        else:
            g2 = y
    elif mode == "all":
        g2 = p / (xpos + eps)
    else:
        raise ValueError(f'invalid subtree mode "{mode}"')
    return g2, p


def ebp_backward(
    graph: GraphDef,
    params,
    values,
    posvals,
    cotangent,
    *,
    subtree_mode: str,
    eps: float = 1e-16,
    with_bias: bool = False,
    keep: Optional[Sequence[int]] = None,
    priors: Optional[Dict[int, jnp.ndarray]] = None,
    inject_spec=None,
    start_node: Optional[int] = None,
) -> Dict[int, jnp.ndarray]:
    """EBP backward walk.  Returns {event_idx: P} for requested events.

    Args:
      cotangent: gradient seeded at the graph output (the reference's
        ``Xn.backward(Pn)``, whitebox.py:498).
      keep: event indices whose MWP to return (default: all).  Unrequested
        events are dead code XLA eliminates.
      priors: static per-event override arrays (reference self.P_prior,
        whitebox.py:390-392,570-577).
      inject_spec: traced (event_id, flat_elem, value) dynamic one-hot prior
        for the vmapped weighted-subtree path.
      start_node: begin the walk at this node index instead of the output
        (truncated walk for prior-injected sweeps with zero cotangent:
        everything above contributes zero gradient, so missing grads are
        treated as zeros; the injected event's node must be <= start_node —
        see GraphDef.event_node).
    """
    _check_mode(graph, subtree_mode)
    priors = priors or {}
    keep_set = set(range(graph.n_events)) if keep is None else set(
        k % graph.n_events for k in keep)

    grads = [None] * graph.n_tensors
    grads[graph.output_id] = cotangent
    out: Dict[int, jnp.ndarray] = {}
    truncated = start_node is not None
    first_node = (len(graph.nodes) - 1 if start_node is None
                  else min(start_node, len(graph.nodes) - 1))

    # Event lookup: (tensor, consumer, slot) -> Event
    ev_by_key = {(e.tensor, e.consumer, e.slot): e for e in graph.events}

    def _finalize(t):
        g = grads[t]
        if g is None:
            if not truncated:
                return
            g = jnp.zeros_like(values[t])
        for (ci, slot, at, xt) in graph.hooks_on(t):
            ev = ev_by_key[(t, ci, slot)]
            a = jnp.maximum(values[at], 0)
            xp = jnp.maximum(posvals[xt], 0)
            g, p = _apply_event_rule(
                ev, subtree_mode, g, a, xp, eps,
                priors.get(ev.idx), inject_spec)
            if ev.idx in keep_set:
                out[ev.idx] = p
        grads[t] = g

    for ni in range(first_node, -1, -1):
        node = graph.nodes[ni]
        _finalize(node.out)
        g = grads[node.out]
        if g is None:
            continue
        p = params.get(node.pname, {}) if node.pname else {}
        if node.hooked:
            p = O.positive_params(node.op, p, with_bias=with_bias)
        xs = tuple(values[i] for i in node.ins)
        contribs = O.op_vjp(node.op, p, xs, node.attrs_dict, g)
        for i, c in zip(node.ins, contribs):
            grads[i] = c if grads[i] is None else grads[i] + c
    _finalize(graph.input_id)
    return out


def ebp_backward_allevents(
    graph: GraphDef,
    params,
    values,
    posvals,
    elems,
    vals,
    *,
    subtree_mode: str,
    eps: float = 1e-16,
    with_bias: bool = False,
    n_buckets: int = 1,
    row_shard=None,
    cascade: bool = False,
):
    """Batched prior-injected backward: one walk row per candidate event.

    The weighted-subtree sweep evaluates a one-hot prior injection at
    EVERY event 0..n_events-2 (reference: whitebox.py:699-703 runs these
    serially).  Because candidate k injects exactly at event k, the
    injection row at each event is *static* — so instead of vmapping
    n_events independent walks each carrying a traced (event_id, elem,
    val) triple (which lowers to a full-tensor scatter + select at every
    event for every row), this runs natively-batched walks where event k
    costs one single-row scatter.

    ``elems``/``vals`` are [n_events-1] traced arrays: flat element index
    and injection value per candidate (row k = event k).  With
    PROBE-BATCHED captures (``values``/``posvals`` leading dim P > 1)
    pass [n_events-1, P] arrays — every op then carries a [rows, P, ...]
    batch (the injected one-hot broadcasts per probe; still no gather),
    which keeps the MXU fed where a per-probe scan pays XLA's per-op
    overhead 378 x P times on small tensors.

    ``n_buckets`` splits the candidate rows into contiguous event ranges.
    ``graph.event_node`` is non-increasing in event index, so rows of a
    bucket share a truncation point: with a zero output cotangent the
    gradient above the bucket's first node is identically zero and those
    vjps are statically skipped.  All buckets share ``values``/``posvals``
    (one forward, one dispatch) — this is what the round-1 per-jit
    bucketing attempt lost.

    ``cascade`` merges the buckets' walks below their shared frontiers
    into ONE full-depth walk whose row batch grows bucket by bucket —
    identical per-row math (the bucketed walk is its row-sliced
    restriction), ~(n_buckets+1)/2 x fewer walk ops.  Ignored when
    ``row_shard`` is given (the rows-over-mesh path keeps fixed-width
    buckets so the shard sizes stay static).

    Returns (P_out [n_events-1, *out_shape], maxes [n_events-1]) where
    P_out is the channel-summed MWP at the saliency plane (event
    n_events-2 — a configurable output event would need the event's
    tensor to sit BELOW every bucket's truncation frontier, or truncated
    buckets would silently contribute no row; the sweep only ever reads
    the saliency plane) and maxes are per-row map maxima for host-side
    validity selection.
    """
    _check_mode(graph, subtree_mode)
    n_cand = graph.n_events - 1
    kk = graph.n_events - 2

    ev_by_key = {(e.tensor, e.consumer, e.slot): e for e in graph.events}

    # Contiguous buckets of candidate rows (ascending event index).
    n_buckets = max(1, min(n_buckets, n_cand))
    size = -(-n_cand // n_buckets)
    bucket_ranges = [(lo, min(lo + size, n_cand))
                     for lo in range(0, n_cand, size)]

    outs = []

    def _make_finalize(grads, bounds):
        """Hook-event processor for a walk carrying candidate rows
        ``bounds[0]:bounds[1]`` (a bucket's range, or [0, live) for the
        cascade — ``bounds`` is read at call time so the cascade can
        grow it at bucket frontiers)."""

        def _finalize(t):
            lo, hi = bounds
            g = grads[t]
            for (ci, slot, at, xt) in graph.hooks_on(t):
                ev = ev_by_key[(t, ci, slot)]
                if g is None:
                    # above/at the truncation frontier: gradient is
                    # identically zero for every live row
                    if not (lo <= ev.idx < hi):
                        continue
                    g = jnp.zeros((hi - lo, *values[t].shape),
                                  values[t].dtype)
                    if row_shard is not None:
                        # shard candidate rows over the mesh 'dp' axis;
                        # GSPMD propagates through the whole bucket walk
                        g = row_shard(g)
                a = jnp.maximum(values[at], 0)
                xp = jnp.maximum(posvals[xt], 0)
                z = g
                zh = jnp.maximum(z, 0)
                p = a * zh  # [nb, 1, ...]
                inj_row = ev.idx - lo if lo <= ev.idx < hi else None
                if inj_row is not None:
                    # Fully-fusable injection: static one-hot row selector
                    # (broadcast, constant) x on-the-fly iota one-hot — no
                    # scatter, no batched-tensor copy, zero extra HBM
                    # traffic beyond the p read already happening.
                    rshape = p.shape[1:]
                    rowsel = jnp.zeros((hi - lo,) + (1,) * len(rshape),
                                       p.dtype).at[inj_row].set(1)
                    if elems.ndim == 1:
                        iota = jax.lax.broadcasted_iota(
                            jnp.int32, (p[0].size, 1), 0).reshape(rshape)
                        onehot = jnp.where(iota == elems[ev.idx],
                                           vals[ev.idx].astype(p.dtype), 0)
                    else:
                        # probe-batched: per-probe flat index/value into
                        # each probe's [C,H,W] plane; broadcast compare,
                        # no gather
                        per = p[0, 0].size  # per-probe plane size
                        npr = rshape[0]
                        iota = jax.lax.broadcasted_iota(
                            jnp.int32, (per, 1), 0).reshape(rshape[1:])
                        onehot = jnp.where(
                            iota[None] == elems[ev.idx].reshape(
                                (npr,) + (1,) * (len(rshape) - 1)),
                            vals[ev.idx].astype(p.dtype).reshape(
                                (npr,) + (1,) * (len(rshape) - 1)), 0)
                    p = p * (1 - rowsel) + rowsel * onehot
                    rowsel_b = rowsel > 0
                if subtree_mode == "affineonly":
                    g2 = p / (xp + eps) if ev.is_affine else z
                elif subtree_mode == "affineonly_with_prior":
                    pm, zm = p, zh
                    if inj_row is not None:
                        pm = jnp.where(rowsel_b, (p > 0) * p, p)
                        zm = jnp.where(rowsel_b, (p > 0) * z, zh)
                    g2 = pm / (xp + eps) if ev.is_affine else zm
                elif subtree_mode == "norelu":
                    g2 = p / (xp + eps)
                    if ev.is_poolrelu and inj_row is not None:
                        g2 = jnp.where(rowsel_b, z, g2)
                elif subtree_mode == "all":
                    g2 = p / (xp + eps)
                if ev.idx == kk:
                    outs.append(p.astype(jnp.float32).sum(axis=2))
                g = g2
            grads[t] = g

        return _finalize

    def _walk_node(ni, grads, _finalize):
        node = graph.nodes[ni]
        _finalize(node.out)
        g = grads[node.out]
        if g is None:
            return
        p = params.get(node.pname, {}) if node.pname else {}
        if node.hooked:
            p = O.positive_params(node.op, p, with_bias=with_bias)
        xs = tuple(values[i] for i in node.ins)
        fn = lambda *inputs: O.OPS[node.op](p, inputs, **node.attrs_dict)
        _, vjp_fn = jax.vjp(fn, *xs)
        contribs = jax.vmap(vjp_fn)(g)
        for i, c in zip(node.ins, contribs):
            grads[i] = c if grads[i] is None else grads[i] + c

    if cascade and row_shard is None and len(bucket_ranges) > 1:
        # Cascaded walk: every bucket's exact walk shares the node range
        # below the next bucket's frontier, so instead of n_buckets
        # independent walks (each descending all the way to the input —
        # ~sum_b depth_b node visits, the per-op dispatch bound of the
        # round-3 roofline) run ONE full-depth walk whose candidate-row
        # batch GROWS at each bucket frontier: pad every live gradient
        # with the joining bucket's zero rows and keep walking.  Node
        # visits drop ~(n_buckets+1)/2 x while the zero-row FLOP waste
        # stays exactly that of the bucketed walk (rows still join only
        # at their own bucket's frontier).
        joins = {}
        for lo, hi in bucket_ranges:
            sn = graph.event_node[lo]
            joins[sn] = max(joins.get(sn, 0), hi)
        grads = [None] * graph.n_tensors
        bounds = [0, 0]  # live candidate-row range, grown at frontiers
        fin = _make_finalize(grads, bounds)
        for ni in range(graph.event_node[0], -1, -1):
            new_hi = joins.get(ni, 0)
            if new_hi > bounds[1]:
                for t, g in enumerate(grads):
                    if g is not None:
                        pad = jnp.zeros(
                            (new_hi - g.shape[0],) + g.shape[1:], g.dtype)
                        grads[t] = jnp.concatenate([g, pad])
                bounds[1] = new_hi
            _walk_node(ni, grads, fin)
        fin(graph.input_id)
    else:
        for lo, hi in bucket_ranges:
            grads = [None] * graph.n_tensors
            fin = _make_finalize(grads, [lo, hi])
            for ni in range(graph.event_node[lo], -1, -1):
                _walk_node(ni, grads, fin)
            fin(graph.input_id)

    P_out = jnp.concatenate(outs, axis=0)  # [n_cand, {1|P}, H, W]
    if elems.ndim == 2:  # probe-batched: per-(row, probe) maxima
        return P_out, P_out.max(axis=(2, 3))
    return P_out, P_out.max(axis=(1, 2, 3))


def natural_backward(
    graph: GraphDef,
    params,
    values,
    cotangent,
    keep: Optional[Sequence[int]] = None,
) -> Dict[int, jnp.ndarray]:
    """Plain autograd backward collecting raw per-event gradients.

    This is the reference's 'activation'-mode backward where _savegrad
    records dA at every hooked input in hook-fire order
    (whitebox.py:356-358, 652-676).  Original weights, no gradient rewrite.
    Returns {event_idx: dA}.
    """
    keep_set = set(range(graph.n_events)) if keep is None else set(
        k % graph.n_events for k in keep)
    grads = [None] * graph.n_tensors
    grads[graph.output_id] = cotangent
    out: Dict[int, jnp.ndarray] = {}
    ev_by_key = {(e.tensor, e.consumer, e.slot): e for e in graph.events}

    def _finalize(t):
        g = grads[t]
        if g is None:
            return
        for (ci, slot, at, xt) in graph.hooks_on(t):
            ev = ev_by_key[(t, ci, slot)]
            if ev.idx in keep_set:
                out[ev.idx] = g

    for ni in range(len(graph.nodes) - 1, -1, -1):
        node = graph.nodes[ni]
        _finalize(node.out)
        g = grads[node.out]
        if g is None:
            continue
        p = params.get(node.pname, {}) if node.pname else {}
        xs = tuple(values[i] for i in node.ins)
        contribs = O.op_vjp(node.op, p, xs, node.attrs_dict, g)
        for i, c in zip(node.ins, contribs):
            grads[i] = c if grads[i] is None else grads[i] + c
    _finalize(graph.input_id)
    return out


def ebp(graph, params, x, Pn, *, subtree_mode, eps=1e-16, with_bias=False,
        keep=None, priors=None, inject_spec=None):
    """Full EBP: both forward passes + backward.  Returns {event_idx: P}."""
    values = forward_clean(graph, params, x)
    posvals = forward_positive(graph, params, values, with_bias=with_bias)
    return ebp_backward(
        graph, params, values, posvals, Pn,
        subtree_mode=subtree_mode, eps=eps, with_bias=with_bias,
        keep=keep, priors=priors, inject_spec=inject_spec)
