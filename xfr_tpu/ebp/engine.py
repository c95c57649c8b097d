"""Public Whitebox saliency API.

Mirrors the reference ``Whitebox``/``WhiteboxNetwork`` surface
(reference: python/xfr/models/whitebox.py:25-824) with a TPU-native core:

  * no hooks / weight mutation — EBP is an explicit interpreter pass
    (xfr_tpu.ebp.interpreter) that jits to a single XLA program;
  * contrastive variants batch the mate/nonmate backwards with vmap over
    the output cotangent, sharing one forward capture;
  * weighted-subtree EBP replaces the reference's O(n_layers) serial
    layerwise re-runs (whitebox.py:699-703) with one vmapped batch of
    prior-injected backward walks over shared forward captures.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from xfr_tpu.graph import GraphDef
from xfr_tpu.ebp import interpreter as I
from xfr_tpu.parallel.mesh import mesh_key


def _row_shard_over_dp(mesh):
    """Constraint pinning a tensor's leading (candidate-row) axis to the
    mesh 'dp' axis, or None without a mesh — the rows-over-mesh layout
    of the per-probe wsebp sweeps (the batched sweeps shard PROBES
    instead; see _wsebp_sweep_select_shmap_fn)."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec

    def row_shard(g):
        spec = PartitionSpec(*(["dp"] + [None] * (g.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            g, NamedSharding(mesh, spec))

    return row_shard


def _percentile_mass_mask(mwp, percentile):
    """Binary mask keeping the top-(100-percentile)% of MWP *mass*.

    The reference sorts ascending, cumsums, and keeps elements whose
    cumulative mass reaches percentile% of the total
    (reference: whitebox.py:550-555).  Equivalent threshold form: the
    cutoff is the smallest element value t with
    sum(mwp[mwp <= t]) >= percentile% of the total; keep everything
    >= t.  Same result up to float summation order at the boundary (the
    reference's torch.sort + sequential cumsum is itself unstable
    there).

    Found by bisection on the value's BIT pattern (non-negative f32
    values order like their int32 bits): 31 masked-sum sweeps instead of
    a full sort — the sort costs ~10 ms/probe on TPU (over half the
    fused contrastive kernel), the sweeps ~0.5 ms.
    """
    flat = mwp.reshape(-1).astype(jnp.float32)  # MWP mass is non-negative
    total = flat.sum()
    target = (percentile / 100.0) * total
    bits_hi = jax.lax.bitcast_convert_type(jnp.max(flat), jnp.int32)

    def body(_, lohi):
        # invariant: mass(value(lo)) < target <= mass(value(hi))
        lo, hi = lohi
        mid = lo + (hi - lo) // 2  # (lo+hi)//2 overflows int32 bit space
        v = jax.lax.bitcast_convert_type(jnp.maximum(mid, 0), jnp.float32)
        mass = jnp.where(flat <= v, flat, 0.0).sum()
        ok = (mass >= target) & (mid >= 0)
        return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

    _, hi = jax.lax.fori_loop(0, 32, body, (jnp.int32(-1), bits_hi))
    thresh = jax.lax.bitcast_convert_type(hi, jnp.float32)
    return (flat >= thresh).astype(mwp.dtype).reshape(mwp.shape)


def _wsebp_select_merge(P_out, maxes, scores, topk, do_max, eps):
    """Valid-subtree selection + weighted merge of a candidate sweep.

    Reproduces the reference exactly (whitebox.py:706-725): candidates in
    ascending-score order (stable ties), keep the last ``topk`` with
    map-max > 0 excluding event 1, min-max-normalize the selected scores
    (all-ones fallback), normalize each map by its max, merge by weighted
    sum or max.  Returns (merged [H,W], sel [n_cand] bool)."""
    n_cand = scores.shape[0]
    order = jnp.argsort(scores, stable=True)
    valid = (maxes > 0) & (jnp.arange(n_cand) != 1)
    v_ord = valid[order]
    # of the valid candidates, keep the last topk in score order
    rank_from_end = jnp.cumsum(v_ord[::-1])[::-1]
    sel_ord = v_ord & (rank_from_end <= topk)
    sel = jnp.zeros((n_cand,), bool).at[order].set(sel_ord)

    vmin = jnp.min(jnp.where(sel, scores, jnp.inf))
    vmax = jnp.max(jnp.where(sel, scores, -jnp.inf))
    norm = (scores - vmin) / (eps + (vmax - vmin))
    norm = jnp.where(sel, norm, 0.0).astype(jnp.float32)
    norm = jnp.where(norm.sum() == 0, sel.astype(jnp.float32), norm)
    mapn = P_out * (1.0 / (P_out.max(axis=(1, 2, 3),
                                     keepdims=True) + 1e-12))
    weighted = norm[:, None, None, None] * mapn * \
        sel[:, None, None, None]
    merged = (jnp.max(weighted, axis=0) if do_max
              else jnp.sum(weighted, axis=0))
    return merged[0], sel


class WhiteboxNetwork:
    """A network prepared for whitebox EBP (reference: whitebox.py:25-84).

    Wraps a classify-headed ``GraphDef`` + params.  ``encode_tensor``
    identifies the SSA tensor whose forward value is the embedding (the
    reference's ``encode()`` output).  Triplet classification replaces the
    final classifier weights (reference: whitebox.py:93-96).
    """

    def __init__(self, graph: GraphDef, params, *, encode_tensor: int,
                 classifier_pname: str, num_classes: int,
                 preprocess=None, embed_dim: Optional[int] = None,
                 name: str = "net"):
        self.graph = graph
        self.params = dict(params)
        self.encode_tensor = encode_tensor
        self.classifier_pname = classifier_pname
        self._num_classes = num_classes
        self._preprocess = preprocess
        self.embed_dim = embed_dim
        self.name = name
        # original classifier, restorable after set_triplet_classifier —
        # the reference builds a fresh net per generation job, so meanEBP
        # always sees the full classifier
        self._orig_classifier = dict(params).get(classifier_pname)
        self._orig_num_classes = num_classes

    def num_classes(self):
        return self._num_classes

    def reset_classifier(self):
        """Restore the original (full) classifier after triplet runs."""
        if self._orig_classifier is not None:
            self.params = dict(self.params)
            self.params[self.classifier_pname] = self._orig_classifier
        self._num_classes = self._orig_num_classes

    def set_triplet_classifier(self, x_mate, x_nonmate):
        """Replace the classifier with a 2-row [x_mate; x_nonmate] matrix
        (reference: whitebox.py:93-96,121-124,171-173)."""
        w = jnp.concatenate(
            [jnp.asarray(x_mate).reshape(1, -1),
             jnp.asarray(x_nonmate).reshape(1, -1)], axis=0)
        self.params = dict(self.params)
        self.params[self.classifier_pname] = {"w": w}
        self._num_classes = 2
        return self

    def preprocess(self, im):
        """PIL image / numpy HWC image -> [1,C,H,W] network input."""
        if self._preprocess is None:
            raise NotImplementedError(
                f"no preprocess function registered for {self.name}")
        return self._preprocess(im)

    def encode(self, x):
        """Embedding forward (reference: whitebox.py:58-60 contract).
        Prefer Whitebox.encode for the jit-cached variant."""
        from xfr_tpu.ebp import interpreter as I
        return I.forward_clean(self.graph, self.params,
                               jnp.asarray(x))[self.encode_tensor]

    def classify(self, x):
        """Classifier forward (reference: whitebox.py:62-64 contract)."""
        from xfr_tpu.ebp import interpreter as I
        return I.forward_clean(self.graph, self.params,
                               jnp.asarray(x))[self.graph.output_id]

    def clear(self):
        """Hook-state clearing in the reference (whitebox.py:66-71); the
        functional interpreter keeps no per-call layer state, so this is
        a deliberate no-op kept for API parity."""


class Whitebox:
    """Whitebox EBP saliency engine (reference: whitebox.py:261-824)."""

    def __init__(self, net: WhiteboxNetwork, ebp_version=None, with_bias=None,
                 eps=1e-16, ebp_subtree_mode="affineonly_with_prior",
                 compute_dtype=None, wsebp_dtype=None,
                 contrastive_dtype=None):
        """compute_dtype: optional jnp dtype (e.g. jnp.bfloat16) for the
        on-device EBP compute; MWP outputs are cast back to float32.  The
        default float32 matches the reference numerics; bfloat16 roughly
        halves device time on the big vmapped passes.  Caveat: contrastive
        variants subtract nearly-equal distributions, which amplifies bf16
        rounding (maps stay structurally similar but visibly perturbed) —
        prefer bf16 for meanEBP / weighted-subtree only.

        wsebp_dtype: compute dtype for the weighted-subtree candidate
        sweep only (defaults to compute_dtype).  The sweep dominates
        generation wall-clock and its maps feed a blur+normalize+merge,
        so bfloat16 here is quality-gated safe
        (tests/test_compute_dtype.py) while the contrastive paths stay
        float32.

        contrastive_dtype: compute dtype for the contrastive/truncated
        backward passes only (defaults to compute_dtype).  Contrastive
        maps are a difference of nearly-equal MWP distributions, so the
        ~1e-3 relative bf16 rounding of each map dominates the
        difference; pinning these passes to float32 makes
        compute_dtype=bfloat16 safe for every method (the generation
        CLI does exactly that)."""
        assert isinstance(net, WhiteboxNetwork)
        self.net = net
        self.compute_dtype = compute_dtype or jnp.float32
        self.wsebp_dtype = wsebp_dtype
        self.contrastive_dtype = contrastive_dtype
        # probes per scan step in the batched sweep: each step's walk ops
        # carry a [rows, chunk, ...] batch (see _wsebp_sweep_select_scan_fn)
        self.wsebp_probe_chunk = 1
        # Cascaded sweep walk: merge the candidate buckets' walks below
        # their shared frontiers into one growing-row walk (identical
        # math, ~6.5x fewer walk ops on the per-op-overhead-bound sweep
        # — see I.ebp_backward_allevents).
        self.wsebp_cascade = True
        # lax.scan unroll of the per-probe sweep steps (scheduler can
        # interleave independent probes' small ops)
        self.wsebp_scan_unroll = 1
        self.eps = float(eps)
        self.ebp_ver = 6 if ebp_version is None else ebp_version
        if self.ebp_ver < 4:
            raise RuntimeError("ebp version, if set, must be at least 4")
        # Version semantics (reference: whitebox.py:280-289).
        self.convert_saliency_uint8 = (self.ebp_ver != 6)
        if with_bias is not None:
            self._ebp_with_bias = bool(with_bias)
        else:
            self._ebp_with_bias = self.ebp_ver == 11
        self._ebp_subtree_mode = ebp_subtree_mode
        self.batch_size = 32  # embeddings batching (whitebox.py:299)
        # max rows per scan step of the mono blend+encode program.  A/B on
        # the chip: 128 looks 11% faster in a standalone kernel timing but
        # is 10-15% SLOWER through the full eval unit (11.1-11.5 vs
        # 9.6-10.2 evals/s) — the 32-row scan's chunked outputs overlap
        # dispatch/transfer better; only whole-pipeline timings are
        # trustworthy on axon.
        self.blend_batch = 32

        # Exposed after each EBP call, mirroring reference attributes.
        self.P: Dict[int, np.ndarray] = {}
        self.P_layername = list(net.graph.event_names())

        # Calibration constants, set by the factory (eval/create_wbnet.py).
        self.match_threshold = None
        self.platts_scaling = None

        # Optional device mesh: production batched paths (embeddings,
        # ebp_batch, contrastive, STRise scoring chunks, eval blends)
        # shard their probe/mask batch over the 'dp' axis (see use_mesh).
        self.mesh = None

        self._jit_cache = {}
        # content-hash -> device buffer memo for repeated image uploads
        # (the analysis loop re-evaluates the same probe/twin pair for
        # every method; the axon device link is ~15 MB/s)
        self._upload_memo = {}

    # ------------------------------------------------------------------
    # Device-mesh placement (SURVEY.md §2.8: the mesh replaces the
    # reference's one-process-per-GPU queue,
    # generate_..._multigpu.py:121-231)
    # ------------------------------------------------------------------

    def use_mesh(self, mesh):
        """Attach a jax.sharding.Mesh: params replicate across it and
        every batched entry point shards its leading batch dim over the
        'dp' axis (GSPMD then runs each device's shard in parallel; the
        per-sample independence of every kernel means zero cross-device
        collectives until the host gather)."""
        from xfr_tpu.parallel.mesh import replicate
        self.mesh = mesh
        if mesh is not None:
            self.net.params = replicate(mesh, self.net.params)
            if self.net._orig_classifier is not None:
                self.net._orig_classifier = replicate(
                    mesh, self.net._orig_classifier)
            # keep padded embedding batches divisible by the dp size
            dp = mesh.shape["dp"]
            self.batch_size = -(-self.batch_size // dp) * dp
        return self

    @property
    def _dp(self):
        return self.mesh.shape["dp"] if self.mesh is not None else 1

    def _replicated(self, tree):
        if self.mesh is None:
            return tree
        from xfr_tpu.parallel.mesh import replicate
        return replicate(self.mesh, tree)

    def _shard_rows(self, x, batch_axis=0):
        """Place ``x`` with dim ``batch_axis`` sharded over 'dp' (the
        caller guarantees divisibility)."""
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec
        spec = [None] * np.ndim(x)
        spec[batch_axis] = "dp"
        return jax.device_put(
            jnp.asarray(x),
            NamedSharding(self.mesh, PartitionSpec(*spec)))

    # ------------------------------------------------------------------
    # Core jitted kernels
    # ------------------------------------------------------------------

    def _prep(self, params, x, dtype=None):
        """Cast params/input to the compute dtype inside a jit."""
        dtype = dtype or self.compute_dtype
        if dtype == jnp.float32:
            return params, x
        cast = lambda a: a.astype(dtype)
        return jax.tree.map(cast, params), cast(x)

    @property
    def _wsebp_dtype(self):
        return self.wsebp_dtype or self.compute_dtype

    @property
    def _contrastive_dtype(self):
        return self.contrastive_dtype or self.compute_dtype

    def _kernel(self, key, builder, precision="high"):
        """Cache a jitted kernel, calling it under
        ``jax.default_matmul_precision(precision)``.

        TPU f32 matmuls/convs default to single-pass bf16 multiplies,
        which makes the contrastive family — a difference of two
        near-equal MWP distributions — wobble by O(1) with batch shape
        (measured max|diff| 0.79 between the B=1 and B=8 programs on
        random weights).  bf16_3x ('high') pins the maps to ~3e-6 across
        batch shapes and is measured FREE on these HBM-bound backward
        kernels (130 vs 140 ms for the B=8 contrastive pair).  The
        encode/embeddings forward opts out (MXU-bound, and plain
        positive sums are precision-robust)."""
        # eps is baked into every traced EBP backward: mix it into EVERY
        # key (over-keying merely rebuilds non-eps programs if eps ever
        # changes; under-keying silently served stale-eps kernels).
        # Precision stays LAST — tests and tools read k[-1].
        key = key + (float(self.eps), precision)
        fn = self._jit_cache.get(key)
        if fn is None:
            from xfr_tpu.utils import programs
            programs.note_build(key[0])
            built = builder()
            if precision is None:
                fn = built
            else:
                def fn(*a, _built=built, **k):
                    with jax.default_matmul_precision(precision):
                        return _built(*a, **k)
            self._jit_cache[key] = fn
        return fn

    def _shmap_kernel(self, key, local, sharded, n_out=1, precision="high",
                      mesh=None):
        """The jit+shard_map boilerplate shared by every mesh fast path:
        wrap a ``local`` per-device body (shared with the single-chip
        jit) in a shard_map whose argument positions in ``sharded`` carry
        the independent step axis over 'dp' and everything else (params,
        images, counts) replicates, then register it under
        ``key + (mesh_key,)``.  No collectives anywhere — the fast paths
        all decompose into device-independent steps and shard_map just
        pins the decomposition; outputs concatenate in global step
        order.  ``n_out`` > 1 for bodies returning a tuple (every output
        'dp'-sharded)."""
        mesh = self.mesh if mesh is None else mesh
        from jax.sharding import PartitionSpec as Pspec

        def build():
            out_specs = (Pspec("dp") if n_out == 1
                         else tuple([Pspec("dp")] * n_out))

            @jax.jit
            def fn(*args):
                lp = jax.shard_map(
                    local, mesh=mesh,
                    in_specs=tuple(Pspec("dp") if i in sharded else Pspec()
                                   for i in range(len(args))),
                    out_specs=out_specs)
                return lp(*args)

            return fn

        # the shard layout is part of the program: a family key reused
        # with different sharded args / output arity must not collide
        return self._kernel(
            key + (tuple(sorted(sharded)), n_out, mesh_key(mesh)),
            build, precision=precision)

    @property
    def _n_events(self):
        return self.net.graph.n_events

    def _ebp_raw_fn(self, keep):
        """jitted: (params, x, Pn) -> {event: P} for ``keep`` events."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        keep = tuple(sorted(k % graph.n_events for k in keep))

        @jax.jit
        def fn(params, x, Pn):
            params, x = self._prep(params, x)
            out = I.ebp(graph, params, x, Pn.astype(x.dtype),
                        subtree_mode=mode, eps=eps, with_bias=wb, keep=keep)
            return {k: v.astype(jnp.float32) for k, v in out.items()}

        return self._kernel(("ebp_raw", mode, wb, keep,
                             str(self.compute_dtype)), lambda: fn)

    def _ebp_multi_cotangent_fn(self, keep):
        """jitted: (params, x, Pn_batch[k,1,C]) -> {event: P[k,...]} sharing
        one forward capture across k backward sweeps."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        keep = tuple(sorted(k % graph.n_events for k in keep))

        @jax.jit
        def fn(params, x, Pns):
            params, x = self._prep(params, x)
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)

            def bwd(Pn):
                out = I.ebp_backward(
                    graph, params, values, posvals, Pn.astype(x.dtype),
                    subtree_mode=mode, eps=eps, with_bias=wb, keep=keep)
                return {k: v.astype(jnp.float32) for k, v in out.items()}

            return jax.vmap(bwd)(Pns)

        return self._kernel(("ebp_multi", mode, wb, keep,
                             str(self.compute_dtype)), lambda: fn)

    def _ebp_pooled_fn(self):
        """jitted: channel-pooled MWP at event -2 — only [B,H,W] crosses to
        host (full per-channel maps are several MB; the device->host link
        dominates wall-clock otherwise)."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        kk = graph.n_events - 2

        @jax.jit
        def fn(params, x, Pn):
            params, x = self._prep(params, x)
            out = I.ebp(graph, params, x, Pn.astype(x.dtype),
                        subtree_mode=mode, eps=eps, with_bias=wb, keep=(kk,))
            P = out[kk].astype(jnp.float32)
            return P.sum(axis=1), P

        return self._kernel(("ebp_pooled", mode, wb,
                             str(self.compute_dtype)), lambda: fn)

    def _contrastive_fn(self, truncate=False):
        """jitted device-side contrastive / truncated-contrastive combine
        (whitebox.py:506-558): per-map unit-mass normalize, optional
        percentile-mass truncation of the mate MWP, relu difference,
        channel pool."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        kk = graph.n_events - 2
        cdt = self._contrastive_dtype

        @jax.jit
        def fn(params, x, Pns, percentile):
            params, x = self._prep(params, x, cdt)
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)

            def bwd(Pn):
                out = I.ebp_backward(
                    graph, params, values, posvals, Pn.astype(x.dtype),
                    subtree_mode=mode, eps=eps, with_bias=wb, keep=(kk,))
                return out[kk].astype(jnp.float32)

            P = jax.vmap(bwd)(Pns)  # [2,1,C,H,W]
            mate = P[0] / jnp.maximum(P[0].sum(), eps)
            nonmate = P[1] / jnp.maximum(P[1].sum(), eps)
            if truncate:
                mask = _percentile_mass_mask(mate, percentile)
                diff = jnp.maximum(mask * mate - mask * nonmate, 0)
            else:
                diff = jnp.maximum(mate - nonmate, 0)
            return diff.sum(axis=1)[0]  # pool channels -> [H,W]

        return self._kernel(("contrastive", mode, wb, truncate,
                             str(cdt)), lambda: fn)

    # ------------------------------------------------------------------
    # Saliency post-processing (reference: whitebox.py:439-460)
    # ------------------------------------------------------------------

    def _float32_to_uint8(self, img):
        return np.uint8(255 * ((img - np.min(img)) /
                               (self.eps + (np.max(img) - np.min(img)))))

    def _scale_normalized(self, img):
        img = np.float32(img)
        return (img - np.min(img)) / (self.eps + (np.max(img) - np.min(img)))

    def _mwp_to_saliency(self, P, blur_radius=2):
        """Channel-pooled MWP -> saliency map: normalize + gaussian blur.

        v6: float path, skimage.filters.gaussian equivalent
        (scipy.ndimage.gaussian_filter, mode='nearest').
        v!=6: uint8 path via PIL GaussianBlur (whitebox.py:448-460).
        """
        img = np.asarray(P, dtype=np.float32)
        if self.convert_saliency_uint8:
            import PIL.Image
            import PIL.ImageFilter
            img = self._float32_to_uint8(img)
            img = np.array(PIL.Image.fromarray(img).filter(
                PIL.ImageFilter.GaussianBlur(radius=blur_radius)))
            img = self._float32_to_uint8(img)
        else:
            from scipy.ndimage import gaussian_filter
            img = gaussian_filter(img, blur_radius, mode="nearest")
            img = np.maximum(0, img)
            img /= max(img.sum(), self.eps)
        return img

    # ------------------------------------------------------------------
    # Public EBP API
    # ------------------------------------------------------------------

    def ebp_subtree_mode(self):
        return self._ebp_subtree_mode

    def _as_input(self, x):
        x = jnp.asarray(x)
        if x.dtype != jnp.float64:  # f64 passed only by parity tests
            x = x.astype(jnp.float32)
        if x.ndim == 3:
            x = x[None]
        return x

    def _onehot(self, k):
        P = np.zeros((1, self.net.num_classes()), np.float32)
        P[0, k] = 1.0
        return jnp.asarray(P)

    def ebp(self, x, Pn, mwp=False):
        """Excitation backprop (reference: whitebox.py:482-504).

        Returns the channel-pooled MWP of the second-to-last backward event
        (the first conv's output plane), optionally converted to a saliency
        map."""
        x = self._as_input(x)
        Pn = jnp.asarray(Pn, jnp.float32)
        k = self._n_events - 2
        pooled, P_full = self._ebp_pooled_fn()(self.net.params, x, Pn)
        # keep the full per-channel MWP on device; convert lazily if read
        self.P = {k: P_full}
        P = np.squeeze(np.asarray(pooled)).astype(np.float32)
        return self._mwp_to_saliency(P) if not mwp else P

    def contrastive_ebp(self, img_probe, k_poschannel, k_negchannel):
        """Contrastive EBP: relu(mwp_mate - mwp_nonmate) at event -2, each
        normalized to unit mass (reference: whitebox.py:506-527)."""
        x = self._as_input(img_probe)
        Pns = jnp.stack([self._onehot(k_poschannel),
                         self._onehot(k_negchannel)])
        mwp = self._contrastive_fn(truncate=False)(
            self.net.params, x, Pns, jnp.float32(0.0))
        return self._mwp_to_saliency(np.asarray(mwp, np.float32))

    def truncated_contrastive_ebp(self, img_probe, k_poschannel, k_negchannel,
                                  percentile=20):
        """Truncated contrastive EBP (reference: whitebox.py:529-558): a
        percentile-mass mask on the mate MWP gates the contrastive
        difference."""
        x = self._as_input(img_probe)
        Pns = jnp.stack([self._onehot(k_poschannel),
                         self._onehot(k_negchannel)])
        mwp = self._contrastive_fn(truncate=True)(
            self.net.params, x, Pns, jnp.float32(percentile))
        return self._mwp_to_saliency(np.asarray(mwp, np.float32))

    def layerwise_ebp(self, img_probe, k_layer, mode="argmax", k_element=None,
                      k_poschannel=0, mwp=True):
        """Layerwise EBP (reference: whitebox.py:561-581): run EBP to get
        P_mate, build a prior at event ``k_layer`` (argmax or single
        element), then re-run with the prior injected and a zero output
        cotangent."""
        x = self._as_input(img_probe)
        Pn = self._onehot(k_poschannel)
        kk = self._n_events - 2
        base = self._ebp_raw_fn((k_layer, kk))(self.net.params, x, Pn)
        Pk = np.asarray(base[k_layer % self._n_events], np.float32)

        if mode == "argmax":
            prior = Pk * (Pk == Pk.max()).astype(np.float32)
        elif mode == "elementwise":
            assert k_element is not None
            prior = np.zeros(Pk.size, np.float32)
            prior[k_element] = Pk.flat[k_element]
            prior = prior.reshape(Pk.shape)
        else:
            raise ValueError('invalid layerwise EBP mode "%s"' % mode)

        return self._prior_ebp(x, {k_layer % self._n_events:
                                   jnp.asarray(prior)}, mwp=mwp)

    def _prior_ebp(self, x, priors, mwp=False):
        """EBP with zero output cotangent and static per-event priors
        (the reference's self.P_prior mechanism, whitebox.py:390-392)."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        kk = self._n_events - 2
        prior_keys = tuple(sorted(priors.keys()))

        @jax.jit
        def fn(params, x, prior_vals):
            pri = dict(zip(prior_keys, prior_vals))
            Pn = jnp.zeros((x.shape[0], self.net.num_classes()), x.dtype)
            return I.ebp(graph, params, x, Pn, subtree_mode=mode, eps=eps,
                         with_bias=wb, keep=(kk,), priors=pri)

        fn = self._kernel(
            ("prior_ebp", mode, wb, prior_keys, kk, self.net.num_classes()),
            lambda: fn)
        out = fn(self.net.params, x, tuple(priors[k] for k in prior_keys))
        P = np.asarray(out[kk], np.float32)
        P = np.squeeze(P.sum(axis=1)).astype(np.float32)
        return self._mwp_to_saliency(P) if not mwp else P

    def layerwise_contrastive_ebp(self, img_probe, k_poschannel, k_negchannel,
                                  k_layer, mode="copy", percentile=80,
                                  k_element=None, gradlayer=None, mwp=False):
        """Deprecated layerwise contrastive EBP, 8 prior-construction modes
        (reference: whitebox.py:584-644)."""
        import warnings
        warnings.warn("layerwise_contrastive_ebp is deprecated, use "
                      "weighted_subtree_ebp instead")
        x = self._as_input(img_probe)
        Pns = jnp.stack([self._onehot(k_poschannel),
                         self._onehot(k_negchannel)])
        kl = k_layer % self._n_events
        out = self._ebp_multi_cotangent_fn((kl,))(self.net.params, x, Pns)
        Pm = np.asarray(out[kl][0], np.float32)
        Pn_ = np.asarray(out[kl][1], np.float32)
        C = np.maximum(Pm - Pn_, 0)

        if mode == "copy":
            prior = C
        elif mode == "mean":
            prior = 0.5 * (Pm + C)
        elif mode == "product":
            prior = np.sqrt(Pm.astype(np.float64) *
                            C.astype(np.float64)).astype(np.float32)
        elif mode == "argmax":
            prior = C * (C == C.max()).astype(np.float32)
        elif mode in ("percentile", "percentile_argmax"):
            assert 0 <= percentile <= 100
            flat = Pm.flatten()
            order = np.argsort(flat, kind="stable")
            csum = np.cumsum(flat[order])
            m = np.zeros_like(flat)
            m[order] = (csum >= (percentile / 100.0) * csum[-1]).astype(
                np.float32)
            prior = m.reshape(Pm.shape) * C
            if mode == "percentile_argmax":
                prior = prior * (prior == prior.max()).astype(np.float32)
        elif mode == "argmax_product":
            pr = np.sqrt(Pm.astype(np.float64) *
                         C.astype(np.float64)).astype(np.float32)
            prior = pr * (pr == pr.max()).astype(np.float32)
        elif mode == "elementwise":
            prior = np.zeros(C.size, np.float32)
            prior[k_element] = C.flat[k_element]
            prior = prior.reshape(C.shape)
        else:
            raise ValueError('unknown contrastive ebp mode "%s"' % mode)

        return self._prior_ebp(x, {kl: jnp.asarray(prior)}, mwp=mwp)

    # ------------------------------------------------------------------
    # Subtree EBP (deprecated-engine capability)
    # ------------------------------------------------------------------

    def _subtree_rank_fn(self, argmax):
        """jitted: per-event truncated-contrastive prior construction for
        ``subtree_ebp`` (reference: resnetEBP.py:273-283 percentile modes).

        One program computes the mate/nonmate MWP at every event (shared
        forward captures, vmapped 2-cotangent backward), the
        percentile-mass mask of the mate MWP, the masked contrast prior,
        and the reference's peakiness score
        ``max(prior / (1e-12 + sum(prior))) * numel``
        (resnetEBP.py:300; after injection self.Pn[k] IS the prior).

        argmax=True returns (elems, vals, scores) for the static
        event-order injected sweep; argmax=False returns
        (per-event prior arrays, scores) for the serial full-prior path.
        """
        graph = self.net.graph
        smode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        n_ev = graph.n_events
        keep = tuple(range(n_ev - 1))

        @jax.jit
        def fn(params, x, Pns, percentile):
            params, x = self._prep(params, x)
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)

            def bwd(Pn):
                return I.ebp_backward(
                    graph, params, values, posvals, Pn.astype(x.dtype),
                    subtree_mode=smode, eps=eps, with_bias=wb, keep=keep)

            P = jax.vmap(bwd)(Pns)  # {event: [2, ...]}
            elems, vals, scores, ties, priors = [], [], [], [], []
            for k in keep:
                Pm = P[k][0]
                C = jnp.maximum(Pm - P[k][1], 0.0)
                pr = _percentile_mass_mask(Pm, percentile) * C
                if argmax:
                    flat = pr.reshape(-1)
                    el = jnp.argmax(flat)
                    v = flat[el]
                    nt = (flat == v).sum()  # tied maxima count
                    elems.append(el.astype(jnp.int32))
                    vals.append(v)
                    ties.append(nt.astype(jnp.int32))
                    # the reference's argmax keeps ALL tied maxima
                    # (resnetEBP.py:278-280): prior = nt elements of v,
                    # so max(prior/sum(prior)) = v/(nt*v)
                    scores.append(
                        (v / (1e-12 + v * nt.astype(v.dtype)))
                        * flat.size)
                else:
                    priors.append(pr)
                    scores.append(
                        (pr.max() / (1e-12 + pr.sum())) * pr.size)
            if argmax:
                return (jnp.stack(elems), jnp.stack(vals),
                        jnp.stack(scores), jnp.stack(ties))
            return tuple(priors), jnp.stack(scores)

        return self._kernel(("subtree_rank", smode, wb, bool(argmax),
                             str(self.compute_dtype),
                             self.net.num_classes()), lambda: fn)

    def _subtree_tied_prior_fn(self, k):
        """jitted: the FULL argmax'd prior for event ``k`` (value v at
        every tied-maximum position) — the exact-ties fallback of the
        subtree_ebp sweep (reference argmax semantics keep all ties,
        resnetEBP.py:278-280)."""
        graph = self.net.graph
        smode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, \
            self.eps

        @jax.jit
        def fn(params, x, Pns, percentile):
            params, x = self._prep(params, x)
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)

            def bwd(Pn):
                return I.ebp_backward(
                    graph, params, values, posvals, Pn.astype(x.dtype),
                    subtree_mode=smode, eps=eps, with_bias=wb, keep=(k,))

            P = jax.vmap(bwd)(Pns)
            Pm = P[k][0]
            C = jnp.maximum(Pm - P[k][1], 0.0)
            pr = _percentile_mass_mask(Pm, percentile) * C
            return jnp.where(pr == pr.max(), pr.max(), 0.0)

        return self._kernel(("subtree_tied_prior", smode, wb, int(k),
                             str(self.compute_dtype),
                             self.net.num_classes()), lambda: fn)

    def subtree_ebp(self, img_probe, k_poschannel, k_negchannel,
                    percentile=20, mode="percentile_argmax", topk=1):
        """Subtree EBP — the deprecated engine's unique method
        (reference: resnetEBP.py:286-340).

        Truncated contrastive EBP injected at every candidate event; each
        candidate scored by the peakiness of its injected prior
        (``max(prior/sum(prior)) * numel``), scores of candidates whose
        saliency plane is all-zero set to 0 (ebp_ver>1 semantics,
        resnetEBP.py:302-306); the top-``topk`` by ascending stable
        argsort are kept and their blurred+normalized planes summed, then
        sum-normalized (float ebp versions) or uint8-normalized.

        Deviations from the deprecated reference, both documented:
        * candidates = every backward event (the reference's
          ``num_layers()`` visitor bug makes it sweep only the first
          ~n_containers events; ours is the intended superset);
        * runs on the modern whitebox engine's EBP rules (the reference
          itself deprecated resnetEBP in favor of whitebox.py).

        mode='percentile_argmax' (the reference default) uses the batched
        static-event-order sweep — one device program for all candidates.
        mode='percentile' injects full-tensor priors serially per
        candidate (one program per event; deprecated-compat slow path).

        Returns ``(smap, P_subtree_topk, k_subtree)`` with k_subtree in
        ascending-score order, exactly like the reference.
        """
        if "percentile" not in mode:
            raise AssertionError("subtree_ebp requires a percentile mode")
        x = self._as_input(img_probe)
        Pns = jnp.stack([self._onehot(k_poschannel),
                         self._onehot(k_negchannel)])

        if mode == "percentile_argmax":
            elems, vals, scores, ties = self._subtree_rank_fn(True)(
                self.net.params, x, Pns, float(percentile))
            P_img_dev, maxes = self._wsebp_sweep_fn()(
                self.net.params, x, elems, vals)
            scores = np.asarray(scores, np.float64)
            maxes = np.array(maxes)  # writable copy: tied events update it
            # The reference's argmax keeps ALL tied maxima
            # (resnetEBP.py:278-280); the batched sweep injects a single
            # element, so events with ties (rare on continuous data, but
            # exact duplicates do occur via pools/forks) are recomputed
            # exactly with the full tied prior.
            tied = np.where((np.asarray(ties) > 1)
                            & (np.asarray(vals, np.float64) > 0))[0]
            tied_maps = {}
            for k in tied:
                prior = self._subtree_tied_prior_fn(int(k))(
                    self.net.params, x, Pns, float(percentile))
                P = self._prior_ebp(x, {int(k): prior}, mwp=True)
                maxes[k] = P.max()
                tied_maps[int(k)] = self._mwp_to_saliency(P)
            # MWP planes are non-negative, so plane-max > 0 iff the
            # blurred saliency map is non-zero (P_img[k].max() > 0 check,
            # resnetEBP.py:303-306)
            scores = scores * (maxes > 0)
            k_subtree = [int(k) for k in
                         np.argsort(scores, kind="stable")[-topk:]]
            sel = np.asarray(P_img_dev[jnp.asarray(
                np.asarray(k_subtree, np.int32))], np.float32)
            maps = [tied_maps.get(k, self._mwp_to_saliency(m[0]))
                    for k, m in zip(k_subtree, sel)]
        else:
            priors, scores = self._subtree_rank_fn(False)(
                self.net.params, x, Pns, float(percentile))
            scores = np.asarray(scores, np.float64)
            maps_all = []
            for k in range(self._n_events - 1):
                P = self._prior_ebp(x, {k: priors[k]}, mwp=True)
                if P.max() <= 0:
                    scores[k] = 0.0
                maps_all.append(self._mwp_to_saliency(P))
            k_subtree = [int(k) for k in
                         np.argsort(scores, kind="stable")[-topk:]]
            maps = [maps_all[k] for k in k_subtree]

        smap = np.sum(np.stack(maps, axis=0), axis=0)
        if self.convert_saliency_uint8:
            smap = self._float32_to_uint8(smap)
        else:
            smap = smap / max(smap.sum(), self.eps)
        return smap, [float(scores[k]) for k in k_subtree], k_subtree

    # ------------------------------------------------------------------
    # Probe-batched triplet EBP
    # ------------------------------------------------------------------
    #
    # B probes with B different (mate, nonmate) classifiers run as ONE
    # batch: the per-probe 2-row classifiers interleave into a single
    # [2B, D] matrix and each probe's cotangent selects only its own two
    # rows.  Because the classifier is linear, zero cotangent rows
    # contribute nothing to the backward — per-probe results are exactly
    # the 2-class runs, but the whole batch is one device launch.

    def set_triplet_classifier_batch(self, x_mates, x_nonmates):
        """Install an interleaved [2B, D] classifier for B probes.

        Under a mesh, B is padded up to a multiple of the dp size with
        zero rows (padded probes produce discarded zero maps) so the
        batch shards evenly."""
        x_mates = np.asarray(x_mates)
        x_nonmates = np.asarray(x_nonmates)
        B, D = x_mates.shape
        pad = (-B) % self._dp
        if pad:
            z = np.zeros((pad, D), x_mates.dtype)
            x_mates = np.concatenate([x_mates, z])
            x_nonmates = np.concatenate([x_nonmates, z])
        w = jnp.stack([jnp.asarray(x_mates), jnp.asarray(x_nonmates)],
                      axis=1).reshape(2 * (B + pad), D)
        self.net.params = dict(self.net.params)
        self.net.params[self.net.classifier_pname] = self._replicated(
            {"w": w})
        self.net._num_classes = 2 * (B + pad)
        return B + pad

    def _pad_probe_batch(self, x):
        """Pad a probe batch to the installed batch-classifier width."""
        x = jnp.asarray(x, jnp.float32)
        B = x.shape[0]
        Bc = self.net.num_classes() // 2
        assert B <= Bc and (B == Bc or self.mesh is not None), \
            "call set_triplet_classifier_batch matching the probe batch"
        if B < Bc:
            x = jnp.concatenate(
                [x, jnp.zeros((Bc - B,) + x.shape[1:], x.dtype)])
        return self._shard_rows(x), B

    def _batch_cotangents(self, B, kind):
        """[B, 2B] (or [2, B, 2B]) cotangent rows selecting each probe's
        own classifier rows."""
        eye = np.zeros((B, 2 * B), np.float32)
        mate = eye.copy()
        nonmate = eye.copy()
        both = eye.copy()
        for i in range(B):
            mate[i, 2 * i] = 1.0
            nonmate[i, 2 * i + 1] = 1.0
            both[i, 2 * i] = 1.0
            both[i, 2 * i + 1] = 1.0
        if kind == "mean":
            return jnp.asarray(both)
        return jnp.stack([jnp.asarray(mate), jnp.asarray(nonmate)])

    def ebp_batch(self, x, mwp=False):
        """Batched meanEBP over the installed batch triplet classifiers:
        x [B,C,H,W] -> list of B saliency maps."""
        x, B = self._pad_probe_batch(x)
        Pn = self._shard_rows(self._batch_cotangents(x.shape[0], "mean"))
        pooled, P_full = self._ebp_pooled_fn()(self.net.params, x, Pn)
        self.P = {self._n_events - 2: P_full}
        pooled = np.asarray(pooled, np.float32)
        if mwp:
            return [pooled[i] for i in range(B)]
        return [self._mwp_to_saliency(pooled[i]) for i in range(B)]

    def _contrastive_batch_fn(self, truncate=False):
        """jitted batched contrastive combine with per-sample
        normalization/truncation."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        kk = graph.n_events - 2
        cdt = self._contrastive_dtype

        @jax.jit
        def fn(params, x, Pns, percentile):
            params, x = self._prep(params, x, cdt)
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)

            def bwd(Pn):
                out = I.ebp_backward(
                    graph, params, values, posvals, Pn.astype(x.dtype),
                    subtree_mode=mode, eps=eps, with_bias=wb, keep=(kk,))
                return out[kk].astype(jnp.float32)

            P = jax.vmap(bwd)(Pns)  # [2, B, C, H, W]

            def combine(mate, nonmate):
                mate = mate / jnp.maximum(mate.sum(), eps)
                nonmate = nonmate / jnp.maximum(nonmate.sum(), eps)
                if truncate:
                    mask = _percentile_mass_mask(mate, percentile)
                    diff = jnp.maximum(mask * mate - mask * nonmate, 0)
                else:
                    diff = jnp.maximum(mate - nonmate, 0)
                return diff.sum(axis=0)  # pool channels -> [H,W]

            return jax.vmap(combine)(P[0], P[1])

        return self._kernel(("contrastive_batch", mode, wb, truncate,
                             str(cdt)), lambda: fn)

    def contrastive_ebp_batch(self, x, truncate_percent=None):
        """Batched (truncated-)contrastive EBP over the installed batch
        classifiers: x [B,C,H,W] -> list of B saliency maps."""
        x, B = self._pad_probe_batch(x)
        Pns = self._shard_rows(
            self._batch_cotangents(x.shape[0], "contrastive"), batch_axis=1)
        mwp = self._contrastive_batch_fn(truncate_percent is not None)(
            self.net.params, x, Pns,
            jnp.float32(truncate_percent or 0.0))
        mwp = np.asarray(mwp, np.float32)
        return [self._mwp_to_saliency(mwp[i]) for i in range(B)]

    def _contrastive_both_fn(self):
        """jitted: contrastive AND truncated-contrastive maps from ONE
        forward-capture pair + one two-cotangent backward sweep (the two
        method variants differ only in the final combine — running them as
        separate engine calls doubles the network passes for nothing)."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        kk = graph.n_events - 2
        cdt = self._contrastive_dtype

        @jax.jit
        def fn(params, x, Pns, percentile):
            params, x = self._prep(params, x, cdt)
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)

            def bwd(Pn):
                out = I.ebp_backward(
                    graph, params, values, posvals, Pn.astype(x.dtype),
                    subtree_mode=mode, eps=eps, with_bias=wb, keep=(kk,))
                return out[kk].astype(jnp.float32)

            P = jax.vmap(bwd)(Pns)  # [2, B, C, H, W]

            def combine(mate, nonmate):
                mate = mate / jnp.maximum(mate.sum(), eps)
                nonmate = nonmate / jnp.maximum(nonmate.sum(), eps)
                contr = jnp.maximum(mate - nonmate, 0).sum(axis=0)
                mask = _percentile_mass_mask(mate, percentile)
                trunc = jnp.maximum(mask * mate - mask * nonmate,
                                    0).sum(axis=0)
                return contr, trunc

            return jax.vmap(combine)(P[0], P[1])

        return self._kernel(("contrastive_both", mode, wb,
                             str(cdt)), lambda: fn)

    def launch_contrastive_ebp_batch_both(self, x, truncate_percent=20):
        """Enqueue the batched contrastive+truncated program and return a
        ``finish()`` closure producing (contrastive maps, truncated maps).

        Launch/finish split lets callers overlap the device work and the
        result transfer with other launches (the weighted-subtree sweeps,
        host png writes) instead of paying a device-link round trip per
        method."""
        x, B = self._pad_probe_batch(x)
        Pns = self._shard_rows(
            self._batch_cotangents(x.shape[0], "contrastive"), batch_axis=1)
        contr_dev, trunc_dev = self._contrastive_both_fn()(
            self.net.params, x, Pns, jnp.float32(truncate_percent))

        def finish():
            contr = np.asarray(contr_dev, np.float32)
            trunc = np.asarray(trunc_dev, np.float32)
            return ([self._mwp_to_saliency(contr[i]) for i in range(B)],
                    [self._mwp_to_saliency(trunc[i]) for i in range(B)])

        return finish

    def contrastive_ebp_batch_both(self, x, truncate_percent=20):
        """Batched contrastive + truncated-contrastive in one device launch:
        x [B,C,H,W] -> (list of B contrastive maps, list of B truncated
        maps)."""
        return self.launch_contrastive_ebp_batch_both(x, truncate_percent)()

    # ------------------------------------------------------------------
    # Weighted subtree EBP
    # ------------------------------------------------------------------

    def weighted_subtree_ebp(self, img_probe, k_poschannel, k_negchannel,
                             topk=1, verbose=False, do_max_subtree=False,
                             do_mated_similarity_gating=True,
                             subtree_mode="norelu", do_mwp_to_saliency=True,
                             max_candidates=None, return_subtree_maps=True):
        """Weighted subtree EBP (reference: whitebox.py:647-737).

        Gradient-gates every backward event to rank subtrees, then runs a
        *batched* set of prior-injected layerwise EBP backwards (one device
        launch) instead of the reference's serial per-layer re-runs.

        ``max_candidates`` bounds how many top-ranked subtrees are evaluated
        (None = all n_events-1, exactly matching the reference's sweep;
        the reference discards all but the topk valid anyway, so a small
        multiple of topk is a faithful fast path).

        ``return_subtree_maps=False`` skips the device->host transfer of
        the topk per-subtree maps (second return value becomes []); the
        generation pipeline only keeps the merged map, and the transfer is
        ~50 ms/probe on a slow device link.
        """
        prev_mode = self._ebp_subtree_mode
        self._ebp_subtree_mode = subtree_mode
        try:
            return self._weighted_subtree_ebp(
                img_probe, k_poschannel, k_negchannel, topk, verbose,
                do_max_subtree, do_mated_similarity_gating,
                do_mwp_to_saliency, max_candidates, return_subtree_maps)
        finally:
            self._ebp_subtree_mode = prev_mode

    def _wsebp_grad_fn(self):
        """jitted: per-event subtree scores + argmax + P_mate injection
        values, all in one program.

        Forward captures are recomputed inside each wsebp kernel instead of
        being passed between jits: shipping the ~2*n_nodes captured
        activation tensors through jit boundaries costs far more in
        dispatch/transfer than the ~15 ms forward recompute."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        n_ev = graph.n_events

        @partial(jax.jit, static_argnames=("gating",))
        def fn(params, x, Pn_pos, gating):
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)
            y = values[graph.output_id]

            cot_m = jnp.zeros_like(y).at[0, 0].set(1.0)
            cot_n = jnp.zeros_like(y).at[0, 1].set(1.0)
            # one batched natural-backward sweep for the 2-3 cotangents
            # (the reference runs x.backward() serially per loss,
            # whitebox.py:652-676)
            if gating:
                cots = jnp.stack([cot_m, cot_n])
            else:
                cots = jnp.stack([jax.nn.softmax(y, axis=-1) - cot_m, cot_n])
            dAs = jax.vmap(
                lambda c: I.natural_backward(graph, params, values, c))(cots)

            scores, idxs = [], []
            for k in range(n_ev - 1):
                if gating:
                    gated = (dAs[k][0] >= 0) * (-dAs[k][1])
                else:
                    gated = (dAs[k][0] < 0) * (-dAs[k][1])
                scores.append(jnp.max(gated))
                idxs.append(jnp.argmax(gated))

            # Base EBP to harvest injection values P_mate[k].flat[idx[k]]
            # (reference: whitebox.py:575-577 via layerwise_ebp).
            P_mate = I.ebp_backward(
                graph, params, values, posvals, Pn_pos, subtree_mode=mode,
                eps=eps, with_bias=wb, keep=tuple(range(n_ev - 1)))
            vals = [P_mate[k].reshape(-1)[idxs[k]] for k in range(n_ev - 1)]
            return jnp.stack(scores), jnp.stack(idxs), jnp.stack(vals)

        return self._kernel(("wsebp_grad", mode, wb,
                             str(self.compute_dtype)), lambda: fn)

    def _wsebp_inject_fn(self, start_node=None):
        """jitted: vmapped prior-injected backward over candidate events
        over freshly recomputed (cheap) forward captures.

        ``start_node`` truncates the walk: with a zero output cotangent the
        gradient above the injection point is identically zero, so a kernel
        whose candidates all fire at node <= start_node statically skips
        the deeper vjps (GraphDef.event_node bucketing)."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        kk = graph.n_events - 2

        sweep_dt = self._wsebp_dtype

        @jax.jit
        def fn(params, x, ev_ids, elems, vals):
            params, x = self._prep(params, x, sweep_dt)
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)
            zero_cot = jnp.zeros_like(values[graph.output_id])

            def one(ev_id, elem, val):
                out = I.ebp_backward(
                    graph, params, values, posvals, zero_cot,
                    subtree_mode=mode, eps=eps, with_bias=wb, keep=(kk,),
                    inject_spec=(ev_id, elem, val.astype(x.dtype)),
                    start_node=start_node)
                return out[kk].astype(jnp.float32).sum(axis=1)

            P_img = jax.vmap(one)(ev_ids, elems, vals)
            # per-candidate maxima for host-side validity selection — only
            # these scalars cross to host; the maps stay on device
            return P_img, P_img.max(axis=(1, 2, 3))

        return self._kernel(("wsebp_inject", mode, wb, start_node,
                             str(sweep_dt)), lambda: fn)

    def _wsebp_sweep_fn(self, n_buckets=12):
        """jitted: the full-candidate weighted-subtree sweep in *static
        event order* (row k = event k), via the natively-batched
        interpreter walk (I.ebp_backward_allevents).

        Candidate/event order is fixed at trace time, so each event's
        injection is a single static-row scatter instead of the traced
        per-candidate scatter+select the vmapped path pays at every event
        for every row — and contiguous event buckets statically skip the
        all-zero vjps above each bucket's injection frontier (exact:
        zero cotangent means zero gradient above the injection point).
        Score-ordering and topk selection happen on host afterwards,
        exactly as the reference's argsort-then-filter
        (whitebox.py:697-717)."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        sweep_dt = self._wsebp_dtype
        mesh = self.mesh
        # snapshot at build time (the cache key records this value; a
        # trace-time self read could diverge from it after a flag flip).
        # Record the EFFECTIVE value: with row_shard set (mesh rows-over-
        # 'dp') the interpreter runs the bucketed walks — the cascade's
        # growing row batch would break the static per-device row
        # partition — so a True here would only mint a second cache entry
        # compiling a byte-identical row-sharded program.
        casc = bool(self.wsebp_cascade) and mesh is None
        row_shard = _row_shard_over_dp(mesh)

        @jax.jit
        def fn(params, x, elems, vals):
            params, x = self._prep(params, x, sweep_dt)
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)
            return I.ebp_backward_allevents(
                graph, params, values, posvals, elems,
                vals.astype(x.dtype), subtree_mode=mode, eps=eps,
                with_bias=wb, n_buckets=n_buckets, row_shard=row_shard,
                cascade=casc)

        return self._kernel(("wsebp_sweep", mode, wb, n_buckets,
                             str(sweep_dt), casc,
                             mesh_key(mesh)), lambda: fn)

    def _wsebp_sweep_select_fn(self, topk, do_max, n_buckets=12):
        """jitted: full sweep + valid-subtree selection + weighted merge in
        ONE program — one device sync per probe instead of three (maxes /
        fetch+merge / smap), which matters on a high-latency device link.

        Selection reproduces the reference exactly (whitebox.py:706-725):
        candidates in ascending-score order (stable ties), keep the last
        ``topk`` with map-max > 0 excluding event 1, min-max-normalize the
        selected scores (all-ones fallback), normalize each map by its
        max, merge by weighted sum or max."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        sweep_dt = self._wsebp_dtype
        mesh = self.mesh
        row_shard = _row_shard_over_dp(mesh)
        # snapshot of the EFFECTIVE value (see _wsebp_sweep_fn): the
        # interpreter ignores cascade when row_shard is set
        casc = bool(self.wsebp_cascade) and mesh is None

        @jax.jit
        def fn(params, x, elems, vals, scores):
            params, x = self._prep(params, x, sweep_dt)
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)
            P_out, maxes = I.ebp_backward_allevents(
                graph, params, values, posvals, elems,
                vals.astype(x.dtype), subtree_mode=mode, eps=eps,
                with_bias=wb, n_buckets=n_buckets, row_shard=row_shard,
                cascade=casc)
            return _wsebp_select_merge(P_out, maxes, scores, topk,
                                       do_max, eps)

        return self._kernel(("wsebp_sweep_select", mode, wb, n_buckets,
                             int(topk), bool(do_max), str(sweep_dt),
                             casc,
                             mesh_key(mesh)), lambda: fn)

    def _wsebp_sweep_select_scan_fn(self, topk, do_max, n_buckets=12,
                                    probe_chunk=None, unroll=None):
        """jitted: fused sweep+selection+merge for a whole probe BATCH in
        one program — one batch-B forward-capture pair shared by a
        lax.scan over probe CHUNKS whose body is the probe-batched
        bucketed candidate walk on chunk-slices of the captures.

        vs per-probe fused launches this removes B-1 redundant batch-1
        forward pairs (~30% of each sweep program) and collapses B device
        programs + B result transfers into one.  Capture slicing happens
        once per chunk per tensor inside the scan — NOT per candidate
        row, which is the vmapped-gather trap (each vmap lane gathering
        its own copy of every capture) measured 13x slower; the walk
        itself stays natively batched over candidate rows x chunk probes.

        ``probe_chunk`` > 1 multiplies every walk op's batch by the chunk
        (the per-probe scan ran at 3% MXU / 14% HBM — per-op overhead
        bound, tools/_wsebp_roofline.py); the fully-batched chunk=8 walk
        OOMs at ~18 GB on v5e, chunk 2-4 fits.  Requires B %% chunk == 0
        (the production batch is padded to batch_size)."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        sweep_dt = self._wsebp_dtype
        chunk = int(probe_chunk or self.wsebp_probe_chunk)
        unroll = int(unroll or self.wsebp_scan_unroll)
        local = self._wsebp_scan_local(topk, do_max, n_buckets, chunk,
                                       unroll)

        @jax.jit
        def fn(params, x, elems, vals, scores):
            # x [B,...]; elems/vals/scores [B, n_cand]
            params, x = self._prep(params, x, sweep_dt)
            return local(params, x, elems, vals, scores)

        return self._kernel(("wsebp_sweep_select_scan", mode, wb, n_buckets,
                             int(topk), bool(do_max), str(sweep_dt), chunk,
                             unroll, bool(self.wsebp_cascade)), lambda: fn)

    def _wsebp_scan_local(self, topk, do_max, n_buckets, chunk, unroll):
        """The batched-sweep body shared by the single-device jit and the
        shard_map per-device shard: one forward-capture pair + a lax.scan
        over probe chunks whose step is the bucketed candidate walk on
        chunk-slices of the captures + the fused selection/merge.

        Returns local(params, x, elems, vals, scores) ->
        (merged [B,H,W], sel [B,n_cand]); inputs must already be in the
        sweep compute dtype (callers run self._prep first)."""
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        casc = bool(self.wsebp_cascade)

        def local(params, x, elems, vals, scores):
            B = x.shape[0]
            C = chunk if B % chunk == 0 else 1
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)

            def body(carry, inp):
                i, elems_i, vals_i, scores_i = inp  # [C, n_cand] each
                sl = lambda v: jax.lax.dynamic_slice_in_dim(v, i * C, C, 0)
                if C == 1:
                    P_out, maxes = I.ebp_backward_allevents(
                        graph, params, [sl(v) for v in values],
                        [sl(v) for v in posvals], elems_i[0],
                        vals_i[0].astype(x.dtype), subtree_mode=mode,
                        eps=eps, with_bias=wb, n_buckets=n_buckets,
                        cascade=casc)
                    merged, sel = _wsebp_select_merge(
                        P_out, maxes, scores_i[0], topk, do_max, eps)
                    return carry, (merged[None], sel[None])
                P_out, maxes = I.ebp_backward_allevents(
                    graph, params, [sl(v) for v in values],
                    [sl(v) for v in posvals], elems_i.T,
                    vals_i.T.astype(x.dtype), subtree_mode=mode, eps=eps,
                    with_bias=wb, n_buckets=n_buckets, cascade=casc)

                def one(Pb, mb, sb):
                    return _wsebp_select_merge(Pb[:, None], mb, sb, topk,
                                               do_max, eps)

                merged, sel = jax.vmap(one, in_axes=(1, 1, 0))(
                    P_out, maxes, scores_i)
                return carry, (merged, sel)

            nsteps = B // C
            _, (merged, sel) = jax.lax.scan(
                body, None,
                (jnp.arange(nsteps),
                 elems.reshape(nsteps, C, -1),
                 vals.reshape(nsteps, C, -1),
                 scores.reshape(nsteps, C, -1)),
                unroll=min(unroll, nsteps))
            return (merged.reshape(B, *merged.shape[2:]),
                    sel.reshape(B, *sel.shape[2:]))  # [B,H,W], [B,n_cand]

        return local

    def _wsebp_sweep_select_batch_fn(self, topk, do_max, n_buckets=12):
        """jitted: fused sweep+selection+merge for a whole probe BATCH as
        ONE probe-batched walk — no scan: every op carries a
        [rows, B, ...] batch.

        The scan path ran at 5.5 TFLOP/s / 112 GB/s (3% MXU, 14% HBM —
        tools/_wsebp_roofline.py): its per-probe steps issue 378 small
        ops x B whose fixed per-op cost dominates, while the same conv
        dgrads reach ~95 TFLOP/s at batch 32 in isolation
        (tools/_nhwc_microbench.py).  Folding the probe axis into the
        walk batch multiplies every op's work by B at the same op count.
        """
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        sweep_dt = self._wsebp_dtype

        casc = bool(self.wsebp_cascade)  # snapshot: key records this

        @jax.jit
        def fn(params, x, elems, vals, scores):
            # x [B,...]; elems/vals/scores [B, n_cand]
            params, x = self._prep(params, x, sweep_dt)
            values = I.forward_clean(graph, params, x)
            posvals = I.forward_positive(graph, params, values, with_bias=wb)
            P_out, maxes = I.ebp_backward_allevents(
                graph, params, values, posvals, elems.T,
                vals.T.astype(x.dtype), subtree_mode=mode, eps=eps,
                with_bias=wb, n_buckets=n_buckets,
                cascade=casc)

            def sel(Pb, mb, sb):
                return _wsebp_select_merge(Pb[:, None], mb, sb, topk,
                                           do_max, eps)

            return jax.vmap(sel, in_axes=(1, 1, 0))(P_out, maxes, scores)

        return self._kernel(("wsebp_sweep_select_batch", mode, wb,
                             n_buckets, int(topk), bool(do_max),
                             str(sweep_dt), casc),
                            lambda: fn)

    def _wsebp_sweep_select_shmap_fn(self, topk, do_max, n_buckets=12):
        """jitted: the scan-batched fused sweep with PROBES sharded over
        the mesh 'dp' axis via shard_map — the mesh analog of
        _wsebp_sweep_select_scan_fn.

        Each device runs the proven local recipe on its probe shard: one
        local-batch forward-capture pair + a lax.scan over local probes
        whose body is the bucketed candidate walk on [1]-slices of the
        local captures.  Probe sweeps are self-contained, so there are NO
        collectives — shard_map just pins the decomposition.  This keeps
        the single-chip scan-batching win under the mesh, unlike the
        rows-over-'dp' per-probe launches (which replicate every forward
        pair across devices and shard each sweep to n_cand/n_dev-row
        slivers).  Do not benchmark this on the virtual CPU mesh: the
        CPU backend executes shard_map partitions sequentially
        (tools/_mesh_wsebp_ab.py measures exactly n_dev x the one-probe
        sweep), which real chips do not."""
        mode, wb = self._ebp_subtree_mode, self._ebp_with_bias
        sweep_dt = self._wsebp_dtype
        casc = bool(self.wsebp_cascade)  # snapshot: key records this;
        # (probes-over-dp shards whole sweeps, so unlike the row-sharded
        # variants the per-device walk DOES cascade)

        # same sweep body as the single-device jit — any change to the
        # walk applies to both paths
        local = self._wsebp_scan_local(topk, do_max, n_buckets,
                                       chunk=1, unroll=1)

        def prepped(params, x, elems, vals, scores):
            params, x = self._prep(params, x, sweep_dt)
            return local(params, x, elems, vals, scores)

        # args: (params, x, elems, vals, scores) — all but params sharded
        return self._shmap_kernel(
            ("wsebp_sweep_select_shmap", mode, wb, n_buckets, int(topk),
             bool(do_max), str(sweep_dt), casc),
            prepped, sharded={1, 2, 3, 4}, n_out=2)

    def _wsebp_buckets(self, n_buckets=6):
        """Static partition of candidate events 0..n_events-2 into buckets
        by fire node, each with its truncation start_node (= max node in
        the bucket).  Cached per (graph, n_buckets)."""
        key = ("wsebp_buckets", n_buckets)
        if key in self._jit_cache:
            return self._jit_cache[key]
        graph = self.net.graph
        ev_node = graph.event_node
        cand = sorted(range(graph.n_events - 1), key=lambda e: ev_node[e])
        n_buckets = min(n_buckets, len(cand))
        size = -(-len(cand) // n_buckets)
        buckets = []
        for o in range(0, len(cand), size):
            grp = cand[o:o + size]
            buckets.append((max(ev_node[e] for e in grp), tuple(grp)))
        self._jit_cache[key] = tuple(buckets)
        return self._jit_cache[key]

    def _wsebp_merge_fn(self, do_max):
        """jitted: gather selected subtree maps, weight by normalized
        subtree scores, merge by sum/max — on device, so only the final
        map (and optionally the topk maps) transfer to host
        (reference merge: whitebox.py:718-725)."""

        @jax.jit
        def fn(P_img, sel, weights):
            maps = P_img[sel]  # [m,1,H,W]
            norm = maps * (1.0 / (maps.max(axis=(1, 2, 3),
                                           keepdims=True) + 1e-12))
            weighted = weights[:, None, None, None] * norm
            merged = (jnp.max(weighted, axis=0) if do_max
                      else jnp.sum(weighted, axis=0))
            return merged[0], maps

        return self._kernel(("wsebp_merge", bool(do_max)), lambda: fn)

    def _wsebp_grad_batch_fn(self):
        """jitted: per-probe subtree scores/argmaxes/injection values for a
        probe batch under the interleaved [2B, D] triplet classifier.

        The EBP/natural backward rules are all per-sample independent, so
        a [B, 2B] cotangent batch with each probe's rows selected yields
        exactly the per-probe single runs (same argument as the batched
        mean/contrastive paths, tests/test_batched_ebp.py) in one launch.
        """
        graph = self.net.graph
        mode, wb, eps = self._ebp_subtree_mode, self._ebp_with_bias, self.eps
        n_ev = graph.n_events

        @partial(jax.jit, static_argnames=("gating",))
        def fn(params, x, gating):
            B = x.shape[0]
            values = I.forward_clean(graph, params, x)
            y = values[graph.output_id]  # [B, 2B]
            posvals = I.forward_positive(graph, params, values, with_bias=wb)

            ii = jnp.arange(B)
            cot_m = jnp.zeros_like(y).at[ii, 2 * ii].set(1.0)
            cot_n = jnp.zeros_like(y).at[ii, 2 * ii + 1].set(1.0)
            if gating:
                cots = jnp.stack([cot_m, cot_n])
            else:
                # per-probe softmax over each probe's own two logits
                pair = jnp.stack([y[ii, 2 * ii], y[ii, 2 * ii + 1]], -1)
                sm = jax.nn.softmax(pair, axis=-1)
                cot_ce = (jnp.zeros_like(y)
                          .at[ii, 2 * ii].set(sm[:, 0] - 1.0)
                          .at[ii, 2 * ii + 1].set(sm[:, 1]))
                cots = jnp.stack([cot_ce, cot_n])
            dAs = jax.vmap(
                lambda c: I.natural_backward(graph, params, values, c))(cots)

            scores, idxs = [], []
            for k in range(n_ev - 1):
                a, b = dAs[k][0], dAs[k][1]
                gated = ((a >= 0) * (-b)) if gating else ((a < 0) * (-b))
                flat = gated.reshape(B, -1)
                scores.append(jnp.max(flat, axis=1))
                idxs.append(jnp.argmax(flat, axis=1))

            P_mate = I.ebp_backward(
                graph, params, values, posvals, cot_m, subtree_mode=mode,
                eps=eps, with_bias=wb, keep=tuple(range(n_ev - 1)))
            # extract each event's selected element as
            # sum(P * (iota == idx)): an elementwise compare+select+reduce
            # XLA fuses into the backward walk, vs ~n_ev tiny
            # take_along_axis ops whose per-op overhead dominates
            # (tools/_rank_pass_ab.py: 66.2 -> 43.4 ms for the P_mate
            # stage).  Bit-exact: the reduce sums one element and N-1
            # zeros.
            vals = []
            for k in range(n_ev - 1):
                flat = P_mate[k].reshape(B, -1)
                hit = (jnp.arange(flat.shape[1])[None, :]
                       == idxs[k][:, None])
                vals.append(jnp.sum(jnp.where(hit, flat, 0.0), axis=1))
            # [B, n_ev-1] each
            return (jnp.stack(scores, 1), jnp.stack(idxs, 1),
                    jnp.stack(vals, 1))

        return self._kernel(("wsebp_grad_batch", mode, wb,
                             str(self.compute_dtype)), lambda: fn)

    def launch_weighted_subtree_ebp_batch(self, x, topk=1, verbose=False,
                                          do_max_subtree=False,
                                          do_mated_similarity_gating=True,
                                          subtree_mode="norelu",
                                          do_mwp_to_saliency=True):
        """Enqueue the whole weighted-subtree batch and return a
        ``finish()`` closure yielding the result list.  The batched
        ranking pass runs first; its outputs feed the candidate sweeps as
        device slices (no host round trip between stages).  On a single
        device (mesh=None) the sweeps run as ONE scan-batched program
        sharing a batch-B forward-capture pair; in mesh mode they run as
        B per-probe programs with candidate rows sharded over 'dp'.

        The per-call device sync costs ~60 ms on a high-latency link;
        launching every program before draining any hides it behind the
        device queue (measured 1.04 s -> 0.57 s for the B=8 sweep stage).
        """
        x_pad, B = self._pad_probe_batch(x)
        prev_mode = self._ebp_subtree_mode
        self._ebp_subtree_mode = subtree_mode
        try:
            scores_d, idxs_d, vals_d = self._wsebp_grad_batch_fn()(
                self.net.params, x_pad,
                gating=bool(do_mated_similarity_gating))
            # sweep inputs are device-sliced ranking outputs: no host
            # round trip between the two stages
            idxs32 = idxs_d.astype(jnp.int32)
            if self.mesh is None:
                # single device: ONE scan-batched program sharing a
                # batch-B forward-capture pair across all probes' sweeps
                merged_d, sel_d = self._wsebp_sweep_select_scan_fn(
                    topk, bool(do_max_subtree))(
                    self.net.params, x_pad, idxs32, vals_d, scores_d)
            else:
                # mesh mode: probes sharded over 'dp', each device
                # running the scan-batched recipe on its local shard.
                # This keeps the single-chip scan-batching win under the
                # mesh; the round-2 per-probe rows-over-'dp' launches
                # replicate every forward pair across all devices (n_dev
                # x B redundant forwards) and shard each sweep into
                # n_cand/n_dev-row slivers.  NB the virtual-CPU mesh is
                # not evidence here: the CPU backend executes shard_map
                # partitions SEQUENTIALLY (tools/_mesh_wsebp_ab.py
                # measures exactly n_dev x one-probe-sweep wall time),
                # while real chips run them concurrently — see the A/B
                # notes in CLAUDE.md.
                merged_d, sel_d = self._wsebp_sweep_select_shmap_fn(
                    topk, bool(do_max_subtree))(
                    self.net.params, x_pad, idxs32, vals_d, scores_d)
        finally:
            self._ebp_subtree_mode = prev_mode

        def finish():
            prev = self._ebp_subtree_mode
            self._ebp_subtree_mode = subtree_mode
            try:
                scores = np.asarray(scores_d, np.float32)
                merged = np.asarray(merged_d, np.float32)
                sel = np.asarray(sel_d)
                return [self._wsebp_fused_finish(
                            merged[i], sel[i], scores[i], verbose,
                            do_mwp_to_saliency)
                        for i in range(B)]
            finally:
                self._ebp_subtree_mode = prev

        return finish

    def weighted_subtree_ebp_batch(self, x, topk=1, verbose=False,
                                   do_max_subtree=False,
                                   do_mated_similarity_gating=True,
                                   subtree_mode="norelu",
                                   do_mwp_to_saliency=True,
                                   return_subtree_maps=False):
        """Weighted-subtree EBP for a probe batch under the interleaved
        batch triplet classifier (set_triplet_classifier_batch): the
        subtree-ranking gradient pass runs once for the whole batch; the
        per-probe candidate sweeps and merges follow.  Per-probe results
        match weighted_subtree_ebp with that probe's 2-class classifier.

        Returns a list of (smap, P_img_valid, P_subtree_valid,
        k_subtree_valid) tuples."""
        if not return_subtree_maps:
            return self.launch_weighted_subtree_ebp_batch(
                x, topk=topk, verbose=verbose,
                do_max_subtree=do_max_subtree,
                do_mated_similarity_gating=do_mated_similarity_gating,
                subtree_mode=subtree_mode,
                do_mwp_to_saliency=do_mwp_to_saliency)()
        x_pad, B = self._pad_probe_batch(x)
        x = jnp.asarray(x, jnp.float32)
        prev_mode = self._ebp_subtree_mode
        self._ebp_subtree_mode = subtree_mode
        try:
            scores_d, idxs_d, vals_d = self._wsebp_grad_batch_fn()(
                self.net.params, x_pad,
                gating=bool(do_mated_similarity_gating))
            scores = np.asarray(scores_d, np.float32)
            idxs = np.asarray(idxs_d)
            vals = np.asarray(vals_d, np.float32)
            return [self._wsebp_post(
                        x[i:i + 1], scores[i], idxs[i], vals[i], topk,
                        verbose, do_max_subtree, do_mwp_to_saliency,
                        None, return_subtree_maps)
                    for i in range(B)]
        finally:
            self._ebp_subtree_mode = prev_mode

    def _weighted_subtree_ebp(self, img_probe, k_poschannel, k_negchannel,
                              topk, verbose, do_max_subtree,
                              do_mated_similarity_gating, do_mwp_to_saliency,
                              max_candidates, return_subtree_maps=True):
        x = self._as_input(img_probe)
        Pn_pos = self._onehot(k_poschannel)

        scores, idxs, vals = self._wsebp_grad_fn()(
            self.net.params, x, Pn_pos, gating=bool(do_mated_similarity_gating))
        return self._wsebp_post(
            x, np.asarray(scores, np.float32), np.asarray(idxs),
            np.asarray(vals, np.float32), topk, verbose, do_max_subtree,
            do_mwp_to_saliency, max_candidates, return_subtree_maps)

    def _wsebp_fused_launch(self, x, elems, vals, scores, topk,
                            do_max_subtree):
        """Enqueue one probe's fused sweep+select+merge program; returns
        device handles WITHOUT syncing, so callers can batch launches and
        hide the per-call device-link round trip."""
        return self._wsebp_sweep_select_fn(topk, bool(do_max_subtree))(
            self.net.params, x, elems, vals, scores)

    def _wsebp_fused_finish(self, smap_dev, sel_dev, P_subtree, verbose,
                            do_mwp_to_saliency):
        """Host side of the fused weighted-subtree path: fetch the merged
        map + selection mask, reconstruct the reference's valid-subtree
        bookkeeping (whitebox.py:706-725), normalize."""
        smap = np.asarray(smap_dev, np.float32)
        sel = np.asarray(sel_dev)
        k_order = np.argsort(P_subtree, kind="stable")
        if verbose:
            for k in k_order:
                print("[weighted_subtree_ebp][%d]: layername=%s, "
                      "grad=%f" % (k, self.P_layername[k], P_subtree[k]))
        k_subtree_valid = [int(k) for k in k_order if sel[k]]
        if len(k_subtree_valid) == 0:
            raise RuntimeError(
                "Failed to calculate valid subtrees. The ebp subtree "
                "mode (%s) may not be supported by this type of "
                "network. You may want to try the "
                '"affineonly_with_prior" ebp subtree mode.'
                % self._ebp_subtree_mode)
        P_subtree_valid = [float(P_subtree[k]) for k in k_subtree_valid]
        if self.convert_saliency_uint8:
            smap = self._float32_to_uint8(smap)
        else:
            smap = smap / max(smap.sum(), self.eps)
        return (
            self._mwp_to_saliency(smap) if do_mwp_to_saliency else smap,
            [], P_subtree_valid, k_subtree_valid)

    def _wsebp_post(self, x, P_subtree, P_subtree_idx, inj_vals, topk,
                    verbose, do_max_subtree, do_mwp_to_saliency,
                    max_candidates, return_subtree_maps):
        n_ev = self._n_events

        if max_candidates is None and not return_subtree_maps:
            # fused sweep+selection+merge: one device sync per probe
            smap_dev, sel_dev = self._wsebp_fused_launch(
                x, jnp.asarray(P_subtree_idx.astype(np.int32)),
                jnp.asarray(inj_vals), jnp.asarray(P_subtree), topk,
                do_max_subtree)
            return self._wsebp_fused_finish(
                smap_dev, sel_dev, P_subtree, verbose, do_mwp_to_saliency)

        # Candidate order: ascending score, like the reference's argsort
        # (whitebox.py:697); it then keeps the last topk valid entries.
        k_order = np.argsort(P_subtree, kind="stable")
        if max_candidates is not None:
            # dynamic candidate subset -> traced-injection vmapped sweep
            k_order = k_order[-int(max_candidates):]
            P_img_dev, maxes = self._wsebp_inject_fn()(
                self.net.params, x,
                jnp.asarray(k_order.astype(np.int32)),
                jnp.asarray(P_subtree_idx[k_order].astype(np.int32)),
                jnp.asarray(inj_vals[k_order]))
            lookup = {int(e): i for i, e in enumerate(k_order)}
        else:
            # full sweep in static event order: one batched bucketed walk
            P_img_dev, maxes = self._wsebp_sweep_fn()(
                self.net.params, x,
                jnp.asarray(P_subtree_idx.astype(np.int32)),
                jnp.asarray(inj_vals))
            lookup = None
        maxes = np.asarray(maxes)  # [cand]; maps stay on device

        def fetch(events):
            if lookup is None:
                return P_img_dev[jnp.asarray(
                    np.asarray([int(e) for e in events], np.int32))]
            return P_img_dev[jnp.asarray(
                np.asarray([lookup[int(e)] for e in events], np.int32))]

        if verbose:
            for k in k_order:
                print("[weighted_subtree_ebp][%d]: layername=%s, grad=%f"
                      % (k, self.P_layername[k], P_subtree[k]))

        # Valid-subtree selection (reference: whitebox.py:706-717).
        # k==1 excluded: the Multiply() layer event on STR-Janus.
        # ``maxes`` indexing: event order for the full sweep, k_order
        # position for the max_candidates path.
        if lookup is None:
            max_of_event = maxes
        else:
            max_of_event = np.zeros(n_ev - 1, maxes.dtype)
            max_of_event[k_order] = maxes
        k_subtree_valid = [int(k) for k in k_order
                           if max_of_event[k] > 0 and k != 1][-topk:]
        if len(k_subtree_valid) == 0:
            raise RuntimeError(
                "Failed to calculate valid subtrees. The ebp subtree mode "
                "(%s) may not be supported by this type of network. You may "
                'want to try the "affineonly_with_prior" ebp subtree mode.'
                % self._ebp_subtree_mode)
        P_subtree_valid = [float(P_subtree[k]) for k in k_subtree_valid]
        norm = self._scale_normalized(P_subtree_valid)
        if np.sum(norm) == 0:
            norm = np.ones_like(P_subtree_valid)

        sel_maps = fetch(k_subtree_valid)
        smap_dev, maps_dev = self._wsebp_merge_fn(bool(do_max_subtree))(
            sel_maps, jnp.arange(len(k_subtree_valid)),
            jnp.asarray(np.asarray(norm, np.float32)))
        smap = np.asarray(smap_dev, np.float32)
        if return_subtree_maps:
            P_img_valid = [np.squeeze(p).astype(np.float32)
                           for p in np.asarray(maps_dev)]
        else:
            P_img_valid = []

        if self.convert_saliency_uint8:
            smap = self._float32_to_uint8(smap)
        else:
            smap = smap / max(smap.sum(), self.eps)

        return (
            self._mwp_to_saliency(smap) if do_mwp_to_saliency else smap,
            [self._mwp_to_saliency(P) if do_mwp_to_saliency else P
             for P in P_img_valid],
            P_subtree_valid,
            k_subtree_valid)

    # ------------------------------------------------------------------
    # Embeddings (reference: whitebox.py:742-806)
    # ------------------------------------------------------------------

    def encode(self, x):
        """Embedding forward for a [N,C,H,W] input batch."""
        graph = self.net.graph

        @jax.jit
        def fn(params, x):
            values = I.forward_clean(graph, params, x)
            return values[self.net.encode_tensor]

        fn = self._kernel(("encode",), lambda: fn, precision=None)
        x = self._as_input(x)
        if self.mesh is not None and x.shape[0] % self._dp == 0:
            x = self._shard_rows(x)
        return fn(self.net.params, x)

    def embeddings(self, images, norm=True):
        """Batched embeddings from preprocessed tensors or raw numpy images
        (reference: whitebox.py:747-785).  Pads the trailing batch so every
        launch reuses one compiled shape."""
        import pandas as pd

        if isinstance(images, (np.ndarray, jnp.ndarray)) and \
                getattr(images, "ndim", 0) == 4 and images.shape[1] in (1, 3):
            imagesT = jnp.asarray(images, jnp.float32)
        elif isinstance(images, pd.DataFrame):
            from xfr_tpu.utils.image import dataframe_image_loader
            imagesT = jnp.stack([
                self.convert_from_numpy(im)[0]
                for im in dataframe_image_loader(images)])
        elif len(images) and isinstance(images[0], (np.ndarray, jnp.ndarray)) \
                and images[0].ndim == 3 and images[0].shape[0] in (1, 3):
            # already in network format (reference: whitebox.py:755-762)
            imagesT = jnp.stack([jnp.asarray(im, jnp.float32)
                                 for im in images])
        else:
            # file paths / displayable images -> loader + preprocess
            from xfr_tpu.utils.image import image_loader
            imagesT = jnp.stack([
                self.convert_from_numpy(im)[0]
                for im in image_loader(list(images))])

        n = imagesT.shape[0]
        bs = self.batch_size
        pad = (-n) % bs
        if pad:
            imagesT = jnp.concatenate(
                [imagesT, jnp.zeros((pad,) + imagesT.shape[1:],
                                    imagesT.dtype)])
        # keep chunk outputs on device (async dispatch pipelines the
        # chunks); one sync + transfer at the end instead of one per chunk
        embeds = [self.encode(imagesT[i:i + bs])
                  for i in range(0, n + pad, bs)]
        embeds = np.asarray(jnp.concatenate(embeds))[:n]

        if norm:
            flat = embeds.reshape(embeds.shape[0], -1)
            embeds = (flat / np.linalg.norm(flat, axis=1, keepdims=True)
                      ).reshape(embeds.shape)
        return embeds

    def _blend_encode_fn(self):
        """jitted: unpack bit-packed threshold masks, blend probe->twin on
        device, encode — the inpainting-game eval hot loop
        (reference: inpainting_game.py:105-134) without shipping T blended
        images over the device link."""
        graph, enc = self.net.graph, self.net.encode_tensor

        @jax.jit
        def fn(params, orig, inp, bits):
            # bits: [n, ceil(H*W/8)] uint8, np.packbits bit order (MSB
            # first)
            H, W = orig.shape[-2], orig.shape[-1]
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
            m = (bits[:, :, None] >> shifts) & jnp.uint8(1)
            m = m.reshape(bits.shape[0], -1)[:, :H * W]
            m = m.astype(orig.dtype).reshape(bits.shape[0], 1, H, W)
            blends = (1.0 - m) * orig[None] + m * inp[None]
            e = I.forward_clean(graph, params, blends)[enc]
            return e.reshape(e.shape[0], -1)

        return self._kernel(("blend_encode",), lambda: fn, precision=None)

    def _blend_encode_mono_local(self, T, bs):
        """The scan body shared by the single-device mono blend+encode jit
        and its shard_map per-device shard: scan over a sequence of
        chunk-start rows ``t0s``, each step blending+encoding a [bs,...]
        batch from the enter-count plane.  Row chunks are independent, so
        sharding ``t0s`` over 'dp' decomposes the family with zero
        collectives — the mesh analog of the wsebp probes-over-dp
        shard_map (same step program as single-chip, so per-row
        embeddings are identical)."""
        graph, enc = self.net.graph, self.net.encode_tensor

        def local(params, orig, inp, counts, t0s):
            H, W = orig.shape[-2], orig.shape[-1]
            c = counts.astype(jnp.int32)[None, :]  # [1, H*W]

            def body(carry, t0):
                t = t0 + jnp.arange(bs, dtype=jnp.int32)[:, None]
                m = ((t < T) & (c >= T - t)).astype(orig.dtype)
                blends = ((1.0 - m.reshape(bs, 1, H, W)) * orig[None] +
                          m.reshape(bs, 1, H, W) * inp[None])
                e = I.forward_clean(graph, params, blends)[enc]
                return carry, e.reshape(bs, -1)

            _, es = jax.lax.scan(body, 0, t0s)
            return es.reshape(t0s.shape[0] * bs, -1)

        return local

    def _blend_encode_mono_fn(self, T, bs):
        """jitted: a MONOTONE threshold-mask family [T,H,W] represented as
        one per-pixel enter-count plane (counts[p] = number of masks
        containing p; by monotonicity pixel p is in masks T-counts[p]..T-1),
        blended+encoded in bs-row chunks under ONE lax.scan program.

        vs the bit-packed path this uploads ~50 KB instead of ~633 KB for
        the standard 101-threshold sweep and costs one dispatch instead of
        ceil(T/bs) (measured: uploads were 2/3 of the eval unit)."""
        nchunk = -(-T // bs)
        local = self._blend_encode_mono_local(T, bs)

        @jax.jit
        def fn(params, orig, inp, counts):
            t0s = jnp.arange(0, nchunk * bs, bs, dtype=jnp.int32)
            return local(params, orig, inp, counts, t0s)[:T]

        return self._kernel(("blend_encode_mono", T, bs), lambda: fn,
                            precision=None)

    def _blend_encode_mono_shmap_fn(self, T, bs):
        """Mesh form of :meth:`_blend_encode_mono_fn`: the chunk-start
        sequence ``t0s`` (padded to a 'dp' multiple; rows past T encode
        the pure original and are discarded) is sharded over 'dp', each
        device running the identical local scan on its chunk range.  No
        collectives — chunks are independent; outputs concatenate in
        global row order."""
        # args: (params, orig, inp, counts, t0s) — t0s sharded
        return self._shmap_kernel(
            ("blend_encode_mono_shmap", T, bs),
            self._blend_encode_mono_local(T, bs), sharded={4},
            precision=None)

    def _blend_encode_mono_multi_fn(self, M, T, bs):
        """Multi-map variant of :meth:`_blend_encode_mono_fn`: M monotone
        threshold-mask families over the SAME probe/twin pair (the
        inpainting-game analysis evaluates every saliency method of a
        probe against one image pair — analysis.py per-probe method loop;
        reference plot_inpainting_game.py:1125-1161) blended+encoded under
        ONE lax.scan program of M*ceil(T/bs) steps.

        Each step's [bs,3,H,W] blend+encode batch is identical to the
        single-map program's, so per-map results match the single path;
        batching maps amortizes the per-program dispatch/pipeline-startup
        cost that dominates a lone ~100-row unit on the remote device
        link."""
        nchunk = -(-T // bs)
        local = self._blend_encode_mono_multi_local(T, bs)

        @jax.jit
        def fn(params, orig, inp, counts):
            ms = jnp.repeat(jnp.arange(M, dtype=jnp.int32), nchunk)
            t0s = jnp.tile(jnp.arange(0, nchunk * bs, bs, dtype=jnp.int32),
                           M)
            return local(params, orig, inp, counts, ms,
                         t0s).reshape(M, nchunk * bs, -1)[:, :T]

        return self._kernel(("blend_encode_mono_multi", M, T, bs),
                            lambda: fn, precision=None)

    def _blend_encode_mono_multi_local(self, T, bs):
        """Scan body shared by the single-device multi-map blend+encode
        jit and its shard_map shard: the (map index, chunk start) step
        sequence is an input, so the mesh path can shard the flat step
        list over 'dp' (steps are independent; per-step batches identical
        to the single program's)."""
        graph, enc = self.net.graph, self.net.encode_tensor

        def local(params, orig, inp, counts, ms, t0s):
            H, W = orig.shape[-2], orig.shape[-1]
            c_all = counts.astype(jnp.int32)  # [M, H*W]

            def body(carry, mt):
                m, t0 = mt
                c = jax.lax.dynamic_index_in_dim(c_all, m, axis=0)  # [1,HW]
                t = t0 + jnp.arange(bs, dtype=jnp.int32)[:, None]
                mk = ((t < T) & (c >= T - t)).astype(orig.dtype)
                blends = ((1.0 - mk.reshape(bs, 1, H, W)) * orig[None] +
                          mk.reshape(bs, 1, H, W) * inp[None])
                e = I.forward_clean(graph, params, blends)[enc]
                return carry, e.reshape(bs, -1)

            _, es = jax.lax.scan(body, 0, (ms, t0s))
            return es.reshape(ms.shape[0] * bs, -1)

        return local

    def _blend_encode_mono_multi_shmap_fn(self, T, bs):
        """Mesh form of :meth:`_blend_encode_mono_multi_fn`: the flat
        (map, chunk) step sequence — padded with discarded t0>=T steps to
        a 'dp' multiple — is sharded over 'dp'; each device scans its
        step range with the identical body.  Outputs concatenate in
        global step order, so the caller's [M, nchunk*bs] reshape sees
        the same layout as the single program."""
        # args: (params, orig, inp, counts, ms, t0s) — ms/t0s sharded
        return self._shmap_kernel(
            ("blend_encode_mono_multi_shmap", T, bs),
            self._blend_encode_mono_multi_local(T, bs), sharded={4, 5},
            precision=None)

    def _blend_encode_mono_multi_pair_fn(self, M, P, T, bs):
        """Cross-probe variant of :meth:`_blend_encode_mono_multi_fn`:
        the M monotone mask families may reference DIFFERENT probe/twin
        image pairs (``pair_idx[m]`` selects from [P,C,H,W] stacks).  The
        analysis stage uses this to run several probes' method maps under
        ONE scanned program, amortizing the per-probe dispatch+drain that
        remains after per-probe method batching.

        Each scan step slices its pair out of the stacks (one ~600 KB
        dynamic slice — cheap next to the [bs,C,H,W] encode) and is
        otherwise identical to the single-pair program's step, so per-map
        embeddings match the single-pair path bit-for-bit."""
        graph, enc = self.net.graph, self.net.encode_tensor
        nchunk = -(-T // bs)

        @jax.jit
        def fn(params, origs, inps, counts, pair_idx):
            H, W = origs.shape[-2], origs.shape[-1]
            c_all = counts.astype(jnp.int32)  # [M, H*W]

            def body(carry, mtp):
                m, t0, p = mtp
                c = jax.lax.dynamic_index_in_dim(c_all, m, axis=0)  # [1,HW]
                orig = jax.lax.dynamic_index_in_dim(origs, p, axis=0,
                                                    keepdims=False)
                inp = jax.lax.dynamic_index_in_dim(inps, p, axis=0,
                                                   keepdims=False)
                t = t0 + jnp.arange(bs, dtype=jnp.int32)[:, None]
                mk = ((t < T) & (c >= T - t)).astype(orig.dtype)
                blends = ((1.0 - mk.reshape(bs, 1, H, W)) * orig[None] +
                          mk.reshape(bs, 1, H, W) * inp[None])
                e = I.forward_clean(graph, params, blends)[enc]
                return carry, e.reshape(bs, -1)

            ms = jnp.repeat(jnp.arange(M, dtype=jnp.int32), nchunk)
            t0s = jnp.tile(jnp.arange(0, nchunk * bs, bs, dtype=jnp.int32),
                           M)
            ps = jnp.repeat(pair_idx.astype(jnp.int32), nchunk)
            _, es = jax.lax.scan(body, 0, (ms, t0s, ps))
            return es.reshape(M, nchunk * bs, -1)[:, :T]

        return self._kernel(("blend_encode_mono_multi_pair", M, P, T, bs),
                            lambda: fn, precision=None)

    def launch_blend_embeddings_counts_multi_pair(
            self, orig_imTs, inpaint_imTs, counts_mat, pair_idx, T,
            norm=True):
        """Batch M monotone mask families spanning P probe/twin image
        pairs into a single scanned blend+encode program.  ``orig_imTs``
        / ``inpaint_imTs``: length-P sequences of [C,H,W] images;
        ``counts_mat``: [M, H*W] uint8 enter-count planes; ``pair_idx``:
        [M] indices into the pair stacks.  ``finish()`` returns [M, T, D]
        embeddings."""
        counts_mat = np.ascontiguousarray(counts_mat, np.uint8)
        pair_idx = np.ascontiguousarray(pair_idx, np.int32)
        assert self.mesh is None and T <= 255 and counts_mat.ndim == 2
        M = counts_mat.shape[0]
        P = len(orig_imTs)
        assert len(inpaint_imTs) == P and pair_idx.shape == (M,)
        bs = self.batch_size
        origs = jnp.stack([self._device_put_memo(
            np.asarray(o, np.float32)) for o in orig_imTs])
        inps = jnp.stack([self._device_put_memo(
            np.asarray(i, np.float32)) for i in inpaint_imTs])
        bs_m = min(self.blend_batch, -(-T // bs) * bs)
        fn = self._blend_encode_mono_multi_pair_fn(M, P, T, bs_m)
        out = fn(self.net.params, origs, inps, jnp.asarray(counts_mat),
                 jnp.asarray(pair_idx))

        def finish():
            embeds = np.asarray(out)
            if norm:
                embeds = embeds / np.linalg.norm(embeds, axis=2,
                                                 keepdims=True)
            return embeds

        return finish

    def _device_put_memo(self, arr):
        """Upload a host array once per content: a small content-hash memo
        returns the live device buffer for repeated uploads (content key
        ~0.3 ms for a 600 KB image vs ~40 ms on the link)."""
        from xfr_tpu.utils.cache import content_key, memo_put
        key = content_key(arr)
        dev = self._upload_memo.get(key)
        if dev is None:
            dev = memo_put(self._upload_memo, key, jnp.asarray(arr))
        return dev

    def launch_blend_embeddings(self, orig_imT, inpaint_imT, masks,
                                norm=True):
        """Enqueue threshold-mask blend + encode on device; returns a
        zero-argument ``finish()`` that syncs and returns the [T,D]
        embeddings — callers overlap host work (IoU curves, the next
        unit's mask build) with the device encode.

        ``masks``: [T,H,W] boolean.  Monotone families (threshold masks
        by construction: lower threshold ⊇ higher) upload as a single
        [H*W] uint8 enter-count plane and run as ONE scanned program;
        general families fall back to bit-packed per-chunk programs.
        Either way this replaces the reference's per-probe hot loop of T
        host float64 blends + a ~60 MB upload
        (inpainting_game.py:105-134).

        Binary-mask blending is a per-pixel SELECT, so float32 device
        blends equal the reference's float64 host blends cast to float32
        bit-for-bit (each output pixel is exactly orig or inp)."""
        masks = np.asarray(masks)
        assert masks.dtype == bool and masks.ndim == 3, (
            "blend_embeddings needs [T,H,W] boolean masks")
        T = masks.shape[0]
        bs = self.batch_size

        mono = (T <= 255
                and bool(np.all(masks[1:] >= masks[:-1])))
        if mono:
            counts = masks.sum(axis=0, dtype=np.uint8).reshape(-1)
            return self.launch_blend_embeddings_counts(
                orig_imT, inpaint_imT, counts, T, norm=norm)
        else:
            orig = self._device_put_memo(np.asarray(orig_imT, np.float32))
            inp = self._device_put_memo(np.asarray(inpaint_imT, np.float32))
            bits = np.packbits(masks.reshape(T, -1), axis=1)
            pad = (-T) % bs
            if pad:  # padded rows: all-zero mask -> blend == orig,
                # discarded below
                bits = np.concatenate(
                    [bits, np.zeros((pad, bits.shape[1]), np.uint8)])
            fn = self._blend_encode_fn()
            bits_j = jnp.asarray(bits)
            chunks = []
            for i in range(0, T + pad, bs):
                b = bits_j[i:i + bs]
                if self.mesh is not None and bs % self._dp == 0:
                    b = self._shard_rows(b)
                chunks.append(fn(self.net.params, orig, inp, b))
            out = jnp.concatenate(chunks)[:T]

        def finish():
            embeds = np.asarray(out)
            if norm:
                return embeds / np.linalg.norm(embeds, axis=1,
                                               keepdims=True)
            return embeds

        return finish

    def launch_blend_embeddings_counts(self, orig_imT, inpaint_imT,
                                       counts, T, norm=True):
        """Monotone-family fast path of :meth:`launch_blend_embeddings`
        taking the [H*W] uint8 enter-count plane directly (counts[p] =
        number of masks containing pixel p; mask t contains p iff
        counts[p] >= T - t).  Callers that derive masks from a threshold
        plane (inpainting-game eval) compute counts with one searchsorted
        instead of materializing the [T,H,W] family.

        Under a mesh the row chunks shard over 'dp' (shard_map; identical
        per-chunk program, so embeddings match the single-chip path)."""
        assert T <= 255
        counts = np.ascontiguousarray(counts, np.uint8).reshape(-1)
        bs = self.batch_size
        orig = self._device_put_memo(np.asarray(orig_imT, np.float32))
        inp = self._device_put_memo(np.asarray(inpaint_imT, np.float32))
        bs_m = min(self.blend_batch, -(-T // bs) * bs)
        if self.mesh is None:
            fn = self._blend_encode_mono_fn(T, bs_m)
            out = fn(self.net.params, orig, inp, jnp.asarray(counts))
        else:
            nchunk = -(-T // bs_m)
            nchunk = -(-nchunk // self._dp) * self._dp  # pad to dp multiple
            t0s = np.arange(0, nchunk * bs_m, bs_m, dtype=np.int32)
            fn = self._blend_encode_mono_shmap_fn(T, bs_m)
            out = fn(self.net.params, orig, inp, jnp.asarray(counts),
                     self._shard_rows(t0s))[:T]

        def finish():
            embeds = np.asarray(out)
            if norm:
                return embeds / np.linalg.norm(embeds, axis=1,
                                               keepdims=True)
            return embeds

        return finish

    def launch_blend_embeddings_counts_multi(self, orig_imT, inpaint_imT,
                                             counts_mat, T, norm=True):
        """Batch M monotone mask families over one probe/twin pair into a
        single scanned blend+encode program (``counts_mat``: [M, H*W]
        uint8 enter-count planes).  ``finish()`` returns [M, T, D]
        embeddings.  The inpainting-game analysis uses this to evaluate
        all of a probe's saliency methods in one device program.

        Under a mesh the flat (map, chunk) step sequence shards over
        'dp' (shard_map; identical per-step program, so embeddings match
        the single-chip path)."""
        counts_mat = np.ascontiguousarray(counts_mat, np.uint8)
        assert T <= 255 and counts_mat.ndim == 2
        M = counts_mat.shape[0]
        bs = self.batch_size
        orig = self._device_put_memo(np.asarray(orig_imT, np.float32))
        inp = self._device_put_memo(np.asarray(inpaint_imT, np.float32))
        bs_m = min(self.blend_batch, -(-T // bs) * bs)
        if self.mesh is None:
            fn = self._blend_encode_mono_multi_fn(M, T, bs_m)
            out = fn(self.net.params, orig, inp, jnp.asarray(counts_mat))
        else:
            nchunk = -(-T // bs_m)
            steps = M * nchunk
            pad = (-steps) % self._dp  # discarded t0>=T steps
            ms = np.concatenate([
                np.repeat(np.arange(M, dtype=np.int32), nchunk),
                np.zeros(pad, np.int32)])
            t0s = np.concatenate([
                np.tile(np.arange(0, nchunk * bs_m, bs_m, dtype=np.int32),
                        M),
                np.full(pad, nchunk * bs_m, np.int32)])
            fn = self._blend_encode_mono_multi_shmap_fn(T, bs_m)
            out = fn(self.net.params, orig, inp, jnp.asarray(counts_mat),
                     self._shard_rows(ms), self._shard_rows(t0s))
            out = out[:steps * bs_m].reshape(M, nchunk * bs_m, -1)[:, :T]

        def finish():
            embeds = np.asarray(out)
            if norm:
                embeds = embeds / np.linalg.norm(embeds, axis=2,
                                                 keepdims=True)
            return embeds

        return finish

    def blend_embeddings(self, orig_imT, inpaint_imT, masks, norm=True):
        """Threshold-mask blend + encode entirely on device (synchronous
        form of :meth:`launch_blend_embeddings`)."""
        return self.launch_blend_embeddings(orig_imT, inpaint_imT, masks,
                                            norm=norm)()

    def convert_from_numpy(self, img):
        """Float/uint8 RGB HWC image -> [1,C,H,W] net input
        (reference: whitebox.py:787-806)."""
        from xfr_tpu.utils.image import resize as _resize
        img = np.asarray(img)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255
        if img.max() > 1 + 1e-6 and img.min() > 0 - 1e-6:
            img = img / 255
        img = _resize(img, (224, 224))
        img = (img * 255).astype(np.uint8)
        return self.net.preprocess(img)

    def preprocess_loader(self, images, returnImageIndex=False, repeats=1):
        """Iterate (displayable image, tensor, filename)
        (reference: whitebox.py:808-824)."""
        from xfr_tpu.utils.image import image_loader
        for im, fn in image_loader(images, returnFileName=True,
                                   returnImageIndex=returnImageIndex,
                                   repeats=repeats):
            imT = self.convert_from_numpy(im)
            yield im, imT[0], fn
