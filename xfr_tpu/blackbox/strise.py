"""STRise: prior-guided sparse-mask blackbox saliency
(reference: python/xfr/models/blackbox.py:110-479).

TPU-native pipeline: mask sampling, upsampling/shifting, filling, blending,
embedding and triplet scoring all run on device; only user-supplied
``black_box_fn`` callables (score-only external matchers, e.g. PittPatt via
subprocess, blackbox.py:83-107) pull masked probes back to host.

For the built-in resnet black boxes, the reference embeds all masked probes
twice (once vs refs, once vs gallery, blackbox.py:396-414); here masked
probes are embedded once and scored against both galleries in the same
jitted chunk, halving the dominant cost.
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

from xfr_tpu.blackbox import masks as M
from xfr_tpu.utils.image import center_crop


def print_flush(s, file=sys.stdout, flush=True):
    file.write(s + "\n")
    if flush:
        file.flush()


class STRise:
    """Blackbox saliency via sparse prior-guided mask perturbation.

    Constructor surface mirrors the reference (blackbox.py:110-262);
    ``use_gpu``/``device`` are accepted and ignored (JAX owns placement).
    Extra knobs: ``seed`` (JAX PRNG key; the reference uses the global numpy
    RNG), ``batch_size`` (embedding chunk), ``net_dict`` (share Whitebox
    instances across calls like utils.create_net's cache).
    """

    def __init__(self,
                 probe=None,
                 refs=None,
                 ref_sids=None,
                 potential_gallery=None,
                 gallery=None,
                 gallery_size=50,
                 black_box=None,
                 black_box_fn=None,
                 prior_type="mean_ebp",
                 mask_type="sparse",
                 num_mask_elements=1,
                 num_masks=6500,
                 mask_scale=12,
                 mask_fill_type="blur",
                 blur_fill_sigma_percent=4,
                 triplet_score_type="cts",
                 use_gpu=True,
                 device=None,
                 seed=0,
                 batch_size=64,
                 net_dict=None,
                 use_pallas_blend=False,
                 mesh=None,
                 score_precision=None):
        self.priors = {"mean_ebp": self.mean_ebp_prior,
                       "uniform": self.uniform_prior}
        self.black_boxes = {"resnetv4_pytorch": self.resnet_bb_fn,
                            "resnetv6_pytorch": self.resnet_bb_fn}
        self.mask_types = {"sparse": self.generate_sparse_masks}
        self.mask_fill_types = {"gray": self.mask_fill_gray,
                                "blur": self.mask_fill_blur}
        self.triplet_scoring_fns = {
            "cts": self.contrastive_triplet_similarity}

        self.blur_fill_sigma_percent = blur_fill_sigma_percent
        self._net_dict = net_dict if net_dict is not None else {}
        self.mean_ebp_net = None
        self.resnet_net = None
        self._key = jax.random.PRNGKey(seed)
        self.batch_size = batch_size
        # Optional jax.sharding.Mesh: the mask-scoring chunks shard over
        # the 'dp' axis so one process drives a whole slice (SURVEY.md
        # §2.8 — the TPU replacement for the reference's per-GPU process
        # pool).  Scoring is per-mask independent: zero collectives.
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape["dp"]
            self.batch_size = -(-self.batch_size // dp) * dp
        # Pallas fused upsample+shift+blend+preprocess: skips materializing
        # the [N,H,W] float mask tensor in HBM (xfr_tpu/blackbox/pallas_blend)
        self.use_pallas_blend = use_pallas_blend
        # Matmul precision of the mask-scoring encode.  None = the TPU
        # default single-pass-bf16 matmuls (fastest; ~3e-4 score noise).
        # On workloads where the mask-score SPREAD is comparable to that
        # noise the selection of positively-scored masks becomes noise-
        # driven: measured on the random-weight bench workload, both the
        # chunked and scanned default-precision scorers produce maps at
        # only 0.74 correlation with an f32 ('highest') reference, while
        # 'high' (bf16_3x) reaches 0.999 rank overlap at ~2.2x the scan
        # cost.  Real checkpoints have far larger spreads; pass
        # score_precision='high' for reference-grade f32 ranking when it
        # matters.
        self.score_precision = score_precision

        # probe / refs (blackbox.py:163-176)
        if probe is not None and refs is not None:
            if isinstance(probe, (str, np.ndarray)):
                self.probe = center_crop(probe, convert_uint8=True)
            else:
                raise ValueError(
                    "Probe must be a filepath to an image or a NumPy array")
            if isinstance(refs, (list, np.ndarray)) or _is_dataframe(refs):
                self.refs = refs
            else:
                raise ValueError("Refs must be a list of filepaths, NumPy "
                                 "arrays, or a Pandas dataframe")
            self.ref_sids = ref_sids
        else:
            raise ValueError("Probe and reference must be specified")

        if prior_type is None or prior_type not in self.priors:
            raise ValueError(
                'Specified prior "{}" is not supported'.format(prior_type))
        self.prior_type = prior_type

        self.potential_gallery = potential_gallery
        if potential_gallery is not None:
            self.potential_gallery_size = _collection_size(potential_gallery)

        self.gallery = gallery
        self.gallery_size = (_collection_size(gallery)
                             if gallery is not None else gallery_size)

        if black_box:
            self.set_black_box(black_box)
        elif black_box_fn:
            self.black_box = None
            self.black_box_fn = black_box_fn
        else:
            raise ValueError("Black box name or function must be specified")

        if mask_type not in self.mask_types:
            raise ValueError(
                'Specified mask type "{}" is not supported'.format(mask_type))
        self.mask_type = mask_type
        self.generate_masks = self.mask_types[mask_type]

        if mask_fill_type not in self.mask_fill_types:
            raise ValueError('Specified mask fill type "{}" is not '
                             "supported".format(mask_fill_type))
        self.mask_fill_type = mask_fill_type
        self.apply_masks = self.mask_fill_types[mask_fill_type]

        self.num_mask_elements = num_mask_elements
        self.num_masks = num_masks
        self.mask_scale = mask_scale

        if triplet_score_type not in self.triplet_scoring_fns:
            raise ValueError('Specified triplet score type "{}" is not '
                             "supported.".format(triplet_score_type))
        self.triplet_score_type = triplet_score_type
        self.triplet_scoring_fn = self.triplet_scoring_fns[triplet_score_type]

    # -- configuration ----------------------------------------------------

    def set_probe(self, probe):
        if isinstance(probe, (str, np.ndarray)):
            self.probe = center_crop(probe, convert_uint8=False)
        else:
            raise ValueError(
                "Probe must be a filepath to an image or a NumPy array")
        self.original_probe_gallery_scores = None

    def set_black_box(self, black_box):
        if black_box not in self.black_boxes:
            raise ValueError('Specified black box "{}" is not supported'
                             .format(black_box))
        self.black_box = black_box
        self.black_box_fn = self.black_boxes[black_box]

    def _get_net(self, name, ebp_version=None):
        key = (name, ebp_version)
        if key not in self._net_dict:
            from xfr_tpu.models import create_wbnet
            self._net_dict[key] = create_wbnet(name,
                                               ebp_version=ebp_version)
        return self._net_dict[key]

    # -- step 1: prior (blackbox.py:280-297) --------------------------------

    def mean_ebp_prior(self):
        if not self.mean_ebp_net:
            self.mean_ebp_net = self._get_net("resnetv4_pytorch")
        wb = self.mean_ebp_net
        from xfr_tpu.models.resnet101 import preprocess_resnet101_batch
        probe = preprocess_resnet101_batch(
            np.asarray(self.probe, np.float32)[None])
        n = wb.net.num_classes()
        Pn = jnp.ones((1, n), jnp.float32) / n
        if wb.convert_saliency_uint8:
            # uint8-quantized saliency path (ebp_version != 6): keep the
            # exact host PIL conversion
            P = wb.ebp(probe, Pn)
            self.prior = np.asarray(M.resize_bilinear(
                jnp.asarray(P, jnp.float32), (224, 224)))
            return
        # float path stays on device end to end: pooled MWP -> gaussian
        # blur -> normalize -> resize, enqueued without a host sync (the
        # prior only weights mask sampling, which consumes it on device).
        # M.gaussian_blur matches the host scipy blur to ~1e-4 relative
        # (tests/test_blackbox.py::test_gaussian_blur_matches_scipy);
        # mask sampling already diverges from the reference's np.random
        # stream, so the prior path is not a parity surface.
        pooled, _ = wb._ebp_pooled_fn()(wb.net.params, probe, Pn)
        P = M.gaussian_blur(
            jnp.squeeze(pooled).astype(jnp.float32), 2.0)
        P = jnp.maximum(P, 0.0)
        P = P / jnp.maximum(P.sum(), wb.eps)
        self.prior = M.resize_bilinear(P, (224, 224))

    def uniform_prior(self):
        # The reference leaves self.prior untouched (blackbox.py:296); the
        # usable semantic is an everywhere-uniform sampling grid.
        if not hasattr(self, "prior"):
            self.prior = np.ones((224, 224), np.float32)

    # -- step 2: masks -------------------------------------------------------

    def generate_sparse_masks(self, random_shift=True, order=1):
        self._key, sub = jax.random.split(self._key)
        if self.use_pallas_blend and random_shift:
            kg, ks = jax.random.split(sub)
            M.check_grid_capacity(
                np.asarray(self.prior).shape, self.mask_scale,
                self.num_mask_elements,
                pct=0.0 if self.prior_type == "uniform" else 50.0)
            grid_probs = M.prior_to_grid(
                jnp.asarray(self.prior, jnp.float32), self.mask_scale,
                self.prior_type)
            self._grids_dev = M.sample_sparse_grids(
                kg, grid_probs, self.num_masks, self.num_mask_elements)
            self._shifts_dev = jax.random.randint(
                ks, (self.num_masks, 2), 0, self.mask_scale)
            self._masks_dev_cache = None
            self._masks_np = None
            return
        self._grids_dev = None
        self._masks_dev_cache = M.make_masks(
            sub, jnp.asarray(self.prior, jnp.float32), self.num_masks,
            self.mask_scale, self.num_mask_elements,
            prior_type=self.prior_type, random_shift=random_shift)
        self._masks_np = None

    @property
    def _masks_dev(self):
        if self._masks_dev_cache is None and self._grids_dev is not None:
            # lazy materialization for API parity (self.masks) and the
            # non-fused scorer
            self._masks_dev_cache = M.upsample_shift_masks_static(
                self._grids_dev, self._shifts_dev,
                (self.prior.shape[0], self.prior.shape[1]), self.mask_scale)
        return self._masks_dev_cache

    @property
    def masks(self):
        if getattr(self, "_masks_np", None) is None:
            self._masks_np = np.asarray(self._masks_dev)
        return self._masks_np

    # -- step 3: fill (blackbox.py:338-364) ----------------------------------

    def mask_fill_gray(self):
        # NB: replicates the reference quirk: fill is 0.5 on the 0..255
        # uint8 probe scale, i.e. near-black (blackbox.py:347-349).
        self._fill_dev = jnp.full(self.probe.shape, 0.5, jnp.float32)

    def mask_fill_blur(self):
        sigma = self.blur_fill_sigma_percent / 100.0 * max(self.probe.shape)
        self._fill_dev = M.gaussian_blur(
            jnp.asarray(self.probe, jnp.float32), sigma)

    def masked_probes_np(self, indices=None):
        """Materialize masked probes [k,H,W,C] on host (for external
        black_box_fn or visualization)."""
        m = self._masks_dev if indices is None else self._masks_dev[indices]
        probe = jnp.asarray(self.probe, jnp.float32)
        blends = m[..., None] * probe + (1.0 - m[..., None]) * self._fill_dev
        return np.asarray(blends)

    def apply_masks_using_image(self, image):
        """Blend probe<->``image`` under every mask (reference:
        blackbox.py:338-345) in one device op; the result is also kept as
        the fill for subsequent scoring."""
        self._fill_dev = jnp.asarray(image, jnp.float32)
        return self.masked_probes_np()

    @property
    def masked_probes(self):
        return self.masked_probes_np()

    # -- step 4: scoring (blackbox.py:366-414) -------------------------------

    def resnet_bb_fn(self, probes, gallery):
        """Built-in resnet scorer for host-side inputs (API parity with
        blackbox.py:366-388).  The hot masked-probe path uses the fused
        device scorer instead."""
        if not self.resnet_net:
            self.resnet_net = self._get_net(self.black_box, ebp_version=6)
        wb = self.resnet_net
        gal_vecs = self._embed_collection(wb, gallery)
        probe_vecs = self._embed_collection(wb, probes)
        return _l2_similarity(probe_vecs, gal_vecs)

    def _embed_collection(self, wb, images):
        from xfr_tpu.models.resnet101 import preprocess_resnet101_batch
        if isinstance(images, np.ndarray) and images.ndim == 4 and \
                images.shape[-1] == 3:
            images = preprocess_resnet101_batch(
                jnp.asarray(images, jnp.float32))
        elif isinstance(images, (list, tuple)) and len(images) and \
                isinstance(images[0], np.ndarray) and images[0].ndim == 3 \
                and images[0].shape[2] == 3:
            images = preprocess_resnet101_batch(
                jnp.asarray(np.stack(images), jnp.float32))
        return wb.embeddings(images)

    @staticmethod
    def _embed_memo_lookup(wb, arr):
        """The shared-net embedding memo's (memo, key, hit) triple for a
        stacked [N,H,W,3] image array.  One key recipe for both the
        collection path and the probe launch path — they MUST stay
        bit-compatible since both read/write ``wb._bb_embed_memo``.

        Params are replaced wholesale (never mutated) on reload, so
        object identity is a sound freshness check for a hit."""
        from xfr_tpu.utils.cache import content_key

        memo = getattr(wb, "_bb_embed_memo", None)
        if memo is None:
            memo = wb._bb_embed_memo = {}
        key = content_key(arr)
        hit = memo.get(key)
        if hit is not None and hit[0] is not wb.net.params:
            hit = None
        return memo, key, hit

    def _embed_collection_memo(self, wb, images):
        """_embed_collection with a content-hash memo on the shared net.

        Generation builds one STRise per probe but the refs (mates) and
        gallery (inpainted nonmates) are constant across every probe of a
        (subject, mask) job — each embed is a separate synchronous device
        round trip (~60 ms of link latency on axon), so re-embedding them
        per map is pure overhead.  Memoized on the Whitebox like its
        kernel cache so all STRise instances sharing a net benefit.  Only
        plain ndarray collections are memoized (DataFrames/paths fall
        through to the uncached path)."""
        from xfr_tpu.utils.cache import memo_put

        if isinstance(images, (list, tuple)) and len(images) and \
                isinstance(images[0], np.ndarray):
            arr = np.stack(images)
        elif isinstance(images, np.ndarray):
            arr = images
        else:
            return self._embed_collection(wb, images)
        memo, key, hit = self._embed_memo_lookup(wb, arr)
        if hit is not None:
            return hit[1]
        e = self._embed_collection(wb, images)
        memo_put(memo, key, (wb.net.params, e))
        return e

    def _launch_probe_embed(self, wb):
        """Enqueue the probe embedding without a host sync.

        Returns ``(pe_kernel, fetch)``: ``pe_kernel`` is a [1,D] array
        for device consumers (un-normalized when freshly enqueued;
        normalized when it came from the content memo — downstream
        kernels always re-normalize, which is idempotent), and
        ``fetch()`` produces the normalized host embedding, inserting it
        into the memo under ``_embed_memo_lookup``'s key (bitwise what
        ``_embed_collection(wb, [probe])`` returns: the same pad-to-bs
        encode program — embeddings() pads a batch of 1 identically —
        and the same host normalization)."""
        from xfr_tpu.models.resnet101 import preprocess_resnet101_batch
        from xfr_tpu.utils.cache import memo_put

        arr = np.stack([np.asarray(self.probe)])
        memo, key, hit = self._embed_memo_lookup(wb, arr)
        if hit is not None:
            e = hit[1].reshape(1, -1)
            return jnp.asarray(e, jnp.float32), (lambda: hit[1])
        x = preprocess_resnet101_batch(jnp.asarray(arr, jnp.float32))
        bs = wb.batch_size
        if bs > 1:
            x = jnp.concatenate(
                [x, jnp.zeros((bs - 1,) + x.shape[1:], x.dtype)])
        e_dev = wb.encode(x)
        pe_kernel = e_dev[:1].reshape(1, -1)

        def fetch():
            e = np.asarray(e_dev)[:1]
            flat = e.reshape(1, -1)
            e = (flat / np.linalg.norm(flat, axis=1, keepdims=True)
                 ).reshape(e.shape)
            memo_put(memo, key, (wb.net.params, e))
            return e

        return pe_kernel, fetch

    def _select_combine_fn(self, n):
        """One-program positive-mask selection + weighted combine +
        normalization for the default contrastive-triplet scoring at
        percentile 0 (the evaluate()/generation configuration): consumes
        the scan scorer's device scores and the un-fetched probe
        embedding, so launch_evaluate's finish() is a single device
        fetch instead of scores-down / selection-up / map-down round
        trips (each ~60 ms of device-link latency on axon).

        Mirrors compute_saliency_map exactly: at percentile 0 the
        selection ``scores >= min(positive scores)`` is ``scores > 0``,
        and the cts arithmetic keeps the host op order
        (contrastive_triplet_similarity)."""
        wb = self.resnet_net

        def build():
            @jax.jit
            def fn(masks, rs, gs, pe, ref_e, gal_e):
                pe = pe / jnp.linalg.norm(pe, axis=1, keepdims=True)
                orig_r = 1.0 - 0.5 * jnp.linalg.norm(
                    pe[:, None] - ref_e[None], axis=2)
                orig_g = 1.0 - 0.5 * jnp.linalg.norm(
                    pe[:, None] - gal_e[None], axis=2)
                ref_sc = orig_r - rs[:n]
                gal_sc = orig_g - gs[:n]
                cts = (ref_sc - gal_sc).mean(axis=1)
                sel = (cts > 0).astype(jnp.float32)
                npos = sel.sum()
                w = cts * sel
                smap = 1.0 - jnp.einsum("n,nhw->hw", w, masks[:n]) \
                    / jnp.maximum(npos, 1.0)
                smap = smap - smap.min()
                smap = smap / smap.max()
                return cts, npos, smap

            return fn

        return wb._kernel(("strise_select_combine",
                           wb.net.encode_tensor, n), build,
                          precision=None)

    def _fused_scorer(self):
        """jitted chunk scorer: masks chunk -> blend -> preprocess ->
        encode -> similarity vs refs+gallery embeddings.  Cached on the
        underlying Whitebox's kernel cache, so every STRise instance
        sharing a net (the generation drivers build one STRise per probe
        over a shared net_dict) reuses ONE traced program instead of
        re-tracing the full encode graph per map."""
        from xfr_tpu.models.resnet101 import preprocess_resnet101_batch

        wb = self.resnet_net
        graph, enc = wb.net.graph, wb.net.encode_tensor

        def build():
            @jax.jit
            def score_chunk(params, masks, probe, fill, ref_e, gal_e):
                blends = (masks[..., None] * probe +
                          (1.0 - masks[..., None]) * fill)
                x = preprocess_resnet101_batch(blends)
                return _encode_and_score(graph, enc, params, x,
                                         ref_e, gal_e)

            return score_chunk

        # default precision unless the user opts into f32-grade ranking
        # (see score_precision in __init__)
        return wb._kernel(("strise_fused_scorer", enc), build,
                          precision=self.score_precision)

    def _fused_scorer_scan(self, nchunk, bs):
        """One-program mask scorer: lax.scan over [nchunk,bs,H,W] mask
        chunks, each step blend -> preprocess -> encode -> similarity.

        The chunked scorer costs one dispatch per chunk — ~0.5 s of
        device-link dispatch overhead across a 6,500-mask map on axon
        (measured 1.61 s -> 1.10 s/map by scanning all chunks in one
        program; scores agree with the chunked program to f32 matmul
        scheduling noise, ~3e-4 with default precision).  Shared across
        STRise instances via the net kernel cache like _fused_scorer;
        the key includes nchunk, so each distinct num_masks compiles
        once."""
        wb = self.resnet_net
        local = self._scorer_scan_local()

        def build():
            @jax.jit
            def score_all(params, masks_c, probe, fill, ref_e, gal_e):
                return local(params, masks_c, probe, fill, ref_e, gal_e)

            return score_all

        return wb._kernel(
            ("strise_scan_scorer", wb.net.encode_tensor, nchunk, bs),
            build, precision=self.score_precision)

    def _scorer_scan_local(self):
        """The scanned-scorer body shared by the single-device jit and the
        shard_map per-device shard (mask chunks are independent, so the
        mesh path shards the chunk axis over 'dp' with zero collectives
        and per-chunk programs identical to the single-chip scan)."""
        from xfr_tpu.models.resnet101 import preprocess_resnet101_batch

        wb = self.resnet_net
        graph, enc = wb.net.graph, wb.net.encode_tensor

        def local(params, masks_c, probe, fill, ref_e, gal_e):
            def body(carry, mchunk):
                blends = (mchunk[..., None] * probe +
                          (1.0 - mchunk[..., None]) * fill)
                x = preprocess_resnet101_batch(blends)
                return carry, _encode_and_score(graph, enc, params, x,
                                                ref_e, gal_e)

            _, (rs, gs) = jax.lax.scan(body, 0, masks_c)
            n = masks_c.shape[0] * masks_c.shape[1]
            return rs.reshape(n, -1), gs.reshape(n, -1)

        return local

    def _fused_scorer_scan_shmap(self, nchunk, bs):
        """Mesh form of :meth:`_fused_scorer_scan`: the [nchunk,bs,H,W]
        chunk axis (nchunk a 'dp' multiple; zero-mask pad chunks are
        discarded by the caller) shards over 'dp', each device scanning
        its chunks with the identical body.  This keeps the one-program
        scan win under ``--mesh auto`` instead of falling back to the
        per-chunk dispatch loop."""
        wb = self.resnet_net
        # args: (params, masks_c, probe, fill, ref_e, gal_e) — the chunk
        # axis of masks_c is the only sharded input
        return wb._shmap_kernel(
            ("strise_scan_scorer_shmap", wb.net.encode_tensor, nchunk, bs),
            self._scorer_scan_local(), sharded={1}, n_out=2,
            precision=self.score_precision, mesh=self.mesh)

    def _fused_scorer_pallas(self):
        """Scorer chunk using the Pallas fused upsample+shift+blend+
        preprocess kernel: masked preprocessed probes are produced straight
        from the tiny grids — the [N,H,W] mask tensor never exists.
        Shared across STRise instances via the net's kernel cache, like
        _fused_scorer."""
        from xfr_tpu.blackbox.pallas_blend import fused_mask_blend_preprocess
        from xfr_tpu.models.resnet101 import MEAN_RGB

        wb = self.resnet_net
        graph, enc = wb.net.graph, wb.net.encode_tensor
        scale = self.mask_scale

        def build():
            @jax.jit
            def score_chunk(params, grids, shifts, probe, fill, ref_e,
                            gal_e):
                x = fused_mask_blend_preprocess(
                    grids, shifts, probe, fill,
                    jnp.asarray(MEAN_RGB, jnp.float32), mask_scale=scale)
                return _encode_and_score(graph, enc, params, x,
                                         ref_e, gal_e)

            return score_chunk

        return wb._kernel(("strise_fused_scorer_pallas", enc, scale),
                          build, precision=self.score_precision)

    def _dp_put(self, a, axis=0):
        """Shard dim ``axis`` of ``a`` over the mesh 'dp' axis (identity
        without a mesh)."""
        if self.mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec
        spec = [None] * a.ndim
        spec[axis] = "dp"
        return jax.device_put(a, NamedSharding(self.mesh,
                                               PartitionSpec(*spec)))

    def _rep_put(self, a):
        if self.mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec
        return jax.device_put(a, NamedSharding(self.mesh, PartitionSpec()))

    def score_masks(self):
        self._score_masks_launch()()

    def _score_masks_launch(self, want_fused_finish=False):
        """Enqueue the mask-scoring device programs without syncing.

        Returns a drain closure that fetches the chunk scores and sets
        ``mask_scores``.  The builtin-matcher path keeps every chunk on
        device at launch time, so a second probe's setup/writes can
        overlap this probe's scoring; the external-matcher path is
        host-bound and runs entirely in the drain.

        With ``want_fused_finish`` (launch_evaluate's default pipeline)
        the single-chip scan path also enqueues the selection+combine
        program and stores a one-fetch finisher on
        ``self._fused_finish`` that sets every score attribute AND the
        saliency map — no per-stage device round trips.  When that
        finisher armed, the returned drain delegates to it (the fused
        program computes the probe/ref/gallery scores on device, so the
        generic drain path would read attributes that were never set) —
        the drain contract holds on every path, with the fused drain
        additionally setting ``saliency_map``."""
        builtin = self.black_box in self.black_boxes if self.black_box \
            else False
        self._fused_finish = None
        fused_cb = None

        if builtin:
            if not self.resnet_net:
                self.resnet_net = self._get_net(self.black_box,
                                                ebp_version=6)
            wb = self.resnet_net
            if self.mesh is not None and wb.mesh is not self.mesh:
                wb.use_mesh(self.mesh)
            n, bs = self.num_masks, self.batch_size
            pad = (-n) % bs
            use_pallas = (self.use_pallas_blend and
                          getattr(self, "_grids_dev", None) is not None)
            fused = (want_fused_finish and not use_pallas and
                     self.triplet_scoring_fn ==
                     self.contrastive_triplet_similarity)

            ref_e = self._embed_collection_memo(wb, self.refs)
            gal_e = self._embed_collection_memo(wb, self.gallery)
            if fused:
                pe_kernel, probe_fetch = self._launch_probe_embed(wb)
            else:
                probe_e = self._embed_collection_memo(wb, [self.probe])
                self.original_probe_ref_scores = _l2_similarity(probe_e,
                                                                ref_e)
                self.original_probe_gallery_scores = _l2_similarity(
                    probe_e, gal_e)

            probe = self._rep_put(jnp.asarray(self.probe, jnp.float32))
            ref_e_d = self._rep_put(jnp.asarray(ref_e, jnp.float32))
            gal_e_d = self._rep_put(jnp.asarray(gal_e, jnp.float32))
            fill_d = self._rep_put(self._fill_dev)
            ref_chunks, gal_chunks = [], []
            if use_pallas:
                scorer = self._fused_scorer_pallas()
                grids, shifts = self._grids_dev, self._shifts_dev
                if pad:
                    grids = jnp.concatenate(
                        [grids, jnp.ones((pad,) + grids.shape[1:],
                                         grids.dtype)])
                    shifts = jnp.concatenate(
                        [shifts, jnp.zeros((pad, 2), shifts.dtype)])
            else:
                masks = self._masks_dev
                # all chunks in ONE scanned program (saves one dispatch
                # round trip per chunk; see _fused_scorer_scan).  Under a
                # mesh the chunk axis shards over 'dp' (shard_map;
                # identical per-chunk program), so --mesh auto keeps the
                # scan win.  Row + chunk padding concatenate ONCE — the
                # mask tensor is ~1.3 GB f32 at 6500 masks, and each
                # concatenate is a full-tensor HBM copy.
                nchunk = (n + pad) // bs
                cpad = 0
                if self.mesh is not None:
                    cpad = (-nchunk) % self.mesh.shape["dp"]
                    nchunk += cpad
                if pad or cpad:
                    masks = jnp.concatenate(
                        [masks,
                         jnp.zeros((pad + cpad * bs,) + masks.shape[1:],
                                   masks.dtype)])
                if self.mesh is not None:
                    scan = self._fused_scorer_scan_shmap(nchunk, bs)
                    masks_c = self._dp_put(
                        masks.reshape(nchunk, bs, *masks.shape[1:]))
                else:
                    scan = self._fused_scorer_scan(nchunk, bs)
                    masks_c = masks.reshape(nchunk, bs, *masks.shape[1:])
                rs, gs = scan(wb.net.params, masks_c, probe, fill_d,
                              ref_e_d, gal_e_d)
                ref_chunks.append(rs)
                gal_chunks.append(gs)
                if fused:
                    flat_ref = jnp.asarray(ref_e, jnp.float32
                                           ).reshape(len(self.refs), -1)
                    flat_gal = jnp.asarray(
                        gal_e, jnp.float32).reshape(
                            _collection_size(self.gallery), -1)
                    cts_d, npos_d, smap_d = self._select_combine_fn(n)(
                        masks, rs, gs, pe_kernel, flat_ref, flat_gal)

                    def fused_finish():
                        cts, npos, smap, rs_h, gs_h = jax.device_get(
                            (cts_d, npos_d, smap_d, rs, gs))
                        # np.array (not asarray): device_get views are
                        # read-only, but these are public result
                        # fields that callers mutate in place
                        # (create_save_smap normalizes the map
                        # in-place, like the reference's numpy maps)
                        self.masked_probe_ref_scores = \
                            np.array(rs_h)[:n]
                        self.masked_probe_gallery_scores = \
                            np.array(gs_h)[:n]
                        pe = probe_fetch()
                        self.original_probe_ref_scores = \
                            _l2_similarity(pe, ref_e)
                        self.original_probe_gallery_scores = \
                            _l2_similarity(pe, gal_e)
                        self.mask_scores = np.array(cts)
                        if npos == 0:
                            raise ValueError(
                                "no positively-scored masks: the "
                                "probe scores identically against "
                                "refs and gallery (are they the same "
                                "images?) — cannot form a saliency "
                                "map")
                        self.saliency_map = np.array(smap)

                    self._fused_finish = fused_finish
                    fused_cb = fused_finish

            if use_pallas:
                for i in range(0, n + pad, bs):
                    rs, gs = scorer(wb.net.params,
                                    self._dp_put(grids[i:i + bs]),
                                    self._dp_put(shifts[i:i + bs]), probe,
                                    fill_d, ref_e_d, gal_e_d)
                    # keep on device: dispatches pipeline asynchronously
                    ref_chunks.append(rs)
                    gal_chunks.append(gs)

            def drain():
                if fused_cb is not None:
                    # Fused launch: the probe/ref/gallery score attrs the
                    # generic path below reads were never set (the fused
                    # program computes them on device), so honoring the
                    # drain contract means running the one-fetch finisher
                    # — callers that ignore self._fused_finish still get
                    # every score attribute and the saliency map.  (A
                    # closure-captured callback, NOT self._fused_finish:
                    # launch_evaluate claims-and-clears that attribute
                    # before any drain could run.)
                    fused_cb()
                    return
                self.masked_probe_ref_scores = np.asarray(
                    jnp.concatenate(ref_chunks))[:n]
                self.masked_probe_gallery_scores = np.asarray(
                    jnp.concatenate(gal_chunks))[:n]
                self.mask_scores = self.triplet_scoring_fn()

            return drain

        def drain():
            # external score-only matcher: host round-trip in chunks
            self.original_probe_ref_scores = self.black_box_fn(
                [self.probe], self.refs)
            if getattr(self, "original_probe_gallery_scores",
                       None) is None:
                self.original_probe_gallery_scores = self.black_box_fn(
                    [self.probe], self.gallery)
            mp = self.masked_probes_np()
            self.masked_probe_ref_scores = self.black_box_fn(mp, self.refs)
            self.masked_probe_gallery_scores = self.black_box_fn(
                mp, self.gallery)
            self.mask_scores = self.triplet_scoring_fn()

        return drain

    def contrastive_triplet_similarity(self):
        """cts = mean((origRef - maskRef) - (origGal - maskGal))
        (reference: blackbox.py:390-394)."""
        ref_scores = (self.original_probe_ref_scores -
                      self.masked_probe_ref_scores)
        gallery_scores = (self.original_probe_gallery_scores -
                          self.masked_probe_gallery_scores)
        return (ref_scores - gallery_scores).mean(axis=1)

    # -- step 5: combine (blackbox.py:416-447) -------------------------------

    @staticmethod
    @jax.jit
    def _combine(masks, weights, selected):
        """mean over selected of weight*mask, fixed shapes (no gather)."""
        w = weights * selected
        return jnp.einsum("n,nhw->hw", w, masks) / jnp.sum(selected)

    def combine_masks(self, indices):
        indices = np.asarray(indices)
        if indices.dtype != bool:
            sel = np.zeros(self.num_masks, bool)
            sel[indices] = True
            indices = sel
        return np.asarray(self._combine(
            self._masks_dev, jnp.asarray(self.mask_scores, jnp.float32),
            jnp.asarray(indices, jnp.float32)))

    def compute_saliency_map(self, positive_scores=True, percentile=0):
        sorted_idx = self.mask_scores.argsort()[::-1]
        pos_sorted_idx = sorted_idx[self.mask_scores[sorted_idx] > 0]
        neg_sorted_idx = sorted_idx[self.mask_scores[sorted_idx] < 0][::-1]

        if positive_scores:
            if pos_sorted_idx.size == 0:
                raise ValueError(
                    "no positively-scored masks: the probe scores "
                    "identically against refs and gallery (are they the "
                    "same images?) — cannot form a saliency map")
            threshold = np.percentile(self.mask_scores[pos_sorted_idx],
                                      percentile)
            selected = self.mask_scores >= threshold
            saliency_map = 1.0 - self.combine_masks(selected)
        else:
            threshold = np.percentile(-self.mask_scores[neg_sorted_idx],
                                      percentile)
            selected = -self.mask_scores >= threshold
            saliency_map = self.combine_masks(selected) - 1.0

        saliency_map -= saliency_map.min()
        saliency_map /= saliency_map.max()
        self.saliency_map = saliency_map

    # -- gallery visualization (blackbox.py:483-533) --------------------------

    def _gallery_montage(self):
        """Gallery montage figure shared by plot_gallery / save_gallery
        (reference: blackbox.py:483-533)."""
        import math

        import matplotlib.pyplot as plt

        ncols = 10
        # Empty gallery would give nrows=0 and plt.subplots raises (the
        # reference additionally hits an undefined-i NameError).
        nrows = max(1, int(math.ceil(1.0 * self.gallery_size / ncols)))
        fig, axes = plt.subplots(ncols=ncols, nrows=nrows, squeeze=False,
                                 figsize=(ncols, nrows))
        if _is_dataframe(self.gallery):
            ims = (center_crop(self.gallery.at[i, "Filename"],
                               convert_uint8=False)
                   for i in self.gallery.index)
        else:
            ims = iter(self.gallery)
        i = -1
        for i, im in enumerate(ims):
            ax = axes.flat[i]
            ax.set_xticks([])
            ax.set_yticks([])
            ax.xaxis.label.set_visible(False)
            ax.yaxis.label.set_visible(False)
            ax.imshow(im)
        for ii in range(i + 1, nrows * ncols):
            fig.delaxes(axes.flat[ii])
        fig.tight_layout(pad=0, w_pad=0, h_pad=0)
        fig.subplots_adjust(hspace=0, wspace=0)
        return fig

    def plot_gallery(self):
        import matplotlib.pyplot as plt

        self._gallery_montage()
        plt.show()

    def save_gallery(self, filename):
        import matplotlib.pyplot as plt

        fig = self._gallery_montage()
        fig.savefig(filename, bbox_inches="tight")
        plt.close(fig)

    # -- driver (blackbox.py:450-479) ----------------------------------------

    def evaluate(self):
        steps = 5
        print_flush("1/{} Computing prior...".format(steps))
        self.priors[self.prior_type]()
        print_flush("2/{} Generating masks...".format(steps))
        self.generate_masks()
        print_flush("3/{} Applying masks...".format(steps))
        self.apply_masks()
        print_flush("4/{} Scoring masks...".format(steps))
        self.score_masks()
        print_flush("5/{} Computing saliency map...".format(steps))
        self.compute_saliency_map()
        print_flush("Finished!")

    def launch_evaluate(self, verbose=False):
        """evaluate() split for cross-probe pipelining: prior, masks,
        fill and all scoring programs ENQUEUE here (no sync on the mask
        scores); the returned finish() closure drains the scores,
        computes the saliency map and returns it.

        Launch probe k+1 before finishing probe k and probe k's host
        post-processing/writes overlap probe k+1's device queue — the
        reference's evaluate() is strictly serial per probe
        (reference: blackbox.py:450-479).  Results are identical to
        evaluate(): the split point is a pure enqueue/drain boundary."""
        if verbose:
            print_flush("launch: prior/masks/fill/scoring enqueue...")
        self.priors[self.prior_type]()
        self.generate_masks()
        self.apply_masks()
        drain = self._score_masks_launch(want_fused_finish=True)
        fused = self._fused_finish
        self._fused_finish = None
        if fused is not None:
            # default-scoring path (single-chip or mesh): selection+
            # combine were enqueued on device; finish is ONE fetch
            def finish():
                fused()
                return self.saliency_map

            return finish

        def finish():
            drain()
            self.compute_saliency_map()
            return self.saliency_map

        return finish


def _is_dataframe(x):
    try:
        import pandas as pd
        return isinstance(x, pd.DataFrame)
    except ImportError:  # pragma: no cover
        return False


def _collection_size(x):
    if isinstance(x, list):
        return len(x)
    if isinstance(x, np.ndarray):
        return x.shape[0]
    if _is_dataframe(x):
        return len(x.index)
    raise TypeError("collection must be a list of filepaths, NumPy arrays, "
                    "or a Pandas dataframe")


def _l2_similarity(x, y):
    """1 - 0.5*||x_hat - y_hat|| pairwise (reference: blackbox.py:385)."""
    xn = x / np.linalg.norm(x, axis=1)[:, None]
    yn = y / np.linalg.norm(y, axis=1)[:, None]
    return 1.0 - 0.5 * np.linalg.norm(xn[:, None] - yn[None], axis=2)


def _encode_and_score(graph, enc, params, x, ref_e, gal_e):
    """Shared scorer tail: encode preprocessed blends, L2-normalize, score
    against both galleries (the on-device _l2_similarity)."""
    from xfr_tpu.ebp import interpreter as I

    values = I.forward_clean(graph, params, x)
    e = values[enc].reshape(x.shape[0], -1)
    e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
    ref_s = 1.0 - 0.5 * jnp.linalg.norm(e[:, None, :] - ref_e[None], axis=2)
    gal_s = 1.0 - 0.5 * jnp.linalg.norm(e[:, None, :] - gal_e[None], axis=2)
    return ref_s, gal_s
