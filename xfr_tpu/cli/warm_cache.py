"""Pre-compile the canonical-shape production programs into the
persistent JAX compilation cache (xfr_tpu enables it at
~/.cache/xfr_tpu_jax; override with XFR_JAX_CACHE_DIR).

Run once per machine/install (or after upgrading jax / the package):

    python -m xfr_tpu.cli.warm_cache --net resnetv4_pytorch

Afterwards a fresh process's first saliency map pays persistent-cache
*loads* instead of full XLA compiles.  NB on the axon remote-compile
service even cache loads round-trip to the service, so cold start is
bounded below by service latency (measured table in docs/guide.md) —
this tool removes the multi-minute compile component, not the service
round trips.

The warmed set covers the whitebox generation mix (meanEBP pooled,
fused contrastive+truncated, wsebp ranking + scan-batched sweep at the
canonical batch size), the embeddings encode chunk, the eval-stage
blend+encode programs (single-map scan, bit-packed fallback chunk, and
the analysis stage's 4-method multi-map scan), and optionally the
blackbox fused scorer + mask sampler (--bb).

When more than one device is visible, a second pass re-runs the eval
blend / wsebp sweep / blackbox scorer steps under ``auto_mesh()`` so
the ``--mesh auto`` default-path shard_map programs land in the
persistent cache too (it keys on compiled HLO, not in-process mesh
identity) — multi-chip cold starts would otherwise pay the full
compiles warm_cache exists to remove.
"""

import argparse
import time

import numpy as np


def warm(net_name="resnetv4_pytorch", batch_size=8, bb=True,
         num_masks=6500, verbose=True, wb=None, mesh="auto"):
    import jax.numpy as jnp

    t_all = time.time()
    steps = []

    def step(name, fn):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        steps.append((name, dt))
        if verbose:
            print("  %-38s %6.1f s" % (name, dt), flush=True)

    if wb is None:
        from xfr_tpu.models import create_wbnet

        wb = create_wbnet(net_name, ebp_version=6)
        wb.wsebp_dtype = jnp.bfloat16  # production CLI default
    rng = np.random.RandomState(0)
    B = batch_size
    probes = jnp.asarray(rng.rand(B, 3, 224, 224) * 50, jnp.float32)
    D = wb.net.embed_dim

    step("encode chunk [%d]" % wb.batch_size,
         lambda: np.asarray(wb.embeddings(
             np.asarray(rng.rand(2, 3, 224, 224), np.float32))))

    def _mean():
        wb.net.reset_classifier()
        Pn = jnp.ones((B, wb.net.num_classes()), jnp.float32)
        np.asarray(wb._ebp_pooled_fn()(wb.net.params, probes, Pn)[0])

    step("meanEBP pooled (B=%d)" % B, _mean)

    em = rng.rand(B, D).astype(np.float32)
    en = rng.rand(B, D).astype(np.float32)
    em /= np.linalg.norm(em, axis=1, keepdims=True)
    en /= np.linalg.norm(en, axis=1, keepdims=True)

    def _ct():
        wb.set_triplet_classifier_batch(em / 2500.0, en / 2500.0)
        wb.launch_contrastive_ebp_batch_both(probes, truncate_percent=20)()

    step("contrastive+truncated both (B=%d)" % B, _ct)

    def _ws():
        wb.set_triplet_classifier_batch(em, en)
        wb.launch_weighted_subtree_ebp_batch(
            probes, topk=32, subtree_mode="norelu")()

    step("wsebp ranking + scan sweep (B=%d)" % B, _ws)

    def _blend():
        # the canonical 101-threshold monotone family -> the single-scan
        # enter-count program keyed ("blend_encode_mono", 101, bs).
        # Production eval/BB nets carry the full classifier, and the
        # classifier shape is part of the program signature (hence the
        # persistent-cache key) even though encode-only programs DCE it —
        # so restore it after _ws's [2B,D] triplet classifier or this
        # warms the wrong variants.
        wb.net.reset_classifier()
        smap = rng.rand(224, 224)
        smap /= smap.sum()
        from xfr_tpu.inpainting_game import create_threshold_masks
        masks = create_threshold_masks(
            smap, "percent-density",
            percentiles=np.unique(np.append(np.arange(0, 100, 1),
                                            [0, 100])),
            seed=0, include_zero_elements=False)
        wb.blend_embeddings(np.asarray(probes[0]), np.asarray(probes[1]),
                            masks)

    step("eval blend+encode (mono scan, T=101)", _blend)

    def _blend_bits():
        # non-monotone fallback: the per-chunk bit-unpack program
        masks = np.zeros((wb.batch_size, 224, 224), bool)
        masks[::2, 40:80, 40:80] = True
        wb.blend_embeddings(np.asarray(probes[0]), np.asarray(probes[1]),
                            masks)

    step("eval blend+encode chunk (bit-packed)", _blend_bits)

    def _blend_multi():
        # the analysis stage batches all of a probe's method maps into ONE
        # multi-map scan (TwinClsBatch -> program keyed
        # ("blend_encode_mono_multi", M, 101, bs)); warm the standard
        # 4-method mix signature (meanEBP + contrastive + truncated +
        # weighted-subtree).  M==1 batches reuse the single-map program
        # warmed by _blend.
        wb.net.reset_classifier()
        from xfr_tpu.inpainting_game import TwinClsBatch

        percentiles = np.unique(np.append(np.arange(0, 100, 1), [0, 100]))
        orig = np.asarray(probes[0], np.float32)
        inp = np.asarray(probes[1], np.float32)
        # galleries = the pair's own embeddings so the protocol's mask-0
        # sanity assert (pure-original blend must classify as original)
        # holds for any weights
        ge = np.asarray(wb.embeddings(np.stack([orig, inp])))
        ge = ge / np.linalg.norm(ge, axis=1, keepdims=True)
        batch = TwinClsBatch(wb, orig, inp, ge[:1], ge[1:],
                             mask_threshold_method="percent-density",
                             percentiles=percentiles, seed=0,
                             include_zero_elements=False)
        fins = []
        for _ in range(4):
            smap = rng.rand(224, 224)
            smap /= smap.sum()
            fins.append(batch.launch(smap))
        batch.flush()
        for f in fins:
            f()

    step("eval multi-map blend+encode (M=4)", _blend_multi)

    if bb:
        from xfr_tpu.blackbox import STRise

        probe_im = (rng.rand(224, 224, 3) * 255).astype(np.uint8)
        refs = [probe_im.copy() for _ in range(2)]
        # gallery must differ from refs: identical galleries give all-zero
        # triplet scores and an empty positive-percentile set
        gals = [(rng.rand(224, 224, 3) * 255).astype(np.uint8)
                for _ in range(2)]

        def _bb(bb_mesh=None):
            # same signature argument as _blend: production BB nets have
            # the full classifier (mean_ebp_prior's Pn is [1, n_classes])
            wb.net.reset_classifier()
            # score_precision="high" matches the BB CLI default (the
            # canonical eval-facing signature; measured ~18 min cold
            # compile for the 2048-mask 'high' scan in a slow service
            # window — exactly what warming is for).  The library-default
            # (None) scorer is warmed too: generation resumes may mix.
            for prec in ("high", None):
                st = STRise(probe=probe_im, refs=refs, gallery=gals,
                            black_box=net_name,
                            net_dict={(net_name, 6): wb,
                                      ("resnetv4_pytorch", None): wb},
                            mask_scale=12, num_mask_elements=2,
                            mask_fill_type="blur",
                            blur_fill_sigma_percent=4,
                            num_masks=num_masks, seed=0,
                            prior_type="mean_ebp", score_precision=prec,
                            mesh=bb_mesh)
                st.launch_evaluate()()

        step("blackbox prior+masks+fused scorer", _bb)

    # --mesh auto pass: re-run the default-path steps under a mesh so the
    # shard_map program variants (xfr_tpu.utils.programs.warm_mesh_set())
    # land in the persistent cache too — multi-chip cold starts would
    # otherwise pay the full compiles of exactly the production programs.
    if mesh == "auto":
        from xfr_tpu.parallel.mesh import auto_mesh

        mesh = auto_mesh()
    if mesh is not None:
        # The mesh pass must not permanently re-route a caller-provided
        # wb onto auto_mesh: save and restore its mesh state (use_mesh
        # also replicates params and rounds batch_size to the dp size).
        prev_mesh, prev_bs = wb.mesh, wb.batch_size
        wb.use_mesh(mesh)
        step("mesh: wsebp shard_map sweep", _ws)
        step("mesh: eval blend+encode (mono scan)", _blend)
        step("mesh: eval multi-map blend+encode", _blend_multi)
        if bb:
            step("mesh: blackbox scan scorer", lambda: _bb(mesh))
        wb.batch_size = prev_bs
        if prev_mesh is not None:
            wb.use_mesh(prev_mesh)
        else:
            import jax

            wb.mesh = None
            # un-replicate: single-device programs expect params placed
            # on (or placeable to) one device, not mesh-committed
            wb.net.params = jax.device_put(wb.net.params, jax.devices()[0])
            if wb.net._orig_classifier is not None:
                wb.net._orig_classifier = jax.device_put(
                    wb.net._orig_classifier, jax.devices()[0])

    total = time.time() - t_all
    if verbose:
        print("warm_cache done: %.1f s total" % total, flush=True)
    return steps


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--net", default="resnetv4_pytorch")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--num-masks", type=int, default=6500)
    parser.add_argument("--no-bb", action="store_true",
                        help="skip the blackbox scorer programs")
    parser.add_argument("--no-mesh", action="store_true",
                        help="skip the --mesh auto shard_map program pass "
                             "(it runs only when >1 device is visible)")
    args = parser.parse_args(argv)
    warm(args.net, args.batch_size, bb=not args.no_bb,
         num_masks=args.num_masks,
         mesh=None if args.no_mesh else "auto")


if __name__ == "__main__":
    main()
