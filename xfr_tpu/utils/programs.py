"""Registry of jitted device-program FAMILIES (the first element of every
``Whitebox._kernel`` key).

Two invariants are mechanized here (round-3 verdict: the warm-cache set
was maintained by hand, and a new canonical-shape program could ship
without a warm step without anything failing):

1. Every ``_kernel`` family must be registered below — building an
   unregistered family raises immediately, so a new program cannot ship
   without a conscious entry.
2. Each entry declares whether ``xfr_tpu.cli.warm_cache`` must pre-seed
   it (``warm=True``: a canonical-shape production program whose cold
   compile a fresh process would otherwise pay; ``warm_mesh=True``: the
   ``--mesh auto`` default-path variant of one — warmed whenever warm()
   runs with more than one visible device, since the persistent XLA
   cache keys on compiled HLO, not on the in-process mesh identity).
   ``tests/test_cli.py::test_warm_cache_covers_registry`` runs ``warm()``
   with build recording ON and asserts the built families equal the
   expected set exactly — adding a warm-flagged program without a warm
   step (or a warm step that silently stops building its program) fails
   CI.

``warm=False`` families are legitimately lazy: deprecated/alternate
paths kept for A/Bs and per-request variants whose signature space is
unbounded.
"""

from dataclasses import dataclass


@dataclass(frozen=True)
class Program:
    warm: bool
    desc: str
    warm_mesh: bool = False


PROGRAMS = {
    # -- forward / embedding ------------------------------------------------
    "encode": Program(True, "padded fixed-shape embedding chunk"),
    # -- EBP family ---------------------------------------------------------
    "ebp_raw": Program(False, "per-event EBP backward (oracle/parity use)"),
    "ebp_multi": Program(False, "multi-event EBP backward"),
    "ebp_pooled": Program(True, "meanEBP pooled saliency (batched)"),
    "prior_ebp": Program(False, "layerwise-contrastive prior injection"),
    "contrastive": Program(False, "single-probe contrastive EBP"),
    "contrastive_batch": Program(False, "batched contrastive (one mode)"),
    "contrastive_both": Program(True,
                                "fused contrastive+truncated batch"),
    "subtree_rank": Program(False, "subtree_ebp ranking pass"),
    "subtree_tied_prior": Program(False, "subtree_ebp tied-prior walk"),
    # -- weighted-subtree sweep ---------------------------------------------
    "wsebp_grad": Program(False, "per-probe wsebp ranking pass"),
    "wsebp_grad_batch": Program(True, "batched wsebp ranking pass"),
    "wsebp_inject": Program(False, "dynamic-injection sweep step"),
    "wsebp_sweep": Program(False, "static event-order sweep (unfused)"),
    "wsebp_sweep_select": Program(False, "fused sweep+select, per probe"),
    "wsebp_sweep_select_scan": Program(True,
                                       "scan-batched fused sweep (prod)"),
    "wsebp_sweep_select_batch": Program(False,
                                        "no-scan full-batch walk (A/B)"),
    "wsebp_sweep_select_shmap": Program(
        False, "mesh sweep (--mesh auto default path)", warm_mesh=True),
    "wsebp_merge": Program(False,
                           "subtree map weight+merge (per-probe path; "
                           "the batched sweep fuses merge in-scan)"),
    # -- eval-stage blend+encode ---------------------------------------------
    "blend_encode": Program(True, "bit-packed mask blend+encode chunk"),
    "blend_encode_mono": Program(True, "monotone counts scan (T=101)"),
    "blend_encode_mono_shmap": Program(
        False, "mesh counts scan (--mesh auto default path)",
        warm_mesh=True),
    "blend_encode_mono_multi": Program(True, "4-method multi-map scan"),
    "blend_encode_mono_multi_shmap": Program(
        False, "mesh multi-map scan (--mesh auto default path)",
        warm_mesh=True),
    "blend_encode_mono_multi_pair": Program(
        False, "cross-probe multi-pair scan (kept machinery, unwired)"),
    # -- blackbox STRise ------------------------------------------------------
    "strise_fused_scorer": Program(False,
                                   "per-chunk scorer (pallas/mesh A/B)"),
    "strise_scan_scorer": Program(True, "one-program scanned mask scorer"),
    "strise_scan_scorer_shmap": Program(
        False, "mesh scan scorer (--mesh auto default path)",
        warm_mesh=True),
    "strise_fused_scorer_pallas": Program(False,
                                          "pallas fused-blend scorer"),
    "strise_select_combine": Program(True,
                                     "fused selection+combine+normalize"),
}

# Families built (cache-miss -> builder ran) since the last reset; the
# warm-cache coverage test records against this.
BUILT = set()
RECORD = False


def note_build(family):
    """Called by Whitebox._kernel on every cache miss."""
    if family not in PROGRAMS:
        raise KeyError(
            "unregistered device-program family %r: add it to "
            "xfr_tpu/utils/programs.py PROGRAMS (and a warm_cache step if "
            "it is a canonical-shape production program)" % (family,))
    if RECORD:
        BUILT.add(family)


def warm_set():
    return {f for f, p in PROGRAMS.items() if p.warm}


def warm_mesh_set():
    """Families warm() must additionally build when it runs with a mesh
    (more than one visible device): the --mesh auto default-path
    shard_map variants of the canonical production programs."""
    return {f for f, p in PROGRAMS.items() if p.warm_mesh}
