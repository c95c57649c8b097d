"""xfr_tpu: a TPU-native explainable face recognition framework (JAX/XLA/Pallas).

Re-implements, TPU-first, the capabilities of the reference "Explainable Face
Recognition" release (ECCV 2020, arXiv:2008.00916):

  * whitebox discriminative saliency via excitation backprop (EBP) and its
    triplet variants, expressed as an explicit graph-IR interpreter instead of
    torch forward/backward hooks (reference: python/xfr/models/whitebox.py),
  * blackbox saliency via massively batched prior-guided mask perturbation
    (reference: python/xfr/models/blackbox.py),
  * the inpainting-game benchmark protocol, generation and analysis drivers
    (reference: python/xfr/inpainting_game/, eval/),
  * face embedding model zoo (ResNet-101+L2, VGGFace2 ResNet-50-128,
    LightCNN-29v2, SENet-50-256, VGG-16) with torch-checkpoint converters.

Path conventions mirror the reference package root variables
(reference: python/xfr/__init__.py:7-14).
"""

import os

__version__ = "0.1.0"

# Repo root (directory containing the xfr_tpu package).
xfr_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Dataset locations (overridable via environment).
inpaintgame_dir = os.environ.get(
    "XFR_INPAINTGAME_DIR", os.path.join(xfr_root, "data", "inpainting-game"))
inpaintgame2_dir = inpaintgame_dir
inpaintgame_saliencymaps_dir = os.environ.get(
    "XFR_INPAINTGAME_SMAPS_DIR",
    os.path.join(xfr_root, "data", "inpainting-game-saliency-maps"))
output_dir = os.environ.get("XFR_OUTPUT_DIR", os.path.join(xfr_root, "output"))


def _enable_persistent_compile_cache():
    """XLA compiles of the big EBP programs take minutes on TPU; the
    persistent cache turns every fresh CLI process after the first from
    ~220 s of compiles into seconds.  Opt out with XFR_JAX_CACHE_DIR=''."""
    cache_dir = os.environ.get(
        "XFR_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "xfr_tpu_jax"))
    if not cache_dir:
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
