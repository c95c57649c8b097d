"""Blackbox (STRise/DISE) saliency demos
(reference: demo/blackbox_demo_subject_{0..3}.ipynb and
blackbox_demo_pittpatt.ipynb, as scripts).

Each demo builds a (probe, ref, gallery) triplet, runs the full STRise
pipeline, and writes the saliency overlay.  ``--custom-bb`` demonstrates
the score-only external-matcher contract (the PittPatt pattern: the scorer
only sees image arrays and returns a similarity matrix —
reference blackbox.py:83-107)."""

import argparse
import os

import numpy as np
import PIL.Image

import xfr_tpu
from xfr_tpu import show
from xfr_tpu.blackbox import STRise

OUTDIR = os.path.dirname(os.path.abspath(__file__))


def _subject_files(subject=0):
    """Use the reference demo triplets if present, else synthesize."""
    for root in (os.environ.get("XFR_DEMO_DATA"),
                 os.path.join(xfr_tpu.xfr_root, "data"),
                 "/root/reference/data"):
        if not root:
            continue
        d = os.path.join(root, "subject_%d" % subject)
        if os.path.isdir(d):
            files = sorted(os.listdir(d))
            probe = [f for f in files if "probe" in f.lower()]
            ref = [f for f in files if "ref" in f.lower()]
            gal = [f for f in files if "gallery" in f.lower()]
            if probe and ref and gal:
                return (os.path.join(d, probe[0]),
                        [os.path.join(d, f) for f in ref],
                        [os.path.join(d, f) for f in gal])
    # synthetic triplet
    rng = np.random.RandomState(subject)
    base = (rng.rand(224, 224, 3) * 60 + 60).astype(np.uint8)
    probe = base.copy()
    probe[40:90, 80:150] = 210
    ref = np.clip(probe.astype(int) + rng.randint(-10, 10, probe.shape),
                  0, 255).astype(np.uint8)
    gal = base.copy()
    gal[40:90, 80:150] = 40
    return probe, [ref], [gal]


def _patch_signature_bb(probes, gallery):
    """Example custom black_box_fn (the PittPatt contract): any function of
    raw images returning a [len(probes), len(gallery)] similarity matrix."""
    def sig(ims):
        out = []
        for im in ims:
            if isinstance(im, str):
                arr = np.asarray(PIL.Image.open(im).convert("RGB"),
                                 np.float64)
            else:
                arr = np.asarray(im, np.float64)
            out.append(arr[40:90, 80:150].mean() / 255.0)
        return np.asarray(out)

    ps, gs = sig(probes), sig(gallery)
    return 1.0 - np.abs(ps[:, None] - gs[None, :])


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--subject", type=int, default=0)
    parser.add_argument("--num-masks", type=int, default=6500)
    parser.add_argument("--custom-bb", action="store_true",
                        help="use the score-only external matcher contract "
                             "instead of the built-in resnet")
    parser.add_argument("--prior", default=None,
                        choices=[None, "mean_ebp", "uniform"])
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    probe, refs, gallery = _subject_files(args.subject)

    if args.custom_bb:
        st = STRise(probe=probe, refs=refs, gallery=gallery,
                    black_box_fn=_patch_signature_bb,
                    prior_type=args.prior or "uniform",
                    num_masks=args.num_masks, seed=args.seed)
        tag = "custom"
    else:
        st = STRise(probe=probe, refs=refs, gallery=gallery,
                    black_box="resnetv6_pytorch",
                    prior_type=args.prior or "mean_ebp",
                    num_masks=args.num_masks, seed=args.seed)
        tag = "resnetv6"

    st.evaluate()

    overlay = show.blend_saliency_map(
        np.asarray(st.probe, np.float32) / 255.0, st.saliency_map)
    out = os.path.join(OUTDIR, "blackbox_demo_subject_%d_%s.jpg"
                       % (args.subject, tag))
    PIL.Image.fromarray(np.uint8(np.clip(overlay, 0, 1) * 255)).save(out)
    print('[blackbox_demo]: saved "%s"' % out)
    print("mask_scores: %d positive of %d"
          % ((st.mask_scores > 0).sum(), len(st.mask_scores)))


if __name__ == "__main__":
    main()
