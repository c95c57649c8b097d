"""Whitebox saliency demos (reference: demo/test_whitebox.py).

Eleven CPU/TPU scenarios covering every EBP variant and matcher.  Writes
blended saliency overlays next to this script, mirroring the reference's
cached goldens in demo/whitebox/*.jpg.

Data resolution order: --data flag, $XFR_DEMO_DATA, the reference release's
data/ directory if present, else a synthetic face (weights fall back to
deterministic random init when the torch checkpoints are absent, so the
demos always run end-to-end; saliency is then structurally valid but not
face-meaningful).
"""

import argparse
import os

import numpy as np
import PIL.Image

import jax.numpy as jnp

import xfr_tpu
from xfr_tpu import show
from xfr_tpu.models import create_wbnet

OUTDIR = os.path.dirname(os.path.abspath(__file__))


def _data_dir():
    for cand in (os.environ.get("XFR_DEMO_DATA"),
                 os.path.join(xfr_tpu.xfr_root, "data"),
                 "/root/reference/data"):
        if cand and os.path.exists(os.path.join(cand, "demo_face.jpg")):
            return cand
    return None


def _demo_face():
    d = _data_dir()
    if d:
        return PIL.Image.open(os.path.join(d, "demo_face.jpg"))
    rng = np.random.RandomState(0)
    img = (rng.rand(256, 256, 3) * 40 + 80).astype(np.uint8)
    img[60:200, 70:190] = 190            # face
    img[100:120, 95:115] = 60            # left eye
    img[100:120, 150:170] = 60           # right eye
    img[150:180, 120:140] = 120          # nose
    return PIL.Image.fromarray(img)


def _triplet_files(mask="nose"):
    d = _data_dir()
    mask_ids = {"mouth": 1, "nose": 2, "eyes": 4}
    if d:
        ipg = os.path.join(d, "inpainting-game/IJBC/aligned/8/img")
        pat = os.path.join(ipg, "{img}/inpainted/%05d_{kind}.png"
                           % mask_ids[mask])
        files = (pat.format(img=1017, kind="truth"),
                 pat.format(img=1017, kind="out_0"),
                 pat.format(img=1406, kind="truth"))
        if all(os.path.exists(f) for f in files):
            return [PIL.Image.open(f) for f in files]
        files = (os.path.join(d, "n00000001_00000117.JPEG"),
                 os.path.join(d, "n00000002_00000100.JPEG"),
                 os.path.join(d, "n00000001_00000384.JPEG"))
        if all(os.path.exists(f) for f in files):
            return [PIL.Image.open(f) for f in files]
    # synthetic triplet: probe/mate share an identity patch; nonmate differs
    rng = np.random.RandomState(1)
    base = (rng.rand(224, 224, 3) * 40 + 80).astype(np.uint8)
    probe = base.copy()
    probe[40:90, 80:150] = 210
    mate = np.clip(probe.astype(int) + rng.randint(-10, 10, probe.shape),
                   0, 255).astype(np.uint8)
    nonmate = base.copy()
    nonmate[40:90, 80:150] = 40
    return [PIL.Image.fromarray(x) for x in (probe, nonmate, mate)]


def _center_crop_face(im):
    """Detector stand-in: center square crop + 224 resize (the reference
    runs Faster R-CNN here; see xfr_tpu.detection)."""
    im = im.convert("RGB")
    w, h = im.size
    m = min(w, h)
    im = im.crop(((w - m) // 2, (h - m) // 2,
                  (w - m) // 2 + m, (h - m) // 2 + m))
    return im.resize((224, 224))


def _blend(img, smap, scale_factor=1.0, gamma=0.3, blur_sigma=0.05):
    arr = np.array(img.convert("RGB")).astype(np.float32) / 255.0
    out = show.blend_saliency_map(arr, smap, blur_sigma=blur_sigma,
                                  gamma=gamma, scale_factor=scale_factor)
    return PIL.Image.fromarray(np.uint8(np.clip(out, 0, 1) * 255))


def _montage(images, tile=112, cols=None):
    import math

    n = len(images)
    cols = cols or int(math.ceil(math.sqrt(n)))
    rows = int(math.ceil(n / cols))
    canvas = PIL.Image.new("RGB", (cols * (tile + 1), rows * (tile + 1)),
                           (255, 255, 255))
    for i, im in enumerate(images):
        canvas.paste(im.resize((tile, tile)),
                     ((i % cols) * (tile + 1), (i // cols) * (tile + 1)))
    return canvas


def _onehot(wb, k):
    P = np.zeros((1, wb.net.num_classes()), np.float32)
    P[0, k] = 1.0
    return jnp.asarray(P)


def _encode_triplet(wb, mask="nose"):
    im_probe, im_nonmate, im_mate = [_center_crop_face(im)
                                     for im in _triplet_files(mask)]
    x_mate = np.asarray(wb.encode(wb.net.preprocess(im_mate)))
    x_nonmate = np.asarray(wb.encode(wb.net.preprocess(im_nonmate)))
    img_probe = wb.net.preprocess(im_probe)
    img_probe_display = im_probe.resize((112, 112))
    return x_mate, x_nonmate, img_probe, img_probe_display


def _save(name, img):
    out = os.path.join(OUTDIR, name)
    img.save(out)
    print('[test_whitebox.%s]: saved "%s"'
          % (name.replace("test_whitebox_", "").replace(".jpg", ""), out))


def ebp(wb):
    """Excitation backprop (reference: demo/test_whitebox.py:77-92)."""
    x_probe = wb.net.preprocess(_demo_face())
    img_saliency = wb.ebp(x_probe, _onehot(wb, 0))
    _save("test_whitebox_ebp.jpg",
          _blend(_demo_face().resize((112, 112)), img_saliency))


def contrastive_ebp(wb):
    x_probe = wb.net.preprocess(_demo_face())
    s = wb.contrastive_ebp(x_probe, k_poschannel=0, k_negchannel=100)
    _save("test_whitebox_contrastive_ebp.jpg",
          _blend(_demo_face().resize(s.shape), s))


def truncated_contrastive_ebp(wb):
    x_probe = wb.net.preprocess(_demo_face())
    s = wb.truncated_contrastive_ebp(x_probe, k_poschannel=0,
                                     k_negchannel=100, percentile=20)
    _save("test_whitebox_truncated_contrastive_ebp.jpg",
          _blend(_demo_face().resize(s.shape), s))


def triplet_ebp(wb):
    x_mate, x_nonmate, img_probe, disp = _encode_triplet(wb, "nose")
    wb.net.set_triplet_classifier(x_mate / 2500.0, x_nonmate / 2500.0)
    s = wb.ebp(img_probe, _onehot(wb, 0))
    _save("test_whitebox_triplet_ebp.jpg", _blend(disp, s))


def contrastive_triplet_ebp(wb):
    x_mate, x_nonmate, img_probe, disp = _encode_triplet(wb, "nose")
    wb.net.set_triplet_classifier(x_mate / 2500.0, x_nonmate / 2500.0)
    s = wb.contrastive_ebp(img_probe, k_poschannel=0, k_negchannel=1)
    _save("test_whitebox_contrastive_triplet_ebp.jpg", _blend(disp, s))


def truncated_contrastive_triplet_ebp(wb):
    x_mate, x_nonmate, img_probe, disp = _encode_triplet(wb, "nose")
    wb.net.set_triplet_classifier(x_mate / 2500.0, x_nonmate / 2500.0)
    s = wb.truncated_contrastive_ebp(img_probe, k_poschannel=0,
                                     k_negchannel=1, percentile=20)
    _save("test_whitebox_truncated_contrastive_triplet_ebp.jpg",
          _blend(disp, s))


def layerwise_ebp(wb, stride=37):
    """EBP montage starting from each interior layer's argmax node
    (reference: demo/test_whitebox.py:146-169 — deprecated there and
    raises immediately; this is a working re-implementation over a
    strided subset of the event schedule).  Tiles are ordered row-wise by
    layer, approaching the image layer at the bottom right."""
    x_probe = wb.net.preprocess(_demo_face())
    disp = _demo_face().resize((112, 112))
    n = wb._n_events
    ks = list(range(0, n - 1, stride))
    tiles = []
    for k in ks:
        print("[test_layerwise_ebp][%d/%d]: layerwise EBP '%s'"
              % (k, n, wb.P_layername[k]))
        s = wb.layerwise_ebp(x_probe, k_layer=k, k_poschannel=0,
                             mode="argmax", mwp=False)
        tiles.append(_blend(disp, np.float32(s) / max(np.max(s), 1e-12)))
    _save("test_whitebox_layerwise_ebp.jpg", _montage(tiles))


def weighted_subtree_triplet_ebp(wb, topk=64, mask="nose",
                                 max_candidates=None):
    """Weighted subtree EBP + montage of selected subtrees
    (reference: demo/test_whitebox.py:175-201)."""
    x_mate, x_nonmate, img_probe, disp = _encode_triplet(wb, mask)
    wb.net.set_triplet_classifier(x_mate / 2500.0, x_nonmate / 2500.0)
    img_subtree, P_img, P_subtree, k_subtree = wb.weighted_subtree_ebp(
        img_probe, k_poschannel=0, k_negchannel=1, topk=topk,
        do_max_subtree=False, subtree_mode="all",
        do_mated_similarity_gating=True, max_candidates=max_candidates)
    print("[weighted_subtree_triplet_ebp]: selected layers=%s"
          % str(k_subtree))
    tiles = [_blend(disp, np.float32(p) / max(np.max(p), 1e-12))
             for p in P_img + [img_subtree]]
    _save("test_whitebox_weighted_subtree_ebp_topk_%d_mask_%s.jpg"
          % (topk, mask), _montage(tiles))


def ebp_lightcnn():
    wb = create_wbnet("lightcnn", ebp_subtree_mode="affineonly")
    x_probe = wb.net.preprocess(_demo_face())
    s = wb.ebp(x_probe, _onehot(wb, 0), mwp=False)
    _save("test_whitebox_ebp_lightcnn.jpg",
          _blend(_demo_face().resize((128, 128)), s))
    return s


def ebp_resnet50_128():
    wb = create_wbnet("vggface2_resnet50")
    x_probe = wb.net.preprocess(_demo_face())
    s = wb.ebp(x_probe, _onehot(wb, 0), mwp=False)
    _save("test_whitebox_ebp_resnet50_128.jpg",
          _blend(_demo_face().resize((112, 112)), s))
    return s


def ebp_senet50_256():
    """Raises: Sigmoid SE gates are unsupported by EBP
    (reference: demo/test_whitebox.py:224, whitebox.py:403)."""
    wb = create_wbnet("senet50_256")
    x_probe = wb.net.preprocess(_demo_face())
    s = wb.ebp(x_probe, _onehot(wb, 0), mwp=False)
    return s


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", default=None,
                        help="reference data/ directory")
    parser.add_argument("--net", default="resnetv4_pytorch")
    parser.add_argument("--topk", type=int, default=64)
    parser.add_argument("--wsebp-max-candidates", type=int, default=None)
    parser.add_argument("--quick", action="store_true",
                        help="single-mask weighted subtree only")
    args = parser.parse_args(argv)
    if args.data:
        os.environ["XFR_DEMO_DATA"] = args.data

    wb = create_wbnet(args.net)
    ebp(wb)
    contrastive_ebp(wb)
    truncated_contrastive_ebp(wb)
    triplet_ebp(wb)
    contrastive_triplet_ebp(wb)
    truncated_contrastive_triplet_ebp(wb)
    if not args.quick:
        layerwise_ebp(create_wbnet(args.net, ebp_version=5,
                                   ebp_subtree_mode="all"))

    masks = ["nose"] if args.quick else ["nose", "eyes", "mouth"]
    for mask in masks:
        wb2 = create_wbnet(args.net, ebp_version=5)
        weighted_subtree_triplet_ebp(
            wb2, topk=args.topk, mask=mask,
            max_candidates=args.wsebp_max_candidates)

    ebp_resnet50_128()
    ebp_lightcnn()


if __name__ == "__main__":
    main()
