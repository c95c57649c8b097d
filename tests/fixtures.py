"""Shared test fixtures: a toy 224x224 Whitebox matcher and a synthetic
mini inpainting-game dataset."""

import os

import numpy as np

import jax.numpy as jnp

from xfr_tpu.graph import GraphBuilder
from xfr_tpu.ebp.engine import Whitebox, WhiteboxNetwork
from xfr_tpu.models.common import init_params


def toy_preprocess(im):
    """uint8/float HWC RGB -> [1,3,224,224] float in [0,1]."""
    from xfr_tpu.utils.image import resize

    arr = np.asarray(im, np.float64)
    if arr.max() > 1.5:
        arr = arr / 255.0
    if arr.shape[:2] != (224, 224):
        arr = resize(arr, (224, 224))
    return jnp.asarray(arr.transpose(2, 0, 1)[None], jnp.float32)


def make_toy_wbnet(num_classes=5, seed=0, subtree_mode="all"):
    """A cheap 224-input matcher exercising the full engine on CPU."""
    g = GraphBuilder("toynet")
    x = g.conv2d(0, 3, 8, 7, stride=4, padding=3, name="conv1")
    x = g.batchnorm2d(x, 8, name="bn1")
    x = g.relu(x, inplace=True)
    x = g.maxpool2d(x, 2)
    x = g.conv2d(x, 8, 16, 3, stride=2, padding=1, name="conv2")
    x = g.relu(x, inplace=True)
    x = g.avgpool2d(x, 14)
    x = g.flatten(x)
    x = g.linear(x, 16, 12, name="fc1")
    x = g.l2normalize(x)
    enc = g.multiply_const(x, 50.0)
    out = g.linear(enc, 12, num_classes, bias=False, name="fc2")
    graph = g.finalize(out)
    params = init_params(g.param_shapes, seed=seed)
    net = WhiteboxNetwork(graph, params, encode_tensor=enc,
                          classifier_pname="fc2", num_classes=num_classes,
                          preprocess=toy_preprocess, embed_dim=12,
                          name="toynet")
    wb = Whitebox(net, ebp_version=6, ebp_subtree_mode=subtree_mode,
                  eps=1e-12)
    wb.match_threshold = 0.9
    wb.platts_scaling = 10.0
    return wb


def make_mini_dataset(root, net_name="toynet", subject_id=1,
                      mask_ids=(2, 5), n_refs=2, seed=0):
    """Synthetic inpainting-game dataset matching the reference layout:

    aligned/{sid}/{base}/inpainted/{mask:05d}_{truth,out_0}.png
    aligned/{sid}/{base}/masks/{mask:05d}.png
    filtered_masks_threshold-{net}.csv, subj-{sid}.csv
    """
    import imageio.v2 as imageio
    import pandas as pd

    rng = np.random.RandomState(seed)
    base_face = (rng.rand(224, 224, 3) * 60 + 60).astype(np.uint8)
    base_face[40:90, 80:150] = 220  # identity patch ("nose")

    rows = []
    subj_rows = []

    def write_item(base, mask_id, region, is_probe):
        d = os.path.join(root, f"aligned/{subject_id}/{base}")
        os.makedirs(os.path.join(d, "inpainted"), exist_ok=True)
        os.makedirs(os.path.join(d, "masks"), exist_ok=True)
        orig = np.clip(base_face.astype(int) +
                       rng.randint(-8, 8, base_face.shape), 0,
                       255).astype(np.uint8)
        twin = orig.copy()
        twin[region] = (rng.rand(3) * 50).astype(np.uint8)  # inpainted
        mask = np.zeros((224, 224), np.uint8)
        mask[region] = 255
        imageio.imwrite(os.path.join(
            d, "inpainted/%05d_truth.png" % mask_id), orig)
        imageio.imwrite(os.path.join(
            d, "inpainted/%05d_out_0.png" % mask_id), twin)
        imageio.imwrite(os.path.join(d, "masks/%05d.png" % mask_id), mask)
        rows.append({
            "SUBJECT_ID": subject_id, "MASK_ID": mask_id,
            "ORIGINAL_BASENAME": base,
            "OriginalFile": f"aligned/{subject_id}/{base}/inpainted/"
                            f"{mask_id:05d}_truth.png",
            "InpaintingFile": f"aligned/{subject_id}/{base}/inpainted/"
                              f"{mask_id:05d}_out_0.png",
            "TRIPLET_SET": "PROBE" if is_probe else "REF"})
        subj_rows.append({"SUBJECT_ID": subject_id,
                          "ORIGINAL_FILE": base + ".jpg",
                          "TRIPLET_SET": "PROBE" if is_probe else "REF"})

    region = np.s_[40:90, 80:150]
    for mask_id in mask_ids:
        for r in range(n_refs):
            write_item(f"img/ref{r}", mask_id, region, is_probe=False)
        write_item("img/p1", mask_id, region, is_probe=True)

    pd.DataFrame(rows).to_csv(
        os.path.join(root, f"filtered_masks_threshold-{net_name}.csv"),
        index=False)
    pd.DataFrame(subj_rows).to_csv(
        os.path.join(root, f"subj-{subject_id}.csv"), index=False)
    return rows
