"""strface compatibility surface (reference: python/strface/).

The reference ships a standalone ``strface`` package with face *detection*
(Faster R-CNN) and *recognition* (a duplicate of the STR-Janus ResNet-101,
strface/recognition.py:141-237).  Here both map onto the main framework:

  * detection -> xfr_tpu.detection.FasterRCNN
  * recognition -> the resnet101 graph + encode helpers below

kept as one shim module so reference users find the same entry points.
"""

from __future__ import annotations

import numpy as np

from xfr_tpu.detection import FasterRCNN  # noqa: F401  (re-export)


def resnet101v6(pthfile=None, device=None):
    """Recognition network constructor
    (reference: strface/recognition.py:230-236): ResNet-101+L2 encoder."""
    from xfr_tpu.models import create_wbnet

    return create_wbnet("resnetv6_pytorch", weights_path=pthfile)


def encode_centercrop(wb, img):
    """Single center-crop encoding (reference: strface/test/
    test_recognition.py semantics): PIL/array -> 512-d embedding."""
    x = wb.net.preprocess(img)
    return np.asarray(wb.encode(x))[0]


def encode_centertwocrop_multiscale(wb, img):
    """Two-crop x 3-scale x flip ensemble template encoding
    (reference: eval/datasets/transforms.py:22-33 +
    strface test_recognition): mean of 6 crop embeddings, L2-normalized."""
    from xfr_tpu.data.transforms import (
        resnet101v4_preprocess_twocrop_ensemble)

    import PIL.Image

    if not isinstance(img, PIL.Image.Image):
        img = PIL.Image.fromarray(np.asarray(img))
    x = resnet101v4_preprocess_twocrop_ensemble()(img)
    e = np.asarray(wb.encode(x)).mean(axis=0)
    return e / np.linalg.norm(e)
