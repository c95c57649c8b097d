"""Network factory: name -> configured Whitebox engine.

Equivalent of the reference's eval/create_wbnet.py:10-137 (and the older
xfr.utils.create_net, utils.py:416-491): builds the graph, loads weights,
wraps in WhiteboxNetwork/Whitebox with the per-net default subtree mode and
the published match-threshold / Platt-scaling calibration constants.

The original torch checkpoints are git-lfs blobs not vendored here; when a
checkpoint path is missing the factory falls back to deterministic random
weights (seeded by net name) so saliency pipelines and benchmarks run
end-to-end — embeddings are then not face-meaningful, which is fine for
performance work and protocol tests.
"""

from __future__ import annotations

import os
import warnings
import zlib

from xfr_tpu import xfr_root
from xfr_tpu.ebp.engine import Whitebox, WhiteboxNetwork
from xfr_tpu.models import common, convert
from xfr_tpu.models import resnet101 as R101
from xfr_tpu.models import lightcnn as LCNN
from xfr_tpu.models import vggface2 as VF2

WEIGHT_FILES = {
    "resnetv6_pytorch": "models/resnet101_l2_d512_twocrop.pth",
    "resnetv4_pytorch": "models/resnet101v4_28NOV17_train.pth",
    "vggface2_resnet50": "models/resnet50_128_pytorch/resnet50_128.pth",
    "senet50_256": "models/senet50_256_pytorch/senet50_256.pth",
    "lightcnn": "models/LightCNN_29Layers_V2_checkpoint.pth.tar",
}


def _load_or_init(net_name, param_shapes, weights_path, strip_prefix=None,
                  ckpt_key="state_dict", runtime_init=()):
    path = weights_path or os.path.join(
        xfr_root, WEIGHT_FILES.get(net_name, ""))
    if path and os.path.exists(path):
        sd = convert.load_torch_checkpoint(path, strip_prefix=strip_prefix,
                                           key=ckpt_key)
        return convert.params_from_state_dict(param_shapes, sd,
                                              runtime_init=runtime_init)
    warnings.warn(
        f"weights for {net_name} not found at {path!r}; using deterministic "
        "random initialization (embeddings will not be face-meaningful)")
    # stable per-net seed: Python's str hash is salted per process
    # (PYTHONHASHSEED) and would make "deterministic" init differ per run
    seed = zlib.crc32(net_name.encode()) % 2**31
    return common.init_params_device(param_shapes, seed=seed)


def create_wbnet(net_name, device=None, ebp_version=None,
                 ebp_subtree_mode=None, weights_path=None):
    """Build a configured Whitebox for a named matcher
    (reference: eval/create_wbnet.py:10).

    ``device`` is accepted for API compatibility and ignored — placement is
    JAX's job (params live on the default device / follow shardings).
    """
    if ebp_version is not None and ebp_version < 4:
        raise DeprecationWarning("EBP version must be >= 4")

    if net_name in ("resnetv6_pytorch", "resnetv4_pytorch"):
        if ebp_subtree_mode is None:
            ebp_subtree_mode = "norelu"
        graph, shapes, enc = R101.build_resnet101()
        params = _load_or_init(net_name, shapes, weights_path, ckpt_key=None)
        net = WhiteboxNetwork(
            graph, params, encode_tensor=enc, classifier_pname="fc2",
            num_classes=65359, preprocess=R101.preprocess_resnet101,
            embed_dim=512, name=net_name)
        wb = Whitebox(net, ebp_version=ebp_version,
                      ebp_subtree_mode=ebp_subtree_mode)
        if net_name == "resnetv6_pytorch":
            wb.match_threshold = R101.RESNETV6_MATCH_THRESHOLD
            wb.platts_scaling = R101.RESNETV6_PLATTS_SCALING
        else:
            wb.match_threshold = R101.RESNETV4_MATCH_THRESHOLD
            wb.platts_scaling = R101.RESNETV4_PLATTS_SCALING
        return wb

    elif net_name == "vggface2_resnet50":
        if ebp_subtree_mode is None:
            ebp_subtree_mode = "norelu"
        if ebp_version is not None:
            warnings.warn("ebp_version %s is ignored for %s"
                          % (ebp_version, net_name))
        graph, shapes, enc = VF2.build_resnet50_128()
        # the real resnet50_128.pth has NO fc1: the reference constructs
        # it at runtime (whitebox.py:216-229)
        params = _load_or_init(net_name, shapes, weights_path,
                               ckpt_key=None, runtime_init=("fc1",))
        net = WhiteboxNetwork(
            graph, params, encode_tensor=enc, classifier_pname="fc1",
            num_classes=2, preprocess=VF2.preprocess_vggface2,
            embed_dim=128, name=net_name)
        wb = Whitebox(net, ebp_version=ebp_version,
                      ebp_subtree_mode=ebp_subtree_mode)
        wb.match_threshold = VF2.VGGFACE2_MATCH_THRESHOLD
        wb.platts_scaling = VF2.VGGFACE2_PLATTS_SCALING
        return wb

    elif net_name == "senet50_256":
        # Included for encode/embeddings parity; EBP raises on Sigmoid
        # (reference: whitebox.py:403, demo/test_whitebox.py:224).
        graph, shapes, enc = VF2.build_senet50_256()
        params = _load_or_init(net_name, shapes, weights_path,
                               ckpt_key=None, runtime_init=("fc1",))
        net = WhiteboxNetwork(
            graph, params, encode_tensor=enc, classifier_pname="fc1",
            num_classes=2, preprocess=VF2.preprocess_vggface2,
            embed_dim=256, name=net_name)
        return Whitebox(net, ebp_version=ebp_version,
                        ebp_subtree_mode=ebp_subtree_mode or "norelu")

    elif net_name == "lightcnn":
        if ebp_subtree_mode is None:
            ebp_subtree_mode = "affineonly_with_prior"
        graph, shapes, enc = LCNN.build_lightcnn29v2(num_classes=80013)
        params = _load_or_init(net_name, shapes, weights_path,
                               strip_prefix="module.")
        net = WhiteboxNetwork(
            graph, params, encode_tensor=enc, classifier_pname="fc2",
            num_classes=80013, preprocess=LCNN.preprocess_lightcnn,
            embed_dim=256, name=net_name)
        wb = Whitebox(net, ebp_version=ebp_version,
                      ebp_subtree_mode=ebp_subtree_mode)
        wb.match_threshold = LCNN.LIGHTCNN_MATCH_THRESHOLD
        wb.platts_scaling = LCNN.LIGHTCNN_PLATTS_SCALING
        return wb

    raise NotImplementedError(
        'create_wbnet does not implement network "%s"' % net_name)


def create_net(net_name, ebp_version=6, device=None, net_dict=None):
    """Cached net factory mirroring the reference's older
    ``xfr.utils.create_net`` (reference: python/xfr/utils.py:416-491):
    same Whitebox per (name, ebp_version) when a ``net_dict`` cache is
    passed.  The reference's vggface2 branch mistakenly loads the
    resnet101 weights path (utils.py:473-475); here every branch loads its
    own weights via create_wbnet."""
    key = (net_name, ebp_version)
    if net_dict is not None and key in net_dict:
        return net_dict[key]
    wb = create_wbnet(net_name, device=device, ebp_version=ebp_version)
    if net_dict is not None:
        net_dict[key] = wb
    return wb
