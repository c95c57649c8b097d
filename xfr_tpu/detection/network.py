"""Faster R-CNN face detection network as graph IR
(reference: python/strface/strface/detection.py:37-113 and the MMdnn
KitModels in python/strface/models/detection/).

Three parts like the converted Caffe model: bottom = ResNet-101 trunk to
res4 (stride 16), rpn = 3x3 conv + cls/bbox 1x1 heads over 9 anchors,
top = res5 stage + (cls_score[2], bbox_pred[8]) heads over 14x14
roi-pooled features.  Trunk/rpn/top run jitted on device; the proposal
layer and roi pooling run on host like the reference (detection.py:97,
proposals are 300 small boxes).

Layer structure and parameter names follow the readable MMdnn KitModel
sources byte-for-byte (python/strface/models/detection/{bottom,rpn,top}_
layers.py): Caffe branch naming (res2a_branch2a / bn2a_branch2a / ...),
asymmetric right/bottom-padded pool1 (bottom_layers.py forward :227-228),
dilation-2 res5 3x3 convs (top_layers.py forward), BN eps
9.99999974738e-06, heads cls_score_1/bbox_pred_1, rpn_conv_3x3.  A
state_dict extracted from the reference's pickled modules
(torch.load(model).state_dict()) therefore converts mechanically — see
``load_from_torch_state_dicts``.  tests/test_detection_structure.py
cross-checks every conv/bn against the MMdnn sources.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from xfr_tpu.graph import GraphBuilder
from xfr_tpu.ebp import interpreter as I
from xfr_tpu.models.common import init_params
from xfr_tpu.detection import boxes as B

_BN_EPS = 9.99999974738e-06  # MMdnn defs (bottom_layers.py)


def _caffe_block_tags(stage, blocks):
    """Caffe block letters: res2{a,b,c}, res3{a,b1..}, res4{a,b1..b22},
    res5{a,b,c} (bottom_layers.py / top_layers.py attribute names)."""
    if blocks <= 3:
        return ["abc"[b] for b in range(blocks)]
    return ["a"] + ["b%d" % i for i in range(1, blocks)]


def _res_stage(g, x, cin, planes, cout, blocks, stride, stage,
               dilation=1):
    for tag in _caffe_block_tags(stage, blocks):
        s = stride if tag == "a" else 1
        pad = dilation  # 3x3 conv keeps resolution: pad == dilation
        y = g.conv2d(x, cin, planes, 1, stride=s, bias=False,
                     name=f"res{stage}{tag}_branch2a")
        y = g.batchnorm2d(y, planes, eps=_BN_EPS,
                          name=f"bn{stage}{tag}_branch2a")
        y = g.relu(y, inplace=True)
        y = g.conv2d(y, planes, planes, 3, padding=pad, dilation=dilation,
                     bias=False, name=f"res{stage}{tag}_branch2b")
        y = g.batchnorm2d(y, planes, eps=_BN_EPS,
                          name=f"bn{stage}{tag}_branch2b")
        y = g.relu(y, inplace=True)
        y = g.conv2d(y, planes, cout, 1, bias=False,
                     name=f"res{stage}{tag}_branch2c")
        y = g.batchnorm2d(y, cout, eps=_BN_EPS,
                          name=f"bn{stage}{tag}_branch2c")
        if tag == "a":
            r = g.conv2d(x, cin, cout, 1, stride=s, bias=False,
                         name=f"res{stage}{tag}_branch1")
            r = g.batchnorm2d(r, cout, eps=_BN_EPS,
                              name=f"bn{stage}{tag}_branch1")
        else:
            r = x
        x = g.node("add", (y, r), hooked=False, tag="FuncAdd")
        x = g.relu(x, inplace=True)
        cin = cout
    return x, cin


def build_trunk():
    """conv1..res4 (1024 ch, stride 16) — bottom_layers.py KitModel."""
    g = GraphBuilder("frcnn_trunk")
    x = g.conv2d(0, 3, 64, 7, stride=2, padding=3, bias=False, name="conv1")
    x = g.batchnorm2d(x, 64, eps=_BN_EPS, name="bn_conv1")
    x = g.relu(x, inplace=True)
    # pool1: right/bottom-only -inf pad + 3x3/2 pool (bottom_layers.py
    # :227-228) == ceil_mode pooling with no leading pad
    x = g.maxpool2d(x, 3, stride=2, padding=0, ceil_mode=True)
    x, cin = _res_stage(g, x, 64, 64, 256, 3, 1, 2)
    x, cin = _res_stage(g, x, cin, 128, 512, 4, 2, 3)
    x, cin = _res_stage(g, x, cin, 256, 1024, 23, 2, 4)
    return g.finalize(x), g.param_shapes


def build_rpn(num_anchors=9):
    g = GraphBuilder("frcnn_rpn")
    x = g.conv2d(0, 1024, 512, 3, padding=1, name="rpn_conv_3x3")
    x = g.relu(x, inplace=True)
    cls = g.conv2d(x, 512, 2 * num_anchors, 1, name="rpn_cls_score")
    # cls is the graph output; bbox head built in a sibling graph for
    # simplicity of the IR's single-output convention.  The duplicated
    # rpn_conv_3x3 costs nothing at runtime: both graphs run inside ONE
    # jit on identical operands and XLA CSE merges the convs (verified:
    # 4 convolutions in pre-opt stablehlo, 3 after optimization).
    return g.finalize(cls), g.param_shapes


def build_rpn_bbox(num_anchors=9):
    g = GraphBuilder("frcnn_rpn_bbox")
    x = g.conv2d(0, 1024, 512, 3, padding=1, name="rpn_conv_3x3")
    x = g.relu(x, inplace=True)
    bbox = g.conv2d(x, 512, 4 * num_anchors, 1, name="rpn_bbox_pred")
    return g.finalize(bbox), g.param_shapes


def build_top(num_classes=2):
    """res5 (dilation-2 3x3s, stride-2 entry) over 14x14 roi features ->
    7x7 avgpool -> cls/bbox heads (top_layers.py KitModel)."""
    g = GraphBuilder("frcnn_top")
    x, cin = _res_stage(g, 0, 1024, 512, 2048, 3, 2, 5, dilation=2)
    x = g.avgpool2d(x, 7, stride=1)
    x = g.flatten(x)
    cls = g.linear(x, 2048, num_classes, name="cls_score_1")
    bbox = g.linear(x, 2048, 4 * num_classes, name="bbox_pred_1")
    # two heads: expose bbox as output, read cls from its tensor id
    g_out = g.finalize(bbox)
    return g_out, g.param_shapes, cls


def load_from_torch_state_dicts(bottom_sd, rpn_sd, top_sd,
                                dtype=jnp.float32):
    """Convert state_dicts of the reference's three detector modules.

    The reference distributes the detector as whole-module torch pickles
    (strface/detection.py:47-61).  Given those unpickled modules,
    ``module.state_dict()`` keys are the MMdnn attribute names this
    builder uses as parameter names, so conversion is mechanical:

        import torch
        net = FasterRCNNNetwork(params=load_from_torch_state_dicts(
            torch.load(d + '/bottom.pkl').state_dict(),
            torch.load(d + '/rpn.pkl').state_dict(),
            torch.load(d + '/top.pkl').state_dict()))
    """
    from xfr_tpu.models.convert import params_from_state_dict

    trunk_graph, trunk_shapes = build_trunk()
    rpn_graph, rpn_shapes = build_rpn()
    _, rpn_bbox_shapes = build_rpn_bbox()
    rpn_shapes = {**rpn_shapes, **rpn_bbox_shapes}
    _, top_shapes, _ = build_top()
    return {
        "trunk": params_from_state_dict(trunk_shapes, bottom_sd,
                                        dtype=dtype),
        "rpn": params_from_state_dict(rpn_shapes, rpn_sd, dtype=dtype),
        "top": params_from_state_dict(top_shapes, top_sd, dtype=dtype),
    }


class FasterRCNNNetwork:
    """Reference FasterRCNN_Network equivalent (detection.py:37-113).

    __call__(im [1,3,H,W], im_info [[H, W, scale]]) ->
        (rois [R,5], bbox_pred [R,8], cls_prob [R,2], cls_score [R,2])
    """

    def __init__(self, params=None, seed=0):
        self.trunk_graph, trunk_shapes = build_trunk()
        self.rpn_graph, rpn_shapes = build_rpn()
        self.rpn_bbox_graph, rpn_bbox_shapes = build_rpn_bbox()
        rpn_shapes = {**rpn_shapes, **rpn_bbox_shapes}
        self.top_graph, top_shapes, self._cls_tensor = build_top()
        if params is None:
            params = {}
        for part in ("trunk", "rpn", "top"):
            # an explicitly-provided-but-empty part means a conversion
            # matched zero keys: refuse rather than silently running a
            # random-weight detector that returns garbage detections
            if part in params and not params[part]:
                raise ValueError("params[%r] is empty — the checkpoint "
                                 "conversion produced no %s weights"
                                 % (part, part))
        self.params = {
            "trunk": params.get("trunk") or init_params(trunk_shapes,
                                                        seed=seed),
            "rpn": params.get("rpn") or init_params(rpn_shapes,
                                                    seed=seed + 1),
            "top": params.get("top") or init_params(top_shapes,
                                                    seed=seed + 2),
        }
        self._num_anchors = B.ANCHORS.shape[0]
        self._feat_stride = B.FEAT_STRIDE
        self._jit = {}

    def _features_and_rpn(self):
        key = "feat_rpn"
        if key not in self._jit:
            tg, rg, rbg = self.trunk_graph, self.rpn_graph, \
                self.rpn_bbox_graph

            @jax.jit
            def fn(trunk_params, rpn_params, im):
                feats = I.forward_clean(tg, trunk_params, im)[tg.output_id]
                cls = I.forward_clean(rg, rpn_params, feats)[rg.output_id]
                bbox = I.forward_clean(rbg, rpn_params,
                                       feats)[rbg.output_id]
                n, c, h, w = cls.shape
                cls_rs = cls.reshape(n, 2, -1, w)
                prob = jax.nn.softmax(cls_rs, axis=1)
                prob = prob.reshape(n, 2 * self._num_anchors, -1, w)
                return feats, prob, bbox

            self._jit[key] = fn
        return self._jit[key]

    def _top(self):
        key = "top"
        if key not in self._jit:
            tg, cls_t = self.top_graph, self._cls_tensor

            @jax.jit
            def fn(top_params, roi_feats):
                values = I.forward_clean(tg, top_params, roi_feats)
                bbox = values[tg.output_id]
                cls_score = values[cls_t]
                return bbox, jax.nn.softmax(cls_score, axis=1), cls_score

            self._jit[key] = fn
        return self._jit[key]

    def __call__(self, im, im_info):
        im = jnp.asarray(np.asarray(im), jnp.float32)
        feats, prob, bbox = self._features_and_rpn()(
            self.params["trunk"], self.params["rpn"], im)
        rois = B.proposal_layer(np.asarray(prob), np.asarray(bbox), im_info,
                                num_anchors=self._num_anchors,
                                feat_stride=self._feat_stride)
        if rois.shape[0] == 0:
            # degenerate case (e.g. every proposal under min_size): empty
            # detection set instead of a zero-batch top-stage program
            return (rois, np.zeros((0, 8), np.float32),
                    np.zeros((0, 2), np.float32),
                    np.zeros((0, 2), np.float32))
        roi_feats = B.roi_pool(np.asarray(feats), rois, (14, 14), 0.0625)
        bbox_pred, cls_prob, cls_score = self._top()(
            self.params["top"], jnp.asarray(roi_feats))
        return (rois, np.asarray(bbox_pred), np.asarray(cls_prob),
                np.asarray(cls_score))

    # reference exposes _nms on the network object (detection.py:405)
    @staticmethod
    def _nms(dets, thresh):
        return B.nms(dets, thresh)
