"""Faster R-CNN face detection network as graph IR
(reference: python/strface/strface/detection.py:37-113 and the MMdnn
KitModels in python/strface/models/detection/).

Three parts like the converted Caffe model: bottom = ResNet-101 trunk to
res4 (stride 16), rpn = 3x3 conv + cls/bbox 1x1 heads over 9 anchors,
top = res5 stage + (cls_score[2], bbox_pred[8]) heads over 14x14
roi-pooled features.  Trunk/rpn/top run jitted on device; the proposal
layer and roi pooling run on host like the reference (detection.py:97,
proposals are 300 small boxes).

The reference ships whole-module torch pickles (not state dicts), which
cannot be converted mechanically; weights here come from a provided
state_dict with matching names or deterministic random init.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from xfr_tpu.graph import GraphBuilder
from xfr_tpu.ebp import interpreter as I
from xfr_tpu.models.common import init_params
from xfr_tpu.detection import boxes as B


def _res_stage(g, x, cin, planes, cout, blocks, stride, prefix):
    for b in range(blocks):
        s = stride if b == 0 else 1
        y = g.conv2d(x, cin, planes, 1, stride=s, bias=False,
                     name=f"{prefix}.{b}.conv1")
        y = g.batchnorm2d(y, planes, name=f"{prefix}.{b}.bn1")
        y = g.relu(y, inplace=True)
        y = g.conv2d(y, planes, planes, 3, padding=1, bias=False,
                     name=f"{prefix}.{b}.conv2")
        y = g.batchnorm2d(y, planes, name=f"{prefix}.{b}.bn2")
        y = g.relu(y, inplace=True)
        y = g.conv2d(y, planes, cout, 1, bias=False,
                     name=f"{prefix}.{b}.conv3")
        y = g.batchnorm2d(y, cout, name=f"{prefix}.{b}.bn3")
        if b == 0:
            r = g.conv2d(x, cin, cout, 1, stride=s, bias=False,
                         name=f"{prefix}.{b}.downsample.0")
            r = g.batchnorm2d(r, cout, name=f"{prefix}.{b}.downsample.1")
        else:
            r = x
        x = g.node("add", (y, r), hooked=False, tag="FuncAdd")
        x = g.relu(x, inplace=True)
        cin = cout
    return x, cin


def build_trunk():
    """conv1..res4 (1024 ch, stride 16)."""
    g = GraphBuilder("frcnn_trunk")
    x = g.conv2d(0, 3, 64, 7, stride=2, padding=3, bias=False, name="conv1")
    x = g.batchnorm2d(x, 64, name="bn1")
    x = g.relu(x, inplace=True)
    x = g.maxpool2d(x, 3, stride=2, padding=1, ceil_mode=True)
    x, cin = _res_stage(g, x, 64, 64, 256, 3, 1, "layer1")
    x, cin = _res_stage(g, x, cin, 128, 512, 4, 2, "layer2")
    x, cin = _res_stage(g, x, cin, 256, 1024, 23, 2, "layer3")
    return g.finalize(x), g.param_shapes


def build_rpn(num_anchors=9):
    g = GraphBuilder("frcnn_rpn")
    x = g.conv2d(0, 1024, 512, 3, padding=1, name="rpn_conv")
    x = g.relu(x, inplace=True)
    cls = g.conv2d(x, 512, 2 * num_anchors, 1, name="rpn_cls_score")
    # cls is the graph output; bbox head built in a sibling graph for
    # simplicity of the IR's single-output convention.
    return g.finalize(cls), g.param_shapes


def build_rpn_bbox(num_anchors=9):
    g = GraphBuilder("frcnn_rpn_bbox")
    x = g.conv2d(0, 1024, 512, 3, padding=1, name="rpn_conv")
    x = g.relu(x, inplace=True)
    bbox = g.conv2d(x, 512, 4 * num_anchors, 1, name="rpn_bbox_pred")
    return g.finalize(bbox), g.param_shapes


def build_top(num_classes=2):
    """res5 over 14x14 roi features -> global avgpool -> cls/bbox heads."""
    g = GraphBuilder("frcnn_top")
    x, cin = _res_stage(g, 0, 1024, 512, 2048, 3, 2, "layer4")
    x = g.avgpool2d(x, 7, stride=1)
    x = g.flatten(x)
    cls = g.linear(x, 2048, num_classes, name="cls_score")
    bbox = g.linear(x, 2048, 4 * num_classes, name="bbox_pred")
    # two heads: expose bbox as output, read cls from its tensor id
    g_out = g.finalize(bbox)
    return g_out, g.param_shapes, cls


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
        roi_feats = B.roi_pool(np.asarray(feats), rois, (14, 14), 0.0625)
        bbox_pred, cls_prob, cls_score = self._top()(
            self.params["top"], jnp.asarray(roi_feats))
        return (rois, np.asarray(bbox_pred), np.asarray(cls_prob),
                np.asarray(cls_score))

    # reference exposes _nms on the network object (detection.py:405)
    @staticmethod
    def _nms(dets, thresh):
        return B.nms(dets, thresh)
