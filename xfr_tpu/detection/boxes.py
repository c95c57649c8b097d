"""Box geometry: anchors, transforms, NMS
(reference: python/strface/strface/detection.py:115-295).

Caffe Faster R-CNN conventions (+1 widths, inclusive coords).
"""

from __future__ import annotations

import numpy as np

# generate_anchors(scales=(8,16,32)), 3 aspect ratios x 3 scales, stride 16
# (reference: detection.py:66-76).
ANCHORS = np.array([
    [-84., -40., 99., 55.],
    [-176., -88., 191., 103.],
    [-360., -184., 375., 199.],
    [-56., -56., 71., 71.],
    [-120., -120., 135., 135.],
    [-248., -248., 263., 263.],
    [-36., -80., 51., 95.],
    [-80., -168., 95., 183.],
    [-168., -344., 183., 359.],
])
FEAT_STRIDE = 16


def shifted_anchors(height, width, feat_stride=FEAT_STRIDE, anchors=ANCHORS):
    """All anchors shifted over the feature grid -> [H*W*A, 4]
    (rows ordered (h, w, a))."""
    shift_x = np.arange(0, width) * feat_stride
    shift_y = np.arange(0, height) * feat_stride
    shift_x, shift_y = np.meshgrid(shift_x, shift_y)
    shifts = np.vstack((shift_x.ravel(), shift_y.ravel(),
                        shift_x.ravel(), shift_y.ravel())).transpose()
    A = anchors.shape[0]
    K = shifts.shape[0]
    out = (anchors.reshape((1, A, 4)) +
           shifts.reshape((1, K, 4)).transpose((1, 0, 2)))
    return out.reshape((K * A, 4))


def bbox_transform_inv(boxes, deltas):
    """Decode box regression deltas (detection.py:210-241)."""
    if boxes.shape[0] == 0:
        return np.zeros((0, deltas.shape[1]), dtype=deltas.dtype)
    boxes = boxes.astype(deltas.dtype, copy=False)
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights

    dx = deltas[:, 0::4]
    dy = deltas[:, 1::4]
    dw = deltas[:, 2::4]
    dh = deltas[:, 3::4]

    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = np.exp(dw) * widths[:, None]
    pred_h = np.exp(dh) * heights[:, None]

    pred = np.zeros(deltas.shape, dtype=deltas.dtype)
    pred[:, 0::4] = pred_ctr_x - 0.5 * pred_w
    pred[:, 1::4] = pred_ctr_y - 0.5 * pred_h
    pred[:, 2::4] = pred_ctr_x + 0.5 * pred_w
    pred[:, 3::4] = pred_ctr_y + 0.5 * pred_h
    return pred


def clip_boxes(boxes, im_shape):
    """Clip to image bounds (detection.py:243-254)."""
    boxes[:, 0::4] = np.maximum(np.minimum(boxes[:, 0::4],
                                           im_shape[1] - 1), 0)
    boxes[:, 1::4] = np.maximum(np.minimum(boxes[:, 1::4],
                                           im_shape[0] - 1), 0)
    boxes[:, 2::4] = np.maximum(np.minimum(boxes[:, 2::4],
                                           im_shape[1] - 1), 0)
    boxes[:, 3::4] = np.maximum(np.minimum(boxes[:, 3::4],
                                           im_shape[0] - 1), 0)
    return boxes


def filter_boxes(boxes, min_size):
    ws = boxes[:, 2] - boxes[:, 0] + 1
    hs = boxes[:, 3] - boxes[:, 1] + 1
    return np.where((ws >= min_size) & (hs >= min_size))[0]


def nms(dets, thresh):
    """Greedy IoU NMS (detection.py:265-295)."""
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    scores = dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[np.where(ovr <= thresh)[0] + 1]
    return keep


def proposal_layer(rpn_cls_prob, rpn_bbox_pred, im_info, num_anchors=9,
                   feat_stride=FEAT_STRIDE, anchors=ANCHORS,
                   pre_nms_topN=6000, post_nms_topN=300, nms_thresh=0.7,
                   min_size=3):
    """RPN proposal layer (detection.py:115-208).  Host numpy, like the
    reference (small: 6000 boxes)."""
    assert rpn_cls_prob.shape[0] == 1
    scores = np.asarray(rpn_cls_prob)[:, num_anchors:, :, :]
    bbox_deltas = np.asarray(rpn_bbox_pred)
    im_height, im_width, im_scale = [float(v) for v in im_info[0]]

    height, width = scores.shape[-2:]
    all_anchors = shifted_anchors(height, width, feat_stride, anchors)

    bbox_deltas = bbox_deltas.transpose((0, 2, 3, 1)).reshape((-1, 4))
    scores = scores.transpose((0, 2, 3, 1)).reshape((-1, 1))

    proposals = bbox_transform_inv(all_anchors, bbox_deltas)
    proposals = clip_boxes(proposals, (im_height, im_width))
    keep = filter_boxes(proposals, min_size * im_scale)
    proposals = proposals[keep, :]
    scores = scores[keep]

    order = scores.ravel().argsort()[::-1]
    if pre_nms_topN > 0:
        order = order[:pre_nms_topN]
    proposals = proposals[order, :]
    scores = scores[order]

    keep = nms(np.hstack((proposals, scores)), nms_thresh)
    if post_nms_topN > 0:
        keep = keep[:post_nms_topN]
    proposals = proposals[keep, :]

    batch_inds = np.zeros((proposals.shape[0], 1), dtype=np.float32)
    return np.hstack((batch_inds, proposals.astype(np.float32, copy=False)))


def roi_pool(features, rois, output_size=(14, 14), spatial_scale=0.0625):
    """torchvision.ops.roi_pool semantics in numpy
    (detection.py:101 equivalent).

    features: [1, C, H, W]; rois: [R, 5] (batch_idx, x1, y1, x2, y2).
    """
    feats = np.asarray(features)
    _, C, H, W = feats.shape
    R = rois.shape[0]
    ph, pw = output_size
    out = np.zeros((R, C, ph, pw), feats.dtype)
    for r in range(R):
        x1 = int(round(rois[r, 1] * spatial_scale))
        y1 = int(round(rois[r, 2] * spatial_scale))
        x2 = int(round(rois[r, 3] * spatial_scale))
        y2 = int(round(rois[r, 4] * spatial_scale))
        roi_w = max(x2 - x1 + 1, 1)
        roi_h = max(y2 - y1 + 1, 1)
        bin_w = roi_w / pw
        bin_h = roi_h / ph
        for i in range(ph):
            hstart = min(max(y1 + int(np.floor(i * bin_h)), 0), H)
            hend = min(max(y1 + int(np.ceil((i + 1) * bin_h)), 0), H)
            for j in range(pw):
                wstart = min(max(x1 + int(np.floor(j * bin_w)), 0), W)
                wend = min(max(x1 + int(np.ceil((j + 1) * bin_w)), 0), W)
                if hend > hstart and wend > wstart:
                    out[r, :, i, j] = feats[0, :, hstart:hend,
                                            wstart:wend].max(axis=(1, 2))
    return out
