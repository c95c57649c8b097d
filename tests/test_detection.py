"""Face detector tests: box geometry vs torch/torchvision oracles and a
full random-weights detection pipeline smoke."""

import numpy as np
import pytest
import torch


def _iou_inclusive(a, b):
    """Caffe-convention IoU (+1 widths)."""
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
    inter = ix * iy
    area = lambda bx: (bx[2] - bx[0] + 1) * (bx[3] - bx[1] + 1)
    return inter / (area(a) + area(b) - inter)


def test_nms_invariants():
    from xfr_tpu.detection.boxes import nms

    rng = np.random.RandomState(0)
    xy = rng.rand(60, 2) * 100
    wh = rng.rand(60, 2) * 50 + 5
    boxes = np.hstack([xy, xy + wh])
    scores = rng.rand(60)
    dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)

    keep = nms(dets, 0.5)
    assert keep[0] == scores.argmax()
    assert len(set(keep)) == len(keep)
    # no kept pair overlaps above threshold
    for i in range(len(keep)):
        for j in range(i + 1, len(keep)):
            assert _iou_inclusive(dets[keep[i]], dets[keep[j]]) <= 0.5
    # every suppressed box overlaps a kept, higher-scored box
    for s_idx in set(range(60)) - set(keep):
        assert any(_iou_inclusive(dets[s_idx], dets[k]) > 0.5 and
                   scores[k] >= scores[s_idx] for k in keep)


def test_bbox_transform_roundtrip():
    from xfr_tpu.detection.boxes import bbox_transform_inv

    boxes = np.array([[10., 20., 50., 80.], [0., 0., 100., 100.]])
    # zero deltas reproduce boxes up to the caffe +1 width convention
    # (x2' = x1 + w where w includes +1) — identical to the reference decode
    out = bbox_transform_inv(boxes, np.zeros((2, 4)))
    np.testing.assert_allclose(out, boxes + np.array([0, 0, 1, 1.]),
                               atol=1e-9)
    # dx shifts center by width
    out = bbox_transform_inv(boxes, np.array([[1.0, 0, 0, 0]] * 2))
    np.testing.assert_allclose(out[:, 0] - boxes[:, 0],
                               boxes[:, 2] - boxes[:, 0] + 1)


def test_roi_pool_matches_adaptive_maxpool():
    """torchvision.roi_pool on a quantized ROI == adaptive_max_pool2d on
    the quantized crop (same floor/ceil bin edges)."""
    import torch.nn.functional as F

    from xfr_tpu.detection.boxes import roi_pool

    rng = np.random.RandomState(0)
    feats = rng.randn(1, 8, 32, 40).astype(np.float32)
    rois = np.array([
        [0, 0, 0, 320, 240],
        [0, 64, 32, 200, 180],
        [0, 100, 100, 110, 120],
    ], np.float32)
    got = roi_pool(feats, rois, (7, 7), 1.0 / 16)
    for r in range(rois.shape[0]):
        # torchvision's C++ quantization: std::round = half away from
        # zero (NOT Python/np round-half-to-even — roi 200/16 = 12.5
        # must quantize to 13)
        x1, y1, x2, y2 = [int(np.floor(v / 16.0 + 0.5))
                          for v in rois[r, 1:]]
        x2, y2 = min(x2, 39), min(y2, 31)
        crop = torch.from_numpy(feats[:, :, y1:y2 + 1, x1:x2 + 1])
        ref = F.adaptive_max_pool2d(crop, (7, 7)).numpy()[0]
        np.testing.assert_allclose(got[r], ref, rtol=1e-5, atol=1e-6)


def test_proposal_layer_peak_anchor():
    """A single strong RPN activation yields a proposal at that anchor."""
    from xfr_tpu.detection import boxes as B

    H = W = 20
    A = 9
    cls = np.full((1, 2 * A, H, W), -5.0, np.float32)
    bbox = np.zeros((1, 4 * A, H, W), np.float32)
    # strong foreground for anchor 3 (square 128) at cell (10, 12)
    cls[0, A + 3, 10, 12] = 5.0
    prob = 1 / (1 + np.exp(-cls))
    im_info = [[320.0, 320.0, 1.0]]
    rois = B.proposal_layer(prob, bbox, im_info)
    assert rois.shape[1] == 5
    # top proposal is the clipped anchor-3 box at that cell (zero deltas
    # decode with the caffe +1 convention on x2/y2)
    anchor = B.ANCHORS[3] + np.array([12 * 16, 10 * 16, 12 * 16, 10 * 16])
    expected = np.clip(anchor + np.array([0, 0, 1, 1.]), 0, 319)
    np.testing.assert_allclose(rois[0, 1:], expected, atol=1e-3)


@pytest.mark.slow
def test_detector_pipeline_smoke():
    """Random-weights end-to-end detect(): shapes/flow + rotation fusion."""
    from xfr_tpu.detection import FasterRCNN

    det = FasterRCNN(conf_threshold=-1.0, rotate_flags=0, test_scales=128,
                     max_size=160)
    img = (np.random.RandomState(0).rand(96, 120, 3) * 255).astype(np.uint8)
    out = det(img)
    assert out.ndim == 2 and out.shape[1] == 5
    # widths/heights positive, scores finite
    if len(out):
        assert (out[:, 2] > 0).all() and (out[:, 3] > 0).all()
        assert np.isfinite(out[:, 4]).all()

    out2 = det.detect(img, padding=10)
    assert out2.shape[1] == 5


def test_roi_pool_vectorized_matches_naive():
    """The separable row/col-pooled roi_pool equals the per-bin loop
    (torchvision semantics) on random RoIs incl. degenerate ones."""
    from xfr_tpu.detection.boxes import roi_pool

    rng = np.random.RandomState(0)
    feats = rng.rand(1, 5, 38, 50).astype(np.float32)
    R = 40
    x1 = rng.randint(0, 45, R)
    y1 = rng.randint(0, 34, R)
    rois = np.stack([
        np.zeros(R), x1 * 16.0, y1 * 16.0,
        (x1 + rng.randint(0, 20, R)) * 16.0,
        (y1 + rng.randint(0, 20, R)) * 16.0], axis=1).astype(np.float32)
    rois[-1, 1:] = [799.0, 607.0, 799.0, 607.0]  # 1x1 RoI at the border

    got = roi_pool(feats, rois, (14, 14), 1.0 / 16)

    _, C, H, W = feats.shape
    ph = pw = 14
    want = np.zeros((R, C, ph, pw), np.float32)
    for r in range(R):
        rx1 = int(np.floor(rois[r, 1] / 16 + 0.5))
        ry1 = int(np.floor(rois[r, 2] / 16 + 0.5))
        rx2 = int(np.floor(rois[r, 3] / 16 + 0.5))
        ry2 = int(np.floor(rois[r, 4] / 16 + 0.5))
        bw = max(rx2 - rx1 + 1, 1) / pw
        bh = max(ry2 - ry1 + 1, 1) / ph
        for i in range(ph):
            hs = min(max(ry1 + int(np.floor(i * bh)), 0), H)
            he = min(max(ry1 + int(np.ceil((i + 1) * bh)), 0), H)
            for j in range(pw):
                ws = min(max(rx1 + int(np.floor(j * bw)), 0), W)
                we = min(max(rx1 + int(np.ceil((j + 1) * bw)), 0), W)
                if he > hs and we > ws:
                    want[r, :, i, j] = feats[0, :, hs:he, ws:we].max(
                        axis=(1, 2))
    np.testing.assert_array_equal(got, want)
