"""KITTI eval protocol tests: rotated IoU vs analytic/Monte-Carlo oracles,
and AP sanity (perfect detections -> 100, misses lower it)."""
import numpy as np

from tsm_det_pointcloud_tpu.eval.rotate_iou_np import rotate_iou_np
from tsm_det_pointcloud_tpu.eval.kitti_eval import (
    d3_box_overlap,
    get_official_eval_result,
    image_box_overlap,
)


def test_rotate_iou_axis_aligned():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    iou = rotate_iou_np(a, b)
    np.testing.assert_allclose(iou[0, 0], 2.0 / 6.0, atol=1e-5)


def test_rotate_iou_identical_and_disjoint():
    a = np.array([[0.0, 0.0, 2.0, 1.0, 0.5], [5.0, 5.0, 1.0, 1.0, 1.0]])
    iou = rotate_iou_np(a, a)
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-5)
    assert iou[0, 1] == 0.0


def test_rotate_iou_45_degrees():
    # unit square vs itself rotated 45deg: octagon intersection,
    # area = 2*(sqrt(2)-1), union = 2 - area
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    np.testing.assert_allclose(rotate_iou_np(a, b)[0, 0], expect, atol=1e-4)


def test_rotate_iou_monte_carlo():
    rng = np.random.RandomState(0)
    boxes_a = np.stack([
        rng.uniform(-1, 1, 8), rng.uniform(-1, 1, 8),
        rng.uniform(0.5, 3, 8), rng.uniform(0.5, 3, 8),
        rng.uniform(-np.pi, np.pi, 8),
    ], 1)
    boxes_b = np.stack([
        rng.uniform(-1, 1, 8), rng.uniform(-1, 1, 8),
        rng.uniform(0.5, 3, 8), rng.uniform(0.5, 3, 8),
        rng.uniform(-np.pi, np.pi, 8),
    ], 1)
    iou = rotate_iou_np(boxes_a, boxes_b)

    # Monte-Carlo oracle
    pts = rng.uniform(-3.5, 3.5, (200000, 2))

    def inside(box, p):
        c, s = np.cos(-box[4]), np.sin(-box[4])
        q = p - box[:2]
        local = np.stack([q[:, 0] * c - q[:, 1] * s,
                          q[:, 0] * s + q[:, 1] * c], 1)
        return (np.abs(local[:, 0]) <= box[2] / 2) & (np.abs(local[:, 1]) <= box[3] / 2)

    area = 7.0 * 7.0
    for i in range(8):
        for j in range(8):
            ina = inside(boxes_a[i], pts)
            inb = inside(boxes_b[j], pts)
            inter = (ina & inb).mean() * area
            union = (ina | inb).mean() * area
            mc = inter / max(union, 1e-9)
            assert abs(mc - iou[i, j]) < 0.03, (i, j, mc, iou[i, j])


def test_d3_overlap_identical():
    # (x, y, z, l, h, w, ry) camera frame, y = bottom
    b = np.array([[1.0, 1.0, 10.0, 4.0, 1.5, 1.8, 0.3]])
    np.testing.assert_allclose(d3_box_overlap(b, b)[0, 0], 1.0, atol=1e-5)


def test_image_box_overlap():
    a = np.array([[0, 0, 10, 10]], np.float64)
    b = np.array([[5, 0, 15, 10]], np.float64)
    np.testing.assert_allclose(image_box_overlap(a, b)[0, 0], 50 / 150, atol=1e-6)


def _make_anno(boxes_cam, names, scores=None, heights=50.0):
    """boxes_cam: (N, 7) x y z l h w ry. Image bbox synthesized tall enough
    to pass every difficulty gate."""
    n = len(boxes_cam)
    anno = {
        "name": np.asarray(names),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n, np.int64),
        "alpha": np.full(n, -10.0) if scores is not None else np.zeros(n),
        "bbox": np.tile(np.array([100.0, 100.0, 200.0, 100.0 + heights]), (n, 1)),
        "dimensions": boxes_cam[:, 3:6].reshape(-1, 3),
        "location": boxes_cam[:, 0:3].reshape(-1, 3),
        "rotation_y": boxes_cam[:, 6].reshape(-1),
    }
    if scores is not None:
        anno["score"] = np.asarray(scores, np.float64)
    return anno


def test_ap_perfect_detection():
    # >= 41 total gts so the official 41-point threshold grid fills
    # (with fewer gts the protocol itself yields AP << 100)
    rng = np.random.RandomState(1)
    gt_annos, dt_annos = [], []
    for img in range(20):
        n = rng.randint(3, 5)
        boxes = np.stack([
            rng.uniform(-10, 10, n), rng.uniform(1, 2, n),
            rng.uniform(5, 40, n), rng.uniform(3.5, 4.5, n),
            rng.uniform(1.4, 1.8, n), rng.uniform(1.5, 1.9, n),
            rng.uniform(-np.pi, np.pi, n),
        ], 1)
        gt_annos.append(_make_anno(boxes, ["Car"] * n))
        dt_annos.append(_make_anno(boxes, ["Car"] * n, scores=rng.uniform(0.5, 1, n)))
    result, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])
    assert ret["Car_3d/moderate_R40"] > 99.9, result
    assert ret["Car_3d/easy"] > 99.9
    assert ret["Car_bev/hard_R40"] > 99.9


def test_ap_half_missed():
    """Detect only every other gt -> recall 0.5 -> R40 AP ~50."""
    rng = np.random.RandomState(2)
    gt_annos, dt_annos = [], []
    for img in range(10):
        boxes = np.stack([
            np.linspace(-20, 20, 4), np.full(4, 1.5), np.linspace(10, 40, 4),
            np.full(4, 4.0), np.full(4, 1.5), np.full(4, 1.8), np.zeros(4),
        ], 1)
        gt_annos.append(_make_anno(boxes, ["Car"] * 4))
        dt_annos.append(
            _make_anno(boxes[::2], ["Car"] * 2, scores=rng.uniform(0.5, 1, 2))
        )
    _, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])
    assert 40 < ret["Car_3d/moderate_R40"] < 60


def test_ap_false_positives_reduce_precision():
    rng = np.random.RandomState(3)
    gt_annos, dt_annos = [], []
    for img in range(15):
        boxes = np.stack([
            np.linspace(-20, 20, 3), np.full(3, 1.5), np.linspace(10, 40, 3),
            np.full(3, 4.0), np.full(3, 1.5), np.full(3, 1.8), np.zeros(3),
        ], 1)
        gt_annos.append(_make_anno(boxes, ["Car"] * 3))
        fp = boxes.copy()
        fp[:, 0] += 100.0  # far away -> all false positives
        det = np.concatenate([boxes, fp], 0)
        # FP scores interleaved with TP scores — FPs strictly below every
        # TP score never hurt the official metric (thresholds are TP scores)
        dt_annos.append(
            _make_anno(det, ["Car"] * 6, scores=rng.uniform(0.5, 1.0, 6))
        )
    _, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])
    assert 40 < ret["Car_3d/moderate_R40"] < 95


def test_van_ignored_for_car():
    """Van gts are neither TP nor FN for Car eval; detections matched to
    them are silently absorbed (not FPs)."""
    rng = np.random.RandomState(4)
    gt_annos, dt_annos = [], []
    for img in range(15):
        cars = np.stack([
            np.linspace(-20, 20, 3), np.full(3, 1.5), np.linspace(10, 40, 3),
            np.full(3, 4.0), np.full(3, 1.5), np.full(3, 1.8), np.zeros(3),
        ], 1)
        van = np.array([[5.0, 1.5, 50.0, 4.0, 1.5, 1.8, 0.0]])
        gt_annos.append(
            _make_anno(np.concatenate([cars, van]), ["Car"] * 3 + ["Van"])
        )
        # detect everything as Car, van dets included
        dt_annos.append(_make_anno(
            np.concatenate([cars, van]), ["Car"] * 4,
            scores=rng.uniform(0.5, 1, 4),
        ))
    _, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])
    assert ret["Car_3d/moderate_R40"] > 99.9
