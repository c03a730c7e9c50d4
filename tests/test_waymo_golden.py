"""Hand-computed golden cases for the Waymo detection metrics
(VERDICT r2 #3 — certification beyond self-comparison).

Every expectation below is derived BY HAND from the official metric
definition (reference: pcdet/datasets/waymo/waymo_eval.py:23-246 wrapping
the waymo_open_dataset TF ops, config :87-106):
  * PR sampled at fixed score cutoffs 0.00..0.99, 1.0, RE-matching the
    surviving detections at each cutoff (TYPE_HUNGARIAN: max total IoU
    over pairs with IoU >= class threshold);
  * AP = step integration after right-max precision smoothing;
  * APH scales BOTH PR numerators by the TP's heading accuracy
    1 - |dtheta|_wrapped / pi;
  * LEVEL_1 ignores L2 gts (difficulty 2 or <= 5 points): detections
    matched to them are dropped (neither TP nor FP); LEVEL_2 counts all;
  * range breakdown buckets gt by gt center range, FP by its own center.

The official pip evaluator cannot be installed here (zero egress); these
definition-level goldens + artifacts/waymo_crosscheck.json are the
certification evidence (see artifacts/waymo_certification.md).
"""
import numpy as np
import pytest

from tsm_det_pointcloud_tpu.eval.waymo_eval import (
    _heading_accuracy,
    hungarian_match,
    iou3d_np,
    waymo_evaluation,
)


def box(x, y=0.0, z=0.0, l=4.0, w=2.0, h=2.0, ry=0.0):
    return [x, y, z, l, w, h, ry]


def gt_anno(boxes, names=None, npts=None, difficulty=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    n = len(boxes)
    return {
        "name": np.asarray(names if names is not None else ["Vehicle"] * n),
        "gt_boxes_lidar": boxes,
        "num_points_in_gt": np.asarray(
            npts if npts is not None else [99] * n),
        "difficulty": np.asarray(
            difficulty if difficulty is not None else [0] * n),
    }


def dt_anno(boxes, scores, names=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    n = len(boxes)
    return {
        "name": np.asarray(names if names is not None else ["Vehicle"] * n),
        "boxes_lidar": boxes,
        "score": np.asarray(scores, np.float32),
    }


def test_identical_same_length_boxes_iou():
    """Axis-aligned 4x2x2 boxes shifted dx along x:
    IoU = (4-dx)/(4+dx) — the anchor identity for the cases below."""
    a = np.asarray([box(0.0)], np.float32)
    for dx, expect in [(0.0, 1.0), (1.0, 3.0 / 5.0), (2.0, 2.0 / 6.0)]:
        b = np.asarray([box(dx)], np.float32)
        assert iou3d_np(a, b)[0, 0] == pytest.approx(expect, abs=1e-4)


def test_ap_one_tp_one_fp_one_miss():
    """1 frame, 2 L1 vehicle gts. det A (score .9) matches gt1 exactly,
    det B (score .8) is off in empty space, gt2 undetected.
    cutoffs < .8: tp=1 fp=1 -> P=.5 R=.5 ; .8<=c<.9: tp=1 fp=0 -> P=1 R=.5;
    c>=.9: nothing. Right-max makes every R=.5 point P=1.
    AP = .5 * 1 = 50."""
    gts = [gt_anno([box(0.0), box(20.0)])]
    dts = [dt_anno([box(0.0), box(40.0)], [0.9, 0.8])]
    _, res = waymo_evaluation(gts, dts, class_names=("Vehicle",))
    assert res["Vehicle/AP_L1"] == pytest.approx(50.0, abs=0.01)
    assert res["Vehicle/AP_L2"] == pytest.approx(50.0, abs=0.01)


def test_aph_heading_error():
    """Single-TP curve with a pi/4 heading error. A rotated RECTANGLE
    would also lose IoU, so use a 2x2 SQUARE (45-deg self-IoU =
    2(sqrt(2)-1)/(2-2(sqrt(2)-1)) ~= .707) under the Cyclist .5
    threshold: still a clean TP, heading accuracy = 1 - (pi/4)/pi = .75.
    AP: P=1, R=1 -> 100. APH: P=.75, R=.75 -> .75*.75 = 56.25."""
    sq = dict(l=2.0, w=2.0)
    gts = [gt_anno([box(0.0, **sq)], names=["Cyclist"])]
    dts = [dt_anno([box(0.0, ry=np.pi / 4, **sq)], [0.9],
                   names=["Cyclist"])]
    iou = iou3d_np(np.asarray(dts[0]["boxes_lidar"]),
                   np.asarray(gts[0]["gt_boxes_lidar"]))
    inter = 8 * (np.sqrt(2) - 1)  # square s=2 rotated 45 deg
    assert iou[0, 0] == pytest.approx(inter / (8 - inter), abs=1e-3)
    _, res = waymo_evaluation(gts, dts, class_names=("Cyclist",))
    assert res["Cyclist/AP_L1"] == pytest.approx(100.0, abs=0.01)
    assert res["Cyclist/APH_L1"] == pytest.approx(56.25, abs=0.01)


def test_aph_pi_flip_zeroes_heading():
    """A pi-flipped det has IDENTICAL geometry (IoU 1, clean Vehicle TP)
    but heading accuracy 0: AP = 100, APH = 0."""
    gts = [gt_anno([box(0.0, ry=0.0)])]
    dts = [dt_anno([box(0.0, ry=np.pi)], [0.9])]
    _, res = waymo_evaluation(gts, dts, class_names=("Vehicle",))
    assert res["Vehicle/AP_L1"] == pytest.approx(100.0, abs=0.01)
    assert res["Vehicle/APH_L1"] == pytest.approx(0.0, abs=0.01)


def test_aph_mixed_fp_curve():
    """TP (score .9, pi/4 heading err on a 2x2 square -> acc .75, Cyclist
    thresh) + FP (score .8) + one missed gt (2 gts total).
    c < .8:    tp=1 tph=.75 fp=1 -> P_h=.375, R_h=.375
    .8<=c<.9:  tp=1 tph=.75 fp=0 -> P_h=.75,  R_h=.375
    APH = .375 * .75 = 28.125 ; AP = .5 * 1 = 50."""
    sq = dict(l=2.0, w=2.0)
    gts = [gt_anno([box(0.0, **sq), box(20.0, **sq)],
                   names=["Cyclist"] * 2)]
    dts = [dt_anno([box(0.0, ry=np.pi / 4, **sq), box(40.0, **sq)],
                   [0.9, 0.8], names=["Cyclist"] * 2)]
    _, res = waymo_evaluation(gts, dts, class_names=("Cyclist",))
    assert res["Cyclist/AP_L1"] == pytest.approx(50.0, abs=0.01)
    assert res["Cyclist/APH_L1"] == pytest.approx(28.125, abs=0.01)


def test_heading_wrap():
    """Heading accuracy wraps |dtheta| into [0, pi]:
    pi vs -pi is the SAME heading (acc 1); 3pi/4 vs -3pi/4 differ by
    pi/2 after wrapping (acc .5); pi flip -> acc 0."""
    assert _heading_accuracy(np.pi, -np.pi) == pytest.approx(1.0)
    assert _heading_accuracy(3 * np.pi / 4, -3 * np.pi / 4) == \
        pytest.approx(0.5)
    assert _heading_accuracy(0.0, np.pi) == pytest.approx(0.0, abs=1e-6)


def test_level_split_ignored_match_drops_out():
    """gt1 is L1, gt2 is L2 (3 points). The only det matches gt2.
    LEVEL_1: the det matches an IGNORED gt -> dropped entirely (no TP, no
    FP); 1 L1 gt unmatched -> recall 0 -> AP_L1 = 0.
    LEVEL_2: tp=1 of 2 gts, no FP -> P=1, R=.5 -> AP_L2 = 50."""
    gts = [gt_anno([box(0.0), box(20.0)], npts=[99, 3])]
    dts = [dt_anno([box(20.0)], [0.9])]
    _, res = waymo_evaluation(gts, dts, class_names=("Vehicle",))
    assert res["Vehicle/AP_L1"] == pytest.approx(0.0, abs=0.01)
    assert res["Vehicle/AP_L2"] == pytest.approx(50.0, abs=0.01)


def test_difficulty_2_marks_level2():
    """difficulty == 2 alone (many points) also makes a gt LEVEL_2."""
    gts = [gt_anno([box(0.0)], npts=[99], difficulty=[2])]
    dts = [dt_anno([box(0.0)], [0.9])]
    _, res = waymo_evaluation(gts, dts, class_names=("Vehicle",))
    assert res["Vehicle/AP_L1"] == pytest.approx(0.0, abs=0.01)  # no L1 gt
    assert res["Vehicle/AP_L2"] == pytest.approx(100.0, abs=0.01)


def test_hungarian_beats_greedy():
    """The case that SEPARATES Hungarian from greedy matching (Cyclist,
    thresh .5). 4x2 boxes, IoU(dx) = (4-dx)/(4+dx):
      gt1 at x=0, gt2 at x=2.2
      det1 at x=0.9 (score .9): IoU gt1 = 3.1/4.9 = .633, gt2 = .509
      det2 at x=-1.0 (score .8): IoU gt1 = .6, gt2 = .111 (< thresh)
    Greedy-by-score: det1->gt1, det2 unmatched -> tp=1 fp=1 -> AP 50.
    Hungarian max-total: det1->gt2 + det2->gt1 (1.109 > .633) -> tp=2 ->
    AP must be 100."""
    gts = [gt_anno([box(0.0), box(2.2)], names=["Cyclist"] * 2)]
    dts = [dt_anno([box(0.9), box(-1.0)], [0.9, 0.8],
                   names=["Cyclist"] * 2)]
    # pin the pairwise IoUs the case is built on
    iou = iou3d_np(np.asarray(dts[0]["boxes_lidar"]),
                   np.asarray(gts[0]["gt_boxes_lidar"]))
    assert iou[0, 0] == pytest.approx(3.1 / 4.9, abs=1e-3)
    assert iou[0, 1] == pytest.approx((4 - 1.3) / (4 + 1.3), abs=1e-3)
    assert iou[1, 0] == pytest.approx(0.6, abs=1e-3)
    assert iou[1, 1] < 0.5
    m = hungarian_match(iou, 0.5)
    assert m.tolist() == [1, 0]  # det1->gt2, det2->gt1
    _, res = waymo_evaluation(gts, dts, class_names=("Cyclist",))
    assert res["Cyclist/AP_L1"] == pytest.approx(100.0, abs=0.01)


def test_rematch_at_cutoff_restores_precision():
    """Re-matching at each cutoff means a LOW-score FP cannot drag AP
    below the recall its high-score prefix achieves: 2 perfect TPs
    (.9/.8) + 1 FP (.7). At cutoff .7 the FP is gone while recall is
    still 1.0 -> right-max precision at R=1 is 1 -> AP = 100."""
    gts = [gt_anno([box(0.0), box(20.0)])]
    dts = [dt_anno([box(0.0), box(20.0), box(40.0)], [0.9, 0.8, 0.7])]
    _, res = waymo_evaluation(gts, dts, class_names=("Vehicle",))
    assert res["Vehicle/AP_L1"] == pytest.approx(100.0, abs=0.01)


def test_range_breakdown_buckets():
    """gt at range 10 -> [0,30), at 40 -> [30,50); both detected
    perfectly; an FP at range 60 (score .7) buckets into [50,inf).
    Per-bucket APs: 100, 100; [50,inf) has no gt -> 0 by convention.
    Overall AP still 100 (cutoff .7 removes the FP at full recall)."""
    gts = [gt_anno([box(10.0), box(40.0)])]
    dts = [dt_anno([box(10.0), box(40.0), box(60.0)], [0.9, 0.8, 0.7])]
    _, res = waymo_evaluation(gts, dts, class_names=("Vehicle",),
                              breakdown_range=True)
    assert res["Vehicle/AP_L1"] == pytest.approx(100.0, abs=0.01)
    assert res["Vehicle_[0,30)/AP_L1"] == pytest.approx(100.0, abs=0.01)
    assert res["Vehicle_[30,50)/AP_L1"] == pytest.approx(100.0, abs=0.01)
    assert res["Vehicle_[50,inf)/AP_L1"] == pytest.approx(0.0, abs=0.01)


def test_score_quantization_to_cutoff_grid():
    """The PR curve only exists at the 101 fixed cutoffs: a detection
    scoring .85 survives cutoffs .00...84 (score > cutoff), exactly like
    one scoring .849 — quantization the official op also exhibits."""
    gts = [gt_anno([box(0.0)])]
    r1 = waymo_evaluation(gts, [dt_anno([box(0.0)], [0.850])],
                          class_names=("Vehicle",))[1]
    r2 = waymo_evaluation(gts, [dt_anno([box(0.0)], [0.849])],
                          class_names=("Vehicle",))[1]
    assert r1["Vehicle/AP_L1"] == pytest.approx(r2["Vehicle/AP_L1"])


def test_iou_threshold_is_strict_per_class():
    """Vehicle threshold .7: an IoU-.6 det is a miss AND an FP ->
    AP = 0; the same geometry as Cyclist (thresh .5) scores 100."""
    g = [gt_anno([box(0.0)])]
    d = [dt_anno([box(1.0)], [0.9])]  # IoU = 3/5 = .6
    _, res = waymo_evaluation(g, d, class_names=("Vehicle",))
    assert res["Vehicle/AP_L1"] == pytest.approx(0.0, abs=0.01)
    g2 = [gt_anno([box(0.0)], names=["Cyclist"])]
    d2 = [dt_anno([box(1.0)], [0.9], names=["Cyclist"])]
    _, res2 = waymo_evaluation(g2, d2, class_names=("Cyclist",))
    assert res2["Cyclist/AP_L1"] == pytest.approx(100.0, abs=0.01)
