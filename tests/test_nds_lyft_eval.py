"""Definition-level hand goldens for the hermetic NuScenes NDS and Lyft
mAP evaluators (the same certification discipline as the Waymo evaluator,
artifacts/waymo_certification.md): every expected value below is computed
BY HAND from the official protocol definitions in the module docstrings —
never by running the code under test.
"""
import numpy as np
import pytest

from tsm_det_pointcloud_tpu.eval.lyft_eval import _iou3d, lyft_evaluation
from tsm_det_pointcloud_tpu.eval.nuscenes_eval import nuscenes_evaluation


def _anno(names, boxes, scores=None, npts=None):
    a = {"name": np.asarray(names, object),
         "boxes_lidar": np.asarray(boxes, np.float64).reshape(-1, 7)}
    if scores is not None:
        a["score"] = np.asarray(scores, np.float64)
    else:
        a["gt_boxes_lidar"] = a.pop("boxes_lidar")
        a["num_lidar_pts"] = (np.asarray(npts) if npts is not None
                              else np.ones(len(names), np.int64))
    return a


CAR = [4.0, 2.0, 1.5]  # dx, dy, dz


def test_nds_perfect_detections():
    """Exact predictions: AP 1.0 at every threshold, all TP errors 0
    except velocity/attribute (undefined for 7-dim boxes -> error curves
    default to ones -> contribution 0), NDS = (5*1 + 1+1+1+0+0)/10 = 0.8."""
    gt = [_anno(["car", "car"],
                [[0, 0, 0] + CAR + [0.3], [10, 5, 0] + CAR + [1.2]])]
    dt = [_anno(["car", "car"],
                [[0, 0, 0] + CAR + [0.3], [10, 5, 0] + CAR + [1.2]],
                scores=[0.9, 0.8])]
    s, ret = nuscenes_evaluation(gt, dt, ["car"])
    assert ret["car_AP"] == pytest.approx(1.0, abs=1e-9)
    assert ret["mAP"] == pytest.approx(1.0, abs=1e-9)
    assert ret["mATE"] == pytest.approx(0.0, abs=1e-9)
    assert ret["mASE"] == pytest.approx(0.0, abs=1e-9)
    assert ret["mAOE"] == pytest.approx(0.0, abs=1e-9)
    assert ret["mAVE"] == pytest.approx(1.0, abs=1e-9)  # undefined -> 1
    assert ret["mAAE"] == pytest.approx(1.0, abs=1e-9)
    assert ret["NDS"] == pytest.approx(0.8, abs=1e-9)


def test_nds_no_detections_and_empty_class():
    gt = [_anno(["car"], [[0, 0, 0] + CAR + [0.0]])]
    dt = [_anno([], np.zeros((0, 7)), scores=[])]
    _, ret = nuscenes_evaluation(gt, dt, ["car", "pedestrian"])
    assert ret["mAP"] == 0.0
    # every TP metric defaults to 1 -> NDS = 0
    assert ret["NDS"] == pytest.approx(0.0, abs=1e-9)


def test_nds_mixed_hand_golden():
    """4 GT cars at x = 0/10/20/30. Preds: TP @ (0.2, 0) s=0.9,
    FP @ (30.5, 20) s=0.8 (closest unmatched GT 20.006 m away),
    TP @ (10, 0.3) s=0.7. Same curves at all four thresholds.

    Hand derivation (module formulas): rec = [.25, .25, .5],
    prec = [1, .5, 2/3]; 101-pt interp (numpy right-fill 0, duplicate-x
    takes the later y): prec(r<0.25) = 1, prec(0.25) = .5, linear to
    2/3 at 0.5, 0 beyond. AP = mean_{i=11..100} clip(p - .1, 0)/.9:
    14*0.9 + 0.4 + sum_{k=1..24}(0.4 + 2/3*0.01k) + 0.56667 = 25.16667
    -> /90/0.9 = 0.31070. mATE over conf curve (TP trans errs 0.2, 0.3,
    cummean [0.2, 0.25] interp on conf): mean_{i=11..50} = 8.975/40 =
    0.224375. ASE = AOE = 0; AVE/AAE undefined -> 1.
    NDS = (5*0.3106996 + (1-0.224375) + 1 + 1 + 0 + 0)/10 = 0.4329123."""
    gt = [_anno(["car"] * 4,
                [[x, 0, 0] + CAR + [0.0] for x in (0, 10, 20, 30)])]
    dt = [_anno(["car"] * 3,
                [[0.2, 0, 0] + CAR + [0.0],
                 [30.5, 20, 0] + CAR + [0.0],
                 [10, 0.3, 0] + CAR + [0.0]],
                scores=[0.9, 0.8, 0.7])]
    _, ret = nuscenes_evaluation(gt, dt, ["car"])
    assert ret["car_AP_0.5"] == pytest.approx(0.3106996, abs=1e-6)
    assert ret["car_AP_4.0"] == pytest.approx(0.3106996, abs=1e-6)
    assert ret["mAP"] == pytest.approx(0.3106996, abs=1e-6)
    assert ret["mATE"] == pytest.approx(0.224375, abs=1e-6)
    assert ret["mASE"] == pytest.approx(0.0, abs=1e-9)
    assert ret["NDS"] == pytest.approx(0.4329123, abs=1e-6)


def test_nds_range_and_points_filters():
    """A GT beyond the 50 m car range and a zero-point GT are excluded;
    a pred beyond range is excluded (doesn't count as FP)."""
    gt = [_anno(["car", "car", "car"],
                [[0, 0, 0] + CAR + [0.0],
                 [60, 0, 0] + CAR + [0.0],       # out of range
                 [10, 0, 0] + CAR + [0.0]],      # zero points
                npts=[5, 5, 0])]
    dt = [_anno(["car", "car"],
                [[0, 0, 0] + CAR + [0.0],
                 [45, 35, 0] + CAR + [0.0]],     # hypot 57 > 50: dropped
                scores=[0.9, 0.8])]
    _, ret = nuscenes_evaluation(gt, dt, ["car"])
    # 1 effective GT, 1 perfect pred, no FP -> AP 1.0
    assert ret["car_AP"] == pytest.approx(1.0, abs=1e-9)


def test_nds_scale_and_orientation_errors():
    """One TP with half-height box and yaw off by 0.3:
    ASE = 1 - (4*2*0.75)/(12 + 6 - 6) = 0.5; AOE = 0.3."""
    gt = [_anno(["car"], [[0, 0, 0, 4, 2, 1.5, 0.0]])]
    dt = [_anno(["car"], [[0, 0, 0, 4, 2, 0.75, 0.3]], scores=[0.9])]
    _, ret = nuscenes_evaluation(gt, dt, ["car"])
    assert ret["mASE"] == pytest.approx(0.5, abs=1e-9)
    assert ret["mAOE"] == pytest.approx(0.3, abs=1e-9)


def test_nds_barrier_period_and_cone_exclusions():
    """Barrier orientation is modulo pi (yaw off by pi -> AOE 0); the
    traffic_cone row contributes nan (excluded) to AOE/AVE/AAE."""
    gt = [_anno(["barrier", "traffic_cone"],
                [[0, 0, 0, 2, 0.5, 1, 0.0], [5, 0, 0, 0.4, 0.4, 1, 0.0]])]
    dt = [_anno(["barrier", "traffic_cone"],
                [[0, 0, 0, 2, 0.5, 1, np.pi], [5, 0, 0, 0.4, 0.4, 1, 2.0]],
                scores=[0.9, 0.9])]
    _, ret = nuscenes_evaluation(gt, dt, ["barrier", "traffic_cone"])
    assert ret["barrier_orient_err"] == pytest.approx(0.0, abs=1e-9)
    assert np.isnan(ret["traffic_cone_orient_err"])
    assert ret["mAOE"] == pytest.approx(0.0, abs=1e-9)  # nanmean


# ---------------------------------------------------------------------------
# Lyft
# ---------------------------------------------------------------------------

def test_lyft_iou3d_shifted_box():
    """2x4 box shifted 1 m along x: inter 3*2*2 = 12, union 16+16-12 = 20
    -> IoU 0.6 exactly."""
    got = _iou3d([1, 0, 0, 4, 2, 2, 0], np.array([[0, 0, 0, 4, 2, 2, 0]]))
    assert got[0] == pytest.approx(0.6, abs=1e-6)


def test_lyft_iou3d_rotated_square():
    """2x2 squares at 0 and 45 deg: intersection is the regular octagon
    8*(sqrt(2)-1); IoU = that over (8 - that) = 1/sqrt(2)."""
    got = _iou3d([0, 0, 0, 2, 2, 1, np.pi / 4],
                 np.array([[0, 0, 0, 2, 2, 1, 0.0]]))
    assert got[0] == pytest.approx(1 / np.sqrt(2), abs=1e-5)


def test_lyft_map_hand_golden():
    """2 GT cars; pred1 exact (IoU 1), pred2 = GT A shifted 1 m (IoU 0.6,
    argmax GT already taken -> FP at EVERY threshold). VOC AP per
    threshold = 0.5*1 + 0.5*0 = 0.5 -> car AP 0.5. The rotated-square
    cyclist pred (IoU 1/sqrt2 = 0.7071) is TP for th <= 0.70 and FP above
    -> AP mean over [0.5..0.95] = 5/10 = 0.5."""
    gt = [_anno(["car", "car", "cyclist"],
                [[0, 0, 0, 4, 2, 2, 0], [10, 0, 0, 4, 2, 2, 0],
                 [20, 0, 0, 2, 2, 1, 0.0]])]
    dt = [_anno(["car", "car", "cyclist"],
                [[0, 0, 0, 4, 2, 2, 0], [1, 0, 0, 4, 2, 2, 0],
                 [20, 0, 0, 2, 2, 1, np.pi / 4]],
                scores=[0.9, 0.8, 0.9])]
    s, ret = lyft_evaluation(gt, dt, ["car", "cyclist"])
    assert ret["car"] == pytest.approx(0.5, abs=1e-6)
    assert ret["cyclist"] == pytest.approx(0.5, abs=1e-6)
    assert ret["mAP"] == pytest.approx(0.5, abs=1e-6)


def test_lyft_greedy_taken_gt_is_fp():
    """Second pred on the SAME GT is an FP even when another GT would
    match above threshold — the reference matches argmax-IoU only
    (recall_precision :301-320), not best-unclaimed."""
    gt = [_anno(["car"], [[0, 0, 0, 4, 2, 2, 0]])]
    dt = [_anno(["car", "car"],
                [[0, 0, 0, 4, 2, 2, 0], [0.1, 0, 0, 4, 2, 2, 0]],
                scores=[0.9, 0.8])]
    _, ret = lyft_evaluation(gt, dt, ["car"], iou_thresholds=[0.5])
    assert ret["car"] == pytest.approx(1.0, abs=1e-6)  # 1 TP then FP tail


def test_lyft_no_gt_class_scores_zero():
    gt = [_anno(["car"], [[0, 0, 0, 4, 2, 2, 0]])]
    dt = [_anno(["car"], [[0, 0, 0, 4, 2, 2, 0]], scores=[0.9])]
    _, ret = lyft_evaluation(gt, dt, ["car", "truck"])
    assert ret["truck"] == 0.0
    assert ret["mAP"] == pytest.approx(0.5, abs=1e-6)
