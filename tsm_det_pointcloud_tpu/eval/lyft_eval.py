"""Hermetic Lyft 3D-detection mAP (official protocol, numpy).

Rebuilds the reference's vendored Lyft toolkit evaluator
(pcdet/datasets/lyft/lyft_mAP_eval/lyft_eval.py, itself from the Lyft
nuscenes-devkit fork) without shapely/pyquaternion:

* IoU: true rotated 3D IoU — BEV polygon intersection x z-overlap over
  union (lyft_eval.py Box3D.get_iou :169-195). The BEV intersection uses
  this repo's polygon-clipping rotated-IoU kernel (eval/rotate_iou_np,
  criterion 0 -> intersection / area_a).
* Matching (recall_precision :272-342): predictions of a class pooled
  over all samples, sorted by score descending; each pred takes the
  single argmax-IoU GT of its sample (over ALL of that class's GT,
  including already-taken ones); TP iff max IoU > threshold AND that GT
  is unclaimed, else FP.
* AP: VOC-style all-point interpolation — precision envelope, area under
  the PR curve with (0,0)/(1,0) sentinels (get_ap :243-264).
* Score: per-class AP = mean over the IoU threshold list (the shipped
  configs use [0.5 .. 0.95] in 0.05 steps); mAP = mean over classes
  (get_average_precisions :345-394; format_lyft_results in
  lyft_utils.py:319-332).

Anno schema (repo-standard host-eval dicts): gt name/gt_boxes_lidar,
dt name/score/boxes_lidar; boxes (x, y, z, dx, dy, dz, yaw) lidar frame.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

from .rotate_iou_np import rotate_iou_np


def _iou3d(box, gt_boxes):
    """(7,) vs (N, 7) rotated 3D IoU, z-extent overlap x BEV polygon."""
    a = np.asarray(box, np.float64).reshape(1, 7)
    b = np.asarray(gt_boxes, np.float64).reshape(-1, 7)
    # BEV intersection area: criterion 0 = inter / area_a
    bev_a = a[:, [0, 1, 3, 4, 6]]
    bev_b = b[:, [0, 1, 3, 4, 6]]
    inter_ratio = rotate_iou_np(bev_a, bev_b, criterion=0)[0]
    inter_area = inter_ratio * (a[0, 3] * a[0, 4])
    zmin = np.maximum(a[0, 2] - a[0, 5] / 2, b[:, 2] - b[:, 5] / 2)
    zmax = np.minimum(a[0, 2] + a[0, 5] / 2, b[:, 2] + b[:, 5] / 2)
    inter = inter_area * np.maximum(zmax - zmin, 0.0)
    vol_a = float(np.prod(a[0, 3:6]))
    vol_b = np.prod(b[:, 3:6], axis=-1)
    union = vol_a + vol_b - inter
    return np.clip(inter / np.maximum(union, 1e-12), 0.0, 1.0)


def _get_ap(recalls, precisions):
    """VOC all-point AP with envelope (reference get_ap :243-264)."""
    rec = np.concatenate(([0.0], recalls, [1.0]))
    prec = np.concatenate(([0.0], precisions, [0.0]))
    for i in range(prec.size - 1, 0, -1):
        prec[i - 1] = np.maximum(prec[i - 1], prec[i])
    idx = np.where(rec[1:] != rec[:-1])[0]
    return float(np.sum((rec[idx + 1] - rec[idx]) * prec[idx + 1]))


def _recall_precision(gt, preds, iou_thresholds):
    """One class: gt/preds are lists of (sample, box7[, score]) records.
    Returns the per-threshold AP list (reference recall_precision)."""
    num_gts = len(gt)
    if num_gts == 0:
        return None
    gts_by_sample = defaultdict(list)
    for s, box in gt:
        gts_by_sample[s].append(box)
    gts_by_sample = {s: np.stack(v) for s, v in gts_by_sample.items()}
    checked = {s: np.zeros((len(v), len(iou_thresholds)))
               for s, v in gts_by_sample.items()}
    preds = sorted(preds, key=lambda r: -r[2])
    tp = np.zeros((len(preds), len(iou_thresholds)))
    fp = np.zeros((len(preds), len(iou_thresholds)))
    for pi, (s, box, _) in enumerate(preds):
        gt_boxes = gts_by_sample.get(s)
        if gt_boxes is None:
            fp[pi, :] = 1.0
            continue
        overlaps = _iou3d(box, gt_boxes)
        jmax = int(np.argmax(overlaps))
        max_overlap = float(overlaps[jmax])
        for ti, th in enumerate(iou_thresholds):
            if max_overlap > th:
                if checked[s][jmax, ti] == 0:
                    tp[pi, ti] = 1.0
                    checked[s][jmax, ti] = 1
                else:
                    fp[pi, ti] = 1.0
            else:
                fp[pi, ti] = 1.0
    tp = np.cumsum(tp, axis=0)
    fp = np.cumsum(fp, axis=0)
    recalls = tp / float(num_gts)
    precisions = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return [_get_ap(recalls[:, i], precisions[:, i])
            for i in range(len(iou_thresholds))]


def lyft_evaluation(gt_annos, det_annos, class_names,
                    iou_thresholds=(0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8,
                                    0.85, 0.9, 0.95), version="trainval"):
    """Official Lyft mAP over per-sample anno dicts. Returns
    (result_str, dict) shaped like the reference's format_lyft_results."""
    assert len(gt_annos) == len(det_annos), \
        f"sample count mismatch: {len(gt_annos)} gt vs {len(det_annos)} dt"
    gt_by_class = defaultdict(list)
    dt_by_class = defaultdict(list)
    for si, (ga, da) in enumerate(zip(gt_annos, det_annos)):
        g_names = np.asarray(ga.get("name", []), object)
        g_boxes = np.asarray(
            ga.get("gt_boxes_lidar", ga.get("boxes_lidar",
                                            np.zeros((0, 7)))), np.float64)
        for i, n in enumerate(g_names):
            gt_by_class[str(n)].append((si, g_boxes[i, :7]))
        d_names = np.asarray(da.get("name", []), object)
        d_boxes = np.asarray(da.get("boxes_lidar", np.zeros((0, 7))),
                             np.float64)
        d_scores = np.asarray(da.get("score", np.ones(len(d_names))),
                              np.float64)
        for i, n in enumerate(d_names):
            dt_by_class[str(n)].append((si, d_boxes[i, :7],
                                        float(d_scores[i])))

    iou_thresholds = [float(t) for t in iou_thresholds]
    classwise_ap = np.zeros(len(class_names))
    for ci, cls in enumerate(class_names):
        if cls in dt_by_class and cls in gt_by_class:
            ap_list = _recall_precision(
                gt_by_class[cls], dt_by_class[cls], iou_thresholds)
            if ap_list is not None:
                classwise_ap[ci] = float(np.mean(ap_list))

    ret = {}
    result = f"----------------Lyft {version} results-----------------\n"
    result += f"Average precision over IoUs: {iou_thresholds}\n"
    for ci, cls in enumerate(class_names):
        result += "{:<20}: \t {:.4f}\n".format(cls, classwise_ap[ci])
        ret[cls] = float(classwise_ap[ci])
    result += "--------------average performance-------------\n"
    mAP = float(np.mean(classwise_ap)) if len(classwise_ap) else 0.0
    result += "mAP:\t {:.4f}\n".format(mAP)
    ret["mAP"] = mAP
    return result, ret
