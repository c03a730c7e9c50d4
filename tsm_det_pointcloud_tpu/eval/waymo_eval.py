"""Waymo detection metrics (mAP / mAPH, LEVEL_1 / LEVEL_2) — numpy host
implementation.

Parity target: pcdet/datasets/waymo/waymo_eval.py
(`OpenPCDetWaymoDetectionMetricsEstimator`, :23), which wraps the
waymo_open_dataset TensorFlow metric ops. That package isn't available in
this environment, so the protocol is implemented directly:

  * classes Vehicle / Pedestrian / Cyclist / Sign, 3D IoU matching at
    0.7 / 0.5 / 0.5 / 0.5;
  * LEVEL_2 = gt boxes with <= 5 lidar points (or annotated level 2);
    LEVEL_1 metrics use only level-1 gts (level-2 gts are ignored — they
    neither count as gt nor create FPs), LEVEL_2 uses all;
  * greedy score-ordered max-IoU matching (the official evaluator solves
    an assignment; greedy is the standard close approximation);
  * AP = area under the precision-recall curve with right-max smoothing;
    APH weighs every TP (and the recall denominator per matched pair) by
    heading accuracy 1 - |Δθ|_wrapped / π.

For certification numbers, the result.pkl written by tools/test.py can be
fed to the official TF evaluator offline on any CPU host.
"""
from __future__ import annotations

import numpy as np

from .rotate_iou_np import rotate_iou_np

CLASS_IOU = {"Vehicle": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5, "Sign": 0.5}


def iou3d_np(boxes_a, boxes_b):
    """(N, 7) x (M, 7) lidar-frame 3D IoU in numpy (host eval)."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), np.float32)
    bev_a = boxes_a[:, [0, 1, 3, 4, 6]]
    bev_b = boxes_b[:, [0, 1, 3, 4, 6]]
    inter2d = rotate_iou_np(bev_a, bev_b, criterion=None)
    zmax = np.minimum(
        boxes_a[:, None, 2] + boxes_a[:, None, 5] / 2,
        boxes_b[None, :, 2] + boxes_b[None, :, 5] / 2,
    )
    zmin = np.maximum(
        boxes_a[:, None, 2] - boxes_a[:, None, 5] / 2,
        boxes_b[None, :, 2] - boxes_b[None, :, 5] / 2,
    )
    inter = inter2d * np.clip(zmax - zmin, 0, None)
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return inter / np.maximum(vol_a[:, None] + vol_b[None, :] - inter, 1e-9)


def _heading_accuracy(a, b):
    d = np.abs(a - b) % (2 * np.pi)
    d = np.minimum(d, 2 * np.pi - d)
    return np.clip(1.0 - d / np.pi, 0.0, 1.0)


def _match_frame(gt_boxes, gt_ignore, dt_boxes, dt_scores, iou_thresh):
    """Greedy score-ordered matching. Returns per-dt (matched_gt or -1) and
    per-dt ignored flag (matched an ignored gt)."""
    order = np.argsort(-dt_scores)
    matched_gt = np.full(len(dt_boxes), -1, np.int64)
    dt_ignored = np.zeros(len(dt_boxes), bool)
    if len(gt_boxes) == 0:
        return matched_gt, dt_ignored
    iou = iou3d_np(dt_boxes, gt_boxes)
    taken = np.zeros(len(gt_boxes), bool)
    for j in order:
        cand = np.where(~taken & (iou[j] >= iou_thresh))[0]
        if len(cand) == 0:
            continue
        best = cand[np.argmax(iou[j][cand])]
        taken[best] = True
        matched_gt[j] = best
        dt_ignored[j] = gt_ignore[best]
    return matched_gt, dt_ignored


def waymo_evaluation(gt_annos, dt_annos, class_names=("Vehicle", "Pedestrian", "Cyclist")):
    """gt_annos/dt_annos: per-frame dicts with
      name (N,), boxes_lidar/gt_boxes_lidar (N, 7), score (dt),
      heading = boxes[:, 6], num_points_in_gt (gt; optional),
      difficulty (gt; optional, 2 marks LEVEL_2).
    Returns (result_str, dict of '<CLASS>/(AP|APH)_L1/L2')."""
    results = {}
    for cls in class_names:
        thr = CLASS_IOU.get(cls, 0.5)
        for level in (1, 2):
            tp_rows = []  # (score, heading_acc)
            fp_scores = []
            total_gt = 0
            for gt, dt in zip(gt_annos, dt_annos):
                g_sel = np.asarray(gt["name"]) == cls
                g_boxes = np.asarray(
                    gt.get("gt_boxes_lidar", gt.get("boxes_lidar"))
                ).reshape(-1, 7)[g_sel] if g_sel.any() else np.zeros((0, 7))
                npts = np.asarray(
                    gt.get("num_points_in_gt", np.full(g_sel.sum(), 99))
                ).reshape(-1)[: len(g_boxes)]
                diff = np.asarray(
                    gt.get("difficulty", np.zeros(g_sel.sum()))
                ).reshape(-1)[: len(g_boxes)]
                is_l2 = (npts <= 5) | (diff == 2)
                if level == 1:
                    gt_ignore = is_l2
                else:
                    gt_ignore = np.zeros(len(g_boxes), bool)
                total_gt += int((~gt_ignore).sum())

                d_sel = np.asarray(dt["name"]) == cls
                d_boxes = np.asarray(dt["boxes_lidar"]).reshape(-1, 7)[d_sel] \
                    if d_sel.any() else np.zeros((0, 7))
                d_scores = np.asarray(dt["score"]).reshape(-1)[d_sel] \
                    if d_sel.any() else np.zeros((0,))

                matched, ignored = _match_frame(
                    g_boxes, gt_ignore, d_boxes, d_scores, thr
                )
                for j in range(len(d_boxes)):
                    if matched[j] >= 0:
                        if not ignored[j]:
                            ha = _heading_accuracy(
                                d_boxes[j, 6], g_boxes[matched[j], 6]
                            )
                            tp_rows.append((d_scores[j], float(ha)))
                        # matches to ignored gts drop out entirely
                    else:
                        fp_scores.append(d_scores[j])

            ap, aph = _pr_auc(tp_rows, fp_scores, total_gt)
            results[f"{cls}/AP_L{level}"] = ap * 100
            results[f"{cls}/APH_L{level}"] = aph * 100

    lines = [
        f"{k}: {v:.4f}" for k, v in sorted(results.items())
    ]
    return "\n".join(lines), results


def _pr_auc(tp_rows, fp_scores, total_gt):
    if total_gt == 0 or len(tp_rows) == 0:
        return 0.0, 0.0
    tp_scores = np.asarray([r[0] for r in tp_rows])
    tp_ha = np.asarray([r[1] for r in tp_rows])
    fp_scores = np.asarray(fp_scores)
    events = np.concatenate([
        np.stack([tp_scores, np.ones_like(tp_scores), tp_ha], 1),
        np.stack([fp_scores, np.zeros_like(fp_scores),
                  np.zeros_like(fp_scores)], 1),
    ])
    order = np.argsort(-events[:, 0])
    is_tp = events[order, 1]
    ha = events[order, 2]
    cum_tp = np.cumsum(is_tp)
    cum_tph = np.cumsum(is_tp * ha)
    cum_fp = np.cumsum(1 - is_tp)
    recall = cum_tp / total_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    precision_h = cum_tph / np.maximum(cum_tp + cum_fp, 1e-9)
    # right-max smoothing then trapezoid-free step integration
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
        precision_h[i] = max(precision_h[i], precision_h[i + 1])
    ap = 0.0
    aph = 0.0
    prev_r = 0.0
    for i in range(len(recall)):
        dr = recall[i] - prev_r
        if dr > 0:
            ap += dr * precision[i]
            aph += dr * precision_h[i]
            prev_r = recall[i]
    return float(ap), float(aph)
