"""NMS dispatch (parity: pcdet/models/model_utils/model_nms_utils.py).

All variants run on-device with fixed-size outputs:
  class_agnostic_nms <- :6-29
  multi_thresh       <- :52-87 (per-class score thresholds -> per-class NMS ->
                        second global NMS; the TSM post-processing default)
  multi_classes_nms  <- :89-127
Scores below threshold are masked to -inf before top-k so they can never
enter the kept set; `count` reports real detections.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ...ops import iou3d


def _batched_classes():
    # one class-batched suppression fixpoint instead of num_class
    # sequential ones. Exact (cross-checked), but the on-chip A/B read
    # NEGATIVE at Waymo b8: 24.53 batched vs 25.88 sequential (-5%) —
    # the vmapped path materializes the (C, n, n) per-class rank masks
    # that the sequential loop lets XLA reuse one buffer for, and that
    # bandwidth exceeds the saved while-dispatch latency. Default OFF;
    # TSM_NMS_BATCHED=1 re-enables for future A/B.
    return os.environ.get("TSM_NMS_BATCHED", "0") == "1"


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None):
    """box_scores (N,), box_preds (N, 7). Returns (idx (post,), count, scores)."""
    scores = box_scores
    if score_thresh is not None:
        scores = jnp.where(box_scores >= score_thresh, box_scores, -jnp.inf)
    nms_fn = iou3d.nms_bev if nms_config["NMS_TYPE"] == "nms_gpu" else iou3d.nms_normal
    return nms_fn(
        box_preds, scores,
        thresh=float(nms_config["NMS_THRESH"]),
        pre_maxsize=int(nms_config["NMS_PRE_MAXSIZE"]),
        post_maxsize=int(nms_config["NMS_POST_MAXSIZE"]),
    )


def multi_thresh_nms(cls_scores, box_preds, labels, nms_config, score_thresh_list):
    """Per-class score gating + per-class NMS + global second NMS.

    cls_scores (N,) max-class scores; labels (N,) int32 1-based;
    score_thresh_list: per-class thresholds (len == num_class).
    Parity: model_nms_utils.multi_thresh (:52-87).
    """
    num_class = len(score_thresh_list)
    thresh = jnp.asarray(score_thresh_list, cls_scores.dtype)[
        jnp.clip(labels - 1, 0, num_class - 1)
    ]
    gated = jnp.where(cls_scores >= thresh, cls_scores, -jnp.inf)

    nms_thresh = float(nms_config["NMS_THRESH"])
    pre = int(nms_config["NMS_PRE_MAXSIZE"])
    post = int(nms_config["NMS_POST_MAXSIZE"])
    rotated = nms_config["NMS_TYPE"] == "nms_gpu"

    n = int(gated.shape[0])
    if n <= max(pre, 4096):
        # The num_class+1 NMS passes all run on the SAME boxes — build the
        # polygon-clip suppression matrix once (the dominant
        # post-processing cost at Waymo scale: 2.1 ms per (3072, 3072)
        # build on a v5e) and replay rank-based keep fixpoints per score
        # gating. Exact-equivalent to per-pass nms_bev
        # (tests/test_iou3d.py cross-checks both layers).
        s_mat = iou3d.suppression_matrix(
            box_preds, nms_thresh, rotated=rotated
        )
        if _batched_classes():
            # r5: the per-class keep fixpoints are independent and each
            # while iteration touches ~1 MB of packed words — the cost
            # is sequential dispatch latency, not bandwidth. vmap the
            # classes into ONE batched fixpoint (iterates to the MAX
            # chain depth across classes; converged classes ride along
            # as no-ops, results identical — cross-checked in
            # tests/test_iou3d.py::test_multi_thresh_batched_classes).
            cls_ids = jnp.arange(1, num_class + 1)
            cls_gated = jnp.where(
                labels[None, :] == cls_ids[:, None], gated[None], -jnp.inf
            )                                            # (C, N)
            keeps = jax.vmap(
                lambda g: iou3d.nms_keep_mask_from_matrix(
                    s_mat, g, pre_maxsize=pre, post_maxsize=post
                )
            )(cls_gated)
            kept_mask = jnp.any(keeps, axis=0)
        else:
            kept_mask = jnp.zeros_like(gated, bool)
            for c in range(1, num_class + 1):
                cls_gated = jnp.where(labels == c, gated, -jnp.inf)
                kept_mask |= iou3d.nms_keep_mask_from_matrix(
                    s_mat, cls_gated, pre_maxsize=pre, post_maxsize=post
                )
        survivors = jnp.where(kept_mask, gated, -jnp.inf)
        return iou3d.nms_from_matrix(
            s_mat, survivors, pre_maxsize=pre, post_maxsize=post
        )

    # candidate set far larger than the NMS working set: per-pass top-k
    # truncation beats one (n, n) matrix
    nms_fn = iou3d.nms_bev if rotated else iou3d.nms_normal
    kept_mask = jnp.zeros_like(gated, bool)
    for c in range(1, num_class + 1):
        cls_gated = jnp.where(labels == c, gated, -jnp.inf)
        idx, cnt, _ = nms_fn(
            box_preds, cls_gated, thresh=nms_thresh,
            pre_maxsize=pre, post_maxsize=post,
        )
        slot_ok = jnp.arange(idx.shape[0]) < cnt
        kept_mask = kept_mask.at[idx].set(slot_ok | kept_mask[idx])

    survivors = jnp.where(kept_mask, gated, -jnp.inf)
    return nms_fn(
        box_preds, survivors, thresh=nms_thresh,
        pre_maxsize=pre, post_maxsize=post,
    )
