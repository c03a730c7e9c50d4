"""Loss functions — functional jnp forms of pcdet/utils/loss_utils.py.

Every function returns *per-element* losses (no reduction) so callers control
normalization exactly as the reference does. Weighted variants multiply by a
broadcastable `weights` argument.

Parity map:
  sigmoid_focal_loss           <- SigmoidFocalClassificationLoss (:9-74)
  weighted_smooth_l1           <- WeightedSmoothL1Loss (:141-200)
  weighted_l1                  <- WeightedL1Loss (:269)
  weighted_cross_entropy       <- WeightedCrossEntropyLoss (:311)
  weighted_bce                 <- WeightedBinaryCrossEntropyLoss (:339)
  corner_loss                  <- get_corner_loss_lidar (:365-400)
  centernet_focal / reg        <- FocalLossCenterNet / RegLossCenterNet (:420-542)
  centerness_label             <- PointSASALoss.generate_centerness_label (:648-680)
  rdiou                        <- PointHeadVoteSASAStatisticDistillation.get_rdiou
                                  (point_head_vote_sasa_statistic_distillation.py:929-981)
  sasa_assign_targets / loss   <- PointSASALoss (:545-753), vectorized over the
                                  batch instead of the reference's python loop
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import boxes_to_corners_3d, points_in_boxes
from ..utils.common_utils import rotate_points_along_z


def _bce_with_logits(logits, targets):
    """Numerically-stable elementwise BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def sigmoid_focal_loss(logits, targets, weights=None, gamma=2.0, alpha=0.25):
    """Per-element sigmoid focal loss, OpenPCDet form."""
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - p) + (1.0 - targets) * p
    loss = alpha_w * jnp.power(pt, gamma) * _bce_with_logits(logits, targets)
    if weights is not None:
        if weights.ndim < loss.ndim:
            weights = weights[..., None]
        loss = loss * weights
    return loss


def weighted_smooth_l1(preds, targets, weights=None, beta=1.0 / 9.0,
                       code_weights=None):
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    n = jnp.abs(diff)
    if beta < 1e-5:
        loss = n
    else:
        # overflow-safe huber: never squares an unbounded residual, so a
        # masked-out exploded row can't poison gradients via the untaken
        # where-branch (0 * inf -> NaN)
        c = jnp.minimum(n, beta)
        loss = 0.5 * c * c / beta + (n - c)
    if weights is not None:
        if weights.ndim < loss.ndim:
            weights = weights[..., None]
        loss = loss * weights
    return loss


def weighted_l1(preds, targets, weights=None, code_weights=None):
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    loss = jnp.abs(diff)
    if weights is not None:
        if weights.ndim < loss.ndim:
            weights = weights[..., None]
        loss = loss * weights
    return loss


def weighted_cross_entropy(logits, one_hot_targets, weights=None):
    """Softmax CE per element over the last axis (direction/angle bins)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(one_hot_targets * logp, axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


def weighted_bce(logits, targets, weights=None):
    loss = _bce_with_logits(logits, targets)
    if weights is not None:
        if weights.ndim < loss.ndim:
            weights = weights[..., None]
        loss = loss * weights
    return loss


def corner_loss(pred_boxes7, gt_boxes7, delta=1.0):
    """Per-box corner loss with the flipped-heading trick.
    Parity: loss_utils.get_corner_loss_lidar (:365-400). Returns (N,)."""
    pred_c = boxes_to_corners_3d(pred_boxes7)  # (N, 8, 3)
    gt_c = boxes_to_corners_3d(gt_boxes7)
    gt_flip = gt_boxes7.at[:, 6].add(jnp.pi)
    gt_c_flip = boxes_to_corners_3d(gt_flip)
    # sqrt(sum + eps): a plain norm has a NaN gradient at exactly-zero
    # distance (perfect prediction / flipped-heading tie)
    d = jnp.minimum(
        jnp.sqrt(jnp.sum((pred_c - gt_c) ** 2, axis=-1) + 1e-12),
        jnp.sqrt(jnp.sum((pred_c - gt_c_flip) ** 2, axis=-1) + 1e-12),
    )  # (N, 8)
    # overflow-safe huber (see weighted_smooth_l1)
    abs_d = jnp.abs(d)
    c = jnp.minimum(abs_d, delta)
    h = 0.5 * c * c / delta + (abs_d - c)
    return jnp.mean(h, axis=1)


def centernet_focal(pred, gt, mask=None):
    """CornerNet/CenterNet gaussian focal loss on heatmaps (pred in (0,1)).
    Returns scalar loss normalized by #positives.
    Parity: loss_utils.neg_loss_cornernet (:420-458)."""
    pos_inds = (gt == 1).astype(pred.dtype)
    neg_inds = (gt < 1).astype(pred.dtype)
    neg_weights = jnp.power(1 - gt, 4)
    pred = jnp.clip(pred, 1e-4, 1 - 1e-4)
    pos_loss = jnp.log(pred) * jnp.power(1 - pred, 2) * pos_inds
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, 2) * neg_weights * neg_inds
    if mask is not None:
        pos_loss = pos_loss * mask
        neg_loss = neg_loss * mask
        pos_inds = pos_inds * mask
    num_pos = pos_inds.sum()
    return jnp.where(
        num_pos == 0, -neg_loss.sum(), -(pos_loss.sum() + neg_loss.sum()) / jnp.maximum(num_pos, 1.0)
    )


def centernet_reg_loss(regr, gt_regr, mask):
    """L1 regression loss gathered at target positions.
    regr/gt_regr (B, K, D), mask (B, K). Parity: RegLossCenterNet (:520)."""
    num = mask.astype(regr.dtype).sum()
    m = mask[..., None].astype(regr.dtype)
    loss = jnp.abs(regr * m - gt_regr * m)
    return loss.sum() / jnp.maximum(num, 1.0)


def centerness_label(point_xyz, point_box_labels, pos_mask, epsilon=1e-6):
    """Per-point centerness in [0,1] wrt its assigned gt box; 0 for bg.
    point_xyz (N, 3), point_box_labels (N, 7), pos_mask (N,) bool."""
    canonical = point_xyz - point_box_labels[:, 0:3]
    canonical = rotate_points_along_z(
        canonical[:, None, :], -point_box_labels[:, 6]
    )[:, 0]
    half = point_box_labels[:, 3:6] / 2
    front = half - canonical
    back = half + canonical
    ratio = jnp.minimum(front, back) / jnp.maximum(
        jnp.maximum(front, back), epsilon
    )
    cent = jnp.clip(ratio[:, 0] * ratio[:, 1] * ratio[:, 2], epsilon) ** (1 / 3.0)
    return jnp.where(pos_mask, cent, 0.0)


def rdiou(bboxes1, bboxes2):
    """Rotation-Decoupled IoU: treats heading as a 4th unit-length axis via
    t = sin(r1)cos(r2) / cos(r1)sin(r2). Returns (u, rdiou) like the
    reference (u = center-distance penalty term of DIoU).
    bboxes1/bboxes2 (..., 7). Elementwise; shapes broadcast."""
    x1, y1, z1 = bboxes1[..., 0], bboxes1[..., 1], bboxes1[..., 2]
    l1 = jnp.clip(bboxes1[..., 3], None, 10.0)
    w1 = jnp.clip(bboxes1[..., 4], None, 10.0)
    h1 = jnp.clip(bboxes1[..., 5], None, 10.0)
    x2, y2, z2 = bboxes2[..., 0], bboxes2[..., 1], bboxes2[..., 2]
    l2, w2, h2 = bboxes2[..., 3], bboxes2[..., 4], bboxes2[..., 5]
    t1 = jnp.sin(bboxes1[..., 6]) * jnp.cos(bboxes2[..., 6])
    t2 = jnp.cos(bboxes1[..., 6]) * jnp.sin(bboxes2[..., 6])
    j = jnp.ones_like(h2)

    vol1 = l1 * w1 * h1
    vol2 = l2 * w2 * h2

    def overlap(c1, s1, c2, s2):
        lo = jnp.maximum(c1 - s1 / 2, c2 - s2 / 2)
        hi = jnp.minimum(c1 + s1 / 2, c2 + s2 / 2)
        return jnp.clip(hi - lo, 0.0)

    inter = (
        overlap(x1, l1, x2, l2)
        * overlap(y1, w1, y2, w2)
        * overlap(z1, h1, z2, h2)
        * overlap(t1, j, t2, j)
    )

    def hull(c1, s1, c2, s2):
        lo = jnp.minimum(c1 - s1 / 2, c2 - s2 / 2)
        hi = jnp.maximum(c1 + s1 / 2, c2 + s2 / 2)
        return jnp.clip(hi - lo, 0.0)

    inter_diag = (x2 - x1) ** 2 + (y2 - y1) ** 2 + (z2 - z1) ** 2 + (t2 - t1) ** 2
    c_diag = (
        hull(x1, l1, x2, l2) ** 2
        + hull(y1, w1, y2, w2) ** 2
        + hull(z1, h1, z2, h2) ** 2
        + hull(t1, j, t2, j) ** 2
    )
    union = vol1 + vol2 - inter
    u = inter_diag / jnp.maximum(c_diag, 1e-7)
    return u, inter / jnp.maximum(union, 1e-7)


# ---------------------------------------------------------------------------
# SASA layer loss (point segmentation pyramid supervision)
# ---------------------------------------------------------------------------

def sasa_assign_targets(points_xyz, gt_boxes, extra_width=None,
                        set_ignore_flag=True, num_class=3, gt_valid=None):
    """Per-point segmentation labels against gt boxes, vectorized per batch.

    points_xyz (B, N, 3); gt_boxes (B, M, 8) with class idx (1-based) in
    column 7; gt_valid (B, M) mask of real (non-padded) boxes.
    Returns labels (B, N) int32 in {-1 (ignore), 0 (bg), 1..num_class}.
    """
    B, N, _ = points_xyz.shape

    def single(pts, boxes, bvalid):
        idx_in = points_in_boxes(pts, boxes[:, :7], valid_mask=bvalid)
        fg = idx_in >= 0
        cls_of_box = boxes[:, 7].astype(jnp.int32)
        labels = jnp.where(
            fg,
            jnp.where(num_class == 1, 1, cls_of_box[jnp.maximum(idx_in, 0)]),
            0,
        )
        if set_ignore_flag and extra_width is not None:
            idx_ext = points_in_boxes(
                pts, boxes[:, :7], extra_width=extra_width, valid_mask=bvalid
            )
            ignore = (~fg) & (idx_ext >= 0)
            labels = jnp.where(ignore, -1, labels)
        return labels

    valid = gt_valid if gt_valid is not None else (gt_boxes[..., 3] > 0)
    return jax.vmap(single)(points_xyz, gt_boxes, valid)


def sasa_layer_loss(scores, labels, num_class=3):
    """One SASA pyramid level: focal loss of per-point (num_class,) logits
    against one-hot labels, ignoring -1, normalized by #(fg+bg).
    scores (B, N, num_class), labels (B, N). Returns scalar."""
    pos = labels > 0
    neg = labels == 0
    cls_weights = (pos | neg).astype(scores.dtype)
    one_hot = jax.nn.one_hot(
        jnp.clip(labels, 0), num_class + 1, dtype=scores.dtype
    )[..., 1:]
    loss = sigmoid_focal_loss(scores, one_hot, cls_weights)
    normalizer = jnp.maximum(cls_weights.sum(), 1.0)
    return loss.sum() / normalizer


def softmax_focal_loss(logits, target_idx, weights=None, gamma=2.0,
                       alpha=0.25, num_classes=None):
    """Softmax focal CE (parity: loss_utils.SoftmaxFocalClassificationLoss
    :75-139). logits (..., C), integer targets (...,)."""
    num_classes = num_classes or logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(target_idx, num_classes, dtype=logits.dtype)
    pt = jnp.exp(jnp.sum(logp * one_hot, axis=-1))
    loss = -alpha * (1.0 - pt) ** gamma * jnp.sum(logp * one_hot, axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss
