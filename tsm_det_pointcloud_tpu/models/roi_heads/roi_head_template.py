"""RoI head shared machinery (flax) — proposals, target assignment, losses.

Parity: pcdet/models/roi_heads/roi_head_template.py (proposal_layer :46,
losses :153-249) + target_assigner/proposal_target_layer.py:8-227.

TPU deltas (documented):
  * proposal_layer emits fixed-R roi slots + a count (padded with zeros)
    instead of per-sample variable tensors;
  * ProposalTargetLayer's random fg/bg subsampling becomes a deterministic
    priority top-k (fg by IoU desc, then hard bg, then easy bg) — same
    ratios, no host RNG round-trip; the random variant can be added by
    threading an rng stream if exact-parity sampling is ever needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import iou3d, loss_utils
from ...ops.boxes import boxes_to_corners_3d
from ...utils.common_utils import limit_period


def proposal_layer(batch_cls_preds, batch_box_preds, nms_cfg,
                   score_normalized=False):
    """(B, N, C) cls + (B, N, 7) boxes -> rois (B, R, 7), roi_scores (B, R),
    roi_labels (B, R) 1-based, roi_valid (B, R)."""
    post = int(nms_cfg["NMS_POST_MAXSIZE"])
    pre = int(nms_cfg["NMS_PRE_MAXSIZE"])
    thresh = float(nms_cfg["NMS_THRESH"])

    scores = batch_cls_preds if score_normalized else jax.nn.sigmoid(
        batch_cls_preds
    )
    max_scores = scores.max(-1)
    labels = scores.argmax(-1).astype(jnp.int32) + 1

    def single(sc, bx, lb):
        keep_idx, cnt, kept_scores = iou3d.nms_bev(
            bx[:, :7], sc, thresh, pre_maxsize=pre, post_maxsize=post
        )
        slot_ok = jnp.arange(post) < cnt
        return (
            jnp.where(slot_ok[:, None], bx[keep_idx][:, :7], 0.0),
            jnp.where(slot_ok, kept_scores, 0.0),
            jnp.where(slot_ok, lb[keep_idx], 0),
            slot_ok,
        )

    rois, roi_scores, roi_labels, roi_valid = jax.lax.map(
        lambda a: single(*a), (max_scores, batch_box_preds, labels)
    )
    return rois, roi_scores, roi_labels, roi_valid


def assign_targets(rois, roi_labels, roi_valid, gt_boxes, gt_valid,
                   target_cfg):
    """Match rois to gts by 3D IoU and build second-stage targets.

    Returns dict with: sampled roi slots' gt box (B, R, 7), max_iou (B, R),
    reg_valid (fg mask), cls_labels (iou-guided in [0,1], -1 ignored),
    all on the FULL roi set with a selection mask `sampled` of
    ROI_PER_IMAGE slots (deterministic priority sampling).
    """
    R = rois.shape[1]
    roi_per_image = int(target_cfg.get("ROI_PER_IMAGE", R))
    fg_ratio = float(target_cfg.get("FG_RATIO", 0.5))
    fg_thresh = float(target_cfg.get("REG_FG_THRESH", 0.55))
    cls_fg = float(target_cfg.get("CLS_FG_THRESH", 0.75))
    cls_bg = float(target_cfg.get("CLS_BG_THRESH", 0.25))
    hard_bg_lo = float(target_cfg.get("CLS_BG_THRESH_LO", 0.1))

    def single(r, rl, rv, g, gv):
        iou = iou3d.boxes_iou3d(r, g[:, :7])          # (R, M)
        iou = jnp.where(gv[None, :] & rv[:, None], iou, 0.0)
        # class-aware matching (get_max_iou_with_same_class)
        same = rl[:, None] == g[None, :, 7].astype(jnp.int32)
        iou_cls = jnp.where(same, iou, 0.0)
        max_iou = iou_cls.max(-1)
        gt_idx = iou_cls.argmax(-1)
        gt_of_roi = g[gt_idx][:, :7]
        gt_cls = g[gt_idx][:, 7].astype(jnp.int32)

        fg = (max_iou >= fg_thresh) & rv
        hard_bg = (max_iou < cls_bg) & (max_iou >= hard_bg_lo) & rv
        easy_bg = (max_iou < hard_bg_lo) & rv
        n_fg = jnp.minimum(fg.sum(), int(roi_per_image * fg_ratio))
        # deterministic priority: fg desc-iou, then hard bg, then easy bg
        prio = jnp.where(fg, 3.0 + max_iou, 0.0)
        prio = jnp.where(hard_bg, 2.0 + max_iou, prio)
        prio = jnp.where(easy_bg, 1.0 + max_iou, prio)
        # cap fg count at roi_per_image*fg_ratio by demoting extras
        fg_rank = jnp.cumsum(fg) - 1
        demoted = fg & (fg_rank >= n_fg)
        prio = jnp.where(demoted, 0.5, prio)
        _, sel = jax.lax.top_k(prio, roi_per_image)
        sampled = jnp.zeros((R,), bool).at[sel].set(True) & (prio[sel].min() > 0)

        # iou-guided cls label (roi_head_template.py:166-176)
        cls_label = (max_iou - cls_bg) / (cls_fg - cls_bg)
        cls_label = jnp.clip(cls_label, 0.0, 1.0)
        ignore = (max_iou > cls_bg) & (max_iou < cls_fg)
        cls_label = jnp.where(max_iou >= cls_fg, 1.0, cls_label)
        cls_label = jnp.where(max_iou <= cls_bg, 0.0, cls_label)
        interval = ignore
        return dict(
            gt_of_roi=gt_of_roi, gt_cls=gt_cls, max_iou=max_iou, fg=fg,
            sampled=sampled, cls_label=cls_label, cls_interval=interval,
        )

    return jax.vmap(single)(rois, roi_labels, roi_valid, gt_boxes, gt_valid)


def canonical_reg_targets(rois, gt_of_roi):
    """Residuals of gt in each roi's canonical frame (center origin,
    heading-aligned) — the reference's encode with roi as anchor."""
    rx, ry, rz = rois[..., 0], rois[..., 1], rois[..., 2]
    heading = rois[..., 6]
    lx = gt_of_roi[..., 0] - rx
    ly = gt_of_roi[..., 1] - ry
    lz = gt_of_roi[..., 2] - rz
    cosa, sina = jnp.cos(-heading), jnp.sin(-heading)
    cx = lx * cosa - ly * sina
    cy = lx * sina + ly * cosa
    diag = jnp.sqrt(rois[..., 3] ** 2 + rois[..., 4] ** 2)
    xt = cx / jnp.maximum(diag, 1e-5)
    yt = cy / jnp.maximum(diag, 1e-5)
    zt = lz / jnp.maximum(rois[..., 5], 1e-5)
    dxt = jnp.log(jnp.maximum(gt_of_roi[..., 3], 1e-5) / jnp.maximum(rois[..., 3], 1e-5))
    dyt = jnp.log(jnp.maximum(gt_of_roi[..., 4], 1e-5) / jnp.maximum(rois[..., 4], 1e-5))
    dzt = jnp.log(jnp.maximum(gt_of_roi[..., 5], 1e-5) / jnp.maximum(rois[..., 5], 1e-5))
    rt = limit_period(gt_of_roi[..., 6] - heading, offset=0.5, period=2 * np.pi)
    return jnp.stack([xt, yt, zt, dxt, dyt, dzt, rt], -1)


def decode_roi_boxes(rois, rcnn_reg):
    """Inverse of canonical_reg_targets: refine rois by predicted residuals."""
    diag = jnp.sqrt(rois[..., 3] ** 2 + rois[..., 4] ** 2)
    cx = rcnn_reg[..., 0] * diag
    cy = rcnn_reg[..., 1] * diag
    cz = rcnn_reg[..., 2] * rois[..., 5]
    heading = rois[..., 6]
    cosa, sina = jnp.cos(heading), jnp.sin(heading)
    x = cx * cosa - cy * sina + rois[..., 0]
    y = cx * sina + cy * cosa + rois[..., 1]
    z = cz + rois[..., 2]
    dx = jnp.exp(rcnn_reg[..., 3]) * rois[..., 3]
    dy = jnp.exp(rcnn_reg[..., 4]) * rois[..., 4]
    dz = jnp.exp(rcnn_reg[..., 5]) * rois[..., 5]
    r = rcnn_reg[..., 6] + heading
    return jnp.stack([x, y, z, dx, dy, dz, r], -1)


def roi_losses(rcnn_cls, rcnn_reg, targets, rois, loss_cfg):
    """rcnn cls (B, R) logits, reg (B, R, 7); returns (loss, tb)."""
    w = loss_cfg["LOSS_WEIGHTS"]
    sampled = targets["sampled"]
    interval = targets["cls_interval"]
    cls_w = (sampled & ~interval).astype(jnp.float32)
    cls_loss = (
        jnp.clip(rcnn_cls, 0) - rcnn_cls * targets["cls_label"]
        + jnp.log1p(jnp.exp(-jnp.abs(rcnn_cls)))
    )
    cls_loss = (cls_loss * cls_w).sum() / jnp.maximum(cls_w.sum(), 1.0)

    reg_t = canonical_reg_targets(rois, targets["gt_of_roi"])
    fg = (targets["fg"] & sampled).astype(jnp.float32)
    reg_loss = loss_utils.weighted_smooth_l1(
        rcnn_reg, reg_t, weights=fg,
        code_weights=w.get("code_weights", [1.0] * 7),
    ).sum() / jnp.maximum(fg.sum(), 1.0)

    total = cls_loss * w.get("rcnn_cls_weight", 1.0) + \
        reg_loss * w.get("rcnn_reg_weight", 1.0)
    tb = {"rcnn_cls_loss": cls_loss, "rcnn_reg_loss": reg_loss}

    if loss_cfg.get("CORNER_LOSS_REGULARIZATION", False):
        pred_boxes = decode_roi_boxes(rois, rcnn_reg)
        B, R = pred_boxes.shape[:2]
        pc = boxes_to_corners_3d(pred_boxes.reshape(-1, 7))
        gc = boxes_to_corners_3d(targets["gt_of_roi"].reshape(-1, 7))
        flip = targets["gt_of_roi"].reshape(-1, 7).at[:, 6].add(np.pi)
        gcf = boxes_to_corners_3d(flip)
        # eps-normed + overflow-safe huber (see ops/loss_utils.corner_loss)
        d = jnp.minimum(
            jnp.sqrt(jnp.sum((pc - gc) ** 2, axis=-1) + 1e-12),
            jnp.sqrt(jnp.sum((pc - gcf) ** 2, axis=-1) + 1e-12),
        )
        c = jnp.minimum(d, 1.0)
        huber = 0.5 * c * c + (d - c)
        corner = huber.mean(-1).reshape(B, R)
        corner_loss = (corner * fg).sum() / jnp.maximum(fg.sum(), 1.0)
        total = total + corner_loss * w.get("rcnn_corner_weight", 1.0)
        tb["rcnn_corner_loss"] = corner_loss
    return total, tb
