"""Part-A2 RoI head (flax).

Parity: pcdet/models/roi_heads/partA2_head.py:104 + the roiaware_pool3d
extension (ops/roiaware_pool3d): pool per-point part offsets (avg) and
segmentation features (max) into a G^3 voxel grid per RoI, then conv/FC
stacks for confidence + refinement.

TPU design: RoI-aware pooling = containment test (N, R) -> per-point cell
id in its roi -> one segment_max / segment_sum over roi*G^3 segments per
sample. No CUDA scatter kernels; fixed shapes throughout.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.boxes import in_box_frame
from ..backbones_3d.pointnet2_modules import SharedMLP
from . import roi_head_template as tmpl


def roiaware_pool(points_xyz, feats, point_valid, rois, grid_size,
                  pool="max"):
    """points (N, 3), feats (N, C), rois (R, 7) -> (R, G^3, C).
    Each point lands in the cell of every roi containing it."""
    N = points_xyz.shape[0]
    R = rois.shape[0]
    G = grid_size
    local = in_box_frame(points_xyz, rois)          # (N, R, 3)
    half = rois[:, 3:6] * 0.5
    inside = jnp.all(jnp.abs(local) <= half[None], axis=-1) & point_valid[:, None]
    # cell index per (point, roi)
    frac = jnp.clip((local / jnp.maximum(rois[None, :, 3:6], 1e-5)) + 0.5,
                    0.0, 1.0 - 1e-6)
    cell = (frac * G).astype(jnp.int32)             # (N, R, 3)
    cell_id = (cell[..., 0] * G + cell[..., 1]) * G + cell[..., 2]
    seg = jnp.where(
        inside, jnp.arange(R)[None, :] * G ** 3 + cell_id, R * G ** 3
    )  # (N, R)
    seg_flat = seg.reshape(-1)
    feat_rep = jnp.repeat(feats[:, None, :], R, axis=1).reshape(N * R, -1)
    if pool == "max":
        pooled = jax.ops.segment_max(
            jnp.where(seg_flat[:, None] < R * G ** 3, feat_rep, -jnp.inf),
            seg_flat, num_segments=R * G ** 3 + 1,
        )[: R * G ** 3]
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    else:
        sums = jax.ops.segment_sum(
            feat_rep, seg_flat, num_segments=R * G ** 3 + 1
        )[: R * G ** 3]
        cnts = jax.ops.segment_sum(
            jnp.ones_like(seg_flat, jnp.float32), seg_flat,
            num_segments=R * G ** 3 + 1,
        )[: R * G ** 3]
        pooled = sums / jnp.maximum(cnts[:, None], 1.0)
    return pooled.reshape(R, G ** 3, -1)


class PartA2FCHead(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int = 1

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        g = int(cfg["ROI_AWARE_POOL"]["POOL_SIZE"])
        nms_cfg = cfg["NMS_CONFIG"]["TRAIN" if training else "TEST"]

        rois, roi_scores, roi_labels, roi_valid = tmpl.proposal_layer(
            batch_dict["batch_cls_preds"], batch_dict["batch_box_preds"],
            nms_cfg,
            score_normalized=bool(batch_dict.get("cls_preds_normalized", False)),
        )
        targets = None
        if training:
            targets = tmpl.assign_targets(
                rois, roi_labels, roi_valid, batch_dict["gt_boxes"],
                batch_dict["gt_boxes_mask"], cfg["TARGET_CONFIG"],
            )

        pts = batch_dict["point_coords"]
        seg_feats = batch_dict["point_features"]
        part = batch_dict["point_part_offset"]
        pvalid = batch_dict["point_valid"]
        scores = batch_dict.get("point_cls_scores")
        if scores is not None:
            seg_feats = seg_feats * scores[..., None]

        part_pooled = jax.vmap(
            lambda p, f, v, r: roiaware_pool(p, f, v, r, g, pool="avg")
        )(pts, part, pvalid, rois)                       # (B, R, G^3, 3)
        feat_pooled = jax.vmap(
            lambda p, f, v, r: roiaware_pool(p, f, v, r, g, pool="max")
        )(pts, seg_feats, pvalid, rois)                  # (B, R, G^3, C)

        x = jnp.concatenate([part_pooled, feat_pooled], -1)
        B, R = x.shape[:2]
        x = x.reshape(B, R, -1)

        h = x
        for k, c in enumerate(cfg["SHARED_FC"]):
            h = nn.Dense(int(c), use_bias=False, name=f"shared_fc{k}")(h)
            h = nn.BatchNorm(
                use_running_average=not training, momentum=0.99,
                epsilon=1e-3, name=f"shared_bn{k}",
            )(h, mask=roi_valid[..., None])
            h = nn.relu(h)
        hc = SharedMLP(list(cfg["CLS_FC"]), name="cls_fc")(
            h, training, mask=roi_valid[..., None]
        )
        rcnn_cls = nn.Dense(1, name="cls_out")(hc)[..., 0]
        hr = SharedMLP(list(cfg["REG_FC"]), name="reg_fc")(
            h, training, mask=roi_valid[..., None]
        )
        rcnn_reg = nn.Dense(7, name="reg_out")(hr)

        if training:
            loss, tb = tmpl.roi_losses(
                rcnn_cls, rcnn_reg, targets, rois, cfg["LOSS_CONFIG"]
            )
            batch_dict["loss_rcnn"] = loss
            batch_dict["tb_dict_rcnn"] = tb

        batch_dict["batch_box_preds"] = tmpl.decode_roi_boxes(rois, rcnn_reg)
        batch_dict["batch_cls_preds"] = rcnn_cls[..., None]
        batch_dict["cls_preds_normalized"] = False
        batch_dict["roi_labels"] = roi_labels
        batch_dict["rois"] = rois
        batch_dict["has_class_labels"] = True
        return batch_dict
