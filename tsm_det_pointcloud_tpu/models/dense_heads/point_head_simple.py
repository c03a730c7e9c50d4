"""PointHeadSimple — keypoint foreground segmentation (PV-RCNN).

Parity: pcdet/models/dense_heads/point_head_simple.py: a small FC stack on
point_features predicting per-point foreground score, supervised by
points-in-gt-boxes (enlarged) with focal loss; at inference the sigmoid
score weights the keypoint features for RoI pooling.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import loss_utils
from ...ops.boxes import points_in_boxes
from ..backbones_3d.pointnet2_modules import SharedMLP


class PointHeadSimple(nn.Module):
    model_cfg: dict
    num_class: int
    meta: object = None

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        src = cfg.get("POINT_FEATURE_SOURCE", "point_features")
        feats = batch_dict[
            "point_features_before_fusion"
            if cfg.get("USE_POINT_FEATURES_BEFORE_FUSION") else src
        ]
        valid = batch_dict["point_valid"]
        h = SharedMLP(list(cfg["CLS_FC"]), name="cls_fc")(
            feats, training, mask=valid[..., None]
        )
        logits = nn.Dense(1, name="cls_out")(h)[..., 0]  # class-agnostic fg
        batch_dict["point_cls_scores"] = jax.nn.sigmoid(
            jnp.where(valid, logits, -1e9)
        )

        if training:
            pts = batch_dict["point_coords"]
            gt = batch_dict["gt_boxes"]
            gv = batch_dict["gt_boxes_mask"]
            extra = cfg.get("TARGET_CONFIG", {}).get(
                "GT_EXTRA_WIDTH", [0.2, 0.2, 0.2]
            )

            def single(p, boxes, bvalid):
                inside = points_in_boxes(p, boxes[:, :7], valid_mask=bvalid)
                ext = points_in_boxes(
                    p, boxes[:, :7], extra_width=extra, valid_mask=bvalid
                )
                labels = jnp.where(inside >= 0, 1, 0)
                labels = jnp.where((inside < 0) & (ext >= 0), -1, labels)
                return labels

            labels = jax.vmap(single)(pts, gt, gv)
            labels = jnp.where(valid, labels, -1)
            pos = labels > 0
            neg = labels == 0
            w = (pos | neg).astype(jnp.float32)
            one_hot = pos.astype(jnp.float32)
            loss = loss_utils.sigmoid_focal_loss(
                logits[..., None], one_hot[..., None], w[..., None]
            ).sum() / jnp.maximum(pos.sum(), 1.0)
            lw = cfg.get("LOSS_CONFIG", {}).get("LOSS_WEIGHTS", {})
            batch_dict["loss_point"] = loss * float(lw.get("point_cls_weight", 1.0))
        return batch_dict
