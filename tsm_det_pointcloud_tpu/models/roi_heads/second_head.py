"""SECOND IoU head (flax).

Parity: pcdet/models/roi_heads/second_head.py (the SECONDNetIoU cascade):
proposals from the anchor head, BEV-feature grid pooling per RoI, an IoU
branch trained to predict box/gt 3D IoU, and score rectification
score = cls^(1-a) * iou^a at post-processing (second_net_iou.py:38-75).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import iou3d
from ..backbones_3d.pfe.voxel_set_abstraction import bilinear_interpolate
from ..backbones_3d.pointnet2_modules import SharedMLP
from .pvrcnn_head import roi_grid_points
from . import roi_head_template as tmpl


class SECONDHead(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int = 1
    voxel_size: tuple = (0.05, 0.05, 0.1)
    point_cloud_range: tuple = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        nms_cfg = cfg["NMS_CONFIG"]["TRAIN" if training else "TEST"]
        g = int(cfg.get("ROI_GRID_POOL", {}).get("GRID_SIZE", 7))

        rois, roi_scores, roi_labels, roi_valid = tmpl.proposal_layer(
            batch_dict["batch_cls_preds"], batch_dict["batch_box_preds"],
            nms_cfg,
            score_normalized=bool(batch_dict.get("cls_preds_normalized", False)),
        )

        # BEV grid pooling: sample the 2D feature map at roi lattice xy
        bev = batch_dict["spatial_features_2d"]      # (B, H, W, C)
        stride = batch_dict.get("spatial_features_stride", 8)
        vx = self.voxel_size[0] * stride
        vy = self.voxel_size[1] * stride
        B, R = rois.shape[:2]
        grid = roi_grid_points(rois, g)[..., :2].reshape(B, R * g ** 3, 2)

        def one(bm, gxy):
            px = (gxy[:, 0] - self.point_cloud_range[0]) / vx
            py = (gxy[:, 1] - self.point_cloud_range[1]) / vy
            return bilinear_interpolate(bm, px, py)

        pooled = jax.vmap(one)(bev, grid).reshape(B, R, -1)

        h = pooled
        for k, c in enumerate(cfg["SHARED_FC"]):
            h = nn.Dense(int(c), use_bias=False, name=f"shared_fc{k}")(h)
            h = nn.BatchNorm(
                use_running_average=not training, momentum=0.99,
                epsilon=1e-3, name=f"shared_bn{k}",
            )(h, mask=roi_valid[..., None])
            h = nn.relu(h)
        hi = SharedMLP(list(cfg.get("IOU_FC", [256])), name="iou_fc")(
            h, training, mask=roi_valid[..., None]
        )
        iou_preds = nn.Dense(1, name="iou_out")(hi)[..., 0]   # (B, R)

        if training:
            def single(r, g_, gv):
                iou = iou3d.boxes_iou3d(r, g_[:, :7])
                return jnp.where(gv[None, :], iou, 0.0).max(-1)

            iou_target = jax.vmap(single)(
                rois, batch_dict["gt_boxes"], batch_dict["gt_boxes_mask"]
            )
            w = roi_valid.astype(jnp.float32)
            # reference trains IoU with smooth-l1 on (2*iou - 0.5) encoding
            loss = (jnp.abs(jax.nn.sigmoid(iou_preds) - iou_target) * w
                    ).sum() / jnp.maximum(w.sum(), 1.0)
            lw = cfg.get("LOSS_CONFIG", {}).get("LOSS_WEIGHTS", {})
            batch_dict["loss_rcnn"] = loss * float(
                lw.get("rcnn_iou_weight", 1.0)
            )
            batch_dict["tb_dict_rcnn"] = {"rcnn_iou_loss": loss}

        batch_dict["batch_box_preds"] = rois
        batch_dict["roi_scores"] = roi_scores
        batch_dict["iou_preds"] = jax.nn.sigmoid(iou_preds)
        batch_dict["roi_labels"] = roi_labels
        batch_dict["rois"] = rois
        batch_dict["has_class_labels"] = True
        # rectified score (SCORE_THRESH applies to this in post)
        alpha = float(cfg.get("IOU_WEIGHT", 0.5))
        rect = jnp.clip(roi_scores, 1e-6) ** (1 - alpha) * jnp.clip(
            batch_dict["iou_preds"], 1e-6
        ) ** alpha
        batch_dict["batch_cls_preds"] = rect[..., None]
        batch_dict["cls_preds_normalized"] = True
        return batch_dict
