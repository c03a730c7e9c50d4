"""PV-RCNN RoI head (flax).

Parity: pcdet/models/roi_heads/pvrcnn_head.py — roi_grid_pool (:64): a
GRID_SIZE^3 lattice of points per RoI in its canonical frame, each lattice
point aggregating score-weighted keypoint features via two-radius ball
query MSG (the reference's StackSAModuleMSG), then shared FC -> rcnn cls +
reg branches. Proposals/targets/losses come from roi_head_template.py.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import grouping
from ..backbones_3d.pointnet2_modules import SharedMLP
from . import roi_head_template as tmpl


def roi_grid_points(rois, grid_size):
    """(B, R, 7) -> (B, R, G^3, 3) world-frame lattice points."""
    B, R, _ = rois.shape
    g = grid_size
    idx = (np.stack(np.meshgrid(*[np.arange(g)] * 3, indexing="ij"), -1)
           .reshape(-1, 3).astype(np.float32))  # (G^3, 3)
    frac = (jnp.asarray(idx) + 0.5) / g - 0.5   # in (-0.5, 0.5)
    local = frac[None, None] * rois[:, :, None, 3:6]
    cosa = jnp.cos(rois[..., 6])[..., None]
    sina = jnp.sin(rois[..., 6])[..., None]
    x = local[..., 0] * cosa - local[..., 1] * sina + rois[:, :, None, 0]
    y = local[..., 0] * sina + local[..., 1] * cosa + rois[:, :, None, 1]
    z = local[..., 2] + rois[:, :, None, 2]
    return jnp.stack([x, y, z], -1)


class PVRCNNHead(nn.Module):
    model_cfg: dict
    input_channels: int   # keypoint feature dim
    num_class: int = 1

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        pool_cfg = cfg["ROI_GRID_POOL"]
        g = int(pool_cfg["GRID_SIZE"])
        nms_key = "TRAIN" if training else "TEST"
        nms_cfg = cfg["NMS_CONFIG"][nms_key]

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

        # --- RoI grid pooling over score-weighted keypoints ---
        kp = batch_dict["point_coords"]            # (B, K, 3)
        kp_feat = batch_dict["point_features"]     # (B, K, C)
        kp_valid = batch_dict["point_valid"]
        if "point_cls_scores" in batch_dict:
            kp_feat = kp_feat * batch_dict["point_cls_scores"][..., None]

        B, R = rois.shape[:2]
        grid = roi_grid_points(rois, g).reshape(B, R * g ** 3, 3)

        scales = [(0.0, float(r), int(ns)) for r, ns in zip(
            pool_cfg["POOL_RADIUS"], pool_cfg["NSAMPLE"]
        )]
        groups = grouping.query_group_scales(
            kp, kp_feat, kp_valid, grid,
            jnp.ones(grid.shape[:2], bool), scales,
        )
        outs = []
        for i, ((grouped, slot_ok, cnt), mlp) in enumerate(
            zip(groups, pool_cfg["MLPS"])
        ):
            h = SharedMLP(list(mlp), name=f"pool_mlp{i}")(
                grouped, training, mask=slot_ok[..., None]
            )
            h = jnp.where(slot_ok[..., None], h, -1e9).max(axis=2)
            h = jnp.where(cnt[..., None] > 0, h, 0.0)
            outs.append(h)
        pooled = jnp.concatenate(outs, -1).reshape(B, R, g ** 3, -1)
        pooled = pooled.reshape(B, R, -1)  # flatten the lattice

        h = pooled
        for k, c in enumerate(cfg["SHARED_FC"]):
            h = nn.Dense(int(c), use_bias=False, name=f"shared_fc{k}")(h)
            h = nn.BatchNorm(
                use_running_average=not training, momentum=0.99,
                epsilon=1e-3, name=f"shared_bn{k}",
            )(h, mask=roi_valid[..., None])
            h = nn.relu(h)

        hc = h
        for k, c in enumerate(cfg["CLS_FC"]):
            hc = nn.Dense(int(c), use_bias=False, name=f"cls_fc{k}")(hc)
            hc = nn.BatchNorm(
                use_running_average=not training, momentum=0.99,
                epsilon=1e-3, name=f"cls_bn{k}",
            )(hc, mask=roi_valid[..., None])
            hc = nn.relu(hc)
        rcnn_cls = nn.Dense(1, name="cls_out")(hc)[..., 0]  # (B, R)

        hr = h
        for k, c in enumerate(cfg["REG_FC"]):
            hr = nn.Dense(int(c), use_bias=False, name=f"reg_fc{k}")(hr)
            hr = nn.BatchNorm(
                use_running_average=not training, momentum=0.99,
                epsilon=1e-3, name=f"reg_bn{k}",
            )(hr, mask=roi_valid[..., None])
            hr = nn.relu(hr)
        rcnn_reg = nn.Dense(7, name="reg_out")(hr)  # (B, R, 7)

        if training:
            loss, tb = tmpl.roi_losses(
                rcnn_cls, rcnn_reg, targets, rois, cfg["LOSS_CONFIG"]
            )
            batch_dict["loss_rcnn"] = loss
            batch_dict["tb_dict_rcnn"] = tb

        refined = tmpl.decode_roi_boxes(rois, rcnn_reg)
        batch_dict["batch_box_preds"] = refined
        batch_dict["batch_cls_preds"] = rcnn_cls[..., None]
        batch_dict["cls_preds_normalized"] = False
        batch_dict["roi_labels"] = roi_labels
        batch_dict["rois"] = rois
        batch_dict["has_class_labels"] = True
        return batch_dict


class EPointRoIHead(PVRCNNHead):
    """Parity: roi_heads/e_point_roi_head.py (TSM-project experimental) —
    point-feature RoI grid pooling; compact equivalent on the PVRCNN
    machinery."""


class EPointRoIHeadV2(PVRCNNHead):
    """Parity: e_point_roi_head_v2.py (experimental)."""


class DSASNetRoIHead(PVRCNNHead):
    """Parity: DSASNet_roi_head.py (experimental)."""
