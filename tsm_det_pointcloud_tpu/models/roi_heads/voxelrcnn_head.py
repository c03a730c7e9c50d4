"""Voxel R-CNN head (flax).

Parity: pcdet/models/roi_heads/voxelrcnn_head.py:106 — RoI grid points
aggregate neighboring VOXEL features from multi_scale_3d_features
(x_conv2..4) via voxel query (NeighborVoxelSAModuleMSG), then shared FC ->
cls/reg. Reuses ops/voxel.voxel_query against each sparse tensor.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.grouping import group_points
from ...ops.voxel import voxel_query
from ..backbones_3d.pfe.voxel_set_abstraction import voxel_centers
from ..backbones_3d.pointnet2_modules import SharedMLP
from .pvrcnn_head import roi_grid_points
from . import roi_head_template as tmpl


class VoxelRCNNHead(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int = 1
    voxel_size: tuple = (0.05, 0.05, 0.1)
    point_cloud_range: tuple = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        pool_cfg = cfg["ROI_GRID_POOL"]
        g = int(pool_cfg["GRID_SIZE"])
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

        B, R = rois.shape[:2]
        grid = roi_grid_points(rois, g).reshape(B, R * g ** 3, 3)

        pooled = []
        for src, sc in pool_cfg["POOL_LAYERS"].items():
            st = batch_dict["multi_scale_3d_features"][src]
            stride = batch_dict["multi_scale_3d_strides"][src]
            vs = np.asarray(self.voxel_size) * stride
            centers = jax.vmap(
                lambda c: voxel_centers(
                    c, stride, self.voxel_size, self.point_cloud_range
                )
            )(st.coords)
            origin = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
            gcoords = jnp.floor(
                (grid - origin) / jnp.asarray(vs, jnp.float32)
            ).astype(jnp.int32)[..., ::-1]

            for ri, (radius, ns) in enumerate(
                zip(sc["POOL_RADIUS"], sc["NSAMPLE"])
            ):
                qr = tuple(int(v) for v in sc.get(
                    "QUERY_RANGES", [[4, 4, 4]] * len(sc["POOL_RADIUS"])
                )[ri])

                def one(gx, gc, cx, scoords, svalid):
                    return voxel_query(
                        gx, gc, cx, scoords, svalid, radius=float(radius),
                        nsample=int(ns), query_range=qr,
                    )

                idx, cnt = jax.vmap(one)(
                    grid, gcoords, centers, st.coords, st.valid
                )
                slot_ok = jnp.arange(int(ns))[None, None, :] < cnt[:, :, None]
                g_xyz = group_points(centers, idx) - grid[:, :, None, :]
                g_feat = group_points(st.features, idx)
                grouped = jnp.where(
                    slot_ok[..., None],
                    jnp.concatenate([g_xyz, g_feat], -1), 0.0,
                )
                h = SharedMLP(
                    list(sc["MLPS"][ri]), name=f"pool_{src}_{ri}"
                )(grouped, training, mask=slot_ok[..., None])
                h = jnp.where(slot_ok[..., None], h, -1e9).max(axis=2)
                h = jnp.where(cnt[..., None] > 0, h, 0.0)
                pooled.append(h)

        x = jnp.concatenate(pooled, -1).reshape(B, R, -1)
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
