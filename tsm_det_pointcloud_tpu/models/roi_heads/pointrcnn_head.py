"""PointRCNN RoI head (flax).

Parity: pcdet/models/roi_heads/pointrcnn_head.py:85 + the roipoint_pool3d
extension (ops/roipoint_pool3d): pool a fixed number of raw points (+their
backbone features) per enlarged RoI, canonically transform, then a small
SA stack + FCs for confidence/refinement.

TPU design: pooling is a masked top-K containment selection over the
(R, N) point-in-roi grid — the CUDA kernel's per-roi scan becomes
_first_k_true on the containment mask.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.boxes import enlarge_box3d, in_box_frame
from ...ops.grouping import _first_k_true
from ..backbones_3d.pointnet2_modules import SharedMLP
from . import roi_head_template as tmpl


def roipoint_pool(points_xyz, point_feats, point_valid, rois, num_sampled,
                  extra_width=(0.0, 0.0, 0.0)):
    """Per-roi fixed-size point pooling.
    points_xyz (N, 3), feats (N, C), rois (R, 7) ->
    pooled_xyz (R, S, 3) canonical, pooled_feats (R, S, C), empty (R,)."""
    big = enlarge_box3d(rois, extra_width)
    local = in_box_frame(points_xyz, big)        # (N, R, 3)
    inside = jnp.all(
        jnp.abs(local) <= big[None, :, 3:6] * 0.5, axis=-1
    ) & point_valid[:, None]
    idx, cnt = _first_k_true(inside.T, num_sampled)   # (R, S)
    g_xyz = points_xyz[idx]                            # (R, S, 3)
    g_feat = point_feats[idx]
    # canonical transform wrt the (un-enlarged) roi frame
    rel = g_xyz - rois[:, None, 0:3]
    cosa = jnp.cos(-rois[:, 6])[:, None]
    sina = jnp.sin(-rois[:, 6])[:, None]
    cx = rel[..., 0] * cosa - rel[..., 1] * sina
    cy = rel[..., 0] * sina + rel[..., 1] * cosa
    canon = jnp.stack([cx, cy, rel[..., 2]], -1)
    slot_ok = jnp.arange(num_sampled)[None, :] < cnt[:, None]
    canon = jnp.where(slot_ok[..., None], canon, 0.0)
    g_feat = jnp.where(slot_ok[..., None], g_feat, 0.0)
    return canon, g_feat, cnt == 0, slot_ok


class PointRCNNHead(nn.Module):
    model_cfg: dict
    input_channels: int
    num_class: int = 1

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
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

        S = int(cfg["ROI_POINT_POOL"].get("NUM_SAMPLED_POINTS", 512))
        depth_norm = float(cfg["ROI_POINT_POOL"].get("DEPTH_NORMALIZER", 70.0))
        pts = batch_dict["point_coords"]
        feats = batch_dict["point_features"]
        pvalid = batch_dict["point_valid"]
        scores = batch_dict.get(
            "point_cls_scores", jnp.ones(pts.shape[:2], pts.dtype)
        )

        def single(p, f, v, sc, r):
            depth = jnp.linalg.norm(p, axis=-1) / depth_norm - 0.5
            merged = jnp.concatenate(
                [sc[:, None], depth[:, None], f], -1
            )
            return roipoint_pool(p, merged, v, r, S)

        canon, g_feat, empty, slot_ok = jax.vmap(single)(
            pts, feats, pvalid, scores, rois
        )  # (B, R, S, ...)

        x = jnp.concatenate([canon, g_feat], -1)
        B, R = x.shape[:2]
        h_pts = SharedMLP(list(cfg["XYZ_UP_LAYER"]), name="xyz_up")(
            x, training, mask=slot_ok[..., None]
        )  # (B, R, S, C)

        sa_cfg = cfg.get("SA_CONFIG")
        if sa_cfg:
            # per-RoI canonical-frame PointNet++ encoder (parity:
            # pointrcnn_head.py SA_CONFIG npoints 128/32/-1): flatten the
            # RoI axis into the batch and chain single-scale SA modules;
            # npoint == -1 is the reference's GroupAll terminal layer,
            # realised as an MLP + masked max over the surviving points.
            from ..backbones_3d.pointnet2_modules import PointnetSAModuleMSG

            xyz_f = canon[..., :3].reshape(B * R, S, 3)
            f = h_pts.reshape(B * R, S, -1)
            v = (slot_ok & ~empty[..., None]).reshape(B * R, S)
            h = None
            for i, (np_i, r_i, ns_i, mlp_i) in enumerate(zip(
                sa_cfg["NPOINTS"], sa_cfg["RADIUS"], sa_cfg["NSAMPLE"],
                sa_cfg["MLPS"],
            )):
                if int(np_i) == -1:
                    g = jnp.concatenate([xyz_f, f], -1)
                    g = SharedMLP(list(mlp_i), name=f"roi_sa{i}")(
                        g, training, mask=v[..., None]
                    )
                    h = jnp.where(v[..., None], g, -1e9).max(axis=1)
                    h = jnp.where(
                        v.any(axis=1, keepdims=True), h, 0.0
                    ).reshape(B, R, -1)
                    break
                xyz_f, f, v = PointnetSAModuleMSG(
                    npoint=int(np_i), radii=[float(r_i)],
                    nsamples=[int(ns_i)], mlps=[list(mlp_i)],
                    name=f"roi_sa{i}",
                )(xyz_f, f, v, training)
            if h is None:  # no GroupAll terminal: pool the last SA level
                h = jnp.where(v[..., None], f, -1e9).max(axis=1)
                h = jnp.where(
                    v.any(axis=1, keepdims=True), h, 0.0
                ).reshape(B, R, -1)
        else:
            h = jnp.where(slot_ok[..., None], h_pts, -1e9).max(axis=2)
        h = jnp.where(~empty[..., None], h, 0.0)

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
