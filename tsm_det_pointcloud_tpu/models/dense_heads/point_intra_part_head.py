"""PointIntraPartOffsetHead — Part-A2 intra-object part locations.

Parity: pcdet/models/dense_heads/point_intra_part_head.py: per-point fg
segmentation + 3-channel sigmoid part-location regression (the normalized
(0..1) position of each fg point inside its gt box), trained with focal +
BCE losses on UNetV2's stride-1 voxel features.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import loss_utils
from ...ops.boxes import in_box_frame, points_in_boxes
from ..backbones_3d.pointnet2_modules import SharedMLP


class PointIntraPartOffsetHead(nn.Module):
    model_cfg: dict
    num_class: int
    meta: object = None

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        feats = batch_dict["point_features"]      # (B, V, C) stride-1 voxels
        valid = batch_dict["point_valid"]
        # voxel centers as the point set (UNetV2 emits voxel-aligned feats)
        coords = batch_dict.get("point_coords")
        if coords is None:
            from ..backbones_3d.pfe.voxel_set_abstraction import voxel_centers

            coords = jax.vmap(
                lambda c: voxel_centers(
                    c, 1, self.meta.voxel_size, self.meta.point_cloud_range
                )
            )(batch_dict["point_coords_voxel"])
            batch_dict["point_coords"] = coords

        hc = SharedMLP(list(cfg["CLS_FC"]), name="cls_fc")(
            feats, training, mask=valid[..., None]
        )
        cls_preds = nn.Dense(
            self.num_class, name="cls_out",
            bias_init=nn.initializers.constant(-jnp.log(99.0)),
        )(hc)
        hp = SharedMLP(list(cfg["PART_FC"]), name="part_fc")(
            feats, training, mask=valid[..., None]
        )
        part_preds = nn.Dense(3, name="part_out")(hp)

        batch_dict["point_cls_preds"] = cls_preds
        batch_dict["point_part_offset"] = jax.nn.sigmoid(part_preds)
        batch_dict["point_cls_scores"] = jax.nn.sigmoid(cls_preds).max(-1)

        if training:
            gt = batch_dict["gt_boxes"]
            gv = batch_dict["gt_boxes_mask"]

            def single(p, boxes, bvalid):
                idx = points_in_boxes(p, boxes[:, :7], valid_mask=bvalid)
                safe = jnp.maximum(idx, 0)
                labels = jnp.where(
                    idx >= 0, boxes[safe, 7].astype(jnp.int32), 0
                )
                local = in_box_frame(p, boxes[:, :7])        # (N, M, 3)
                local = jnp.take_along_axis(
                    local, safe[:, None, None], axis=1
                )[:, 0]                                       # (N, 3)
                part = local / jnp.maximum(boxes[safe, 3:6], 1e-5) + 0.5
                part = jnp.where((idx >= 0)[:, None], jnp.clip(part, 0, 1), 0.0)
                return labels, part

            labels, part_labels = jax.vmap(single)(coords, gt, gv)
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
            part_loss = loss_utils.weighted_bce(
                part_preds, part_labels, weights=pos.astype(jnp.float32)
            ).sum() / jnp.maximum(pos.sum(), 1.0)
            lw = cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
            batch_dict["loss_point"] = (
                cls_loss * lw.get("point_cls_weight", 1.0)
                + part_loss * lw.get("point_part_weight", 1.0)
            )
        return batch_dict
