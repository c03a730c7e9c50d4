"""Voxel feature encoders (flax), device-side voxelization included.

Parity: pcdet/models/backbones_3d/vfe/{mean_vfe.py, pillar_vfe.py,
dynamic_mean_vfe.py, dynamic_pillar_vfe.py}. The reference consumes host-side
spconv voxels; here each VFE voxelizes the (B, N, C) point tensor on device
(ops.voxel.voxelize under jit) — one fused kernel instead of a host
preprocessing step. The "dynamic" VFEs of the reference (torch_scatter based)
are naturally subsumed: our voxelization is already a segment reduction.

batch_dict contract (in):  points (B, N, C) f32, points_mask (B, N) bool
             (out): voxel_features (B, V, C'), voxel_coords (B, V, 3) zyx,
                    voxel_mask (B, V) bool, [pillar_features for pillars]
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.voxel import compute_voxel_coords, grid_size, voxelize


class MeanVFE(nn.Module):
    """Mean of point features per voxel (parity: mean_vfe.py:31L)."""
    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple
    max_voxels: int
    max_points_per_voxel: int

    def get_output_feature_dim(self):
        return self.num_point_features

    @nn.compact
    def __call__(self, batch_dict, training=False):
        points, mask = batch_dict["points"], batch_dict["points_mask"]
        gdims = grid_size(self.point_cloud_range, self.voxel_size)

        def single(pts, msk):
            coords, in_range = compute_voxel_coords(
                pts[:, :3], self.point_cloud_range, self.voxel_size
            )
            out = voxelize(
                pts, coords, msk & in_range, num_voxels=self.max_voxels,
                max_points=self.max_points_per_voxel, grid_dims=gdims,
            )
            cnt = jnp.maximum(out["num_points"], 1)[:, None].astype(pts.dtype)
            feats = out["voxels"].sum(axis=1) / cnt
            return feats, out["coordinates"], out["num_points"]

        feats, coords, counts = jax.vmap(single)(points, mask)
        batch_dict["voxel_features"] = feats
        batch_dict["voxel_coords"] = coords
        batch_dict["voxel_num_points"] = counts
        batch_dict["voxel_mask"] = counts > 0
        return batch_dict


class PillarVFE(nn.Module):
    """PointPillars feature net (parity: pillar_vfe.py:52-123).

    Augments each in-pillar point with (xyz - pillar_mean) and
    (xy - pillar_center) [+ z-center when USE_ABSLOTE_XYZ off], then a
    Linear+BN+ReLU stack max-pooled over the pillar's points. The per-point
    linear layers batch to one big (B*V*P, C) matmul on the MXU.
    """
    model_cfg: dict
    num_point_features: int
    voxel_size: tuple
    point_cloud_range: tuple
    max_voxels: int
    max_points_per_voxel: int

    def get_output_feature_dim(self):
        return int(self.model_cfg["NUM_FILTERS"][-1])

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        use_norm = cfg.get("USE_NORM", True)
        with_distance = cfg.get("WITH_DISTANCE", False)
        use_abs_xyz = cfg.get("USE_ABSLOTE_XYZ", True)
        num_filters = list(cfg["NUM_FILTERS"])

        points, mask = batch_dict["points"], batch_dict["points_mask"]
        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.point_cloud_range[:3]
        gdims = grid_size(self.point_cloud_range, self.voxel_size)

        def single(pts, msk):
            coords, in_range = compute_voxel_coords(
                pts[:, :3], self.point_cloud_range, self.voxel_size
            )
            return voxelize(
                pts, coords, msk & in_range, num_voxels=self.max_voxels,
                max_points=self.max_points_per_voxel, grid_dims=gdims,
            )

        out = jax.vmap(single)(points, mask)
        voxels = out["voxels"]            # (B, V, P, C)
        coords = out["coordinates"]       # (B, V, 3) zyx
        npts = out["num_points"]          # (B, V)
        B, V, P, C = voxels.shape
        pt_valid = (
            jnp.arange(P)[None, None, :] < npts[:, :, None]
        )  # (B, V, P)

        xyz = voxels[..., :3]
        cnt = jnp.maximum(npts, 1)[..., None, None].astype(xyz.dtype)
        mean_xyz = xyz.sum(axis=2, keepdims=True) / cnt
        f_cluster = xyz - mean_xyz

        cx = (coords[..., 2:3].astype(xyz.dtype) + 0.5) * vx + x0
        cy = (coords[..., 1:2].astype(xyz.dtype) + 0.5) * vy + y0
        cz = (coords[..., 0:1].astype(xyz.dtype) + 0.5) * vz + z0
        center = jnp.concatenate([cx, cy, cz], axis=-1)[:, :, None, :]
        f_center = xyz - center

        feats = [voxels if use_abs_xyz else voxels[..., 3:], f_cluster, f_center]
        if with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        features = jnp.concatenate(feats, axis=-1)
        features = features * pt_valid[..., None].astype(features.dtype)

        for i, n_out in enumerate(num_filters):
            features = nn.Dense(n_out, use_bias=not use_norm, name=f"pfn_{i}")(features)
            if use_norm:
                features = nn.BatchNorm(
                    use_running_average=not training, momentum=0.99,
                    epsilon=1e-3, name=f"pfn_bn_{i}",
                )(features)
            features = nn.relu(features)
            features = jnp.where(pt_valid[..., None], features, -1e9)
            pooled = features.max(axis=2)  # (B, V, n_out)
            if i < len(num_filters) - 1:
                features = jnp.concatenate(
                    [jnp.where(pt_valid[..., None], features, 0.0),
                     jnp.broadcast_to(pooled[:, :, None, :], features.shape[:3] + (n_out,))],
                    axis=-1,
                )

        vmask = npts > 0
        pooled = jnp.where(vmask[..., None], pooled, 0.0)
        batch_dict["pillar_features"] = pooled
        batch_dict["voxel_features"] = pooled
        batch_dict["voxel_coords"] = coords
        batch_dict["voxel_mask"] = vmask
        return batch_dict


class DynamicMeanVFE(MeanVFE):
    """Parity: dynamic_mean_vfe.py (torch_scatter scatter_mean). Our MeanVFE
    is already 'dynamic' — device-side voxelization IS a segment reduction
    with no per-voxel point cap beyond the buffer; this alias preserves the
    reference registry name."""


class DynamicPillarVFE(PillarVFE):
    """Parity: dynamic_pillar_vfe.py — same note as DynamicMeanVFE."""


class MeanDensityVFE(MeanVFE):
    """Mean VFE + per-voxel point-count density channel
    (parity: vfe/__init__.py MeanDensityVFE)."""

    def get_output_feature_dim(self):
        return self.num_point_features + 1

    @nn.compact
    def __call__(self, batch_dict, training=False):
        batch_dict = super().__call__(batch_dict, training)
        density = batch_dict["voxel_mask"].astype(jnp.float32)
        # recompute counts from mask-carrying voxelize output is not stored;
        # density = normalized point count channel
        cnt = batch_dict.get("voxel_num_points", None)
        if cnt is None:
            cnt = density
        batch_dict["voxel_features"] = jnp.concatenate(
            [batch_dict["voxel_features"], cnt[..., None].astype(jnp.float32)],
            axis=-1,
        )
        return batch_dict


class SPVFE(MeanVFE):
    """Sorted-pillar VFE (parity: vfe/sort_points.py SPVFE): voxel means
    refined by a per-voxel MLP. Compact functional equivalent of the
    experimental variant (unused by shipped configs)."""

    def get_output_feature_dim(self):
        return int(self.model_cfg.get("NUM_FILTERS", [32])[-1])

    @nn.compact
    def __call__(self, batch_dict, training=False):
        batch_dict = MeanVFE.__call__(self, batch_dict, training)
        feats = batch_dict["voxel_features"]
        vmask = batch_dict["voxel_mask"]
        for i, c in enumerate(self.model_cfg.get("NUM_FILTERS", [32])):
            feats = nn.Dense(int(c), use_bias=False, name=f"spv_fc{i}")(feats)
            feats = nn.BatchNorm(
                use_running_average=not training, momentum=0.99,
                epsilon=1e-3, name=f"spv_bn{i}",
            )(feats, mask=vmask[..., None])
            feats = nn.relu(feats)
        batch_dict["voxel_features"] = jnp.where(vmask[..., None], feats, 0.0)
        return batch_dict


class VPCVFE(SPVFE):
    """Voxelwise point-conv VFE (parity: vfe/voxelwisePointConv.py VPCVFE).
    Same compact per-voxel MLP refinement contract as SPVFE."""
