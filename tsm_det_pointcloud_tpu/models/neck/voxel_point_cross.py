"""VoxelPointCross neck — BEV <-> point bidirectional fusion (flax).

Parity: pcdet/models/neck/VoxelPointCross.py:14-535, the TSM project's
experimental neck (registry neck/__init__.py:5-9; unreachable from any
shipped reference config, so the config schema is defined here after the
module's __init__ reads).

Architecture (reference line refs):
  * ``v_input``  conv 3x3 -> 128 over spatial_features (:41-45)
  * five ``v2p_k`` "voxel-to-point" blocks, each conv(128->64->128)
    (:46-85), chained through four ``p2v_k`` blocks and four ``v_k``
    residual-concat blocks: v_k = conv(cat[v_{k-1}, p2v_k(v2p_k)])
    (:437-453)
  * a point branch seeded by multi-scale voxel-neighbor pooling at the raw
    points (``point_grid_pool`` with NeighborVoxelSAModuleMSG, :20-36,
    :347-409) projected to 128 (:234-238)
  * the five v2p maps are bilinearly read at the points and folded in a
    cascade p_k = Linear(cat[p_{k-1}, v2p_k @ points]) (:461-499)
  * outputs: spatial_features_2d = v4, encoded_point_features = p5
    (:506-507)

Config: POINT_GRID_POOL {FEATURES_SOURCE, POOL_LAYERS{src: {MLPS,
POOL_RADIUS, NSAMPLE, QUERY_RANGES}}}, NUM_FILTERS (trunk width, reference
hardcodes 128).

TPU-first notes: points are fixed-capacity (B, N, 3) with masks; the
ragged per-sample interpolation loop becomes a vmapped bilinear gather;
the voxel pooling reuses the shared PointGridPool module.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones_2d.point_bev_hybrids import (
    ConvBlock, PointGridPool, _pixels, interp_bev,
)
from ..backbones_3d.pointnet2_modules import SharedMLP


class VoxelPointCross(nn.Module):
    model_cfg: dict
    voxel_size: tuple
    point_cloud_range: tuple

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        ch = int(cfg.get("NUM_FILTERS", 128))
        # the reference neck replaces the 2D backbone and reads the raw map
        # (:413); when a 2D backbone DID run, consume its output instead so
        # the stride contract downstream (anchor grids) is preserved
        if "spatial_features_2d" in batch_dict:
            bev = batch_dict["spatial_features_2d"]        # (B, H, W, C)
            stride = int(batch_dict.get("spatial_features_2d_stride",
                                        batch_dict.get(
                                            "spatial_features_stride", 2)))
        else:
            bev = batch_dict["spatial_features"]
            stride = int(batch_dict.get("encoded_spconv_tensor_stride", 8))
        if "point_coords" in batch_dict:
            pts = batch_dict["point_coords"]
            pvalid = batch_dict.get(
                "point_valid", jnp.ones(pts.shape[:2], bool))
        else:
            pts = batch_dict["points"][..., :3]
            pvalid = batch_dict.get(
                "points_mask", jnp.ones(pts.shape[:2], bool))
        if pvalid.shape != pts.shape[:2]:  # stale mask from another set
            pvalid = jnp.ones(pts.shape[:2], bool)

        # ---- point seed: multi-scale voxel pooling OR existing features
        if "multi_scale_3d_features" in batch_dict and cfg.get(
            "POINT_GRID_POOL"
        ):
            pooled, _ = PointGridPool(
                pool_cfg=dict(cfg["POINT_GRID_POOL"]),
                voxel_size=self.voxel_size,
                point_cloud_range=self.point_cloud_range,
                name="point_grid_pool",
            )(batch_dict, pts, pvalid, training)
        else:
            pooled = batch_dict["point_features"]
        pfeat = SharedMLP([ch], name="point_features")(
            pooled, training, mask=pvalid[..., None])

        # ---- BEV cross trunk: 5 x (v2p -> p2v -> v) (:437-453) ----
        x = ConvBlock((ch,), name="v_input")(bev, training)
        v2p_maps = []
        state = x
        for k in range(5):
            v2p = ConvBlock((ch // 2, ch), name=f"v2p_{k + 1}")(
                state, training)
            v2p_maps.append(v2p)
            if k == 4:
                break
            p2v = ConvBlock((ch // 2, ch), name=f"p2v_{k + 1}")(
                v2p, training)
            state = ConvBlock((ch, ch), name=f"v{k + 1}")(
                jnp.concatenate([state, p2v], -1), training)

        # ---- point cascade over the five v2p reads (:461-499) ----
        px, py = _pixels(pts, self.voxel_size, self.point_cloud_range,
                         stride)
        p = pfeat
        for k, m in enumerate(v2p_maps):
            read = interp_bev(m, px, py)
            p = SharedMLP([ch, ch], name=f"p{k + 1}_out")(
                jnp.concatenate([p, read], -1), training,
                mask=pvalid[..., None])
        p = jnp.where(pvalid[..., None], p, 0.0)

        batch_dict["spatial_features"] = state
        batch_dict["spatial_features_2d"] = state
        batch_dict["point_coords"] = pts
        batch_dict["point_valid"] = pvalid
        batch_dict["point_features"] = p
        batch_dict["encoded_point_features"] = p
        return batch_dict
