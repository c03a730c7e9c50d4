"""Voxel Set Abstraction — PV-RCNN keypoint feature extraction (flax).

Parity: pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py:124-411 —
FPS keypoints from the raw cloud, then per-source aggregation:
  * raw_points: ball-query MSG over the raw cloud,
  * x_conv1..4: ball-query MSG over the sparse tensors' voxel centers
    (the reference's stack SA modules over `multi_scale_3d_features`),
  * bev: bilinear interpolation of the dense BEV map at keypoint xy,
finally fused by a Dense layer into `point_features` (B, K, C).

TPU design: all support sets are fixed-capacity (sparse tensors carry
valid masks), so each source is a masked (K, V) distance grid + one MXU
einsum per MLP layer; no stacked-batch bookkeeping.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ....ops import grouping, sampling
from ..pointnet2_modules import SharedMLP


def voxel_centers(coords_zyx, stride, voxel_size, point_cloud_range):
    """(V, 3) int zyx coords at `stride` -> (V, 3) metric xyz centers."""
    vs = jnp.asarray(voxel_size, jnp.float32) * stride
    origin = jnp.asarray(point_cloud_range[:3], jnp.float32)
    xyz_idx = coords_zyx[..., ::-1].astype(jnp.float32)  # -> x, y, z
    return (xyz_idx + 0.5) * vs + origin


def bilinear_interpolate(bev, x, y):
    """bev (H, W, C); x/y (K,) in pixel units -> (K, C)."""
    H, W, _ = bev.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    x1, y1 = x0 + 1, y0 + 1
    wx = jnp.clip(x - x0.astype(x.dtype), 0.0, 1.0)
    wy = jnp.clip(y - y0.astype(y.dtype), 0.0, 1.0)
    v00 = bev[y0, x0]
    v01 = bev[y0, x1]
    v10 = bev[y1, x0]
    v11 = bev[y1, x1]
    return (
        v00 * ((1 - wx) * (1 - wy))[:, None]
        + v01 * (wx * (1 - wy))[:, None]
        + v10 * ((1 - wx) * wy)[:, None]
        + v11 * (wx * wy)[:, None]
    )


class SAGroup(nn.Module):
    """Ball-query MSG aggregation of a (fixed-capacity) support set at given
    query points — the stack-SA building block."""
    radii: tuple
    nsamples: tuple
    mlps: tuple
    use_xyz: bool = True

    @nn.compact
    def __call__(self, query_xyz, support_xyz, support_feats, support_valid,
                 training=False):
        q_valid = jnp.ones(query_xyz.shape[:2], bool)
        scales = [(0.0, float(r), int(ns))
                  for r, ns in zip(self.radii, self.nsamples)]
        groups = grouping.query_group_scales(
            support_xyz, support_feats, support_valid, query_xyz, q_valid,
            scales, self.use_xyz,
        )
        outs = []
        for i, ((grouped, slot_ok, cnt), mlp) in enumerate(
            zip(groups, self.mlps)
        ):
            h = SharedMLP(list(mlp), name=f"mlp{i}")(
                grouped, training, mask=slot_ok[..., None]
            )
            h = jnp.where(slot_ok[..., None], h, -1e9).max(axis=2)
            h = jnp.where(cnt[..., None] > 0, h, 0.0)
            outs.append(h)
        return jnp.concatenate(outs, -1)


class VoxelSetAbstraction(nn.Module):
    model_cfg: dict
    voxel_size: tuple
    point_cloud_range: tuple
    num_bev_features: int = 256
    num_rawpoint_features: int = 4

    @property
    def num_point_features(self):
        return int(self.model_cfg["NUM_OUTPUT_FEATURES"])

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        n_kp = int(cfg["NUM_KEYPOINTS"])
        points = batch_dict["points"]
        pmask = batch_dict["points_mask"]
        xyz = points[..., :3]

        # --- keypoint sampling (FPS / sectorized-FPS over the raw cloud) ---
        method = str(cfg.get("SAMPLE_METHOD", "FPS"))
        if method in ("SPC", "SectorFPS"):
            from .vector_pool import sectorized_fps

            idx = sectorized_fps(
                xyz, pmask, n_kp,
                num_sectors=int(cfg.get("SPC_SAMPLING", {}).get(
                    "NUM_SECTORS", 6
                )),
            )
        else:
            idx = sampling.furthest_point_sample(xyz, n_kp, pmask)
        keypoints = sampling.gather_points(xyz, idx)          # (B, K, 3)
        kp_valid = jnp.take_along_axis(pmask, idx, axis=1)

        feats = []
        src_names = list(cfg["FEATURES_SOURCE"])
        sa_cfg = cfg.get("SA_LAYER", {})

        if "bev" in src_names:
            bev = batch_dict["spatial_features"]  # (B, H, W, C) NHWC
            stride = batch_dict.get("spatial_features_stride", 8)
            vx = self.voxel_size[0] * stride
            vy = self.voxel_size[1] * stride

            def one(bm, kp):
                px = (kp[:, 0] - self.point_cloud_range[0]) / vx
                py = (kp[:, 1] - self.point_cloud_range[1]) / vy
                return bilinear_interpolate(bm, px, py)

            feats.append(jax.vmap(one)(bev, keypoints))

        def make_group(sc, name):
            # PV-RCNN++ sources use VectorPool, PV-RCNN plain ball-MSG
            if str(sc.get("NAME", "")) == "VectorPoolAggregationModuleMSG":
                from .vector_pool import VectorPoolAggregationModuleMSG

                n_scale = len(sc["POOL_RADIUS"])
                return VectorPoolAggregationModuleMSG(
                    radii=tuple(sc["POOL_RADIUS"]),
                    nsamples=tuple(sc["NSAMPLE"]),
                    local_grids=tuple(
                        tuple(g) for g in sc.get(
                            "LOCAL_GRIDS", [[3, 3, 3]] * n_scale
                        )
                    ),
                    mlps=tuple(tuple(m) for m in sc["MLPS"]),
                    aggregation_mlp=(
                        list(sc["AGGREGATION_MLPS"])
                        if sc.get("AGGREGATION_MLPS") else None
                    ),
                    name=name,
                )
            return SAGroup(
                radii=tuple(sc["POOL_RADIUS"]),
                nsamples=tuple(sc["NSAMPLE"]),
                mlps=tuple(tuple(m) for m in sc["MLPS"]),
                name=name,
            )

        if "raw_points" in src_names:
            rp = sa_cfg["raw_points"]
            raw_feats = points[..., 3:] if points.shape[-1] > 3 else None
            feats.append(make_group(rp, "sa_rawpoints")(
                keypoints, xyz, raw_feats, pmask, training
            ))

        for src in src_names:
            if not src.startswith("x_conv"):
                continue
            st = batch_dict["multi_scale_3d_features"][src]
            stride = batch_dict["multi_scale_3d_strides"][src]
            sc = sa_cfg[src]
            centers = jax.vmap(
                lambda c: voxel_centers(
                    c, stride, self.voxel_size, self.point_cloud_range
                )
            )(st.coords)
            feats.append(make_group(sc, f"sa_{src}")(
                keypoints, centers, st.features, st.valid, training
            ))

        fused = jnp.concatenate(feats, -1)
        out = nn.Dense(
            int(cfg["NUM_OUTPUT_FEATURES"]), use_bias=False,
            name="vsa_point_feature_fusion",
        )(fused)
        out = nn.BatchNorm(
            use_running_average=not training, momentum=0.99, epsilon=1e-3,
            name="fusion_bn",
        )(out, mask=kp_valid[..., None])
        out = nn.relu(out)
        out = jnp.where(kp_valid[..., None], out, 0.0)

        batch_dict["point_features_before_fusion"] = fused
        batch_dict["point_features"] = out
        batch_dict["point_coords"] = keypoints
        batch_dict["point_valid"] = kp_valid
        return batch_dict
