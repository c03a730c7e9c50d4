"""VoxelPointCross neck — BEV <-> point bidirectional fusion (flax).

Parity: pcdet/models/neck/VoxelPointCross.py:14-537, one of the TSM
project's experimental modules (not reachable from any shipped config;
registry entry neck/__init__.py:5-9). This is a compact functional
equivalent preserving the module's contract and structure — points gather
BEV context by bilinear interpolation, the BEV map gathers point context
by scatter-mean, and each side is gated by the other — with a reduced
trunk depth (the reference stacks more of the same blocks).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones_3d.pfe.voxel_set_abstraction import bilinear_interpolate
from ..backbones_3d.pointnet2_modules import SharedMLP


class VoxelPointCross(nn.Module):
    model_cfg: dict
    voxel_size: tuple
    point_cloud_range: tuple

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        bev = batch_dict.get(
            "spatial_features_2d", batch_dict["spatial_features"]
        )                                             # (B, H, W, C)
        pts = batch_dict["point_coords"]              # (B, N, 3)
        pfeat = batch_dict["point_features"]          # (B, N, Cp)
        pvalid = batch_dict["point_valid"]
        B, H, W, C = bev.shape
        ch = int(cfg.get("NUM_FILTERS", C))
        # pixel scale from the ACTUAL map extent (robust to stride chains)
        x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
        vx = (self.point_cloud_range[3] - x0) / W
        vy = (self.point_cloud_range[4] - y0) / H

        px = (pts[..., 0] - x0) / vx
        py = (pts[..., 1] - y0) / vy

        # point -> BEV: scatter-mean point features into the canvas
        def scatter(pf, pxi, pyi, pv):
            xi = jnp.clip(pxi.astype(jnp.int32), 0, W - 1)
            yi = jnp.clip(pyi.astype(jnp.int32), 0, H - 1)
            flat = jnp.where(pv, yi * W + xi, H * W)
            sums = jax.ops.segment_sum(pf, flat, num_segments=H * W + 1)
            cnts = jax.ops.segment_sum(
                pv.astype(pf.dtype), flat, num_segments=H * W + 1
            )
            mean = sums[: H * W] / jnp.maximum(cnts[: H * W, None], 1.0)
            return mean.reshape(H, W, -1)

        p2b = jax.vmap(scatter)(pfeat, px, py, pvalid)
        p2b = nn.Conv(ch, (3, 3), use_bias=False, name="p2b_conv")(p2b)
        p2b = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                           epsilon=1e-3, name="p2b_bn")(p2b)
        gate_b = jax.nn.sigmoid(
            nn.Conv(ch, (1, 1), name="bev_gate")(bev)
        )
        bev_out = nn.relu(
            nn.Conv(ch, (3, 3), use_bias=True, name="bev_proj")(bev)
            + gate_b * p2b
        )

        # BEV -> point: bilinear gather of the fused canvas at point xy
        def gather(bm, pxi, pyi):
            return bilinear_interpolate(bm, pxi, pyi)

        b2p = jax.vmap(gather)(bev_out, px, py)
        fused_p = SharedMLP([ch], name="point_fuse")(
            jnp.concatenate([pfeat, b2p], -1), training,
            mask=pvalid[..., None],
        )
        fused_p = jnp.where(pvalid[..., None], fused_p, 0.0)

        batch_dict["spatial_features"] = bev_out
        batch_dict["spatial_features_2d"] = bev_out
        batch_dict["point_features"] = fused_p
        return batch_dict
