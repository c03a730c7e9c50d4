"""Sparse -> dense BEV projection (flax).

Parity: pcdet/models/backbones_2d/map_to_bev/{pointpillar_scatter.py,
height_compression.py}. Channels-last: spatial features are (B, ny, nx, C)
(the reference is NCHW; NHWC is the native TPU conv layout).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class PointPillarScatter(nn.Module):
    """Scatter pillar features into the dense BEV canvas
    (parity: pointpillar_scatter.py:5-37)."""
    model_cfg: dict
    grid_size: tuple  # (nx, ny, nz) with nz == 1

    @nn.compact
    def __call__(self, batch_dict, training=False):
        feats = batch_dict.get(
            "pillar_features", batch_dict.get("voxel_features")
        )                                        # (B, V, C)
        coords = batch_dict["voxel_coords"]     # (B, V, 3) zyx
        vmask = batch_dict["voxel_mask"]
        nx, ny, nz = int(self.grid_size[0]), int(self.grid_size[1]), int(self.grid_size[2])
        assert nz == 1
        C = feats.shape[-1]

        def single(f, c, m):
            canvas = jnp.zeros((ny, nx, C), f.dtype)
            yy = jnp.where(m, c[:, 1], ny)  # invalid -> dropped
            xx = jnp.where(m, c[:, 2], 0)
            return canvas.at[yy, xx].set(f, mode="drop")

        batch_dict["spatial_features"] = jax.vmap(single)(feats, coords, vmask)
        return batch_dict


class Conv2DCollapse(nn.Module):
    """Collapse a dense (B, nx, ny, nz, C) voxel volume to BEV with a
    learned 1x1 conv (parity: map_to_bev/conv2d_collapse.py — CaDDN)."""
    model_cfg: dict

    @nn.compact
    def __call__(self, batch_dict, training=False):
        vox = batch_dict["spatial_features_3d"]      # (B, nx, ny, nz, C)
        B, nx, ny, nz, C = vox.shape
        x = vox.transpose(0, 2, 1, 3, 4).reshape(B, ny, nx, nz * C)
        out_ch = int(self.model_cfg.get("NUM_BEV_FEATURES", 64))
        x = nn.Conv(out_ch, (1, 1), use_bias=False, name="collapse")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3, name="bn")(x)
        batch_dict["spatial_features"] = nn.relu(x)
        return batch_dict


class HeightCompression(nn.Module):
    """Collapse the z axis of a dense 3D feature volume into channels
    (parity: height_compression.py:10-26). Expects
    batch_dict['encoded_spconv_tensor'] as dense (B, nz, ny, nx, C)."""
    model_cfg: dict

    @nn.compact
    def __call__(self, batch_dict, training=False):
        dense = batch_dict["encoded_spconv_tensor"]  # (B, nz, ny, nx, C)
        B, nz, ny, nx, C = dense.shape
        batch_dict["spatial_features"] = dense.transpose(0, 2, 3, 1, 4).reshape(
            B, ny, nx, nz * C
        )
        batch_dict["spatial_features_stride"] = batch_dict.get(
            "encoded_spconv_tensor_stride", 8
        )
        return batch_dict
