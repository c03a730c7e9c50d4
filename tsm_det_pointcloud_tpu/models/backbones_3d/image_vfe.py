"""CaDDN image VFE — camera-only frustum features to 3D voxels (flax).

Parity: pcdet/models/backbones_3d/vfe/image_vfe.py + image_vfe_modules/
{ffn/ddn (depth distribution network), f2v (frustum-to-voxel transform)}:
an image backbone produces features + a categorical depth distribution
over LID-discretized bins; voxel features are image features weighted by
the depth probability at each voxel's projected (u, v, depth).

TPU design: instead of materializing the dense (B, h, w, D, C) frustum
tensor and trilinear-sampling it (the reference's f2v), each voxel center
projects to the image once and gathers feature * depth-prob directly —
one gather per voxel over a fused (h, w) map. Depth supervision projects
the lidar points to sparse depth targets with a focal loss over bins.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def lid_to_bin(depth, num_bins, depth_min, depth_max):
    """LID discretization (CaDDN eq. 2): bin sizes grow linearly."""
    span = depth_max - depth_min
    bin_size = 2 * span / (num_bins * (1 + num_bins))
    idx = -0.5 + 0.5 * jnp.sqrt(1 + 8 * jnp.maximum(depth - depth_min, 0.0) / bin_size)
    return jnp.clip(idx, 0, num_bins - 1).astype(jnp.int32)


class ConvBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, training=False):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3)(x)
        return nn.relu(x)


class ImageVFE(nn.Module):
    """Image backbone + depth head + frustum-to-voxel gather."""
    model_cfg: dict
    grid_size: tuple            # (nx, ny, nz)
    point_cloud_range: tuple
    voxel_size: tuple
    downsample_factor: int = 8

    def get_output_feature_dim(self):
        return int(self.model_cfg.get("NUM_OUTPUT_FEATURES", 64))

    @nn.compact
    def __call__(self, batch_dict, training=False):
        cfg = self.model_cfg
        images = batch_dict["images"]          # (B, H, W, 3) in [0, 1]
        lidar_to_img = batch_dict["trans_lidar_to_cam_img"]  # (B, 3, 4)
        D = int(cfg.get("NUM_DEPTH_BINS", 80))
        dmin, dmax = cfg.get("DEPTH_RANGE", (2.0, 46.8))
        C = self.get_output_feature_dim()
        ds = self.downsample_factor

        # --- image backbone (compact DDN stand-in; the reference wraps a
        # torchvision DeepLabV3-ResNet101, ffn/ddn_deeplabv3.py) ---
        x = ConvBlock(32, 2)(images, training)
        x = ConvBlock(32)(x, training)
        x = ConvBlock(64, 2)(x, training)
        x = ConvBlock(64)(x, training)
        x = ConvBlock(C, 2)(x, training)
        feats = ConvBlock(C)(x, training)          # (B, H/8, W/8, C)
        depth_logits = nn.Conv(D, (1, 1), name="depth_head")(feats)
        depth_prob = jax.nn.softmax(depth_logits, axis=-1)

        B, hf, wf, _ = feats.shape

        # --- frustum-to-voxel: project voxel centers, gather feat * prob ---
        nx, ny, nz = (int(v) for v in self.grid_size)
        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.point_cloud_range[:3]
        gx = (jnp.arange(nx) + 0.5) * vx + x0
        gy = (jnp.arange(ny) + 0.5) * vy + y0
        gz = (jnp.arange(nz) + 0.5) * vz + z0
        centers = jnp.stack(
            jnp.meshgrid(gx, gy, gz, indexing="ij"), -1
        ).reshape(-1, 3)                            # (nx*ny*nz, 3)
        ones = jnp.ones((centers.shape[0], 1), centers.dtype)
        hom = jnp.concatenate([centers, ones], -1)  # (V, 4)

        def sample_one(feat, prob, P):
            uvw = hom @ P.T                         # (V, 3)
            depth = uvw[:, 2]
            u = uvw[:, 0] / jnp.maximum(depth, 1e-3) / ds
            v = uvw[:, 1] / jnp.maximum(depth, 1e-3) / ds
            inside = (
                (u >= 0) & (u < wf) & (v >= 0) & (v < hf)
                & (depth > dmin) & (depth < dmax)
            )
            ui = jnp.clip(u.astype(jnp.int32), 0, wf - 1)
            vi = jnp.clip(v.astype(jnp.int32), 0, hf - 1)
            dbin = lid_to_bin(depth, D, dmin, dmax)
            f = feat[vi, ui]                        # (V, C)
            p = prob[vi, ui, dbin]                  # (V,)
            out = f * p[:, None]
            return jnp.where(inside[:, None], out, 0.0)

        vox = jax.vmap(sample_one)(feats, depth_prob, lidar_to_img)
        vox = vox.reshape(B, nx, ny, nz, C)
        batch_dict["voxel_features_dense"] = vox
        # BEV collapse target (Conv2DCollapse consumes this)
        batch_dict["spatial_features_3d"] = vox

        if training and "points" in batch_dict:
            # depth supervision from projected lidar (ffn losses)
            pts = batch_dict["points"][..., :3]
            pmask = batch_dict.get(
                "points_mask", jnp.ones(pts.shape[:2], bool)
            )

            def depth_targets(p, m, P):
                homp = jnp.concatenate(
                    [p, jnp.ones((p.shape[0], 1), p.dtype)], -1
                )
                uvw = homp @ P.T
                depth = uvw[:, 2]
                u = (uvw[:, 0] / jnp.maximum(depth, 1e-3) / ds).astype(jnp.int32)
                v = (uvw[:, 1] / jnp.maximum(depth, 1e-3) / ds).astype(jnp.int32)
                ok = m & (u >= 0) & (u < wf) & (v >= 0) & (v < hf) & \
                    (depth > dmin) & (depth < dmax)
                return u, v, lid_to_bin(depth, D, dmin, dmax), ok

            us, vs, bins, oks = jax.vmap(depth_targets)(
                pts, pmask, lidar_to_img
            )
            logits_at = jax.vmap(
                lambda lg, v_, u_: lg[v_, u_]
            )(depth_logits, jnp.clip(vs, 0, hf - 1), jnp.clip(us, 0, wf - 1))
            logp = jax.nn.log_softmax(logits_at, axis=-1)
            nll = -jnp.take_along_axis(logp, bins[..., None], -1)[..., 0]
            pt = jnp.exp(-nll)
            focal = ((1 - pt) ** 2) * nll           # focal depth loss
            batch_dict["loss_depth"] = (
                (focal * oks).sum() / jnp.maximum(oks.sum(), 1.0)
            )
        return batch_dict
