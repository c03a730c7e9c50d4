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

        # --- image backbone / DDN (registry: ddn.py). Default stays the
        # compact stand-in; DDN.NAME == 'DDNDeepLabV3' selects the real
        # ResNet+ASPP architecture (reference ffn/ddn_deeplabv3.py —
        # untrained here: pretrained ImageNet weights are unportable
        # without egress, the documented delta) ---
        from .ddn import DDN_REGISTRY

        ddn_cfg = dict(cfg.get("DDN", {}))
        ddn_name = ddn_cfg.pop("NAME", "CompactDDN")
        kw = {k.lower(): v for k, v in ddn_cfg.items()}
        feats, depth_logits = DDN_REGISTRY[ddn_name](
            num_feat=C, num_logits=D, name="ddn", **kw
        )(images, training)
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
            if "gt_boxes2d" in batch_dict:
                # fg/bg balancer (parity: ffn/ddn_loss/balancer.py):
                # points projecting inside a gt 2D box weigh FG_WEIGHT,
                # the rest BG_WEIGHT; fg and bg sums each normalize by
                # the total supervised count
                fg_w = float(cfg.get("FG_WEIGHT", 13.0))
                bg_w = float(cfg.get("BG_WEIGHT", 1.0))
                b2d = batch_dict["gt_boxes2d"]       # (B, Nb, 4) u1v1u2v2
                b2m = batch_dict.get(
                    "gt_boxes2d_mask",
                    jnp.any(b2d != 0, axis=-1),
                )
                uf = us.astype(jnp.float32) * ds
                vf = vs.astype(jnp.float32) * ds
                inb = (
                    (uf[:, :, None] >= b2d[:, None, :, 0])
                    & (uf[:, :, None] < b2d[:, None, :, 2])
                    & (vf[:, :, None] >= b2d[:, None, :, 1])
                    & (vf[:, :, None] < b2d[:, None, :, 3])
                    & b2m[:, None, :]
                ).any(-1)                            # (B, P)
                fg = inb & oks
                bg = (~inb) & oks
                total = jnp.maximum(oks.sum(), 1.0)
                batch_dict["loss_depth"] = (
                    (focal * fg * fg_w).sum() / total
                    + (focal * bg * bg_w).sum() / total
                )
            else:
                batch_dict["loss_depth"] = (
                    (focal * oks).sum() / jnp.maximum(oks.sum(), 1.0)
                )
        return batch_dict
