"""PointNet++ set-abstraction / feature-propagation modules (flax).

Parity: pcdet/ops/pointnet2/pointnet2_batch/pointnet2_modules.py —
`PointnetSAModuleMSG` (:66), `PointnetSAModuleFSMSG` (3DSSD fusion sampling
with d-fps/f-fps/s-fps + dilated grouping + aggregation/confidence MLPs,
:181-403), `PointnetFPModule` (:130).

TPU design: all shapes static — (B, N, 3) xyz + (B, N) valid masks; FPS
variants are fori_loop argmax scans (ops/sampling.py); ball queries are
masked tiled distance grids (ops/grouping.py); the per-scale "1x1 Conv2d"
MLPs become Dense stacks over channels-last grouped tensors
(B, M, nsample, C) — each layer is one big MXU matmul.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import grouping, sampling


def safe_bn_mask(mask):
    """Guard a BatchNorm element mask against the all-empty case.

    flax computes masked stats as mean(x, where=mask); a mask with zero
    true entries yields NaN mean/var which would poison batch_stats (and
    every later eval forward).  Empty groups DO occur (e.g. a dilated
    voxel-query annulus with no centroids in range), so when the mask is
    empty, fall back to all-True: inputs are already where-masked to 0,
    giving mean 0 / var 0 — finite and harmless.
    """
    if mask is None:
        return None
    empty = jnp.logical_not(jnp.any(mask))
    return jnp.logical_or(mask, empty)


class SharedMLP(nn.Module):
    """Dense + BN + ReLU stack over the trailing channel axis.

    Honors TSM_COMPUTE_DTYPE=bfloat16 (ops/spconv.compute_dtype): the
    activation stream between layers rides bf16 — halves HBM traffic on
    the (B, M, nsample, C) grouped tensors — while params and BN batch
    statistics stay float32 (flax computes half-precision stats in f32).
    Downstream head output layers keep f32 params with dtype unset, so
    logits/regressions promote back to float32 automatically.
    """
    channels: Sequence[int]
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, training=False, mask=None):
        from ...ops.spconv import compute_dtype

        cd = compute_dtype()
        mask = safe_bn_mask(mask)
        for i, c in enumerate(self.channels):
            x = nn.Dense(
                c, use_bias=not self.use_norm, dtype=cd, name=f"fc{i}"
            )(x)
            if self.use_norm:
                x = nn.BatchNorm(
                    use_running_average=not training, momentum=0.99,
                    epsilon=1e-3, dtype=cd, name=f"bn{i}",
                )(x, mask=mask)
            x = nn.relu(x)
        return x


def sample_by_methods(xyz, features, scores, valid, npoint_list,
                      sample_range_list, sample_method_list, gamma=1.0):
    """Fusion sampling (parity: PointnetSAModuleFSMSG forward sampling loop).

    Each (npoint, [lo, hi], method) picks npoint indices from xyz[lo:hi]:
      d-fps: euclidean FPS; f-fps: FPS on a feature+xyz distance matrix;
      s-fps: FPS weighted by sigmoid(max cls score)^gamma (confidence);
      rand/ctr-like variants are not used by the shipped configs.
    Returns concatenated global indices (B, sum(npoints)).
    """
    out = []
    for npoint, (lo, hi), method in zip(
        npoint_list, sample_range_list, sample_method_list
    ):
        sub_xyz = xyz[:, lo:hi]
        sub_valid = valid[:, lo:hi]
        if method in ("d-fps", "D-FPS"):
            idx = sampling.furthest_point_sample(sub_xyz, npoint, sub_valid)
        elif method in ("f-fps", "F-FPS"):
            feats = features[:, lo:hi]
            d_xyz = jnp.sum(
                (sub_xyz[:, :, None, :] - sub_xyz[:, None, :, :]) ** 2, -1
            )
            d_feat = jnp.sum(
                (feats[:, :, None, :] - feats[:, None, :, :]) ** 2, -1
            )
            idx = sampling.furthest_point_sample_matrix(
                d_xyz + d_feat, npoint, sub_valid
            )
        elif method in ("s-fps", "S-FPS"):
            assert scores is not None, "s-fps needs confidence scores"
            w = jax.nn.sigmoid(scores[:, lo:hi].max(axis=-1)) ** gamma
            idx = sampling.furthest_point_sample_weights(
                sub_xyz, w, npoint, sub_valid
            )
        else:
            raise NotImplementedError(method)
        out.append(idx + lo)
    return jnp.concatenate(out, axis=1)


def group_and_mask(xyz, features, valid, new_xyz, new_valid, idx, cnt,
                   use_xyz=True):
    """Gather neighbors, re-center xyz, zero padded slots.
    Returns grouped (B, M, ns, 3+C or C) and slot mask (B, M, ns)."""
    g_xyz = grouping.group_points(xyz, idx) - new_xyz[:, :, None, :]
    slot_ok = (
        (jnp.arange(idx.shape[-1])[None, None, :] < cnt[:, :, None])
        & new_valid[:, :, None]
    )
    parts = [g_xyz] if use_xyz else []
    if features is not None:
        parts.append(grouping.group_points(features, idx))
    grouped = jnp.concatenate(parts, axis=-1)
    return jnp.where(slot_ok[..., None], grouped, 0.0), slot_ok


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale grouping SA (parity: PointnetSAModuleMSG :66)."""
    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    pool_method: str = "max_pool"

    @nn.compact
    def __call__(self, xyz, features, valid, training=False):
        idx_s = sampling.furthest_point_sample(xyz, self.npoint, valid)
        new_xyz = sampling.gather_points(xyz, idx_s)
        new_valid = jnp.take_along_axis(valid, idx_s, axis=1)

        outs = []
        scales = [(0.0, float(r), int(ns))
                  for r, ns in zip(self.radii, self.nsamples)]
        groups = grouping.query_group_scales(
            xyz, features, valid, new_xyz, new_valid, scales, self.use_xyz
        )
        for i, ((grouped, slot_ok, cnt), mlp) in enumerate(
            zip(groups, self.mlps)
        ):
            h = SharedMLP(mlp, name=f"mlp{i}")(
                grouped, training, mask=slot_ok[..., None]
            )
            h = jnp.where(slot_ok[..., None], h, -1e9)
            if self.pool_method == "max_pool":
                h = h.max(axis=2)
            else:
                h = jnp.where(slot_ok[..., None], h, 0.0).sum(2) / jnp.maximum(
                    cnt[..., None], 1
                )
            h = jnp.where(new_valid[..., None] & (cnt[..., None] > 0), h, 0.0)
            outs.append(h)
        return new_xyz, jnp.concatenate(outs, -1), new_valid


class PointnetSAModuleFSMSG(nn.Module):
    """Fusion-sampling MSG SA (parity: PointnetSAModuleFSMSG :181-403).

    Adds: multi-method sampling over index ranges, dilated (annulus)
    grouping, post-concat aggregation MLP, and a per-point confidence MLP
    whose logits drive the next layer's s-fps and the SASA loss.
    """
    npoint_list: Sequence[int]
    sample_range_list: Sequence[Sequence[int]]
    sample_method_list: Sequence[str]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    dilated_group: bool = False
    aggregation_mlp: Sequence[int] = None
    confidence_mlp: Sequence[int] = None
    num_class: int = 3
    weight_gamma: float = 1.0
    pool_method: str = "max_pool"

    @nn.compact
    def __call__(self, xyz, features, valid, scores=None, training=False):
        idx_s = sample_by_methods(
            xyz, features, scores, valid, self.npoint_list,
            self.sample_range_list, self.sample_method_list,
            self.weight_gamma,
        )
        new_xyz = sampling.gather_points(xyz, idx_s)
        new_valid = jnp.take_along_axis(valid, idx_s, axis=1)

        outs = []
        scales = []
        for i, (r, ns) in enumerate(zip(self.radii, self.nsamples)):
            lo = (float(self.radii[i - 1])
                  if (self.dilated_group and i > 0) else 0.0)
            scales.append((lo, float(r), int(ns)))
        groups = grouping.query_group_scales(
            xyz, features, valid, new_xyz, new_valid, scales, self.use_xyz
        )
        for i, ((grouped, slot_ok, cnt), mlp) in enumerate(
            zip(groups, self.mlps)
        ):
            h = SharedMLP(mlp, name=f"mlp{i}")(
                grouped, training, mask=slot_ok[..., None]
            )
            h = jnp.where(slot_ok[..., None], h, -1e9)
            h = h.max(axis=2)
            h = jnp.where(new_valid[..., None] & (cnt[..., None] > 0), h, 0.0)
            outs.append(h)
        new_features = jnp.concatenate(outs, -1)

        if self.aggregation_mlp:
            new_features = SharedMLP(self.aggregation_mlp, name="aggregation")(
                new_features, training, mask=new_valid[..., None]
            )
            new_features = jnp.where(
                new_valid[..., None], new_features, 0.0
            )

        new_scores = None
        if self.confidence_mlp:
            h = SharedMLP(self.confidence_mlp, name="confidence")(
                new_features, training, mask=new_valid[..., None]
            )
            new_scores = nn.Dense(
                self.num_class, name="confidence_out",
                bias_init=nn.initializers.constant(-jnp.log(99.0)),
            )(h)  # focal-style bias init (prior 0.01)
            new_scores = jnp.where(new_valid[..., None], new_scores, -1e9)
        return new_xyz, new_features, new_valid, new_scores


class PointnetFPModule(nn.Module):
    """Feature propagation via inverse-distance 3-NN interpolation
    (parity: PointnetFPModule :130)."""
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 known_valid=None, training=False, unknown_valid=None):
        dist, idx = grouping.three_nn(unknown, known, known_valid)
        weight = grouping.three_interpolate_weights(dist)
        interp = grouping.three_interpolate(known_feats, idx, weight)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        mask = unknown_valid[..., None] if unknown_valid is not None else None
        out = SharedMLP(self.mlp, name="mlp")(interp, training, mask=mask)
        if unknown_valid is not None:
            out = jnp.where(unknown_valid[..., None], out, 0.0)
        return out
