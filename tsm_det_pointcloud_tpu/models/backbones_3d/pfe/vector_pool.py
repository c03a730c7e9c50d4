"""VectorPool aggregation — PV-RCNN++ (flax).

Parity: pcdet/ops/pointnet2/pointnet2_stack/{vector_pool_gpu.cu (485),
pointnet2_modules.py VectorPoolAggregationModule(MSG) :247,423} and the
sectorized keypoint sampling of pv_rcnn_plusplus.py.

Idea: instead of a max-pool over an unordered neighbor set, each query's
ball is partitioned into a fixed local voxel lattice (e.g. 3x3x3); per-cell
features are averaged and concatenated position-wise, preserving local
structure. TPU-native: neighbors come from the nearest-k ball query, cell
assignment is a one-hot matmul (MXU), per-cell mean is one einsum — no
curand, no stacked-batch bookkeeping.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ....ops import grouping, sampling
from ..pointnet2_modules import SharedMLP


class VectorPoolAggregation(nn.Module):
    """One scale of vector-pool aggregation."""
    radius: float
    nsample: int
    local_grid: Sequence[int] = (3, 3, 3)   # (nx, ny, nz) local cells
    mlp: Sequence[int] = (32,)

    @nn.compact
    def __call__(self, query_xyz, support_xyz, support_feats, support_valid,
                 training=False):
        nxg, nyg, nzg = (int(v) for v in self.local_grid)
        ncell = nxg * nyg * nzg
        ((feats, slot_ok, cnt),) = grouping.query_group_scales(
            support_xyz, support_feats, support_valid, query_xyz,
            jnp.ones(query_xyz.shape[:2], bool),
            [(0.0, float(self.radius), int(self.nsample))],
        )
        g_xyz = feats[..., :3]

        # local cell id from relative position in [-r, r)^3
        frac = jnp.clip(
            (g_xyz / (2.0 * self.radius)) + 0.5, 0.0, 1.0 - 1e-6
        )
        cell = (
            (frac[..., 0] * nxg).astype(jnp.int32) * (nyg * nzg)
            + (frac[..., 1] * nyg).astype(jnp.int32) * nzg
            + (frac[..., 2] * nzg).astype(jnp.int32)
        )  # (B, M, ns)
        onehot = jax.nn.one_hot(cell, ncell, dtype=g_xyz.dtype)
        onehot = onehot * slot_ok[..., None]
        # per-cell mean: (B, M, ns, C) x (B, M, ns, cells) -> (B, M, cells, C)
        sums = jnp.einsum("bmnc,bmnk->bmkc", feats, onehot)
        cnts = onehot.sum(axis=2)                       # (B, M, cells)
        mean = sums / jnp.maximum(cnts[..., None], 1.0)
        flat = mean.reshape(mean.shape[0], mean.shape[1], -1)
        out = SharedMLP(list(self.mlp), name="post_mlp")(flat, training)
        return jnp.where((cnt > 0)[..., None], out, 0.0)


class VectorPoolAggregationModuleMSG(nn.Module):
    """Multi-scale vector pool (parity: VectorPoolAggregationModuleMSG)."""
    radii: Sequence[float]
    nsamples: Sequence[int]
    local_grids: Sequence[Sequence[int]]
    mlps: Sequence[Sequence[int]]
    aggregation_mlp: Sequence[int] = None

    @nn.compact
    def __call__(self, query_xyz, support_xyz, support_feats, support_valid,
                 training=False):
        outs = []
        for i, (r, ns, lg, mlp) in enumerate(zip(
            self.radii, self.nsamples, self.local_grids, self.mlps
        )):
            outs.append(VectorPoolAggregation(
                radius=float(r), nsample=int(ns), local_grid=tuple(lg),
                mlp=tuple(mlp), name=f"scale{i}",
            )(query_xyz, support_xyz, support_feats, support_valid, training))
        out = jnp.concatenate(outs, -1)
        if self.aggregation_mlp:
            out = SharedMLP(list(self.aggregation_mlp), name="agg")(
                out, training
            )
        return out


def sectorized_fps(xyz, valid, npoint, num_sectors=6):
    """Sector-partitioned FPS (parity: the proposal-centric SPC keypoint
    sampler, voxel_set_abstraction.py:45-122): split by azimuth into
    `num_sectors`, FPS an equal share inside each sector, concatenate.
    Fixed shapes: each sector draws npoint//num_sectors (+remainder in
    sector 0) from the full set with out-of-sector points masked."""
    B, N, _ = xyz.shape
    angle = jnp.arctan2(xyz[..., 1], xyz[..., 0])  # (B, N)
    sector = jnp.floor(
        (angle + np.pi) / (2 * np.pi / num_sectors)
    ).astype(jnp.int32) % num_sectors
    per = npoint // num_sectors
    counts = [per + (npoint - per * num_sectors)] + [per] * (num_sectors - 1)
    picked = []
    for s, k in enumerate(counts):
        m = valid & (sector == s)
        picked.append(sampling.furthest_point_sample(xyz, k, m))
    return jnp.concatenate(picked, axis=1)
