"""Voxelization + voxel-centroid ops — static-capacity, sort-based.

TPU-native replacements for three reference mechanisms:
  * spconv `Point2Voxel` voxel generators (data_processor.py:16-61) ->
    `voxelize`: one sort + segment pass builds (V, max_pts, C) voxel buffers.
  * `get_centroid_per_voxel` (`torch.unique(dim=0)` + scatter_add_,
    voxel_aggregation_utils.py:132-161) -> `voxel_centroids`: the same
    sort-and-segment pass with a static voxel capacity; overflow voxels are
    dropped deterministically (largest keys last), mirroring
    MAX_NUMBER_OF_VOXELS semantics.
  * `voxel_query(_dilated)` hash-grid walks (voxel_query_gpu.cu:10-160) ->
    brute-force masked distance search against the (V,) centroid set. The
    CUDA hash walk is an accel structure for SIMT; on TPU a dense (M, V)
    masked distance grid is more regular and rides the VPU. The curand
    reservoir pick becomes deterministic first-k in slot order (numerics
    delta documented; AP-neutral on fixed seeds).

Dynamic structure policy (SURVEY.md §7.1): every op takes/returns fixed
shapes + validity masks. Invalid/padded points get the sentinel key and sort
to the end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def compute_voxel_coords(points_xyz, point_cloud_range, voxel_size, stride=1):
    """(..., 3) xyz -> (..., 3) int32 voxel coords in (z, y, x) order +
    bool in-range mask. `stride` scales voxel_size (downsampled grids)."""
    pc_range = jnp.asarray(point_cloud_range, jnp.float32)
    vsize = jnp.asarray(voxel_size, jnp.float32) * stride
    shifted = (points_xyz - pc_range[:3]) / vsize
    coords_xyz = jnp.floor(shifted).astype(jnp.int32)
    grid = grid_size(point_cloud_range, voxel_size, stride)
    grid_xyz = jnp.asarray(grid[::-1], jnp.int32)  # (x, y, z) extents
    in_range = jnp.all((coords_xyz >= 0) & (coords_xyz < grid_xyz), axis=-1)
    return coords_xyz[..., ::-1], in_range  # -> (z, y, x)


def grid_size(point_cloud_range, voxel_size, stride=1):
    """Static (z, y, x) grid extents (python ints)."""
    pc = np.asarray(point_cloud_range, np.float64)
    vs = np.asarray(voxel_size, np.float64) * stride
    g = np.round((pc[3:6] - pc[0:3]) / vs).astype(np.int64)  # (x, y, z)
    return int(g[2]), int(g[1]), int(g[0])


def _linearize(coords_zyx, gz, gy, gx, valid):
    """(N, 3) zyx int coords -> (N,) int32 scalar keys; invalid -> sentinel
    (gz*gy*gx), which sorts after all real keys."""
    key = (coords_zyx[:, 0] * gy + coords_zyx[:, 1]) * gx + coords_zyx[:, 2]
    sentinel = gz * gy * gx
    return jnp.where(valid, key, sentinel)


@functools.partial(jax.jit, static_argnames=("num_voxels", "max_points"))
def voxelize(points, coords_zyx, valid, num_voxels, max_points, grid_zyx=None,
             grid_dims=None):
    """Group points into fixed-capacity voxels.

    points (N, C) features, coords_zyx (N, 3) int32, valid (N,) bool.
    Returns dict:
      voxels       (V, max_points, C)  zero-padded per-voxel point buffers
      coordinates  (V, 3) int32 zyx    (-1 rows are padding)
      num_points   (V,) int32          points landed in voxel (<= max_points)
      num_voxels   ()  int32           actual voxel count (<= V)
      point_voxel_idx (N,) int32       slot of each point (-1 invalid/overflow)
    `grid_dims` = (gz, gy, gx) python ints (static).
    """
    assert grid_dims is not None, "pass grid_dims=(gz,gy,gx)"
    gz, gy, gx = grid_dims
    N = points.shape[0]
    key = _linearize(coords_zyx, gz, gy, gx, valid)
    order = jnp.argsort(key)
    skey = key[order]
    spts = points[order]
    scoords = coords_zyx[order]
    svalid = skey < gz * gy * gx

    is_start = jnp.concatenate([svalid[:1], (skey[1:] != skey[:-1]) & svalid[1:]])
    slot = jnp.cumsum(is_start) - 1  # (N,) voxel slot per sorted point
    n_vox = jnp.sum(is_start)

    # rank of each point inside its voxel
    pos = jnp.arange(N, dtype=jnp.int32)
    seg_start = jnp.full((num_voxels,), 0, jnp.int32).at[
        jnp.where(is_start, slot, num_voxels)
    ].set(pos, mode="drop")
    rank = pos - seg_start[jnp.clip(slot, 0, num_voxels - 1)]

    ok = svalid & (slot < num_voxels) & (rank < max_points)
    vox = jnp.zeros((num_voxels, max_points, points.shape[-1]), points.dtype)
    vox = vox.at[
        jnp.where(ok, slot, num_voxels), jnp.where(ok, rank, 0)
    ].set(spts, mode="drop")

    vcoords = jnp.full((num_voxels, 3), -1, jnp.int32)
    vcoords = vcoords.at[jnp.where(is_start & (slot < num_voxels), slot, num_voxels)].set(
        scoords, mode="drop"
    )
    counts = jax.ops.segment_sum(
        ok.astype(jnp.int32), jnp.where(svalid, slot, num_voxels),
        num_segments=num_voxels + 1,
    )[:num_voxels]

    # map back to original point order
    pslot = jnp.where(svalid & (slot < num_voxels), slot, -1)
    point_voxel_idx = jnp.zeros((N,), jnp.int32).at[order].set(pslot)

    return dict(
        voxels=vox,
        coordinates=vcoords,
        num_points=counts,
        num_voxels=jnp.minimum(n_vox, num_voxels),
        point_voxel_idx=point_voxel_idx,
    )


@functools.partial(jax.jit, static_argnames=("num_voxels",))
def voxel_centroids(coords_zyx, features, valid, num_voxels, grid_dims):
    """Scatter-mean features (and implicitly xyz if included in features)
    per voxel. Parity: get_centroid_per_voxel
    (voxel_aggregation_utils.py:132-161).

    Returns dict: centroids (V, C) means, coordinates (V, 3) zyx int32,
    counts (V,) int32, point_slot (N,) int32 (-1 for dropped/invalid),
    num_voxels () int32, valid (V,) bool.
    """
    gz, gy, gx = grid_dims
    N = coords_zyx.shape[0]
    key = _linearize(coords_zyx, gz, gy, gx, valid)
    order = jnp.argsort(key)
    skey = key[order]
    sfeat = features[order]
    scoords = coords_zyx[order]
    svalid = skey < gz * gy * gx

    is_start = jnp.concatenate([svalid[:1], (skey[1:] != skey[:-1]) & svalid[1:]])
    slot = jnp.cumsum(is_start) - 1
    n_vox = jnp.sum(is_start)
    seg = jnp.where(svalid & (slot < num_voxels), slot, num_voxels)

    sums = jax.ops.segment_sum(sfeat, seg, num_segments=num_voxels + 1)[:num_voxels]
    counts = jax.ops.segment_sum(
        jnp.ones((N,), jnp.int32), seg, num_segments=num_voxels + 1
    )[:num_voxels]
    centroids = sums / jnp.maximum(counts, 1)[:, None].astype(sums.dtype)

    vcoords = jnp.full((num_voxels, 3), -1, jnp.int32)
    vcoords = vcoords.at[jnp.where(is_start & (slot < num_voxels), slot, num_voxels)].set(
        scoords, mode="drop"
    )
    pslot = jnp.where(svalid & (slot < num_voxels), slot, -1)
    point_slot = jnp.zeros((N,), jnp.int32).at[order].set(pslot)

    return dict(
        centroids=centroids,
        coordinates=vcoords,
        counts=counts,
        point_slot=point_slot,
        num_voxels=jnp.minimum(n_vox, num_voxels),
        valid=counts > 0,
    )


@functools.partial(jax.jit, static_argnames=("radius", "nsample", "query_range", "min_radius", "chunk"))
def voxel_query(new_xyz, new_coords_zyx, centroid_xyz, centroid_coords_zyx,
                centroid_valid, radius, nsample, query_range, min_radius=0.0,
                chunk=256):
    """Neighborhood search of query points against voxel centroids.

    new_xyz (M, 3) metric queries; new_coords_zyx (M, 3) their voxel coords
    at the centroid grid stride; centroid_* (V, ...) the sparse centroid set.
    A centroid is a neighbor iff (a) |Delta voxel coord| <= query_range per
    axis (the CUDA kernel's walk window, voxel_query_gpu.cu:34-60), and
    (b) min_radius <= euclidean distance < radius.
    Returns idx (M, nsample) into the centroid array (first-k in slot order,
    padded with first hit) and cnt (M,) true neighbor counts (drives the
    reference's density/SASA scores).
    """
    M = new_xyz.shape[0]
    qr = jnp.asarray(query_range, jnp.int32)
    c = min(chunk, M)
    pad = (-M) % c
    qx = jnp.pad(new_xyz, ((0, pad), (0, 0))).reshape(-1, c, 3)
    qc = jnp.pad(new_coords_zyx, ((0, pad), (0, 0))).reshape(-1, c, 3)

    max_r2 = float(radius) ** 2
    min_r2 = float(min_radius) ** 2

    c2 = jnp.sum(centroid_xyz * centroid_xyz, axis=-1)

    def one_chunk(args):
        from .topk import top_k

        x, coord = args
        q2 = jnp.sum(x * x, axis=-1)
        d2 = jnp.maximum(
            q2[:, None] + c2[None, :] - 2.0 * (x @ centroid_xyz.T), 0.0
        )
        dc = jnp.abs(coord[:, None, :] - centroid_coords_zyx[None, :, :])
        mask = (
            (d2 < max_r2)
            & jnp.all(dc <= qr[None, None, :], axis=-1)
            & centroid_valid[None, :]
        )
        if min_r2 > 0:
            mask &= d2 >= min_r2
        # nearest-k selection (the CUDA kernel reservoir-samples a random k
        # of the window, voxel_query_gpu.cu:26 — nearest-k is deterministic
        # and the same documented delta as ball_query)
        neg_big = jnp.asarray(-1e30, d2.dtype)
        key = jnp.where(mask, -d2, neg_big)
        if key.shape[-1] < nsample:  # fewer centroids than nsample slots
            key = jnp.pad(
                key, ((0, 0), (0, nsample - key.shape[-1])),
                constant_values=-1e30,
            )
        kv, idx = top_k(key, nsample)
        idx = jnp.minimum(idx, mask.shape[-1] - 1)
        hit = kv > neg_big * 0.5
        idx = jnp.where(hit, idx, idx[:, :1]).astype(jnp.int32)
        cnt = jnp.sum(mask, axis=-1).astype(jnp.int32)
        return idx, cnt

    idx, cnt = jax.lax.map(one_chunk, (qx, qc))
    return idx.reshape(-1, nsample)[:M], cnt.reshape(-1)[:M]
