"""Point-axis sharding (SURVEY §5.7): scale the point-count axis across a
device mesh for scenes beyond one chip's memory.

The reference has no analog — its "long axis" (16,384 KITTI -> 163,840
Waymo points, fast_cpc.yaml:52-56 / waymo_fast_cpc.yaml:12-16) is handled
single-GPU by the O(N*M) FPS recursion (sampling_gpu.cu:101-180) and
per-point CUDA kernels. On TPU the same axis shards over the ICI mesh:

- `points (B, N, F)` sharded on axis 1 over a `points` mesh axis: each
  device holds `(B, N/D, F)` — memory per chip scales 1/D.
- **segment-local FPS** (`segment_local_fps`): every shard runs the exact
  FPS recursion on its own segment for ceil(npoint/D) samples, then the
  candidate sets are allgathered and interleaved round-robin (every
  shard's k-th pick before any shard's (k+1)-th) so a prefix of the
  result stays spatially diverse — the property downstream
  SAMPLE_RANGE slicing relies on. D parallel O((N/D)*(M/D)) loops + one
  tiny allgather over ICI replace one O(N*M) sequential loop.
- **allgathered centroids** (`sharded_voxel_centroids`): the voxel
  centroid reduction runs locally per shard (sort + segment-sum over
  local points only), local partial (sum, count) lists are allgathered,
  and a second compaction merges voxels that span shards. The result is
  REPLICATED — the blueprint's "keep the centroid sparse tensors
  replicated" — so the sparse-conv U-Nets downstream run unchanged.
- `gather_from_sharded` fetches selected rows from the sharded axis as a
  replicated tensor via owner-masked psum (an allreduce, not a gather of
  the full axis).

All three are `shard_map`-based and jit-compatible; single-device meshes
degenerate to the plain ops (tested bitwise in tests/test_point_sharding.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sampling import _furthest_point_sample_xla
from ..ops.voxel import voxel_centroids


def point_sharding(mesh, axis="points"):
    """NamedSharding that splits the point axis of (B, N, ...) arrays."""
    return NamedSharding(mesh, P(None, axis))


def segment_local_fps(xyz, npoint, mesh, valid_mask=None, axis="points"):
    """FPS over a point-axis-sharded cloud.

    xyz (B, N, 3) sharded on axis 1; returns (B, npoint) GLOBAL indices,
    replicated. Each shard samples ceil(npoint/D) locally (exact FPS on its
    segment); the union is interleaved round-robin across shards.
    """
    D = mesh.shape[axis]
    per = -(-npoint // D)

    def local(xyz_l, mask_l):
        # xyz_l: (B, N/D, 3) — this shard's segment
        n_local = xyz_l.shape[1]
        idx_l = _furthest_point_sample_xla(xyz_l, per, mask_l)  # (B, per)
        shard = jax.lax.axis_index(axis)
        gidx = idx_l + shard * n_local  # local -> global point ids
        allg = jax.lax.all_gather(gidx, axis, axis=1)  # (B, D, per)
        # round-robin interleave: (B, D, per) -> (B, per, D) -> (B, per*D)
        merged = jnp.swapaxes(allg, 1, 2).reshape(allg.shape[0], -1)
        return merged[:, :npoint]

    in_specs = (P(None, axis, None),
                P(None, axis) if valid_mask is not None else P())
    if valid_mask is None:
        valid_mask = jnp.zeros((), jnp.float32)  # unused placeholder

        def wrapper(x, _):
            return local(x, None)
    else:
        wrapper = local
    return jax.shard_map(
        wrapper, mesh=mesh, in_specs=in_specs, out_specs=P(),
        check_vma=False,
    )(xyz, valid_mask)


def gather_from_sharded(values, idx_global, mesh, axis="points"):
    """Gather rows of a point-axis-sharded (B, N, C) by replicated global
    indices (B, K) -> replicated (B, K, C), via owner-masked psum."""

    def local(vals_l, idx):
        n_local = vals_l.shape[1]
        shard = jax.lax.axis_index(axis)
        rel = idx - shard * n_local  # (B, K)
        owned = (rel >= 0) & (rel < n_local)
        take = jnp.take_along_axis(
            vals_l, jnp.clip(rel, 0, n_local - 1)[..., None], axis=1
        )
        contrib = jnp.where(owned[..., None], take, 0)
        return jax.lax.psum(contrib, axis)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(None, axis, None), P()),
        out_specs=P(), check_vma=False,
    )(values, idx_global)


def sharded_voxel_centroids(coords_zyx, features, valid, num_voxels,
                            grid_dims, mesh, axis="points"):
    """voxel_centroids over a point-axis-sharded cloud (flat N layout).

    coords_zyx (N, 3) int32 / features (N, C) / valid (N,) sharded on axis
    0. Returns the same dict as ops.voxel.voxel_centroids with centroids /
    coordinates / counts / valid REPLICATED, except `point_slot` is
    omitted (it indexes the merged compaction, not the input points).

    Per shard: local compaction to <= num_voxels partial (sum, count)
    rows; allgather the D partial lists; merge with a second compaction.
    The merge averages partial sums and partial counts per voxel key over
    the k shards holding it — the merged mean is (mean of sums)/(mean of
    counts) since the 1/k cancels.
    """

    def local(c_l, f_l, v_l):
        loc = voxel_centroids(c_l, f_l, v_l, num_voxels, grid_dims)
        counts = loc["counts"].astype(f_l.dtype)
        sums = loc["centroids"] * counts[:, None]
        payload = jnp.concatenate([sums, counts[:, None]], axis=1)
        g_payload = jax.lax.all_gather(payload, axis, axis=0, tiled=True)
        g_coords = jax.lax.all_gather(
            loc["coordinates"], axis, axis=0, tiled=True)
        g_valid = jax.lax.all_gather(loc["valid"], axis, axis=0, tiled=True)
        merged = voxel_centroids(
            g_coords, g_payload, g_valid, num_voxels, grid_dims)
        mean_sums = merged["centroids"][:, :-1]
        mean_counts = merged["centroids"][:, -1:]
        centroids = mean_sums / jnp.maximum(mean_counts, 1e-12)
        # per-voxel point totals: mean over shard entries x entry count
        # (round, don't truncate — the mean is a float division)
        n_entries = jnp.maximum(merged["counts"], 1).astype(f_l.dtype)
        totals = jnp.round(mean_counts[:, 0] * n_entries).astype(jnp.int32)
        return (centroids, merged["coordinates"],
                jnp.where(merged["valid"], totals, 0),
                merged["num_voxels"], merged["valid"])

    cent, coords, counts, nvox, vmask = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )(coords_zyx, features, valid)
    return dict(centroids=cent, coordinates=coords, counts=counts,
                num_voxels=nvox, valid=vmask)
