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

import contextlib
import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sampling import _furthest_point_sample_xla
from ..ops.voxel import voxel_centroids


def point_sharding(mesh, axis="points"):
    """NamedSharding that splits the point axis of (B, N, ...) arrays."""
    return NamedSharding(mesh, P(None, axis))


# ---------------------------------------------------------------------------
# Feature activation (r5, VERDICT r4 #5): a trace-time context that routes
# the TSM backbone's layer-0 sampling/grouping through the sharded
# primitives below. Set by tools/train.py / tools/test.py `--point_axis N`
# (or cfg PARALLEL.POINT_AXIS) around build + jit; read by
# models/backbones_3d/voxel_pointnet2_backbone.VoxelSAModule at trace time.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PointAxisContext:
    mesh: Mesh
    axis: str = "points"


_ACTIVE: list = []


def active():
    """The innermost active PointAxisContext, or None."""
    return _ACTIVE[-1] if _ACTIVE else None


@contextlib.contextmanager
def activate(mesh, axis="points"):
    """Enable point-axis sharding for model code traced inside the block."""
    _ACTIVE.append(PointAxisContext(mesh=mesh, axis=axis))
    try:
        yield _ACTIVE[-1]
    finally:
        _ACTIVE.pop()


def make_point_mesh(n_points, n_data=None):
    """Mesh over visible devices with a trailing `points` axis of size
    n_points (leading `data` axis absorbs the rest)."""
    import numpy as np

    devs = np.asarray(jax.devices())
    if len(devs) % n_points:
        raise ValueError(
            f"{len(devs)} devices not divisible by points={n_points}")
    n_data = n_data or len(devs) // n_points
    return Mesh(devs[: n_data * n_points].reshape(n_data, n_points),
                ("data", "points"))


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


def sharded_ball_group_multi(radius_pairs, nsamples, xyz, features, valid,
                             new_xyz, mesh, axis="points", chunk=512):
    """Multi-scale annulus query + grouping over a point-axis-sharded
    source cloud, with REPLICATED queries.

    xyz (B, N, 3) / features (B, N, C) or None / valid (B, N) sharded on
    axis 1; new_xyz (B, M, 3) replicated. Per shard: nearest-k selection
    against the local segment (same top-k-on-(-d2) rule as the XLA
    fallback ops/grouping.ball_query_multi); the D partial candidate sets
    merge by a lexicographic (d2, global_idx) sort, so ties break on the
    GLOBAL index — the same nearest-k equivalence-class member as the
    fallback. cnt is the exact global in-range count (psum).

    Returns [(g_xyz_abs (B, M, ns, 3), g_feat (B, M, ns, C) | None,
    cnt (B, M))] per scale. Unfilled slots are zero; callers mask by
    slot < cnt (the repo-wide grouping contract).
    """
    from ..ops.topk import top_k

    nsamples = tuple(int(n) for n in nsamples)
    pairs = tuple((float(lo), float(hi)) for lo, hi in radius_pairs)
    C = 0 if features is None else features.shape[-1]

    def local(xyz_l, feat_l, valid_l, q):
        B, n_local, _ = xyz_l.shape
        shard = jax.lax.axis_index(axis)
        x2 = jnp.sum(xyz_l * xyz_l, axis=-1)                   # (B, n)
        q2 = jnp.sum(q * q, axis=-1)                           # (B, M)
        d2 = jnp.maximum(
            q2[..., None] + x2[:, None, :]
            - 2.0 * jnp.einsum("bmc,bnc->bmn", q, xyz_l), 0.0)
        outs = []
        for (lo, hi), ns in zip(pairs, nsamples):
            mask = (d2 < hi * hi) & valid_l[:, None, :]
            if lo > 0:
                mask &= d2 >= lo * lo
            key = jnp.where(mask, -d2, -1e30)
            kv, li = top_k(key, ns)                            # (B, M, ns)
            hit = kv > -1e29
            gidx = jnp.where(hit, li + shard * n_local, 2**30)
            cand_d2 = jnp.where(hit, -kv, 1e30)
            # gather the candidates' payload locally (cheap: ns rows)
            gx = jnp.take_along_axis(
                xyz_l, jnp.clip(li, 0, n_local - 1)[..., None]
                .reshape(B, -1, 1), axis=1).reshape(B, -1, ns, 3)
            gx = jnp.where(hit[..., None], gx, 0.0)
            payl = [gx]
            if feat_l is not None:
                gf = jnp.take_along_axis(
                    feat_l, jnp.clip(li, 0, n_local - 1)[..., None]
                    .reshape(B, -1, 1), axis=1).reshape(B, -1, ns, C)
                payl.append(jnp.where(hit[..., None], gf, 0.0))
            cnt_l = jnp.sum(mask, axis=-1).astype(jnp.int32)
            # allgather D*ns candidates, merge nearest-ns by (d2, gidx):
            # a stable argsort on d2 alone would keep shard-major order on
            # ties, so pre-sort by GLOBAL index then stable-sort by d2 —
            # lexicographic (d2, gidx), deterministic across mesh sizes
            allc = [jax.lax.all_gather(a, axis, axis=2, tiled=True)
                    for a in (cand_d2, gidx.astype(jnp.int32))]
            allp = [jax.lax.all_gather(a, axis, axis=2, tiled=True)
                    for a in payl]                             # (B,M,D*ns,·)
            gperm = jnp.argsort(allc[1], axis=2, stable=True)
            d2_g = jnp.take_along_axis(allc[0], gperm, axis=2)
            perm2 = jnp.argsort(d2_g, axis=2, stable=True)
            perm = jnp.take_along_axis(gperm, perm2, axis=2)[:, :, :ns]
            m_hit = jnp.take_along_axis(allc[0], perm, axis=2) < 1e29
            mg = [jnp.take_along_axis(
                a, perm[..., None], axis=2) for a in allp]
            g_xyz = jnp.where(m_hit[..., None], mg[0], 0.0)
            g_feat = (jnp.where(m_hit[..., None], mg[1], 0.0)
                      if feat_l is not None else None)
            cnt = jax.lax.psum(cnt_l, axis)
            outs.append((g_xyz, g_feat, cnt)
                        if feat_l is not None else (g_xyz, cnt))
        return tuple(x for o in outs for x in o)

    in_specs = [P(None, axis, None),
                P(None, axis, None) if features is not None else P(),
                P(None, axis), P()]
    if features is None:
        feats_arg = jnp.zeros((), jnp.float32)

        def wrapper(x, _, v, q):
            return local(x, None, v, q)
    else:
        feats_arg = features
        wrapper = local
    n_out = len(pairs) * (3 if features is not None else 2)
    flat = jax.shard_map(
        wrapper, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=tuple(P() for _ in range(n_out)), check_vma=False,
    )(xyz, feats_arg, valid, new_xyz)
    out = []
    step = 3 if features is not None else 2
    for i in range(len(pairs)):
        grp = flat[i * step:(i + 1) * step]
        if features is not None:
            out.append((grp[0], grp[1], grp[2]))
        else:
            out.append((grp[0], None, grp[1]))
    return out


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
