"""Point-axis sharding (SURVEY §5.7) on the 8-virtual-device CPU mesh.

Covers: segment-local FPS (exact per-segment recursion + round-robin
union), owner-masked psum gather, and the allgathered/replicated voxel
centroid merge, each against its single-device oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tsm_det_pointcloud_tpu.ops.sampling import _furthest_point_sample_xla
from tsm_det_pointcloud_tpu.ops.voxel import voxel_centroids
from tsm_det_pointcloud_tpu.parallel.point_sharding import (
    gather_from_sharded,
    point_sharding,
    segment_local_fps,
    sharded_voxel_centroids,
)


def make_mesh(d):
    devs = jax.devices()
    if len(devs) < d:
        pytest.skip(f"need {d} devices")
    return Mesh(np.array(devs[:d]), ("points",))


def make_cloud(b, n, seed=0):
    rng = np.random.RandomState(seed)
    xyz = np.stack(
        [rng.uniform(0, 70, (b, n)), rng.uniform(-40, 40, (b, n)),
         rng.uniform(-3, 1, (b, n))], axis=-1
    ).astype(np.float32)
    return xyz


@pytest.mark.parametrize("d", [1, 8])
def test_segment_local_fps_matches_per_segment_oracle(d):
    mesh = make_mesh(d)
    B, N, npoint = 2, 1024, 64
    xyz = jnp.asarray(make_cloud(B, N))
    xyz_sh = jax.device_put(xyz, point_sharding(mesh))
    idx = np.asarray(segment_local_fps(xyz_sh, npoint, mesh))
    assert idx.shape == (B, npoint)

    # oracle: run the exact FPS on each segment on one device, interleave
    per = -(-npoint // d)
    seg = N // d
    parts = [
        np.asarray(_furthest_point_sample_xla(xyz[:, s * seg:(s + 1) * seg],
                                              per)) + s * seg
        for s in range(d)
    ]
    expect = np.stack(parts, axis=2).reshape(B, -1)[:, :npoint]
    np.testing.assert_array_equal(idx, expect)
    # all indices valid + no duplicates within a batch row
    assert (idx >= 0).all() and (idx < N).all()
    for b in range(B):
        assert len(set(idx[b].tolist())) == npoint


def test_segment_local_fps_respects_valid_mask():
    mesh = make_mesh(8)
    B, N, npoint = 1, 1024, 32
    xyz = jnp.asarray(make_cloud(B, N, seed=3))
    # invalidate the 3rd shard's segment entirely except its seed point 0
    mask = np.ones((B, N), bool)
    seg = N // 8
    mask[:, 3 * seg + 1:4 * seg] = False
    idx = np.asarray(segment_local_fps(
        jax.device_put(xyz, point_sharding(mesh)), npoint, mesh,
        valid_mask=jax.device_put(jnp.asarray(mask),
                                  NamedSharding(mesh, P(None, "points")))))
    banned = set(range(3 * seg + 1, 4 * seg))
    assert not (set(idx[0].tolist()) & banned)


def test_gather_from_sharded_matches_take():
    mesh = make_mesh(8)
    B, N, C, K = 2, 512, 5, 40
    vals = jnp.asarray(np.random.RandomState(1).randn(B, N, C).astype(np.float32))
    idx = jnp.asarray(np.random.RandomState(2).randint(0, N, (B, K)))
    out = np.asarray(gather_from_sharded(
        jax.device_put(vals, point_sharding(mesh)), idx, mesh))
    expect = np.asarray(jnp.take_along_axis(vals, idx[..., None], axis=1))
    np.testing.assert_allclose(out, expect, rtol=1e-6)


@pytest.mark.parametrize("d", [1, 8])
def test_sharded_voxel_centroids_matches_unsharded(d):
    mesh = make_mesh(d)
    N, C, V = 2048, 4, 256
    grid = (8, 16, 16)
    rng = np.random.RandomState(7)
    coords = jnp.asarray(np.stack(
        [rng.randint(0, g, N) for g in grid], axis=1).astype(np.int32))
    feats = jnp.asarray(rng.randn(N, C).astype(np.float32))
    valid = jnp.asarray(rng.rand(N) > 0.1)

    ref = voxel_centroids(coords, feats, valid, V, grid)
    got = sharded_voxel_centroids(
        jax.device_put(coords, NamedSharding(mesh, P("points", None))),
        jax.device_put(feats, NamedSharding(mesh, P("points", None))),
        jax.device_put(valid, NamedSharding(mesh, P("points"))),
        V, grid, mesh)

    assert int(got["num_voxels"]) == int(ref["num_voxels"])
    # compare as {coord key: (centroid, count)} — slot order may differ
    def as_map(r):
        out = {}
        co, ce, ct = (np.asarray(r["coordinates"]), np.asarray(r["centroids"]),
                      np.asarray(r["counts"]))
        for i in range(V):
            if ct[i] > 0:
                out[tuple(co[i])] = (ce[i], ct[i])
        return out

    mref, mgot = as_map(ref), as_map(got)
    assert set(mref) == set(mgot)
    for k in mref:
        np.testing.assert_allclose(mgot[k][0], mref[k][0], rtol=1e-4,
                                   atol=1e-5)
        assert mgot[k][1] == mref[k][1]


def test_sharded_fps_jits_and_scales():
    """The §5.7 scale story: a cloud 8x one shard's budget, jitted end to
    end (fps -> gather -> centroids) with every per-device buffer 1/8."""
    mesh = make_mesh(8)
    B, N, npoint = 1, 8192, 128
    xyz = jax.device_put(jnp.asarray(make_cloud(B, N, 5)),
                         point_sharding(mesh))

    @jax.jit
    def pipeline(xyz):
        idx = segment_local_fps(xyz, npoint, mesh)
        sampled = gather_from_sharded(xyz, idx, mesh)
        return idx, sampled

    idx, sampled = pipeline(xyz)
    assert sampled.shape == (B, npoint, 3)
    picked = np.asarray(jnp.take_along_axis(
        jax.device_get(xyz), np.asarray(idx)[..., None], axis=1))
    np.testing.assert_allclose(np.asarray(sampled), picked, rtol=1e-6)
    # sharded inputs really are split: each device holds N/8 rows
    shard_rows = {s.data.shape[1] for s in xyz.addressable_shards}
    assert shard_rows == {N // 8}
