import numpy as np
import jax.numpy as jnp

from tsm_det_pointcloud_tpu.ops.voxel import (
    compute_voxel_coords,
    grid_size,
    voxelize,
    voxel_centroids,
    voxel_query,
)

PC_RANGE = [0, -4, -3, 8, 4, 1]
VSIZE = [0.5, 0.5, 0.5]
GRID = grid_size(PC_RANGE, VSIZE)  # (z, y, x) = (8, 16, 16)


def test_grid_size():
    assert GRID == (8, 16, 16)
    assert grid_size([0, -40, -3, 70.4, 40, 1], [0.05, 0.05, 0.1], 4) == (10, 400, 352)


def test_compute_voxel_coords():
    pts = jnp.array([[0.1, -3.9, -2.9], [7.9, 3.9, 0.9], [9.0, 0, 0]])
    coords, ok = compute_voxel_coords(pts, PC_RANGE, VSIZE)
    np.testing.assert_array_equal(np.array(coords)[0], [0, 0, 0])
    np.testing.assert_array_equal(np.array(coords)[1], [7, 15, 15])
    np.testing.assert_array_equal(np.array(ok), [True, True, False])


def _mkpoints():
    # 6 points: 3 in voxel A, 2 in voxel B, 1 out of range
    pts = np.array(
        [
            [0.1, 0.1, 0.1, 1.0],
            [0.2, 0.2, 0.2, 2.0],
            [0.3, 0.3, 0.3, 3.0],
            [4.1, 1.1, 0.1, 4.0],
            [4.2, 1.2, 0.2, 5.0],
            [100.0, 0, 0, 6.0],
        ],
        np.float32,
    )
    coords, ok = compute_voxel_coords(jnp.array(pts[:, :3]), PC_RANGE, VSIZE)
    return pts, coords, ok


def test_voxelize_groups_and_counts():
    pts, coords, ok = _mkpoints()
    out = voxelize(jnp.array(pts), coords, ok, num_voxels=8, max_points=2,
                   grid_dims=GRID)
    assert int(out["num_voxels"]) == 2
    counts = np.array(out["num_points"])
    assert sorted(counts[counts > 0].tolist()) == [2, 2]  # capped at max_points
    # each voxel buffer holds points from a single voxel
    vox = np.array(out["voxels"])
    vc = np.array(out["coordinates"])
    for v in range(2):
        feat_ids = vox[v, :, 3]
        feat_ids = feat_ids[feat_ids > 0]
        if 4.0 in feat_ids:
            assert set(feat_ids.tolist()) <= {4.0, 5.0}
        else:
            assert set(feat_ids.tolist()) <= {1.0, 2.0, 3.0}
        assert np.all(vc[v] >= 0)
    # padding rows flagged
    assert np.all(np.array(out["coordinates"])[2:] == -1)


def test_voxelize_point_voxel_idx():
    pts, coords, ok = _mkpoints()
    out = voxelize(jnp.array(pts), coords, ok, num_voxels=8, max_points=4,
                   grid_dims=GRID)
    pvi = np.array(out["point_voxel_idx"])
    assert pvi[5] == -1  # out of range
    assert pvi[0] == pvi[1] == pvi[2]
    assert pvi[3] == pvi[4]
    assert pvi[0] != pvi[3]


def test_voxel_centroids_means():
    pts, coords, ok = _mkpoints()
    out = voxel_centroids(coords, jnp.array(pts), ok, num_voxels=8, grid_dims=GRID)
    assert int(out["num_voxels"]) == 2
    cents = np.array(out["centroids"])
    counts = np.array(out["counts"])
    slotA = int(np.array(out["point_slot"])[0])
    slotB = int(np.array(out["point_slot"])[3])
    np.testing.assert_allclose(cents[slotA], pts[:3].mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(cents[slotB], pts[3:5].mean(axis=0), atol=1e-5)
    assert counts[slotA] == 3 and counts[slotB] == 2
    assert int(np.array(out["point_slot"])[5]) == -1


def test_voxel_centroids_overflow_capacity():
    rng = np.random.RandomState(0)
    pts = rng.uniform([0, -4, -3], [8, 4, 1], (200, 3)).astype(np.float32)
    coords, ok = compute_voxel_coords(jnp.array(pts), PC_RANGE, VSIZE)
    out = voxel_centroids(coords, jnp.array(pts), ok, num_voxels=16, grid_dims=GRID)
    assert int(out["num_voxels"]) == 16  # clipped to capacity
    assert np.array(out["counts"]).sum() <= 200
    # all slots valid
    assert np.array(out["valid"])[:16].all()


def test_voxel_query_radius_and_window():
    # centroids on x axis at 0.25 + 0.5*k (voxel centers)
    cent_xyz = np.array(
        [[0.25, 0.25, 0.25], [0.75, 0.25, 0.25], [1.25, 0.25, 0.25],
         [5.25, 0.25, 0.25]], np.float32,
    )
    cent_coords, _ = compute_voxel_coords(jnp.array(cent_xyz), PC_RANGE, VSIZE)
    valid = jnp.ones(4, bool)
    q_xyz = jnp.array([[0.25, 0.25, 0.25]])
    q_coords, _ = compute_voxel_coords(q_xyz, PC_RANGE, VSIZE)
    idx, cnt = voxel_query(
        q_xyz, q_coords, jnp.array(cent_xyz), cent_coords, valid,
        radius=1.2, nsample=4, query_range=(2, 2, 2),
    )
    # radius 1.2 catches x=0.25, 0.75, 1.25 (dist 0, .5, 1.0); window +-2 ok
    assert int(cnt[0]) == 3
    np.testing.assert_array_equal(np.array(idx)[0, :3], [0, 1, 2])

    # shrink window to +-1 voxel: x=1.25 is 2 voxels away -> excluded
    idx2, cnt2 = voxel_query(
        q_xyz, q_coords, jnp.array(cent_xyz), cent_coords, valid,
        radius=1.2, nsample=4, query_range=(1, 1, 1),
    )
    assert int(cnt2[0]) == 2


def test_voxel_query_min_radius():
    cent_xyz = np.array(
        [[0.25, 0.25, 0.25], [0.75, 0.25, 0.25], [1.25, 0.25, 0.25]], np.float32
    )
    cent_coords, _ = compute_voxel_coords(jnp.array(cent_xyz), PC_RANGE, VSIZE)
    q_xyz = jnp.array([[0.25, 0.25, 0.25]])
    q_coords, _ = compute_voxel_coords(q_xyz, PC_RANGE, VSIZE)
    idx, cnt = voxel_query(
        q_xyz, q_coords, jnp.array(cent_xyz), cent_coords, jnp.ones(3, bool),
        radius=2.0, nsample=4, query_range=(4, 4, 4), min_radius=0.3,
    )
    # annulus [0.3, 2.0): only x=.75 (d=.5) and x=1.25 (d=1.0)
    assert int(cnt[0]) == 2
    np.testing.assert_array_equal(np.array(idx)[0, :2], [1, 2])
