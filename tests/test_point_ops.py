import numpy as np
import jax.numpy as jnp

from tsm_det_pointcloud_tpu.ops.sampling import (
    furthest_point_sample,
    furthest_point_sample_weights,
    furthest_point_sample_matrix,
    gather_points,
)
from tsm_det_pointcloud_tpu.ops.grouping import (
    ball_query,
    ball_query_dilated,
    group_points,
    three_nn,
    three_interpolate,
    three_interpolate_weights,
)


def fps_numpy(xyz, npoint):
    n = xyz.shape[0]
    idxs = [0]
    mind = np.full(n, 1e10)
    for _ in range(1, npoint):
        d = np.sum((xyz - xyz[idxs[-1]]) ** 2, axis=-1)
        mind = np.minimum(mind, d)
        idxs.append(int(np.argmax(mind)))
    return np.array(idxs)


def test_fps_matches_numpy_reference():
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-10, 10, (2, 128, 3)).astype(np.float32)
    got = np.array(furthest_point_sample(jnp.array(xyz), 16))
    for b in range(2):
        np.testing.assert_array_equal(got[b], fps_numpy(xyz[b], 16))


def test_fps_spreads_points():
    # FPS of a line of points picks the two extremes first
    xyz = np.zeros((1, 100, 3), np.float32)
    xyz[0, :, 0] = np.arange(100)
    got = np.array(furthest_point_sample(jnp.array(xyz), 3))[0]
    assert got[0] == 0 and got[1] == 99 and got[2] in (49, 50)


def test_fps_respects_valid_mask():
    rng = np.random.RandomState(1)
    xyz = rng.uniform(-10, 10, (1, 64, 3)).astype(np.float32)
    mask = np.ones((1, 64), bool)
    mask[0, 32:] = False
    got = np.array(furthest_point_sample(jnp.array(xyz), 8, jnp.array(mask)))[0]
    assert np.all(got < 32)


def test_fps_matrix_equals_fps_on_euclidean_matrix():
    rng = np.random.RandomState(2)
    xyz = rng.uniform(-5, 5, (1, 64, 3)).astype(np.float32)
    d2 = np.sum((xyz[0, :, None] - xyz[0, None]) ** 2, -1)[None]
    got_m = np.array(furthest_point_sample_matrix(jnp.array(d2), 8))
    got_x = np.array(furthest_point_sample(jnp.array(xyz), 8))
    np.testing.assert_array_equal(got_m, got_x)


def test_fps_weights_zero_weight_never_picked():
    rng = np.random.RandomState(3)
    xyz = rng.uniform(-5, 5, (1, 64, 3)).astype(np.float32)
    w = np.ones((1, 64), np.float32)
    w[0, 10:20] = 0.0
    got = np.array(furthest_point_sample_weights(jnp.array(xyz), jnp.array(w), 8))[0]
    assert not np.any((got >= 10) & (got < 20))


def test_gather_points():
    feats = jnp.arange(2 * 5 * 3).reshape(2, 5, 3).astype(jnp.float32)
    idx = jnp.array([[0, 4], [2, 2]])
    out = np.array(gather_points(feats, idx))
    np.testing.assert_array_equal(out[0, 1], np.array([12, 13, 14]))
    np.testing.assert_array_equal(out[1, 0], out[1, 1])


def test_ball_query_first_k_semantics():
    # support points on a line; query at origin; radius catches first few
    xyz = np.zeros((1, 10, 3), np.float32)
    xyz[0, :, 0] = np.arange(10) * 0.5  # 0, .5, 1, 1.5, ...
    new_xyz = np.zeros((1, 1, 3), np.float32)
    idx, cnt = ball_query(1.2, 2, jnp.array(xyz), jnp.array(new_xyz))
    # in radius: 0, .5, 1.0 -> cnt 3, first 2 kept: [0, 1]
    assert int(cnt[0, 0]) == 3
    np.testing.assert_array_equal(np.array(idx)[0, 0], [0, 1])


def test_ball_query_pad_with_first_hit():
    xyz = np.zeros((1, 5, 3), np.float32)
    xyz[0, :, 0] = [0.0, 5, 5, 5, 0.1]
    new_xyz = np.zeros((1, 1, 3), np.float32)
    idx, cnt = ball_query(1.0, 4, jnp.array(xyz), jnp.array(new_xyz))
    assert int(cnt[0, 0]) == 2
    np.testing.assert_array_equal(np.array(idx)[0, 0], [0, 4, 0, 0])


def test_ball_query_empty_returns_zero_cnt():
    xyz = np.full((1, 5, 3), 100.0, np.float32)
    new_xyz = np.zeros((1, 2, 3), np.float32)
    idx, cnt = ball_query(1.0, 3, jnp.array(xyz), jnp.array(new_xyz))
    np.testing.assert_array_equal(np.array(cnt)[0], [0, 0])


def test_ball_query_dilated_annulus():
    xyz = np.zeros((1, 6, 3), np.float32)
    xyz[0, :, 0] = [0.0, 0.3, 0.8, 1.2, 1.8, 2.5]
    new_xyz = np.zeros((1, 1, 3), np.float32)
    idx, cnt = ball_query_dilated(0.5, 2.0, 4, jnp.array(xyz), jnp.array(new_xyz))
    # annulus [0.5, 2.0): hits x = .8, 1.2, 1.8 -> indices 2, 3, 4
    assert int(cnt[0, 0]) == 3
    np.testing.assert_array_equal(np.array(idx)[0, 0, :3], [2, 3, 4])


def test_ball_query_respects_valid_mask():
    xyz = np.zeros((1, 4, 3), np.float32)
    new_xyz = np.zeros((1, 1, 3), np.float32)
    mask = jnp.array([[True, False, True, False]])
    idx, cnt = ball_query(1.0, 4, jnp.array(xyz), jnp.array(new_xyz), valid_mask=mask)
    assert int(cnt[0, 0]) == 2
    np.testing.assert_array_equal(np.array(idx)[0, 0, :2], [0, 2])


def test_group_points_shape_and_values():
    feats = jnp.arange(1 * 4 * 2).reshape(1, 4, 2).astype(jnp.float32)
    idx = jnp.array([[[0, 3], [2, 2]]])  # (1, 2, 2)
    out = np.array(group_points(feats, idx))
    assert out.shape == (1, 2, 2, 2)
    np.testing.assert_array_equal(out[0, 0, 1], [6, 7])


def test_three_nn_and_interpolate():
    known = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]]], np.float32)
    unknown = np.array([[[0.1, 0, 0]]], np.float32)
    dist, idx = three_nn(jnp.array(unknown), jnp.array(known))
    got_idx = set(np.array(idx)[0, 0].tolist())
    assert got_idx == {0, 1, 2}
    np.testing.assert_allclose(np.array(dist)[0, 0, 0], 0.1, atol=1e-5)

    feats = jnp.array([[[1.0], [2.0], [3.0], [100.0]]])
    w = three_interpolate_weights(dist)
    out = np.array(three_interpolate(feats, idx, w))
    assert 1.0 <= out[0, 0, 0] <= 3.0  # convex combo of 1, 2, 3


def test_three_nn_brute_force_oracle():
    rng = np.random.RandomState(5)
    known = rng.uniform(-5, 5, (2, 50, 3)).astype(np.float32)
    unknown = rng.uniform(-5, 5, (2, 20, 3)).astype(np.float32)
    dist, idx = three_nn(jnp.array(unknown), jnp.array(known))
    d2 = np.sum((unknown[:, :, None] - known[:, None]) ** 2, -1)
    ref = np.sort(d2, axis=-1)[..., :3]
    np.testing.assert_allclose(np.array(dist) ** 2, ref, atol=1e-4)


def test_fps_block_pruned_bitwise_vs_xla_oracle():
    # interpret-mode check of the Morton-block-pruned kernel
    # (fps_pallas.furthest_point_sample_block_pruned) against the XLA
    # oracle — must be bitwise-equal, incl. first-max tie-breaking
    from tsm_det_pointcloud_tpu.ops.fps_pallas import (
        furthest_point_sample_block_pruned,
    )
    from tsm_det_pointcloud_tpu.ops.sampling import (
        _furthest_point_sample_xla,
    )

    rng = np.random.RandomState(7)
    for B, N, M in [(2, 2500, 256), (1, 4096, 1024)]:
        xyz = rng.uniform(-40, 40, (B, N, 3)).astype(np.float32)
        mask = rng.rand(B, N) > 0.1
        mask[:, 0] = True
        ref = np.asarray(
            _furthest_point_sample_xla(jnp.asarray(xyz), M, jnp.asarray(mask))
        )
        got = np.asarray(
            furthest_point_sample_block_pruned(
                jnp.asarray(xyz), M, jnp.asarray(mask), interpret=True
            )
        )
        np.testing.assert_array_equal(ref, got)
        # full-sweep mode (sync-free unconditional block loop) must stay
        # bitwise-identical — it only changes WHICH blocks are visited
        # (all of them), never the math
        got_fs = np.asarray(
            furthest_point_sample_block_pruned(
                jnp.asarray(xyz), M, jnp.asarray(mask), interpret=True,
                full_sweep=True,
            )
        )
        np.testing.assert_array_equal(ref, got_fs)


def test_fps_block_pruned_duplicate_points_ties():
    # many exactly-duplicated points force max ties; the kernel must pick
    # the minimum original index like jnp.argmax does
    from tsm_det_pointcloud_tpu.ops.fps_pallas import (
        furthest_point_sample_block_pruned,
    )
    from tsm_det_pointcloud_tpu.ops.sampling import (
        _furthest_point_sample_xla,
    )

    rng = np.random.RandomState(11)
    base = rng.uniform(-10, 10, (1, 300, 3)).astype(np.float32)
    xyz = np.concatenate([base, base[:, ::2], base[:, :100]], axis=1)
    ref = np.asarray(_furthest_point_sample_xla(jnp.asarray(xyz), 128))
    got = np.asarray(
        furthest_point_sample_block_pruned(jnp.asarray(xyz), 128,
                                           interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_block_pruned_two_rows_bitwise():
    """The 2-row-per-program block-pruned FPS variant (overlapped SREG
    syncs; r5 perf candidate, flag-gated) is bitwise-equal to the XLA
    oracle, including the odd-batch pad path and valid masks."""
    import numpy as np
    from tsm_det_pointcloud_tpu.ops.fps_pallas import (
        furthest_point_sample_block_pruned,
    )
    from tsm_det_pointcloud_tpu.ops.sampling import (
        _furthest_point_sample_xla,
    )

    rng = np.random.RandomState(11)
    for B in (2, 3):
        N, M = 4096, 256
        xyz = np.zeros((B, N, 3), np.float32)
        # clustered like the bench distribution
        for b in range(B):
            for k in range(8):
                c = rng.uniform(-50, 50, 3) * [1, 1, 0.02]
                xyz[b, k * 512:(k + 1) * 512] = c + rng.uniform(
                    -2, 2, (512, 3))
        mask = np.ones((B, N), bool)
        mask[:, N - 700:] = False
        for vm in (None, jnp.asarray(mask)):
            want = np.asarray(_furthest_point_sample_xla(
                jnp.asarray(xyz), M, vm))
            got = np.asarray(furthest_point_sample_block_pruned(
                jnp.asarray(xyz), M, vm, interpret=True, two_rows=True))
            np.testing.assert_array_equal(got, want)


def test_block_pruned_n_rows_bitwise():
    """The generic R-row kernel (r5: 4-row FPS, VERDICT r4 #4) is
    bitwise-equal to the XLA oracle, including the pad path (B=3 with
    R=4 pads one duplicate row) and valid masks."""
    import numpy as np
    from tsm_det_pointcloud_tpu.ops.fps_pallas import (
        furthest_point_sample_block_pruned,
    )
    from tsm_det_pointcloud_tpu.ops.sampling import (
        _furthest_point_sample_xla,
    )

    rng = np.random.RandomState(12)
    for B in (4, 3):
        N, M = 4096, 256
        xyz = np.zeros((B, N, 3), np.float32)
        for b in range(B):
            for k in range(8):
                c = rng.uniform(-50, 50, 3) * [1, 1, 0.02]
                xyz[b, k * 512:(k + 1) * 512] = c + rng.uniform(
                    -2, 2, (512, 3))
        mask = np.ones((B, N), bool)
        mask[:, N - 700:] = False
        for vm in (None, jnp.asarray(mask)):
            want = np.asarray(_furthest_point_sample_xla(
                jnp.asarray(xyz), M, vm))
            got = np.asarray(furthest_point_sample_block_pruned(
                jnp.asarray(xyz), M, vm, interpret=True, rows=4))
            np.testing.assert_array_equal(got, want)
