import numpy as np
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.ops.boxes import (
    boxes_to_corners_3d,
    boxes_to_corners_3d_np,
    points_in_boxes,
    points_in_boxes_mask,
    points_in_boxes_np,
    enlarge_box3d,
    mask_boxes_outside_range_np,
)
from tsm_det_pointcloud_tpu.utils.common_utils import (
    limit_period,
    rotate_points_along_z,
)


def test_corners_axis_aligned():
    b = jnp.array([[0.0, 0, 0, 2, 4, 6, 0]])
    c = np.array(boxes_to_corners_3d(b))[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(sorted(set(np.round(c[:, 0], 5))), [-1, 1])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 1], 5))), [-2, 2])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 2], 5))), [-3, 3])


def test_corners_rotation_90deg():
    b = jnp.array([[0.0, 0, 0, 2, 4, 2, np.pi / 2]])
    c = np.array(boxes_to_corners_3d(b))[0]
    # dx axis now along y, dy along -x
    np.testing.assert_allclose(c[:, 0].max(), 2, atol=1e-5)
    np.testing.assert_allclose(c[:, 1].max(), 1, atol=1e-5)


def test_corners_np_matches_jnp():
    rng = np.random.RandomState(1)
    b = np.concatenate(
        [rng.uniform(-5, 5, (10, 3)), rng.uniform(1, 4, (10, 3)), rng.uniform(-3, 3, (10, 1))],
        axis=1,
    ).astype(np.float32)
    np.testing.assert_allclose(
        np.array(boxes_to_corners_3d(jnp.array(b))), boxes_to_corners_3d_np(b), atol=1e-4
    )


def test_points_in_axis_aligned_box():
    boxes = jnp.array([[0.0, 0, 0, 2, 2, 2, 0]])
    pts = jnp.array([[0.0, 0, 0], [0.9, 0.9, 0.9], [1.1, 0, 0], [0, 0, -1.01]])
    idx = np.array(points_in_boxes(pts, boxes))
    np.testing.assert_array_equal(idx, [0, 0, -1, -1])


def test_points_in_rotated_box():
    # 4x1 box rotated 45deg: point along the diagonal inside, along x outside
    boxes = jnp.array([[0.0, 0, 0, 4, 1, 2, np.pi / 4]])
    d = np.sqrt(2) / 2
    pts = jnp.array([[1.2 * d, 1.2 * d, 0], [1.2, 0, 0.0]])
    idx = np.array(points_in_boxes(pts, boxes))
    np.testing.assert_array_equal(idx, [0, -1])


def test_points_in_boxes_first_box_priority():
    boxes = jnp.array([[0.0, 0, 0, 4, 4, 4, 0], [0.0, 0, 0, 2, 2, 2, 0]])
    pts = jnp.array([[0.0, 0, 0]])
    assert int(points_in_boxes(pts, boxes)[0]) == 0


def test_points_in_boxes_np_matches_jnp():
    rng = np.random.RandomState(2)
    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    boxes = np.concatenate(
        [rng.uniform(-8, 8, (7, 3)), rng.uniform(1, 5, (7, 3)), rng.uniform(-3, 3, (7, 1))],
        axis=1,
    ).astype(np.float32)
    got_j = np.array(points_in_boxes(jnp.array(pts), jnp.array(boxes)))
    got_n = points_in_boxes_np(pts, boxes)
    np.testing.assert_array_equal(got_j, got_n)


def test_extra_width():
    boxes = jnp.array([[0.0, 0, 0, 2, 2, 2, 0]])
    pts = jnp.array([[1.2, 0, 0.0]])
    assert int(points_in_boxes(pts, boxes)[0]) == -1
    assert bool(points_in_boxes_mask(pts, boxes, extra_width=(1.0, 1.0, 1.0))[0, 0])


def test_enlarge_box3d():
    b = np.array([[0.0, 0, 0, 2, 2, 2, 0.3]], np.float32)
    out = enlarge_box3d(b, (0.5, 0.5, 1.0))
    np.testing.assert_allclose(out[0, 3:6], [2.5, 2.5, 3.0])
    np.testing.assert_allclose(b[0, 3:6], [2, 2, 2])  # input untouched


def test_limit_period():
    v = np.array([0.0, np.pi, -np.pi, 3 * np.pi / 2, 2 * np.pi])
    out = limit_period(v, offset=0.5, period=2 * np.pi)
    assert np.all(out >= -np.pi) and np.all(out < np.pi)
    np.testing.assert_allclose(out[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[3], -np.pi / 2, atol=1e-6)


def test_rotate_points_along_z_convention():
    # p_new = p @ R with R=[[c,s,0],[-s,c,0],[0,0,1]] rotates +x toward... check:
    # (1,0,0) with angle pi/2 -> row vec [1,0,0]@[[0,1,0],[-1,0,0],[0,0,1]] = (0,1,0)
    pts = jnp.array([[[1.0, 0, 0]]])
    out = np.array(rotate_points_along_z(pts, jnp.array([np.pi / 2])))
    np.testing.assert_allclose(out[0, 0], [0, 1, 0], atol=1e-6)


def test_mask_boxes_outside_range():
    boxes = np.array(
        [[0, 0, 0, 2, 2, 2, 0], [100, 0, 0, 2, 2, 2, 0], [69, 0, 0, 4, 2, 2, 0.0]],
        np.float32,
    )
    m = mask_boxes_outside_range_np(boxes, [-70, -40, -3, 70, 40, 1])
    np.testing.assert_array_equal(m, [True, False, True])
