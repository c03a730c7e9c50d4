"""Native host-ops library (csrc/host_ops.cpp) vs its numpy oracles.

The C++ library mirrors eval/rotate_iou_np.py::_rotate_iou_numpy and
ops/boxes.py::points_in_boxes_np bit-for-bit in algorithm (same corner
order, clip epsilons, first-hit rule); these tests pin that parity on
random + adversarial geometry so either path can score an official eval.
"""
import numpy as np
import pytest

from tsm_det_pointcloud_tpu.ops import host_native
from tsm_det_pointcloud_tpu.eval.rotate_iou_np import _rotate_iou_numpy

pytestmark = pytest.mark.skipif(
    not host_native.available(), reason="no host compiler"
)


def _rand_boxes(rng, n):
    b = np.zeros((n, 5))
    b[:, 0] = rng.uniform(-20, 20, n)
    b[:, 1] = rng.uniform(-20, 20, n)
    b[:, 2] = rng.uniform(0.5, 6.0, n)
    b[:, 3] = rng.uniform(0.5, 3.0, n)
    b[:, 4] = rng.uniform(-2 * np.pi, 2 * np.pi, n)
    return b


@pytest.mark.parametrize("criterion", [None, -1, 0, 1])
def test_rotate_iou_matches_numpy(criterion):
    rng = np.random.default_rng(0)
    a, b = _rand_boxes(rng, 64), _rand_boxes(rng, 48)
    got = host_native.rotate_iou(a, b, criterion)
    want = _rotate_iou_numpy(a, b, criterion)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rotate_iou_adversarial_geometry():
    # identical boxes, touching edges, containment, near-degenerate slivers
    a = np.array([
        [0, 0, 2, 2, 0.0],
        [0, 0, 2, 2, np.pi / 4],
        [2, 0, 2, 2, 0.0],          # shares exactly one edge with box 0
        [0, 0, 0.5, 0.5, 0.3],      # contained in box 0
        [0, 0, 1e-4, 4, 1.1],       # sliver
    ])
    got = host_native.rotate_iou(a, a, -1)
    want = _rotate_iou_numpy(a, a, -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-5)
    assert got[0, 2] < 1e-6  # edge contact, zero area


def test_rotate_iou_empty():
    z = np.zeros((0, 5))
    b = _rand_boxes(np.random.default_rng(1), 3)
    assert host_native.rotate_iou(z, b).shape == (0, 3)
    assert host_native.rotate_iou(b, z).shape == (3, 0)


def test_points_in_boxes_matches_numpy_first_hit():
    from tsm_det_pointcloud_tpu.ops.boxes import points_in_boxes_np

    rng = np.random.default_rng(2)
    pts = rng.uniform(-10, 10, (4096, 3))
    boxes = np.zeros((12, 7))
    boxes[:, :3] = rng.uniform(-8, 8, (12, 3))
    boxes[:, 3:6] = rng.uniform(1, 6, (12, 3))  # big enough to overlap
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 12)
    got = host_native.points_in_boxes(pts, boxes)
    # numpy oracle (force the pure path by calling the body inline)
    rel = pts[:, None, :3] - boxes[None, :, 0:3]
    cosa, sina = np.cos(-boxes[:, 6]), np.sin(-boxes[:, 6])
    x = rel[..., 0] * cosa[None] - rel[..., 1] * sina[None]
    y = rel[..., 0] * sina[None] + rel[..., 1] * cosa[None]
    local = np.stack([x, y, rel[..., 2]], axis=-1)
    mask = np.all(np.abs(local) <= boxes[None, :, 3:6] * 0.5, axis=-1)
    want = np.where(mask.any(-1), mask.argmax(-1), -1)
    np.testing.assert_array_equal(got, want)
    assert (got >= 0).any()  # the scene actually has hits
    # and the public entry point (which dispatches natively at this size)
    np.testing.assert_array_equal(points_in_boxes_np(pts, boxes), want)


def test_points_in_boxes_boundary_inclusive():
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0]])
    pts = np.array([[1.0, 0, 0], [1.0000001, 0, 0], [-1.0, -1.0, -1.0]])
    got = host_native.points_in_boxes(pts, boxes)
    np.testing.assert_array_equal(got, [0, -1, 0])


def test_native_is_fast_enough():
    # the whole point: >= 50x the numpy path at eval-scale grids
    import time

    rng = np.random.default_rng(3)
    a, b = _rand_boxes(rng, 512), _rand_boxes(rng, 256)
    host_native.rotate_iou(a[:4], b[:4])  # warm the lib
    t0 = time.perf_counter()
    host_native.rotate_iou(a, b)
    dt = time.perf_counter() - t0
    assert dt < 0.5, f"native rotate_iou too slow: {dt:.3f}s for 512x256"
