"""3D box geometry, fully vectorized.

Box convention (identical to the reference, pcdet/utils/box_utils.py):
    (x, y, z, dx, dy, dz, heading[, ...])  — (x, y, z) is the BOX CENTER
    (z included), heading is the CCW rotation about +z of the +x (dx) axis.

Everything here is pure jnp and static-shaped — `points_in_boxes` replaces the
reference's roiaware_pool3d CUDA kernel (points_in_boxes_kernel,
ops/roiaware_pool3d/src/roiaware_pool3d_kernel.cu:313) with a vectorized
(N, M) test that XLA tiles onto the VPU. Numpy twins (`*_np`) serve the host
data pipeline where the reference used the CPU variants.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.common_utils import rotate_points_along_z, rotate_points_along_z_np

# template corner order matches pcdet/utils/box_utils.py:boxes_to_corners_3d
_CORNER_TEMPLATE = np.array(
    [
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ],
    dtype=np.float32,
) / 2.0


def boxes_to_corners_3d(boxes3d):
    """(N, 7[+]) boxes -> (N, 8, 3) corners."""
    boxes3d = jnp.asarray(boxes3d)
    template = jnp.asarray(_CORNER_TEMPLATE)
    corners = boxes3d[:, None, 3:6] * template[None]  # (N, 8, 3)
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def boxes_to_corners_3d_np(boxes3d: np.ndarray) -> np.ndarray:
    corners = boxes3d[:, None, 3:6] * _CORNER_TEMPLATE[None]
    corners = rotate_points_along_z_np(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def boxes_to_corners_bev(boxes3d):
    """(N, 7[+]) boxes -> (N, 4, 2) BEV corners, CCW order.

    Order: starting from (+dx/2, +dy/2) going (+,-), (-,-), (-,+) pre-rotation
    (i.e. clockwise in box frame == template order above restricted to z<0),
    which after the heading rotation stays a consistent winding — the rotated
    IoU clipper only needs consistency, not a specific direction.
    """
    boxes3d = jnp.asarray(boxes3d)
    template = jnp.asarray(_CORNER_TEMPLATE[:4, :2])  # (4, 2)
    corners = boxes3d[:, None, 3:5] * template[None]  # (N, 4, 2)
    cosa, sina = jnp.cos(boxes3d[:, 6]), jnp.sin(boxes3d[:, 6])
    x = corners[..., 0] * cosa[:, None] - corners[..., 1] * sina[:, None]
    y = corners[..., 0] * sina[:, None] + corners[..., 1] * cosa[:, None]
    return jnp.stack([x, y], axis=-1) + boxes3d[:, None, 0:2]


def in_box_frame(points, boxes):
    """Transform (N, 3) points into each of (M, 7) boxes' local frames.

    Returns (N, M, 3) local coordinates (box center at origin, axes aligned
    with the box).
    """
    rel = points[:, None, :3] - boxes[None, :, 0:3]  # (N, M, 3)
    cosa, sina = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])  # inverse rot
    x = rel[..., 0] * cosa[None] - rel[..., 1] * sina[None]
    y = rel[..., 0] * sina[None] + rel[..., 1] * cosa[None]
    return jnp.stack([x, y, rel[..., 2]], axis=-1)


def points_in_boxes_mask(points, boxes, extra_width=None):
    """(N, 3+) points x (M, 7) boxes -> (N, M) bool containment mask."""
    points = jnp.asarray(points)
    boxes = jnp.asarray(boxes)
    local = in_box_frame(points[:, :3], boxes)
    half = boxes[:, 3:6] * 0.5
    if extra_width is not None:
        half = half + jnp.asarray(extra_width, half.dtype) * 0.5
    return jnp.all(jnp.abs(local) <= half[None], axis=-1)


def points_in_boxes(points, boxes, extra_width=None, valid_mask=None):
    """First box index containing each point, -1 for background.

    Parity: roiaware_pool3d points_in_boxes_gpu (boxes get priority by index,
    a point inside several boxes is assigned the lowest index — the CUDA
    kernel breaks on first hit). `valid_mask` (M,) excludes padded boxes.
    """
    mask = points_in_boxes_mask(points, boxes, extra_width)  # (N, M)
    if valid_mask is not None:
        mask = mask & valid_mask[None, :]
    any_hit = jnp.any(mask, axis=-1)
    first = jnp.argmax(mask, axis=-1)
    return jnp.where(any_hit, first, -1)


def points_in_boxes_np(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Numpy twin of points_in_boxes (host pipeline / gt-db creation;
    parity: points_in_boxes_cpu, roiaware_pool3d_utils.py:9). Dispatches
    to the native OpenMP library (ops/host_native.py) when compiled; the
    numpy body is the fallback and parity oracle."""
    if boxes.shape[0] == 0:
        return np.full(points.shape[0], -1, dtype=np.int64)
    from . import host_native

    if points.shape[0] * boxes.shape[0] >= 1 << 14 and host_native.available():
        return host_native.points_in_boxes(points, boxes)
    rel = points[:, None, :3] - boxes[None, :, 0:3]
    cosa, sina = np.cos(-boxes[:, 6]), np.sin(-boxes[:, 6])
    x = rel[..., 0] * cosa[None] - rel[..., 1] * sina[None]
    y = rel[..., 0] * sina[None] + rel[..., 1] * cosa[None]
    local = np.stack([x, y, rel[..., 2]], axis=-1)
    mask = np.all(np.abs(local) <= boxes[None, :, 3:6] * 0.5, axis=-1)
    any_hit = mask.any(axis=-1)
    first = mask.argmax(axis=-1)
    return np.where(any_hit, first, -1).astype(np.int64)


def enlarge_box3d(boxes3d, extra_width=(0, 0, 0)):
    """Grow dx/dy/dz by extra_width (parity: box_utils.enlarge_box3d)."""
    mod = jnp if isinstance(boxes3d, jnp.ndarray) else np
    extra = mod.asarray(extra_width, dtype=boxes3d.dtype)
    out = boxes3d.copy() if mod is np else boxes3d
    sizes = boxes3d[..., 3:6] + extra
    if mod is np:
        out[..., 3:6] = sizes
        return out
    return boxes3d.at[..., 3:6].set(sizes)


def mask_boxes_outside_range_np(boxes: np.ndarray, limit_range, min_num_corners=1) -> np.ndarray:
    """Keep boxes with >= min_num_corners BEV corners inside range.
    Parity: box_utils.mask_boxes_outside_range_numpy."""
    if boxes.shape[0] == 0:
        return np.zeros(0, dtype=bool)
    if boxes.shape[1] > 7:
        boxes = boxes[:, :7]
    corners = boxes_to_corners_3d_np(boxes)  # (N, 8, 3)
    inside = ((corners[..., :2] >= np.array(limit_range[0:2])) &
              (corners[..., :2] <= np.array(limit_range[3:5]))).all(axis=-1)
    return inside.sum(axis=-1) >= min_num_corners


def remove_points_in_boxes3d_np(points: np.ndarray, boxes3d: np.ndarray) -> np.ndarray:
    idx = points_in_boxes_np(points, boxes3d)
    return points[idx < 0]


def boxes3d_lidar_to_aligned_bev_np(boxes3d: np.ndarray) -> np.ndarray:
    """(N, 7) -> (N, 4) axis-aligned BEV [x1, y1, x2, y2] bounding the rotated
    box (used for cheap pre-filtering)."""
    corners = boxes_to_corners_3d_np(boxes3d)[:, :4, :2]
    mins, maxs = corners.min(axis=1), corners.max(axis=1)
    return np.concatenate([mins, maxs], axis=-1)


# ---------------------------------------------------------------------------
# KITTI camera <-> lidar box conversions (host side, numpy)
# Parity: pcdet/utils/box_utils.py boxes3d_kitti_camera_to_lidar etc.
# ---------------------------------------------------------------------------

def boxes3d_kitti_camera_to_lidar(boxes3d_camera: np.ndarray, calib) -> np.ndarray:
    """(N, 7) [x, y, z, l, h, w, ry] camera/rect -> (N, 7) lidar
    [x, y, z, dx(l), dy(w), dz(h), heading]."""
    boxes3d_camera = boxes3d_camera.copy()
    xyz_camera = boxes3d_camera[:, 0:3]
    l, h, w, r = (
        boxes3d_camera[:, 3:4], boxes3d_camera[:, 4:5],
        boxes3d_camera[:, 5:6], boxes3d_camera[:, 6:7],
    )
    xyz_lidar = calib.rect_to_lidar(xyz_camera)
    xyz_lidar[:, 2] += h[:, 0] / 2
    return np.concatenate([xyz_lidar, l, w, h, -(np.pi / 2 + r)], axis=-1)


def boxes3d_lidar_to_kitti_camera(boxes3d_lidar: np.ndarray, calib) -> np.ndarray:
    """(N, 7) lidar -> (N, 7) [x, y, z, l, h, w, ry] camera (bottom center)."""
    boxes3d_lidar = boxes3d_lidar.copy()
    xyz_lidar = boxes3d_lidar[:, 0:3].copy()
    l, w, h, r = (
        boxes3d_lidar[:, 3:4], boxes3d_lidar[:, 4:5],
        boxes3d_lidar[:, 5:6], boxes3d_lidar[:, 6:7],
    )
    xyz_lidar[:, 2] -= h[:, 0] / 2
    xyz_cam = calib.lidar_to_rect(xyz_lidar)
    r_cam = -r - np.pi / 2
    return np.concatenate([xyz_cam, l, h, w, r_cam], axis=-1)


def boxes3d_kitti_camera_to_imageboxes(boxes3d: np.ndarray, calib,
                                       image_shape=None) -> np.ndarray:
    """(N, 7) camera boxes -> (N, 4) [x1, y1, x2, y2] image boxes."""
    if boxes3d.shape[0] == 0:
        return np.zeros((0, 4), np.float32)
    corners3d = _boxes3d_camera_corners(boxes3d)
    pts_img, _ = calib.corners3d_to_img_boxes(corners3d)
    boxes2d = pts_img
    if image_shape is not None:
        boxes2d[:, 0] = np.clip(boxes2d[:, 0], a_min=0, a_max=image_shape[1] - 1)
        boxes2d[:, 1] = np.clip(boxes2d[:, 1], a_min=0, a_max=image_shape[0] - 1)
        boxes2d[:, 2] = np.clip(boxes2d[:, 2], a_min=0, a_max=image_shape[1] - 1)
        boxes2d[:, 3] = np.clip(boxes2d[:, 3], a_min=0, a_max=image_shape[0] - 1)
    return boxes2d


def _boxes3d_camera_corners(boxes3d: np.ndarray) -> np.ndarray:
    """(N, 7) camera boxes [x,y,z,l,h,w,ry] -> (N, 8, 3) rect corners
    (bottom-center origin, y down)."""
    n = boxes3d.shape[0]
    l, h, w = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5]
    x_c = np.array([1, 1, -1, -1, 1, 1, -1, -1], np.float32) / 2
    y_c = np.array([0, 0, 0, 0, -1, -1, -1, -1], np.float32)
    z_c = np.array([1, -1, -1, 1, 1, -1, -1, 1], np.float32) / 2
    corners = np.stack(
        [x_c[None] * l[:, None], y_c[None] * h[:, None], z_c[None] * w[:, None]],
        axis=-1,
    )  # (N, 8, 3)
    ry = boxes3d[:, 6]
    c, s = np.cos(ry), np.sin(ry)
    rot = np.stack(
        [c, np.zeros_like(c), s, np.zeros_like(c), np.ones_like(c),
         np.zeros_like(c), -s, np.zeros_like(c), c], axis=-1
    ).reshape(n, 3, 3)
    corners = np.einsum("nij,nkj->nki", rot, corners)
    return corners + boxes3d[:, None, 0:3]
