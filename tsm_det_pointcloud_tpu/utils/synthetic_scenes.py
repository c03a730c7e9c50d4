"""Synthetic KITTI-like scene generation for on-device training proofs.

Shared by tools/sanity_overfit.py (single-class overfit gates) and
tools/distill_proof.py (the mini-KITTI distillation + class-statistics
proof). Real KITTI/Waymo data is environment-blocked, so these scenes are
the substrate for every end-to-end learning check: points sampled on box
surfaces over a ground slab, boxes rejection-sampled apart so the deployed
NMS (IoU 0.1) can never merge two GT (see tools/oracle_eval.py).

Class geometry follows the KITTI mean box sizes the reference's anchor
configs use (reference tools/cfgs/kitti_models/*.yaml anchor_sizes):
Car (3.9, 1.6, 1.56), Pedestrian (0.8, 0.6, 1.73), Cyclist (1.76, 0.6,
1.73).
"""
from __future__ import annotations

import numpy as np

# (dx, dy, dz), points-per-object for surface sampling
CLASS_SPECS = {
    1: ((3.9, 1.6, 1.56), 1200),   # Car
    2: ((0.8, 0.6, 1.73), 350),    # Pedestrian
    3: ((1.76, 0.6, 1.73), 500),   # Cyclist
}
CLASS_NAMES = {1: "Car", 2: "Pedestrian", 3: "Cyclist"}


def sample_boxes(rng, k=5, class_mix=(1, 1, 1, 1, 1), extent=(8, 28, -12, 12),
                 min_sep=5.0):
    """(k, 8) lidar boxes [x y z dx dy dz ry cls]. Centers rejection-sampled
    >= min_sep apart: overlapping GT above the deployed NMS_THRESH make even
    perfect detections unrecoverable (one is correctly suppressed)."""
    x0, x1, y0, y1 = extent
    centers = []
    while len(centers) < k:
        c = np.array([rng.uniform(x0, x1), rng.uniform(y0, y1)])
        if all(np.linalg.norm(c - p) >= min_sep for p in centers):
            centers.append(c)
    boxes = []
    for (cx, cy), cls in zip(centers, class_mix):
        dx, dy, dz = CLASS_SPECS[int(cls)][0]
        boxes.append([cx, cy, rng.uniform(-1.2, -0.8), dx, dy, dz,
                      rng.uniform(-np.pi, np.pi), float(cls)])
    return np.asarray(boxes, np.float32)


def make_scene(rng, n_points, boxes):
    """Points on box surfaces + ground clutter. boxes (M, >=7) (col 7 =
    class when present; per-object point budget scales with class size)."""
    pts = np.zeros((n_points, 4), np.float32)
    pts[:, 0] = rng.uniform(0.0, 32.0, n_points)
    pts[:, 1] = rng.uniform(-16.0, 16.0, n_points)
    pts[:, 2] = rng.uniform(-1.9, -1.6, n_points)
    pts[:, 3] = rng.uniform(0, 1, n_points)
    ofs = 0
    for row in np.asarray(boxes):
        cx, cy, cz, dx, dy, dz, ry = [float(v) for v in row[:7]]
        cls = int(row[7]) if len(row) > 7 else 1
        per = CLASS_SPECS.get(cls, CLASS_SPECS[1])[1]
        per = min(per, n_points - ofs)
        if per <= 0:
            break
        s = slice(ofs, ofs + per)
        ofs += per
        # sample on the box top + sides in the box frame
        u = rng.uniform(-0.5, 0.5, (per, 2))
        face = rng.integers(0, 3, per)
        lx = np.where(face == 0, u[:, 0] * dx, np.where(
            face == 1, np.sign(u[:, 0]) * dx / 2, u[:, 0] * dx))
        ly = np.where(face == 0, u[:, 1] * dy, np.where(
            face == 1, u[:, 1] * dy, np.sign(u[:, 1]) * dy / 2))
        lz = np.where(face == 0, dz / 2, rng.uniform(-0.5, 0.5, per) * dz)
        c, s_ = np.cos(ry), np.sin(ry)
        pts[s, 0] = cx + lx * c - ly * s_
        pts[s, 1] = cy + lx * s_ + ly * c
        pts[s, 2] = cz + lz
        pts[s, 3] = rng.uniform(0.3, 0.9, per)
    return pts


def make_batch(rng, batch, n_points, jnp, class_mix=(1, 1, 1, 1, 1),
               max_gt=12):
    """One collated batch of `batch` scenes, k = len(class_mix) boxes each.
    Returns (batch_dict, gt (batch, max_gt, 8) numpy)."""
    k = len(class_mix)
    gt = np.zeros((batch, max_gt, 8), np.float32)
    gtm = np.zeros((batch, max_gt), bool)
    pts = np.zeros((batch, n_points, 4), np.float32)
    for b in range(batch):
        boxes = sample_boxes(rng, k=k, class_mix=class_mix)
        pts[b] = make_scene(rng, n_points, boxes)
        gt[b, :k] = boxes
        gtm[b, :k] = True
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((batch, n_points), bool),
        "batch_size": batch,
        "gt_boxes": jnp.asarray(gt), "gt_boxes_mask": jnp.asarray(gtm),
    }, gt


def lidar_boxes_to_cam(boxes):
    """(N, 7) lidar x,y,z(center),dx,dy,dz,ry -> camera-frame
    x,y(bottom),z,l,h,w,ry under the standard KITTI extrinsic
    (cam x=-y_l, y=-z_l, z=x_l; ry_cam = -ry_l - pi/2). gt and dt go
    through the SAME rigid map, so official AP is exact."""
    b = np.asarray(boxes, np.float64).reshape(-1, 7)
    out = np.zeros_like(b)
    out[:, 0] = -b[:, 1]
    out[:, 1] = -(b[:, 2] - b[:, 5] / 2.0)  # cam y points down; bottom face
    out[:, 2] = b[:, 0]
    out[:, 3] = b[:, 3]  # l
    out[:, 4] = b[:, 5]  # h
    out[:, 5] = b[:, 4]  # w
    ry = -b[:, 6] - np.pi / 2
    out[:, 6] = (ry + np.pi) % (2 * np.pi) - np.pi
    return out


def cam_anno(boxes_cam, names, scores=None):
    """Official-protocol annotation dict (camera frame). The fake 2D bbox
    is 50 px tall -> 'moderate' difficulty for every object."""
    n = len(boxes_cam)
    anno = {
        "name": np.asarray(names),
        "truncated": np.zeros(n),
        "occluded": np.zeros(n, np.int64),
        "alpha": np.full(n, -10.0) if scores is not None else np.zeros(n),
        "bbox": np.tile(np.array([100.0, 100.0, 200.0, 150.0]), (n, 1))
        if n else np.zeros((0, 4)),
        "dimensions": boxes_cam[:, 3:6].reshape(-1, 3),
        "location": boxes_cam[:, 0:3].reshape(-1, 3),
        "rotation_y": boxes_cam[:, 6].reshape(-1),
    }
    if scores is not None:
        anno["score"] = np.asarray(scores, np.float64)
    return anno
