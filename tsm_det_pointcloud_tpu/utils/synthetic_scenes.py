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

# "Hard" mini-KITTI preset (round-5, VERDICT #1): the easy scenes saturate
# the teacher at 100.0 AP, which makes the distillation gap unmeasurable.
# Realistic difficulty comes from the same places it does on real KITTI:
# far sparse objects (1/r^2 return density), partial occlusion, size
# variance, and vertical clutter that bait false positives. Knobs are one
# dict so calibration runs can sweep them.
HARD_V1 = dict(
    extent=(6.0, 62.0, -26.0, 26.0),   # x0 x1 y0 y1 for object centers
    density_ref=15.0,   # objects at r get base_pts * min(1,(ref/r)^2)
    min_obj_pts=14,     # floor: keep every GT detectable in principle
    occlude_p=0.55,     # chance a box loses an azimuthal sector of points
    occlude_frac=(0.25, 0.55),
    size_jitter=0.12,   # per-axis uniform size scale in [1-j, 1+j]
    n_clutter=(4, 9),   # vertical pole/wall/bush structures per scene
    ground=(0.0, 68.0, -30.0, 30.0),
)


def sample_boxes(rng, k=5, class_mix=(1, 1, 1, 1, 1), extent=(8, 28, -12, 12),
                 min_sep=5.0, size_jitter=0.0):
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
        if size_jitter:
            jx, jy, jz = rng.uniform(1 - size_jitter, 1 + size_jitter, 3)
            dx, dy, dz = dx * jx, dy * jy, dz * jz
        boxes.append([cx, cy, rng.uniform(-1.2, -0.8), dx, dy, dz,
                      rng.uniform(-np.pi, np.pi), float(cls)])
    return np.asarray(boxes, np.float32)


def _clutter_boxes(rng, hard):
    """Vertical non-class structures (poles / wall segments / bushes) as
    (M, 7) pseudo-boxes for surface sampling — false-positive bait that the
    easy scenes never had. Not added to GT."""
    lo, hi = hard["n_clutter"]
    m = int(rng.integers(lo, hi + 1))
    gx0, gx1, gy0, gy1 = hard["ground"]
    out = []
    for _ in range(m):
        kind = rng.integers(0, 3)
        if kind == 0:    # pole
            dx = dy = rng.uniform(0.15, 0.45)
            dz = rng.uniform(1.6, 3.4)
        elif kind == 1:  # wall segment
            dx = rng.uniform(2.0, 6.0)
            dy = rng.uniform(0.2, 0.5)
            dz = rng.uniform(0.9, 2.2)
        else:            # bush / trolley blob
            dx = rng.uniform(0.7, 1.6)
            dy = rng.uniform(0.5, 1.2)
            dz = rng.uniform(0.6, 1.4)
        out.append([rng.uniform(gx0 + 2, gx1 - 2), rng.uniform(gy0 + 2,
                    gy1 - 2), rng.uniform(-1.4, -0.9), dx, dy, dz,
                    rng.uniform(-np.pi, np.pi)])
    return np.asarray(out, np.float32).reshape(-1, 7)


def make_scene(rng, n_points, boxes, hard=None, clutter=None):
    """Points on box surfaces + ground clutter. boxes (M, >=7) (col 7 =
    class when present; per-object point budget scales with class size).
    With a `hard` preset dict (HARD_V1): per-object budgets fall off as
    1/r^2 from the sensor, boxes may lose an azimuthal sector (occlusion),
    and `clutter` pseudo-boxes get surface points too."""
    gx0, gx1, gy0, gy1 = (hard["ground"] if hard else (0.0, 32.0, -16.0,
                                                       16.0))
    pts = np.zeros((n_points, 4), np.float32)
    pts[:, 0] = rng.uniform(gx0, gx1, n_points)
    pts[:, 1] = rng.uniform(gy0, gy1, n_points)
    pts[:, 2] = rng.uniform(-1.9, -1.6, n_points)
    pts[:, 3] = rng.uniform(0, 1, n_points)
    ofs = 0

    def budget(base, cx, cy):
        if hard is None:
            return base
        r = max(np.hypot(cx, cy), 1.0)
        per = int(base * min(1.0, (hard["density_ref"] / r) ** 2))
        return max(per, hard["min_obj_pts"])

    rows = [(row, CLASS_SPECS.get(int(row[7]) if len(row) > 7 else 1,
                                  CLASS_SPECS[1])[1], True)
            for row in np.asarray(boxes)]
    if clutter is not None and len(clutter):
        rows += [(row, 420, False) for row in np.asarray(clutter)]
    for row, base, is_gt in rows:
        cx, cy, cz, dx, dy, dz, ry = [float(v) for v in row[:7]]
        per = min(budget(base, cx, cy), n_points - ofs)
        if per <= 0:
            break
        # sample on the box top + sides in the box frame
        u = rng.uniform(-0.5, 0.5, (per, 2))
        face = rng.integers(0, 3, per)
        lx = np.where(face == 0, u[:, 0] * dx, np.where(
            face == 1, np.sign(u[:, 0]) * dx / 2, u[:, 0] * dx))
        ly = np.where(face == 0, u[:, 1] * dy, np.where(
            face == 1, u[:, 1] * dy, np.sign(u[:, 1]) * dy / 2))
        lz = np.where(face == 0, dz / 2, rng.uniform(-0.5, 0.5, per) * dz)
        if hard and is_gt and rng.uniform() < hard["occlude_p"]:
            # occlusion: drop points whose box-frame azimuth falls in a
            # random sector; keep at least min_obj_pts survivors
            a0 = rng.uniform(-np.pi, np.pi)
            width = rng.uniform(*hard["occlude_frac"]) * 2 * np.pi
            ang = np.arctan2(ly, lx)
            d = np.abs((ang - a0 + np.pi) % (2 * np.pi) - np.pi)
            keep = d > width / 2
            if keep.sum() < hard["min_obj_pts"]:
                keep[:hard["min_obj_pts"]] = True
            lx, ly, lz = lx[keep], ly[keep], lz[keep]
            per = len(lx)
        s = slice(ofs, ofs + per)
        ofs += per
        c, s_ = np.cos(ry), np.sin(ry)
        pts[s, 0] = cx + lx * c - ly * s_
        pts[s, 1] = cy + lx * s_ + ly * c
        pts[s, 2] = cz + lz
        pts[s, 3] = rng.uniform(0.3, 0.9, per)
    return pts


def make_batch(rng, batch, n_points, jnp, class_mix=(1, 1, 1, 1, 1),
               max_gt=12, hard=None):
    """One collated batch of `batch` scenes, k = len(class_mix) boxes each.
    Returns (batch_dict, gt (batch, max_gt, 8) numpy). hard: a HARD_V1-style
    preset dict enabling the round-5 difficulty model (see HARD_V1)."""
    k = len(class_mix)
    gt = np.zeros((batch, max_gt, 8), np.float32)
    gtm = np.zeros((batch, max_gt), bool)
    pts = np.zeros((batch, n_points, 4), np.float32)
    for b in range(batch):
        boxes = sample_boxes(
            rng, k=k, class_mix=class_mix,
            extent=hard["extent"] if hard else (8, 28, -12, 12),
            size_jitter=hard["size_jitter"] if hard else 0.0)
        clutter = _clutter_boxes(rng, hard) if hard else None
        pts[b] = make_scene(rng, n_points, boxes, hard=hard, clutter=clutter)
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
