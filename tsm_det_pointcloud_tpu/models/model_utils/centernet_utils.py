"""CenterNet utilities — heatmap targets, decode, circle NMS (jnp).

Parity: pcdet/models/model_utils/centernet_utils.py — gaussian_radius (:7),
draw_gaussian_to_heatmap (:47), decode_bbox_from_heatmap (:154),
circle_nms (:81). TPU design: the per-gt "draw" loop becomes one masked
max-reduction of analytic gaussians over the full (H, W) map (a handful of
fused VPU ops per gt), and circle NMS reuses the suppression-matrix
fixpoint pattern from ops/iou3d.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.topk import top_k


def gaussian_radius(height, width, min_overlap=0.5):
    """Smallest gaussian radius keeping IoU >= min_overlap (CornerNet)."""
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0))
    r1 = (b1 + sq1) / 2

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians(centers_xy, radii, valid, size_hw):
    """Render max-combined gaussians. centers_xy (M, 2) in feature-map
    units, radii (M,), valid (M,) -> (H, W) heatmap.

    Equivalent to the reference's per-gt square-window draw with
    sigma = (2r+1)/6 and max-overlay; here one analytic pass per gt over
    the whole map (XLA fuses the M-loop into a single reduction)."""
    H, W = size_hw
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]

    def one(cxy, r, ok):
        sigma = (2.0 * r + 1.0) / 6.0
        d2 = (xs - jnp.floor(cxy[0])) ** 2 + (ys - jnp.floor(cxy[1])) ** 2
        g = jnp.exp(-d2 / (2.0 * sigma ** 2 + 1e-9))
        # the reference draws only inside the radius window; outside values
        # are < exp(-r^2/(2 sigma^2)) ~ tiny, but mask for exactness
        g = jnp.where(d2 <= (r + 1.0) ** 2 * 2.0, g, 0.0)
        return jnp.where(ok, g, 0.0)

    gs = jax.vmap(one)(centers_xy, radii, valid)  # (M, H, W)
    return gs.max(axis=0)


def assign_center_targets(gt_boxes, gt_valid, class_ids, num_classes,
                          point_cloud_range, voxel_size, feature_map_stride,
                          size_hw, gaussian_overlap=0.1, min_radius=2,
                          code_size=8):
    """One sample's CenterPoint targets.
    gt_boxes (M, 7+), class_ids (M,) 1-based. Returns dict:
      heatmap (C, H, W), box_targets (M, code_size), inds (M,) flat map
      index of each gt center, mask (M,)."""
    H, W = size_hw
    vx = voxel_size[0] * feature_map_stride
    vy = voxel_size[1] * feature_map_stride
    x0, y0 = point_cloud_range[0], point_cloud_range[1]

    cx = (gt_boxes[:, 0] - x0) / vx
    cy = (gt_boxes[:, 1] - y0) / vy
    in_map = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H) & gt_valid

    dx = gt_boxes[:, 3] / vx
    dy = gt_boxes[:, 4] / vy
    radius = gaussian_radius(dy, dx, min_overlap=gaussian_overlap)
    radius = jnp.maximum(radius.astype(jnp.int32), min_radius).astype(jnp.float32)

    centers = jnp.stack([cx, cy], -1)
    heatmaps = []
    for c in range(num_classes):
        m = in_map & (class_ids == c + 1)
        heatmaps.append(draw_gaussians(centers, radius, m, size_hw))
    heatmap = jnp.stack(heatmaps, 0)

    xi = jnp.clip(jnp.floor(cx), 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.floor(cy), 0, H - 1).astype(jnp.int32)
    inds = yi * W + xi

    # regression targets: dxy offset, z, log sizes, sin/cos rot (+velocity)
    tgt = [
        (cx - xi.astype(jnp.float32))[:, None],
        (cy - yi.astype(jnp.float32))[:, None],
        gt_boxes[:, 2:3],
        jnp.log(jnp.clip(gt_boxes[:, 3:6], 1e-5)),
        jnp.sin(gt_boxes[:, 6:7]),
        jnp.cos(gt_boxes[:, 6:7]),
    ]
    if code_size > 8 and gt_boxes.shape[-1] >= 9:
        tgt.append(gt_boxes[:, 7:9])  # velocity
    box_targets = jnp.concatenate(tgt, -1)
    box_targets = jnp.where(in_map[:, None], box_targets, 0.0)
    return dict(heatmap=heatmap, box_targets=box_targets, inds=inds,
                mask=in_map)


def decode_bbox_from_heatmap(heatmap, rot_cos, rot_sin, center, center_z,
                             dim, point_cloud_range, voxel_size,
                             feature_map_stride, vel=None, K=100,
                             score_thresh=None):
    """heatmap (C, H, W) sigmoid scores; reg maps (c, H, W). Returns
    fixed-size boxes (K, 7[+2]), scores (K,), labels (K,) int32 (0-based)
    sorted by score. Parity: centernet_utils.py:154-220."""
    C, H, W = heatmap.shape
    flat = heatmap.reshape(C * H * W)
    scores, idx = top_k(flat, K)
    labels = (idx // (H * W)).astype(jnp.int32)
    pix = idx % (H * W)
    yi = (pix // W).astype(jnp.float32)
    xi = (pix % W).astype(jnp.float32)

    def take(m):
        return m.reshape(m.shape[0], H * W)[:, pix]  # (c, K)

    off = take(center)
    z = take(center_z)[0]
    d = take(dim)
    rc = take(rot_cos)[0]
    rs = take(rot_sin)[0]
    angle = jnp.arctan2(rs, rc)
    xs = (xi + off[0]) * feature_map_stride * voxel_size[0] + point_cloud_range[0]
    ys = (yi + off[1]) * feature_map_stride * voxel_size[1] + point_cloud_range[1]
    parts = [xs[:, None], ys[:, None], z[:, None], jnp.exp(d).T,
             angle[:, None]]
    if vel is not None:
        parts.append(take(vel).T)
    boxes = jnp.concatenate(parts, -1)
    if score_thresh is not None:
        ok = scores > score_thresh
        scores = jnp.where(ok, scores, 0.0)
    return boxes, scores, labels


def circle_nms(centers_xy, scores, valid, min_radius, post_max_size):
    """Distance-based NMS (CenterPoint circle_nms): suppress any box whose
    center is within min_radius of a kept higher-score box. Inputs sorted
    by score desc. Fixpoint iteration like ops/iou3d._nms_keep_mask."""
    n = centers_xy.shape[0]
    d2 = jnp.sum(
        (centers_xy[:, None, :] - centers_xy[None, :, :]) ** 2, -1
    )
    order = jnp.arange(n)
    S = (d2 < min_radius ** 2) & (order[:, None] < order[None, :])
    S = S & valid[:, None] & valid[None, :]

    def body(c):
        keep, _ = c
        new = valid & ~jnp.any(S & keep[:, None], axis=0)
        return new, jnp.any(new != keep)

    keep, _ = jax.lax.while_loop(lambda c: c[1], body, (valid, jnp.asarray(True)))
    kept_scores, pos = jax.lax.top_k(
        jnp.where(keep, scores, -jnp.inf), min(post_max_size, n)
    )
    count = jnp.minimum(keep.sum(), post_max_size)
    return pos, count, kept_scores
