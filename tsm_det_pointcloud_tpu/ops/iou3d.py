"""Rotated BEV/3D IoU and rotated NMS — fully on-device, static shapes.

TPU-native replacement for the reference's iou3d_nms_cuda extension
(ops/iou3d_nms/src/iou3d_nms_kernel.cu: boxes_overlap_kernel,
boxes_iou_bev_kernel :1-260, nms_kernel :267-313). The CUDA code computes
convex-polygon intersections by edge-pair crossings + angle sort; here we use
Sutherland–Hodgman clipping with a fixed 8-vertex buffer, which is branch-free
and static-shaped, so XLA vectorizes the whole (N, M) pair grid onto the VPU.
NMS runs as a blocked sequential-suppression loop entirely inside jit — no
host round-trip (BASELINE.json north-star requirement).

All functions accept boxes in the (x, y, z, dx, dy, dz, heading) convention.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import boxes_to_corners_bev
from .topk import top_k as _safe_top_k

_MAX_VERTS = 8  # 4-gon clipped by 4 half-planes has <= 8 vertices
_EPS = 1e-8


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _clip_by_edge(poly, cnt, p1, p2):
    """Clip convex polygon (poly[(8,2)], cnt valid) by the half-plane on the
    clockwise side of directed edge p1->p2 (our BEV corners wind CW)."""
    idx = jnp.arange(_MAX_VERTS)
    nxt_idx = jnp.where(cnt > 0, (idx + 1) % jnp.maximum(cnt, 1), 0)
    cur = poly
    nxt = poly[nxt_idx]

    side_cur = _cross(p1, p2, cur)  # <= 0 means inside for CW winding
    side_nxt = _cross(p1, p2, nxt)
    in_cur = side_cur <= 0.0
    in_nxt = side_nxt <= 0.0
    valid_edge = idx < cnt

    denom = side_cur - side_nxt
    t = side_cur / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    inter = cur + t[:, None] * (nxt - cur)

    # per input edge emit: cur (if cur inside), then crossing point (if edge
    # crosses the clip line). Interleave so output order stays a polygon walk.
    emit_pts = jnp.stack([cur, inter], axis=1).reshape(2 * _MAX_VERTS, 2)
    emit_ok = jnp.stack(
        [valid_edge & in_cur, valid_edge & (in_cur != in_nxt)], axis=1
    ).reshape(2 * _MAX_VERTS)

    pos = jnp.cumsum(emit_ok) - 1
    pos = jnp.where(emit_ok, pos, 2 * _MAX_VERTS)  # dropped by mode='drop'
    new_poly = jnp.zeros((_MAX_VERTS, 2), poly.dtype).at[pos].set(
        emit_pts, mode="drop"
    )
    new_cnt = jnp.sum(emit_ok)
    return new_poly, new_cnt


def _polygon_area(poly, cnt):
    idx = jnp.arange(_MAX_VERTS)
    nxt = poly[jnp.where(cnt > 0, (idx + 1) % jnp.maximum(cnt, 1), 0)]
    contrib = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    contrib = jnp.where(idx < cnt, contrib, 0.0)
    return jnp.abs(jnp.sum(contrib)) * 0.5


def _pair_intersection_area(corners_a, corners_b):
    """Intersection area of two CW quads (4, 2) x (4, 2) -> scalar."""
    poly = jnp.zeros((_MAX_VERTS, 2), corners_a.dtype).at[:4].set(corners_a)
    cnt = jnp.asarray(4, jnp.int32)
    for k in range(4):
        p1 = corners_b[k]
        p2 = corners_b[(k + 1) % 4]
        poly, cnt = _clip_by_edge(poly, cnt, p1, p2)
    return _polygon_area(poly, cnt)


_pair_area_vv = jax.vmap(jax.vmap(_pair_intersection_area, (None, 0)), (0, None))


def boxes_overlap_bev(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) BEV intersection areas (rotated).
    Parity: iou3d_nms_cuda.boxes_overlap_bev_gpu."""
    ca = boxes_to_corners_bev(boxes_a)
    cb = boxes_to_corners_bev(boxes_b)
    return _pair_area_vv(ca, cb)


def boxes_iou_bev(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) rotated BEV IoU.
    Parity: iou3d_nms_utils.boxes_iou_bev (iou3d_nms_utils.py:28)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, 1e-6)


def boxes_iou3d(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) 3D IoU = BEV overlap x height overlap over
    volume union. Parity: iou3d_nms_utils.boxes_iou3d_gpu (:48-81)."""
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)
    a_max = boxes_a[:, 2] + boxes_a[:, 5] / 2
    a_min = boxes_a[:, 2] - boxes_a[:, 5] / 2
    b_max = boxes_b[:, 2] + boxes_b[:, 5] / 2
    b_min = boxes_b[:, 2] - boxes_b[:, 5] / 2
    overlap_h = jnp.clip(
        jnp.minimum(a_max[:, None], b_max[None, :])
        - jnp.maximum(a_min[:, None], b_min[None, :]),
        0.0,
    )
    inter = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, 1e-6)


def boxes_aligned_iou3d(boxes_a, boxes_b):
    """Axis-aligned 3D IoU (ignores heading) — used by axis-aligned IoU loss.
    Parity: iou3d_nms_utils.boxes_aligned_iou3d_gpu."""
    mins_a = boxes_a[:, None, 0:3] - boxes_a[:, None, 3:6] / 2
    maxs_a = boxes_a[:, None, 0:3] + boxes_a[:, None, 3:6] / 2
    mins_b = boxes_b[None, :, 0:3] - boxes_b[None, :, 3:6] / 2
    maxs_b = boxes_b[None, :, 0:3] + boxes_b[None, :, 3:6] / 2
    inter = jnp.clip(
        jnp.minimum(maxs_a, maxs_b) - jnp.maximum(mins_a, mins_b), 0.0
    ).prod(-1)
    vol_a = boxes_a[:, 3:6].prod(-1)[:, None]
    vol_b = boxes_b[:, 3:6].prod(-1)[None, :]
    return inter / jnp.clip(vol_a + vol_b - inter, 1e-6)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def _iou_row_fn(rotated: bool):
    if rotated:
        def row(corners_i, area_i, corners, areas):
            inter = jax.vmap(_pair_intersection_area, (None, 0))(corners_i, corners)
            return inter / jnp.clip(area_i + areas - inter, 1e-6)
    else:
        def row(aabb_i, area_i, aabbs, areas):
            inter = jnp.clip(
                jnp.minimum(aabb_i[2:], aabbs[:, 2:])
                - jnp.maximum(aabb_i[:2], aabbs[:, :2]),
                0.0,
            ).prod(-1)
            return inter / jnp.clip(area_i + areas - inter, 1e-6)
    return row


@functools.partial(jax.jit, static_argnames=("block", "rotated"))
def _nms_keep_mask(geom, areas, valid, thresh, block=64, rotated=True):
    """Sequential-suppression NMS on score-sorted inputs, blocked.

    geom: (N, 4, 2) corners (rotated) or (N, 4) aabb (axis-aligned), sorted by
    score desc with `valid` marking real boxes. Returns (N,) bool keep mask.
    Blocked form of the O(N^2) suppression: within each block of `block`
    boxes do the inherently-sequential pass on a (block, block) IoU tile, then
    suppress all later boxes at once with a (block, N) tile — sequential depth
    is N but per-step work is trivial except N/block matrix steps.
    """
    n = geom.shape[0]
    row = _iou_row_fn(rotated)
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    if pad:
        geom = jnp.pad(geom, ((0, pad),) + ((0, 0),) * (geom.ndim - 1))
        areas = jnp.pad(areas, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    np_ = n_blocks * block
    idx_all = jnp.arange(np_)

    def outer(b, keep):
        start = b * block
        blk_geom = jax.lax.dynamic_slice_in_dim(geom, start, block, 0)
        blk_area = jax.lax.dynamic_slice_in_dim(areas, start, block, 0)
        # (block, N) IoU of this block against everything
        iou_blk = jax.vmap(row, (0, 0, None, None))(blk_geom, blk_area, geom, areas)
        blk_keep = jax.lax.dynamic_slice_in_dim(keep, start, block, 0)
        iou_local = jax.lax.dynamic_slice(iou_blk, (0, start), (block, block))

        # sequential pass inside the block
        def inner(i, bk):
            row = jax.lax.dynamic_slice_in_dim(iou_local, i, 1, 0)[0]
            sup = (row > thresh) & (jnp.arange(block) > i) & bk[i]
            return bk & ~sup

        blk_keep = jax.lax.fori_loop(0, block, inner, blk_keep)
        keep = jax.lax.dynamic_update_slice_in_dim(keep, blk_keep, start, 0)
        # suppress all later boxes by surviving members of this block
        sup_later = jnp.any((iou_blk > thresh) & blk_keep[:, None], axis=0)
        sup_later = sup_later & (idx_all >= start + block)
        return keep & ~sup_later

    keep = jax.lax.fori_loop(0, n_blocks, outer, valid)
    return keep[:n]


def nms_bev(boxes, scores, thresh, pre_maxsize=4096, post_maxsize=512,
            score_thresh=None):
    """Rotated BEV NMS. Returns (keep_idx (post,), keep_count, top_scores).

    Fully on-device: sort by score, blocked suppression, fixed-size outputs
    (padded with the last valid index; use keep_count / score mask downstream).
    Parity: iou3d_nms_utils.nms_gpu (iou3d_nms_utils.py:84) + the pre/post
    maxsize semantics of model_nms_utils.class_agnostic_nms.
    """
    n = scores.shape[0]
    k = min(pre_maxsize, n)
    top_scores, order = _safe_top_k(scores, k)
    boxes_s = boxes[order]
    valid = jnp.isfinite(top_scores) & (top_scores > (-jnp.inf if score_thresh is None else score_thresh))
    corners = boxes_to_corners_bev(boxes_s)
    areas = boxes_s[:, 3] * boxes_s[:, 4]
    keep = _nms_keep_mask(corners, areas, valid, thresh, rotated=True)
    return _select_kept(order, top_scores, keep, post_maxsize)


def nms_normal(boxes, scores, thresh, pre_maxsize=4096, post_maxsize=512,
               score_thresh=None):
    """Axis-aligned NMS (ignores heading). Parity: nms_normal_gpu."""
    n = scores.shape[0]
    k = min(pre_maxsize, n)
    top_scores, order = _safe_top_k(scores, k)
    boxes_s = boxes[order]
    valid = jnp.isfinite(top_scores) & (top_scores > (-jnp.inf if score_thresh is None else score_thresh))
    aabb = jnp.concatenate(
        [boxes_s[:, 0:2] - boxes_s[:, 3:5] / 2, boxes_s[:, 0:2] + boxes_s[:, 3:5] / 2],
        axis=-1,
    )
    areas = boxes_s[:, 3] * boxes_s[:, 4]
    keep = _nms_keep_mask(aabb, areas, valid, thresh, rotated=False)
    return _select_kept(order, top_scores, keep, post_maxsize)


def _select_kept(order, top_scores, keep, post_maxsize):
    """Compact kept indices to a fixed (post_maxsize,) buffer, score order."""
    k = order.shape[0]
    masked_scores = jnp.where(keep, top_scores, -jnp.inf)
    post = min(post_maxsize, k)
    kept_scores, kept_pos = jax.lax.top_k(masked_scores, post)
    keep_idx = order[kept_pos]
    keep_count = jnp.minimum(jnp.sum(keep), post)
    return keep_idx, keep_count, kept_scores
