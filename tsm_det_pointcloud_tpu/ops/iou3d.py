"""Rotated BEV/3D IoU and rotated NMS — fully on-device, static shapes.

TPU-native replacement for the reference's iou3d_nms_cuda extension
(ops/iou3d_nms/src/iou3d_nms_kernel.cu: boxes_overlap_kernel,
boxes_iou_bev_kernel :1-260, nms_kernel :267-313). The CUDA code computes
convex-polygon intersections by edge-pair crossings + angle sort; here the
intersection area is a Cyrus–Beck boundary integral (no polygon buffers —
see _pair_intersection_area_grid), pure elementwise math over the (N, M)
pair grid on the VPU. NMS is a suppression-matrix fixpoint iteration fully
inside jit — no host round-trip (BASELINE.json north-star requirement).

All functions accept boxes in the (x, y, z, dx, dy, dz, heading) convention.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import boxes_to_corners_bev
from .topk import top_k as _safe_top_k


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _pair_intersection_area_grid(ca, cb):
    """All-pairs convex-quad intersection areas via Cyrus–Beck boundary
    integrals — ca (N, 4, 2), cb (M, 4, 2) -> (N, M).

    Area(A∩B) = 0.5 |Σ cross(s, e)| over the directed boundary of A∩B,
    which is exactly: each edge of A clipped to the inside of B, plus each
    edge of B clipped to the inside of A (both polygons share winding).
    Each clip is a 1-D t-interval intersection — pure elementwise math on
    the (N, M) pair grid. No vertex buffers: the earlier Sutherland–
    Hodgman form carried (pairs, 8, 2) polygon buffers whose tiny trailing
    dims padded 64x on TPU tiles and OOM'd HBM at N=M=4096.

    Colinear shared edges are counted once: the A-in-B pass uses h <= +eps
    while the B-in-A pass uses h <= -eps (strict), so identical boxes give
    exactly one copy of the shared boundary.
    """
    eps = 1e-7

    def directed_sum(src, dst, axes, strict):
        # src edges live on axes[0] (broadcast over axes[1]); dst halfplanes
        # the other way. axes: ('n', 'm') or ('m', 'n').
        if axes == "nm":
            s_take = lambda v: v[:, None]    # (N,1)
            d_take = lambda v: v[None, :]    # (1,M)
        else:
            s_take = lambda v: v[None, :]    # (1,M)
            d_take = lambda v: v[:, None]    # (N,1)
        thr = -eps if strict else eps
        total = 0.0
        for i in range(4):
            px, py = s_take(src[:, i, 0]), s_take(src[:, i, 1])
            qx, qy = s_take(src[:, (i + 1) % 4, 0]), s_take(src[:, (i + 1) % 4, 1])
            dx, dy = qx - px, qy - py
            t_lo = jnp.zeros_like(px + d_take(dst[:, 0, 0]) * 0)
            t_hi = jnp.ones_like(t_lo)
            ok = jnp.ones_like(t_lo, bool)
            for k in range(4):
                e1x, e1y = d_take(dst[:, k, 0]), d_take(dst[:, k, 1])
                e2x, e2y = d_take(dst[:, (k + 1) % 4, 0]), d_take(dst[:, (k + 1) % 4, 1])
                ex, ey = e2x - e1x, e2y - e1y
                # inside (CW winding) iff h = cross(e, x - e1) <= 0
                h0 = ex * (py - e1y) - ey * (px - e1x)
                sh = ex * dy - ey * dx
                t_bound = (thr - h0) / jnp.where(jnp.abs(sh) < 1e-12, 1e-12, sh)
                t_hi = jnp.where(sh > 0, jnp.minimum(t_hi, t_bound), t_hi)
                t_lo = jnp.where(sh < 0, jnp.maximum(t_lo, t_bound), t_lo)
                ok = ok & jnp.where(jnp.abs(sh) <= 1e-12, h0 <= thr, True)
            valid = ok & (t_hi > t_lo)
            sx, sy = px + t_lo * dx, py + t_lo * dy
            ex_, ey_ = px + t_hi * dx, py + t_hi * dy
            contrib = 0.5 * (sx * ey_ - ex_ * sy)
            total = total + jnp.where(valid, contrib, 0.0)
        return total

    total = directed_sum(ca, cb, "nm", strict=False) + directed_sum(
        cb, ca, "mn", strict=True
    )
    return jnp.abs(total)


def boxes_overlap_bev(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) BEV intersection areas (rotated).
    Parity: iou3d_nms_cuda.boxes_overlap_bev_gpu."""
    ca = boxes_to_corners_bev(boxes_a)
    cb = boxes_to_corners_bev(boxes_b)
    return _pair_intersection_area_grid(ca, cb)


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

def _iou_grid_fn(rotated: bool):
    """(geom_a, areas_a, geom_b, areas_b) -> (Na, Nb) IoU grid."""
    if rotated:
        def grid(ga, aa, gb, ab):
            inter = _pair_intersection_area_grid(ga, gb)
            return inter / jnp.clip(aa[:, None] + ab[None, :] - inter, 1e-6)
    else:
        def grid(ga, aa, gb, ab):
            iw = jnp.clip(
                jnp.minimum(ga[:, None, 2:], gb[None, :, 2:])
                - jnp.maximum(ga[:, None, :2], gb[None, :, :2]),
                0.0,
            ).prod(-1)
            return iw / jnp.clip(aa[:, None] + ab[None, :] - iw, 1e-6)
    return grid


@functools.partial(jax.jit, static_argnames=("block", "rotated"))
def _nms_keep_mask(geom, areas, valid, thresh, block=256, rotated=True):
    """Greedy NMS on score-sorted inputs via suppression-matrix fixpoint.

    geom: (N, 4, 2) corners (rotated) or (N, 4) aabb (axis-aligned), sorted by
    score desc with `valid` marking real boxes. Returns (N,) bool keep mask.

    Two phases, both embarrassingly parallel (the earlier blocked
    sequential-suppression loop took ~50 s on the axon TPU backend —
    long fori_loops of tiny dynamic-slice steps are pathological there):
      1. build S[j, i] = (IoU(j, i) > thresh) & (j < i) in row chunks;
      2. iterate keep <- valid & ~any_j(S[j, i] & keep[j]) to fixpoint.
    Any fixpoint of that map equals the exact greedy result (induction in
    score order), and iteration from all-valid converges in at most the
    suppression chain depth (~a few steps for real detections); the
    while_loop is bounded by N.
    """
    n = geom.shape[0]
    grid = _iou_grid_fn(rotated)
    S = grid(geom, areas, geom, areas) > thresh
    order = jnp.arange(n)
    S = S & (order[:, None] < order[None, :]) & valid[:, None] & valid[None, :]
    return _suppression_fixpoint(S, valid)


def _suppression_fixpoint(S, valid):
    """keep <- valid & ~any_j(S[j, i] & keep[j]) iterated to fixpoint.

    S is consumed BIT-PACKED along j (32 suppressor rows per uint32 word):
    the fixpoint runs its (chain-depth) iterations on a (ceil(N/32), N)
    word grid instead of the (N, N) bool grid — 32x less traffic per
    iteration, identical Boolean algebra (the Waymo multi_thresh path
    replays this fixpoint num_class+1 times per sample at N=3072, where
    the unpacked loop dominated post-processing device time)."""
    n = valid.shape[0]
    w = -(-n // 32)
    pad = w * 32 - n
    bits = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))

    def pack_rows(m):
        # (n, ...) bool -> (w, ...) uint32, bit b of word i = m[32i + b]
        mp = jnp.concatenate(
            [m, jnp.zeros((pad,) + m.shape[1:], m.dtype)], 0
        ) if pad else m
        mp = mp.reshape((w, 32) + m.shape[1:]).astype(jnp.uint32)
        bshape = (1, 32) + (1,) * (m.ndim - 1)
        return jnp.sum(mp * bits.reshape(bshape), axis=1, dtype=jnp.uint32)

    SP = pack_rows(S)                                    # (w, n) uint32

    def cond(c):
        return c[1]

    def body(c):
        keep, _ = c
        kp = pack_rows(keep)                             # (w,)
        suppressed = jnp.any((SP & kp[:, None]) != 0, axis=0)
        new = valid & ~suppressed
        return new, jnp.any(new != keep)

    keep, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True)))
    return keep


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


@functools.partial(jax.jit, static_argnames=("rotated",))
def suppression_matrix(boxes, thresh, rotated=True):
    """(N, 7) boxes -> (N, N) bool: IoU(i, j) > thresh in ORIGINAL order.

    The polygon-clip IoU grid is the expensive part of NMS (2.1 ms per
    (3072, 3072) build on one v5e chip) and depends only on geometry.
    multi_thresh NMS (model_nms_utils) runs NMS num_class+1 times on the
    SAME boxes with different score gatings — building this once and
    replaying rank-based fixpoints (nms_from_matrix) removes 3/4 of the
    Waymo post-processing device time."""
    areas = boxes[:, 3] * boxes[:, 4]
    if rotated:
        geom = boxes_to_corners_bev(boxes)
    else:
        geom = jnp.concatenate(
            [boxes[:, 0:2] - boxes[:, 3:5] / 2,
             boxes[:, 0:2] + boxes[:, 3:5] / 2],
            axis=-1,
        )
    return _iou_grid_fn(rotated)(geom, areas, geom, areas) > thresh


def _keep_from_matrix(s_mat, scores, pre_maxsize, post_maxsize):
    """Greedy-NMS keep mask in ORIGINAL order from a precomputed
    suppression matrix. Exact-equivalent to the sort-then-fixpoint path:
    precedence is by rank in score order (ties broken by lower index,
    exactly lax.top_k's rule), truncation to pre_maxsize drops low-rank
    boxes from both keeping and suppressing (they never entered the
    sorted set before), and at most post_maxsize highest-ranked keeps
    survive (the per-class keep buffers were (post,) before).

    Returns (keep (N,) bool, top_scores (k,), order (k,))."""
    n = scores.shape[0]
    k = min(pre_maxsize, n)
    top_scores, order = _safe_top_k(scores, k)
    rank = jnp.full((n,), n, jnp.int32).at[order].set(
        jnp.arange(k, dtype=jnp.int32)
    )
    valid = jnp.isfinite(scores) & (rank < k)
    S = (s_mat & (rank[:, None] < rank[None, :])
         & valid[:, None] & valid[None, :])
    keep = _suppression_fixpoint(S, valid)
    if post_maxsize < k:
        kk = keep[order]                       # keeps in score order
        kk &= jnp.cumsum(kk.astype(jnp.int32)) <= post_maxsize
        keep = jnp.zeros((n,), bool).at[order].set(kk)
    return keep, top_scores, order


def nms_from_matrix(s_mat, scores, pre_maxsize=4096, post_maxsize=512):
    """nms_bev/nms_normal with the IoU grid hoisted out: same
    (keep_idx, count, top_scores) contract, given suppression_matrix(boxes)
    of the same boxes."""
    keep, top_scores, order = _keep_from_matrix(
        s_mat, scores, pre_maxsize, post_maxsize
    )
    return _select_kept(order, top_scores, keep[order], post_maxsize)


def nms_keep_mask_from_matrix(s_mat, scores, pre_maxsize=4096,
                              post_maxsize=512):
    """Just the (N,) keep mask in original order (per-class multi_thresh
    passes union these instead of scattering index buffers)."""
    keep, _, _ = _keep_from_matrix(s_mat, scores, pre_maxsize, post_maxsize)
    return keep


def _select_kept(order, top_scores, keep, post_maxsize):
    """Compact kept indices to a fixed (post_maxsize,) buffer, score order."""
    k = order.shape[0]
    masked_scores = jnp.where(keep, top_scores, -jnp.inf)
    post = min(post_maxsize, k)
    kept_scores, kept_pos = jax.lax.top_k(masked_scores, post)
    keep_idx = order[kept_pos]
    keep_count = jnp.minimum(jnp.sum(keep), post)
    return keep_idx, keep_count, kept_scores
