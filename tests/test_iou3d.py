import numpy as np
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.ops.iou3d import (
    boxes_iou_bev,
    boxes_iou3d,
    boxes_overlap_bev,
    boxes_aligned_iou3d,
    nms_bev,
    nms_normal,
)


def box(x=0, y=0, z=0, dx=1, dy=1, dz=1, r=0.0):
    return [x, y, z, dx, dy, dz, r]


def test_identical_boxes_iou_one():
    b = jnp.array([box(), box(1, 2, 0.5, 3, 2, 1, 0.7)])
    iou = boxes_iou_bev(b, b)
    np.testing.assert_allclose(np.diag(np.array(iou)), 1.0, atol=1e-5)
    iou3 = boxes_iou3d(b, b)
    np.testing.assert_allclose(np.diag(np.array(iou3)), 1.0, atol=1e-5)


def test_disjoint_boxes_iou_zero():
    a = jnp.array([box(0, 0)])
    b = jnp.array([box(10, 10)])
    assert float(boxes_iou_bev(a, b)[0, 0]) == pytest.approx(0.0, abs=1e-6)
    assert float(boxes_iou3d(a, b)[0, 0]) == pytest.approx(0.0, abs=1e-6)


def test_shifted_unit_squares():
    # unit squares offset 0.5 in x: inter 0.5, union 1.5 -> IoU 1/3
    a = jnp.array([box(0, 0)])
    b = jnp.array([box(0.5, 0)])
    assert float(boxes_overlap_bev(a, b)[0, 0]) == pytest.approx(0.5, abs=1e-5)
    assert float(boxes_iou_bev(a, b)[0, 0]) == pytest.approx(1 / 3, abs=1e-5)


def test_rotated_45_square_overlap():
    # unit square vs itself rotated 45 deg: octagon, area 2*(sqrt(2)-1)
    a = jnp.array([box(0, 0)])
    b = jnp.array([box(0, 0, r=np.pi / 4)])
    expected = 2 * (np.sqrt(2) - 1)
    assert float(boxes_overlap_bev(a, b)[0, 0]) == pytest.approx(expected, abs=1e-4)
    # symmetric
    assert float(boxes_overlap_bev(b, a)[0, 0]) == pytest.approx(expected, abs=1e-4)


def test_rotation_invariance_of_full_rotation():
    a = jnp.array([box(1, 2, 0, 3, 1.5, 1, 0.3)])
    b = jnp.array([box(1, 2, 0, 3, 1.5, 1, 0.3 + 2 * np.pi)])
    assert float(boxes_iou_bev(a, b)[0, 0]) == pytest.approx(1.0, abs=1e-4)


def test_height_overlap_in_iou3d():
    # same BEV, z offset by half the height -> height overlap 0.5
    a = jnp.array([box(0, 0, 0, 2, 2, 1)])
    b = jnp.array([box(0, 0, 0.5, 2, 2, 1)])
    # inter = 4*0.5=2, union = 4+4-2 = 6
    assert float(boxes_iou3d(a, b)[0, 0]) == pytest.approx(2 / 6, abs=1e-5)


def test_aligned_iou3d():
    a = jnp.array([box(0, 0, 0, 2, 2, 2)])
    b = jnp.array([box(1, 0, 0, 2, 2, 2)])
    # inter = 1*2*2=4, union = 8+8-4=12
    assert float(boxes_aligned_iou3d(a, b)[0, 0]) == pytest.approx(4 / 12, abs=1e-5)


def test_one_box_inside_another():
    a = jnp.array([box(0, 0, 0, 4, 4, 4)])
    b = jnp.array([box(0, 0, 0, 2, 2, 2, r=0.5)])
    # b fully inside a in BEV: overlap = area(b) = 4
    assert float(boxes_overlap_bev(a, b)[0, 0]) == pytest.approx(4.0, abs=1e-4)


def test_nms_suppresses_overlaps():
    boxes = jnp.array(
        [
            box(0, 0, 0, 2, 2, 2),         # score .9 keep
            box(0.1, 0, 0, 2, 2, 2),       # overlaps #0 -> suppressed
            box(10, 10, 0, 2, 2, 2),       # far -> keep
            box(0.05, 0.05, 0, 2, 2, 2.0, 0.05),  # overlaps #0 -> suppressed
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    keep_idx, cnt, kept_scores = nms_bev(boxes, scores, thresh=0.5)
    cnt = int(cnt)
    assert cnt == 2
    assert set(np.array(keep_idx[:cnt]).tolist()) == {0, 2}
    np.testing.assert_allclose(np.array(kept_scores[:cnt]), [0.9, 0.7], atol=1e-6)


def test_nms_respects_threshold():
    # IoU of the pair is 1/3; thresh below keeps one, above keeps both
    boxes = jnp.array([box(0, 0), box(0.5, 0)])
    scores = jnp.array([0.9, 0.8])
    _, cnt_hi, _ = nms_bev(boxes, scores, thresh=0.5)
    _, cnt_lo, _ = nms_bev(boxes, scores, thresh=0.2)
    assert int(cnt_hi) == 2  # iou 0.333 < 0.5 -> both survive
    assert int(cnt_lo) == 1


def test_nms_normal_matches_axis_aligned():
    boxes = jnp.array([box(0, 0), box(0.5, 0), box(5, 5)])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep_idx, cnt, _ = nms_normal(boxes, scores, thresh=0.3)
    assert int(cnt) == 2
    assert set(np.array(keep_idx[: int(cnt)]).tolist()) == {0, 2}


def test_nms_large_random_matches_reference_impl():
    # oracle: O(N^2) python NMS with the same IoU function
    rng = np.random.RandomState(0)
    n = 200
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-20, 20, (n, 2))
    boxes[:, 3:5] = rng.uniform(1, 4, (n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    iou = np.array(boxes_iou_bev(jnp.array(boxes), jnp.array(boxes)))
    order = np.argsort(-scores)
    keep_ref, suppressed = [], np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep_ref.append(i)
        for j in order:
            if j != i and not suppressed[j] and scores[j] <= scores[i] and iou[i, j] > 0.3:
                suppressed[j] = True
    keep_idx, cnt, _ = nms_bev(jnp.array(boxes), jnp.array(scores), thresh=0.3)
    got = sorted(np.array(keep_idx[: int(cnt)]).tolist())
    assert got == sorted(keep_ref)


# ---------------------------------------------------------------------------
# shared-suppression-matrix NMS (multi_thresh's hoisted-geometry path)
# ---------------------------------------------------------------------------

def _random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-20, 20, (n, 2))
    boxes[:, 3:5] = rng.uniform(1, 4, (n, 2))
    boxes[:, 5] = 1.5
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes, rng


@pytest.mark.parametrize("pre,post", [(4096, 512), (64, 16), (200, 8)])
def test_nms_from_matrix_matches_nms_bev(pre, post):
    """nms_from_matrix on suppression_matrix must reproduce nms_bev exactly
    (same idx/count/scores) including pre-truncation and -inf gatings."""
    from tsm_det_pointcloud_tpu.ops.iou3d import (
        nms_from_matrix,
        suppression_matrix,
    )

    boxes, rng = _random_boxes(200, seed=1)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    scores[rng.uniform(size=200) < 0.3] = -np.inf  # gated entries

    ref_idx, ref_cnt, ref_sc = nms_bev(
        jnp.array(boxes), jnp.array(scores), thresh=0.3,
        pre_maxsize=pre, post_maxsize=post,
    )
    s_mat = suppression_matrix(jnp.array(boxes), 0.3, rotated=True)
    got_idx, got_cnt, got_sc = nms_from_matrix(
        s_mat, jnp.array(scores), pre_maxsize=pre, post_maxsize=post,
    )
    assert int(got_cnt) == int(ref_cnt)
    c = int(ref_cnt)
    np.testing.assert_array_equal(
        np.asarray(got_idx)[:c], np.asarray(ref_idx)[:c]
    )
    np.testing.assert_allclose(
        np.asarray(got_sc)[:c], np.asarray(ref_sc)[:c], rtol=0, atol=0
    )


def test_multi_thresh_shared_matrix_matches_per_pass_composition():
    """The shared-matrix multi_thresh path must equal the original
    per-pass nms_bev composition (per-class NMS -> keep-index scatter ->
    global NMS) bit for bit, including the per-class post_maxsize cap."""
    from tsm_det_pointcloud_tpu.models.model_utils.model_nms_utils import (
        multi_thresh_nms,
    )

    boxes, rng = _random_boxes(300, seed=2)
    scores = rng.uniform(0, 1, 300).astype(np.float32)
    labels = rng.randint(1, 4, 300).astype(np.int32)
    cfg = {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.3,
           "NMS_PRE_MAXSIZE": 4096, "NMS_POST_MAXSIZE": 16}
    thresh_list = [0.5, 0.2, 0.35]

    # original composition (the pre-shared-matrix implementation)
    t = jnp.asarray(thresh_list)[jnp.clip(jnp.asarray(labels) - 1, 0, 2)]
    gated = jnp.where(jnp.asarray(scores) >= t, jnp.asarray(scores),
                      -jnp.inf)
    kept_mask = jnp.zeros_like(gated, bool)
    for c in range(1, 4):
        cls_gated = jnp.where(jnp.asarray(labels) == c, gated, -jnp.inf)
        idx, cnt, _ = nms_bev(
            jnp.array(boxes), cls_gated, thresh=0.3,
            pre_maxsize=4096, post_maxsize=16,
        )
        slot_ok = jnp.arange(idx.shape[0]) < cnt
        kept_mask = kept_mask.at[idx].set(slot_ok | kept_mask[idx])
    survivors = jnp.where(kept_mask, gated, -jnp.inf)
    ref_idx, ref_cnt, ref_sc = nms_bev(
        jnp.array(boxes), survivors, thresh=0.3,
        pre_maxsize=4096, post_maxsize=16,
    )

    got_idx, got_cnt, got_sc = multi_thresh_nms(
        jnp.asarray(scores), jnp.array(boxes), jnp.asarray(labels),
        cfg, thresh_list,
    )
    assert int(got_cnt) == int(ref_cnt)
    c = int(ref_cnt)
    np.testing.assert_array_equal(
        np.asarray(got_idx)[:c], np.asarray(ref_idx)[:c]
    )
    np.testing.assert_allclose(
        np.asarray(got_sc)[:c], np.asarray(ref_sc)[:c], rtol=0, atol=0
    )


def test_multi_thresh_batched_classes_matches_loop(monkeypatch):
    """The class-batched keep fixpoint (r5, TSM_NMS_BATCHED default) is
    bitwise-equal to the sequential per-class loop."""
    from tsm_det_pointcloud_tpu.models.model_utils.model_nms_utils import (
        multi_thresh_nms,
    )

    rng = np.random.RandomState(11)
    n = 256
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-30, 30, (n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n)
    boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    # clustered duplicates so suppression chains are deep
    boxes[n // 2:] = boxes[: n - n // 2] + rng.normal(
        0, 0.15, (n - n // 2, 7)).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    labels = rng.randint(1, 4, n).astype(np.int32)
    cfg = {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.3,
           "NMS_PRE_MAXSIZE": 4096, "NMS_POST_MAXSIZE": 32}
    thresh_list = [0.1, 0.1, 0.1]

    def run(flag):
        monkeypatch.setenv("TSM_NMS_BATCHED", flag)
        return multi_thresh_nms(
            jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(labels),
            cfg, thresh_list)

    i0, c0, s0 = map(np.asarray, run("0"))
    i1, c1, s1 = map(np.asarray, run("1"))
    assert int(c1) == int(c0)
    k = int(c0)
    np.testing.assert_array_equal(i1[:k], i0[:k])
    np.testing.assert_array_equal(s1[:k], s0[:k])
