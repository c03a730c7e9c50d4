"""Golden-value oracles for the parity-critical math.

Every expected value below is hand-derived from the reference semantics
(file:line cited per test), NOT from running this codebase — the suite
fails if any constant, sign, or convention silently flips.

Covered: PointBinResidualCoder bin/residual convention
(pcdet/utils/box_coder_utils.py:239-273), ResidualCoder diagonal coding
(:24-60), RDIoU (point_head_vote_sasa_statistic_distillation.py:929-981),
corner loss (loss_utils.py:365-400), centerness, focal loss, SASA layer
loss (loss_utils.py:545-753), multi_thresh NMS keep-sets
(model_nms_utils.py:52-87) cross-checked against rotate_iou_np, and
R11 vs R40 KITTI AP on handcrafted det/gt sets with analytic APs
(kitti_object_eval_python/eval.py:86-290).
"""
import numpy as np
import jax.numpy as jnp

from tests.test_kitti_eval import _make_anno
from tsm_det_pointcloud_tpu.eval.kitti_eval import get_official_eval_result
from tsm_det_pointcloud_tpu.eval.rotate_iou_np import rotate_iou_np
from tsm_det_pointcloud_tpu.models.model_utils.model_nms_utils import (
    multi_thresh_nms,
)
from tsm_det_pointcloud_tpu.ops import loss_utils
from tsm_det_pointcloud_tpu.ops.box_coder_utils import (
    PointBinResidualCoder, ResidualCoder,
)

LN2 = float(np.log(2.0))


# ---------------------------------------------------------------------------
# Box coders
# ---------------------------------------------------------------------------

def test_point_bin_coder_angle_golden():
    """Reference convention (box_coder_utils.py:238-274): bin i covers
    [i*d - d/2, i*d + d/2), residual normalized to [-0.5, 0.5),
    decode = (bin + res) * d. Hand case: 40deg with 12 bins (d = 30deg)
    -> shifted = 55deg, bin 1, res = (55 - 45)/30 = 1/3."""
    coder = PointBinResidualCoder(use_mean_size=False, angle_bin_num=12)
    ang = jnp.asarray([np.deg2rad(40.0)])
    oh, res = coder.encode_angle(ang)
    assert int(jnp.argmax(oh[0])) == 1
    np.testing.assert_allclose(float(res[0, 1]), 1.0 / 3.0, atol=1e-6)
    # 0deg -> bin 0, residual exactly 0 (bin centers are residual zeros)
    oh0, res0 = coder.encode_angle(jnp.asarray([0.0]))
    assert int(jnp.argmax(oh0[0])) == 0
    np.testing.assert_allclose(float(res0[0, 0]), 0.0, atol=1e-6)
    # -15deg == 345deg -> shifted 0 -> bin 0, res -0.5 (bin lower edge)
    ohn, resn = coder.encode_angle(jnp.asarray([np.deg2rad(-15.0)]))
    assert int(jnp.argmax(ohn[0])) == 0
    np.testing.assert_allclose(float(resn[0, 0]), -0.5, atol=1e-5)
    # 344deg -> shifted 359 -> bin 11, res = 14/30
    ohb, resb = coder.encode_angle(jnp.asarray([np.deg2rad(344.0)]))
    assert int(jnp.argmax(ohb[0])) == 11
    np.testing.assert_allclose(float(resb[0, 11]), 14.0 / 30.0, atol=1e-5)

    # torch-head decode parity: a reference-trained head emitting
    # (bin=1, res=1/3) must decode to exactly 40deg here too
    cls_oh = jnp.zeros((1, 12)).at[0, 1].set(1.0)
    res_oh = jnp.zeros((1, 12)).at[0, 1].set(1.0 / 3.0)
    ang_dec = coder.decode_angle(cls_oh, res_oh)
    np.testing.assert_allclose(
        float(ang_dec[0, 0]), np.deg2rad(40.0), atol=1e-6
    )


def test_point_bin_coder_full_golden():
    """gt (10, -2, 1, 3.9, 1.6, 1.56, 40deg), point (9, -1, 0.5),
    use_mean_size=False: offsets are raw deltas, sizes log-coded."""
    coder = PointBinResidualCoder(use_mean_size=False, angle_bin_num=12)
    gt = jnp.asarray([[10.0, -2.0, 1.0, 3.9, 1.6, 1.56, np.deg2rad(40.0)]])
    pt = jnp.asarray([[9.0, -1.0, 0.5]])
    code = np.asarray(coder.encode(gt, pt))
    np.testing.assert_allclose(code[0, :6], [
        1.0, -1.0, 0.5, np.log(3.9), np.log(1.6), np.log(1.56)
    ], atol=1e-6)
    assert code.shape == (1, 30)
    np.testing.assert_allclose(code[0, 6 + 1], 1.0)  # bin one-hot
    np.testing.assert_allclose(code[0, 18 + 1], 1.0 / 3.0, atol=1e-6)
    dec = np.asarray(coder.decode(jnp.asarray(code), pt))
    np.testing.assert_allclose(dec[0], np.asarray(gt[0]), atol=1e-5)


def test_residual_coder_golden():
    """anchor (0,0,0,4,2,2,0), gt (1,1,0.5,4,2,2,0.3): diagonal sqrt(20),
    xt = yt = 1/sqrt(20), zt = 0.25, log-sizes 0, rt = 0.3
    (box_coder_utils.py:24-60)."""
    coder = ResidualCoder()
    anchors = jnp.asarray([[0.0, 0, 0, 4, 2, 2, 0]])
    gt = jnp.asarray([[1.0, 1, 0.5, 4, 2, 2, 0.3]])
    code = np.asarray(coder.encode(gt, anchors))
    d = np.sqrt(20.0)
    np.testing.assert_allclose(
        code[0], [1 / d, 1 / d, 0.25, 0, 0, 0, 0.3], atol=1e-6
    )
    dec = np.asarray(coder.decode(jnp.asarray(code), anchors))
    np.testing.assert_allclose(dec[0], np.asarray(gt[0]), atol=1e-5)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def test_rdiou_golden_axis_aligned():
    """Unit-heading boxes (0,0,0,2,2,2,0) vs (1,0,0,2,2,2,0):
    inter = 1*2*2*1 = 4, union = 12 -> rdiou = 1/3;
    inter_diag = 1, c_diag = 3^2+2^2+2^2+1^2 = 18 -> u = 1/18."""
    b1 = jnp.asarray([[[0.0, 0, 0, 2, 2, 2, 0]]])
    b2 = jnp.asarray([[[1.0, 0, 0, 2, 2, 2, 0]]])
    u, r = loss_utils.rdiou(b1, b2)
    np.testing.assert_allclose(float(r[0, 0]), 1.0 / 3.0, atol=1e-6)
    np.testing.assert_allclose(float(u[0, 0]), 1.0 / 18.0, atol=1e-6)


def test_rdiou_golden_rotation_axis():
    """Same center/size but 90deg heading mismatch: t1 = 1, t2 = 0 ->
    the heading axis has zero overlap -> rdiou = 0, and
    u = 1 / (2^2*3 + 2^2) = 1/16 (heading hull = [-0.5, 1.5])."""
    b1 = jnp.asarray([[[0.0, 0, 0, 2, 2, 2, np.pi / 2]]])
    b2 = jnp.asarray([[[0.0, 0, 0, 2, 2, 2, 0]]])
    u, r = loss_utils.rdiou(b1, b2)
    np.testing.assert_allclose(float(r[0, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(u[0, 0]), 1.0 / 16.0, atol=1e-6)


def test_corner_loss_golden():
    """Cube shifted 1m along x: every corner pair distance 1 (the
    flipped-heading alternative is farther), huber(1, delta=1) = 0.5
    -> mean over 8 corners = 0.5 (loss_utils.py:365-400)."""
    pred = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0]])
    gt = jnp.asarray([[1.0, 0, 0, 2, 2, 2, 0]])
    loss = loss_utils.corner_loss(pred, gt)
    np.testing.assert_allclose(float(loss[0]), 0.5, atol=1e-6)
    # identical boxes -> exactly 0; flipped heading -> also 0 (the trick)
    np.testing.assert_allclose(
        float(loss_utils.corner_loss(gt, gt)[0]), 0.0, atol=1e-7
    )
    gt_flip = gt.at[0, 6].add(np.pi)
    np.testing.assert_allclose(
        float(loss_utils.corner_loss(gt_flip, gt)[0]), 0.0, atol=1e-5
    )


def test_centerness_golden():
    """Point (0.5, 0, 0) in box (0,0,0, 2,4,2, 0): per-axis min/max ratios
    (1/3, 1, 1) -> centerness = (1/3)^(1/3)."""
    cent = loss_utils.centerness_label(
        jnp.asarray([[0.5, 0.0, 0.0]]),
        jnp.asarray([[0.0, 0, 0, 2, 4, 2, 0]]),
        jnp.asarray([True]),
    )
    np.testing.assert_allclose(
        float(cent[0]), (1.0 / 3.0) ** (1.0 / 3.0), atol=1e-6
    )
    # box center -> exactly 1; background -> 0
    c0 = loss_utils.centerness_label(
        jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]),
        jnp.asarray([[0.0, 0, 0, 2, 4, 2, 0]] * 2),
        jnp.asarray([True, False]),
    )
    np.testing.assert_allclose(np.asarray(c0), [1.0, 0.0], atol=1e-6)


def test_sigmoid_focal_golden():
    """logit 0 (p = 0.5), gamma 2, alpha 0.25:
    target 1 -> 0.25 * 0.5^2 * ln2; target 0 -> 0.75 * 0.5^2 * ln2."""
    logits = jnp.asarray([0.0, 0.0])
    targets = jnp.asarray([1.0, 0.0])
    loss = np.asarray(loss_utils.sigmoid_focal_loss(logits, targets))
    np.testing.assert_allclose(loss[0], 0.25 * 0.25 * LN2, atol=1e-7)
    np.testing.assert_allclose(loss[1], 0.75 * 0.25 * LN2, atol=1e-7)


def test_sasa_layer_loss_golden():
    """2 points, 3 classes, zero logits: fg point (class 1) contributes
    one target-1 channel + two target-0 channels, bg point three target-0
    channels; normalized by #(fg+bg)=2. Sum happens to be exactly ln2:
    (0.25+0.75*2)*0.25*ln2 + 3*0.75*0.25*ln2 = ln2."""
    scores = jnp.zeros((1, 2, 3))
    labels = jnp.asarray([[1, 0]], jnp.int32)
    loss = float(loss_utils.sasa_layer_loss(scores, labels, num_class=3))
    np.testing.assert_allclose(loss, LN2 / 2.0, atol=1e-6)
    # ignored points (-1) contribute nothing and don't change the norm
    labels_ig = jnp.asarray([[1, 0, -1, -1]], jnp.int32)
    loss_ig = float(loss_utils.sasa_layer_loss(
        jnp.zeros((1, 4, 3)), labels_ig, num_class=3
    ))
    np.testing.assert_allclose(loss_ig, LN2 / 2.0, atol=1e-6)


# ---------------------------------------------------------------------------
# multi_thresh NMS keep-sets
# ---------------------------------------------------------------------------

def test_multi_thresh_nms_keep_set_golden():
    """5 boxes, 2 classes, per-class thresholds [0.5, 0.3]:
      A car (.9) at origin; B car (.8) 0.5m away (BEV IoU 7/9 > 0.1
      -> suppressed by A); C car (.7) far -> kept; D car (.3) below the
      car threshold -> gated out despite no overlap; E ped (.4) -> kept.
    Expected keep set = {A, C, E}. IoUs cross-checked with
    rotate_iou_np (the eval-side oracle)."""
    boxes = jnp.asarray([
        [0.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0],   # A
        [0.5, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0],   # B
        [20.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0],  # C
        [40.0, 0.0, 0.0, 4.0, 2.0, 1.6, 0.0],  # D
        [10.0, 10.0, 0.0, 0.8, 0.8, 1.7, 0.0],  # E
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.3, 0.4])
    labels = jnp.asarray([1, 1, 1, 1, 2], jnp.int32)
    cfg = {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.1,
           "NMS_PRE_MAXSIZE": 16, "NMS_POST_MAXSIZE": 8}
    idx, cnt, kept_scores = multi_thresh_nms(
        scores, boxes, labels, cfg, [0.5, 0.3]
    )
    kept = set(np.asarray(idx)[: int(cnt)].tolist())
    assert kept == {0, 2, 4}, kept
    # scores come back sorted descending
    ks = np.asarray(kept_scores)[: int(cnt)]
    np.testing.assert_allclose(ks, [0.9, 0.7, 0.4], atol=1e-6)

    # oracle cross-check: the suppressed pair really overlaps > thresh,
    # the kept set is pairwise below it
    bev = np.asarray(boxes)[:, [0, 1, 3, 4, 6]]
    iou = rotate_iou_np(bev, bev)
    np.testing.assert_allclose(iou[0, 1], 7.0 / 9.0, atol=1e-4)
    for i in kept:
        for j in kept:
            if i != j:
                assert iou[i, j] < 0.1


# ---------------------------------------------------------------------------
# R11 vs R40 AP with analytic expected values
# ---------------------------------------------------------------------------

def _spread_cam_boxes(n):
    """n non-overlapping car boxes in camera frame (x right, z forward)."""
    x = np.tile(np.asarray([-12.0, -6.0, 0.0, 6.0, 12.0]), -(-n // 5))[:n]
    z = np.repeat(np.arange(-(-n // 5)) * 10.0 + 8.0, 5)[:n]
    return np.stack([
        x, np.full(n, 1.5), z,
        np.full(n, 4.0), np.full(n, 1.5), np.full(n, 1.8), np.zeros(n),
    ], 1)


def test_ap_r11_vs_r40_single_tp_golden():
    """2 gts, 1 perfect det (score .9): one threshold -> precision grid
    [1, 0 x 40]. R11 samples prec[0::4] -> 100/11 = 9.0909...;
    R40 samples prec[1:41] -> exactly 0. This pins the R11 recall-0
    sample quirk (eval.py get_mAP vs get_mAP_R40)."""
    gt = _spread_cam_boxes(2)
    gt_annos = [_make_anno(gt, ["Car"] * 2)]
    dt_annos = [_make_anno(gt[:1], ["Car"], scores=[0.9])]
    _, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])
    np.testing.assert_allclose(
        ret["Car_3d/moderate"], 100.0 / 11.0, atol=1e-6
    )
    np.testing.assert_allclose(ret["Car_3d/moderate_R40"], 0.0, atol=1e-9)


def test_ap_r11_vs_r40_interleaved_fp_golden():
    """41 TPs (scores 82, 80, ..., 2) + 41 FPs at TP score - 0.5:
    at the i-th threshold (0-based) there are i+1 TPs and i FPs above it,
    so precision_i = (i+1)/(2i+1), monotonically decreasing (backward-max
    interpolation is the identity). Analytic APs:
      R11 = 100/11 * sum_{i in 0,4,...,40} (i+1)/(2i+1)
      R40 = 100/40 * sum_{i=1..40}         (i+1)/(2i+1)
    """
    n = 41
    gt = _spread_cam_boxes(n)
    gt_annos = [_make_anno(gt, ["Car"] * n)]
    tp_scores = 82.0 - 2.0 * np.arange(n)
    fp = gt.copy()
    fp[:, 0] += 200.0  # far away -> pure FPs
    det = np.concatenate([gt, fp], 0)
    det_scores = np.concatenate([tp_scores, tp_scores - 0.5])
    dt_annos = [_make_anno(det, ["Car"] * (2 * n), scores=det_scores)]
    _, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])

    prec = np.asarray([(i + 1) / (2 * i + 1) for i in range(41)])
    exp_r11 = 100.0 / 11.0 * prec[0::4].sum()
    exp_r40 = 100.0 / 40.0 * prec[1:].sum()
    np.testing.assert_allclose(ret["Car_3d/moderate"], exp_r11, atol=1e-5)
    np.testing.assert_allclose(ret["Car_3d/moderate_R40"], exp_r40, atol=1e-5)
    # hand-summed spot value for the R11 grid
    np.testing.assert_allclose(exp_r11, 56.10914, atol=1e-4)


def test_vote_head_loss_targets_are_constants():
    """Regression: the cls quality label (centerness x rdiou) and the
    box/vote target assignment must be CONSTANTS w.r.t. the predictions.

    With a differentiable rd factor in the cls label, dBCE/dtarget =
    -logit > 0 while logits are negative, so the cls loss (weight 1.0)
    lowers itself by shrinking predicted boxes until rd -> 0 — observed
    as sizes diverging from targets in overfit runs. Asserts
    d(cls_loss)/d(box_preds) == 0 and d(vote/off targets)/d(vote) == 0.
    """
    import jax

    from tsm_det_pointcloud_tpu.models.dense_heads.point_head_vote import (
        _branch_losses,
    )

    coder = PointBinResidualCoder(use_mean_size=False, angle_bin_num=12)
    cfg = {
        "TARGET_CONFIG": {"VOTE_EXTRA_WIDTH": [0.1, 0.1, 0.1],
                          "GT_CENTRAL_RADIUS": 10.0},
        "LOSS_CONFIG": {
            "CORNER_LOSS_REGULARIZATION": False,
            "RDIOU_REGRESS_REGULARIZATION": False,
            "LOSS_WEIGHTS": {
                "vote_reg_weight": 1.0, "point_cls_weight": 1.0,
                "point_offset_reg_weight": 1.0,
                "point_angle_cls_weight": 1.0,
                "point_angle_reg_weight": 1.0,
            },
        },
    }
    B, N, C = 1, 8, 3
    rng = np.random.default_rng(0)
    gt = np.zeros((B, 2, 8), np.float32)
    gt[0, 0] = [5, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
    gt[0, 1] = [12, 3, -1, 3.9, 1.6, 1.56, -0.7, 2]
    gv = np.ones((B, 2), bool)
    vote = jnp.asarray(
        gt[:, [0, 0, 1, 1, 0, 1, 0, 1], :3]
        + rng.normal(0, 0.2, (B, N, 3)).astype(np.float32)
    )
    reg = jnp.asarray(rng.normal(0, 0.3, (B, N, coder.code_size)).astype(np.float32))
    cls_logits = jnp.asarray(rng.normal(-3, 1, (B, N, C)).astype(np.float32))

    def cls_loss_of_reg(reg_preds):
        out = dict(
            candidate_xyz=vote, candidate_valid=jnp.ones((B, N), bool),
            vote_xyz=vote, cls_preds=cls_logits, reg_preds=reg_preds,
            box_preds=coder.decode(reg_preds, vote),
        )
        _, _, tb = _branch_losses(out, jnp.asarray(gt), jnp.asarray(gv),
                                  coder, cfg, C)
        return tb["cls_loss"]

    g = jax.grad(cls_loss_of_reg)(reg)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=0,
                               err_msg="cls quality label leaks gradient "
                                       "into the box predictions")

    # and the vote->target path: off loss grad w.r.t. vote must come only
    # through the VSA features (none here), not through the targets
    def off_loss_of_vote(vote_xyz):
        out = dict(
            candidate_xyz=vote, candidate_valid=jnp.ones((B, N), bool),
            vote_xyz=vote_xyz, cls_preds=cls_logits, reg_preds=reg,
            box_preds=coder.decode(reg, vote_xyz),
        )
        _, _, tb = _branch_losses(out, jnp.asarray(gt), jnp.asarray(gv),
                                  coder, cfg, C)
        return tb["box_off"]

    g2 = jax.grad(off_loss_of_vote)(vote)
    np.testing.assert_allclose(np.asarray(g2), 0.0, atol=0,
                               err_msg="target assignment leaks gradient "
                                       "into the votes")
