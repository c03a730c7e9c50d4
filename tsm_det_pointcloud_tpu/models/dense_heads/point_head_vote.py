"""TSM vote heads with transferable class statistics (flax).

Parity targets:
  * `PointHeadVoteSASAStatistic` — pcdet/models/dense_heads/code_board.py
    (teacher-training head: votes, VSA aggregation over the backbone's last
    centroid sparse tensor, per-class statistic-conditioned cls blocks,
    dynamic-weight reg branch, momentum statistic accumulation :884-901).
  * `PointHeadVoteSASAStatisticDistillation` — point_head_vote_sasa_
    statistic_distillation.py (frozen teacher branch + trainable s_* student
    branch, distillation losses :682-882).

TPU design: all point sets are batched fixed-size (B, N, ...) with masks;
target assignment is vectorized points-in-boxes (no per-batch python loops);
the class-statistics buffers live in the flax "statistics" collection
(mutable during training like batch_stats, checkpointed with the model).
"""
from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import loss_utils
from ...ops.box_coder_utils import PointBinResidualCoder
from ...ops.boxes import boxes_to_corners_3d, points_in_boxes
from ..backbones_3d.pointnet2_modules import SharedMLP
from ..backbones_3d.voxel_pointnet2_backbone import VoxelSAModule, factored_grid


# ---------------------------------------------------------------------------
# target assignment (vectorized; parity: code_board.py:227-475)
# ---------------------------------------------------------------------------

def assign_targets_simple(points_xyz, gt_boxes, gt_valid, extra_width=None):
    """Vote targets: class of the (enlarged) containing box + its center.
    Returns labels (B, N) int32 (0 bg), centers (B, N, 3)."""

    def single(pts, boxes, bvalid):
        idx = points_in_boxes(
            pts, boxes[:, :7], extra_width=extra_width, valid_mask=bvalid
        )
        fg = idx >= 0
        safe = jnp.maximum(idx, 0)
        labels = jnp.where(fg, boxes[safe, 7].astype(jnp.int32), 0)
        centers = jnp.where(fg[:, None], boxes[safe, 0:3], 0.0)
        return labels, centers

    return jax.vmap(single)(points_xyz, gt_boxes, gt_valid)


def assign_targets_mask(points_xyz, gt_boxes, gt_valid, box_coder,
                        central_radius=10.0):
    """Box/cls targets at vote positions with the ball constraint
    (use_ball_constraint=True path of assign_stack_targets_mask).
    Returns cls_labels (B, N) {-1 ignore, 0 bg, 1..C}, reg_labels
    (B, N, code), box_labels (B, N, 7)."""

    def single(pts, boxes, bvalid):
        idx = points_in_boxes(pts, boxes[:, :7], valid_mask=bvalid)
        box_fg = idx >= 0
        safe = jnp.maximum(idx, 0)
        centers = boxes[safe, 0:3]
        ball = jnp.linalg.norm(centers - pts[:, :3], axis=-1) < central_radius
        fg = box_fg & ball
        ignore = box_fg & ~ball
        labels = jnp.where(fg, boxes[safe, 7].astype(jnp.int32), 0)
        labels = jnp.where(ignore, -1, labels)
        gt_of_pt = boxes[safe, :7]
        reg = box_coder.encode(
            gt_of_pt, pts[:, :3], boxes[safe, 7].astype(jnp.int32)
        )
        reg = jnp.where(fg[:, None], reg, 0.0)
        box_lab = jnp.where(fg[:, None], gt_of_pt, 0.0)
        return labels, reg, box_lab

    return jax.vmap(single)(points_xyz, gt_boxes, gt_valid)


def corner_loss_points(pred_boxes, gt_boxes, weights):
    """Per-point corner SmoothL1 incl. flipped heading (parity:
    get_corner_loss_lidar, code_board.py:565-586). Shapes (B, N, 7)."""
    pc = boxes_to_corners_3d(pred_boxes.reshape(-1, 7))
    gc = boxes_to_corners_3d(gt_boxes.reshape(-1, 7))
    flip = gt_boxes.reshape(-1, 7).at[:, 6].add(np.pi)
    gcf = boxes_to_corners_3d(flip)
    # eps-normed distance + overflow-safe huber: plain norm has a NaN grad
    # at zero distance, and where-huber leaks 0*inf through the untaken
    # quadratic branch when a masked background row's box has exploded
    # (see ops/loss_utils.corner_loss)
    d = jnp.minimum(
        jnp.sqrt(jnp.sum((pc - gc) ** 2, axis=-1) + 1e-12),
        jnp.sqrt(jnp.sum((pc - gcf) ** 2, axis=-1) + 1e-12),
    )  # (B*N, 8)
    abs_d = jnp.abs(d)
    c = jnp.minimum(abs_d, 1.0)
    huber = 0.5 * c * c + (abs_d - c)
    per_pt = huber.mean(axis=-1).reshape(pred_boxes.shape[:2])
    return per_pt * weights


def _bce_logits(logits, targets):
    return jnp.clip(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


class VoteHeadBranch(nn.Module):
    """One vote-head branch (used for both teacher and student).

    Forward produces cls/reg/box preds at vote positions from the
    backbone's final point set + its centroid sparse tensor.
    """
    model_cfg: dict       # the head cfg (shared keys)
    vote_cfg: dict        # VOTE_CONFIG or S_VOTE_CONFIG
    vsa_cfg: dict         # VSA_CONFIG or S_VSA_CONFIG
    num_class: int
    box_coder: PointBinResidualCoder
    update_statistics: bool = True  # False in the distillation head (buffers
                                    # come transferred from the teacher ckpt)
    gated_reg: bool = True  # the statistic-gated dynamic-weight reg branch is
                            # TEACHER-only in the reference; the STUDENT uses a
                            # plain REG_FC MLP (s_reg_layers,
                            # ...distillation.py:160-170,1242-1245)

    @nn.compact
    def __call__(self, point_coords, point_features, point_valid,
                 sp, centroid_xyz, point_scores_cls, point_scores_val,
                 training=False, statistics=None):
        """point_scores_cls/val: per-point argmax class + sigmoid score from
        the backbone confidence (drives the statistic accumulation).
        statistics: optional external (num_class, SHARED_FC[-1]) array — the
        distillation head owns ONE shared buffer set for both branches."""
        cfg = self.model_cfg
        B, N, _ = point_coords.shape
        lo, hi = cfg["SAMPLE_RANGE"]
        cand_xyz = point_coords[:, lo:hi]
        cand_feat = point_features[:, lo:hi]
        cand_valid = point_valid[:, lo:hi]

        # ---- votes ----
        h = SharedMLP(list(self.vote_cfg["VOTE_FC"]), name="vote_fc")(
            cand_feat, training, mask=cand_valid[..., None]
        )
        offsets = nn.Dense(3, name="vote_out")(h)
        rng = jnp.asarray(self.vote_cfg["MAX_TRANSLATION_RANGE"], offsets.dtype)
        offsets = jnp.clip(offsets, -rng, rng)
        vote_xyz = cand_xyz + offsets

        # ---- VSA aggregation at vote positions ----
        vsa = self.vsa_cfg
        feats = VoxelSAModule(
            sa_layer_idx=6,
            radii=[float(r) for r in vsa["RADIUS"]],
            nsamples=[int(n) for n in vsa["NSAMPLE"]],
            mlps=[list(m) for m in vsa["MLPS"]],
            query_ranges=[list(q) for q in vsa["QUERY_RANGE"]],
            dilated_group=bool(vsa.get("DILATED_RADIUS_GROUP", False)),
            aggregation_mlp=None, confidence_mlp=None,
            num_class=self.num_class,
            voxel_size=tuple(
                np.asarray(cfg["VOXEL_CONFIG"]["VOXEL_SIZE"], np.float64)
                * float(vsa.get("SPARSE_TENSOR_STRIDE", 4))
            ),
            point_cloud_range=tuple(cfg["VOXEL_CONFIG"]["POINT_CLOUD_RANGE"]),
            grid=factored_grid(
                cfg["VOXEL_CONFIG"]["POINT_CLOUD_RANGE"],
                np.asarray(cfg["VOXEL_CONFIG"]["VOXEL_SIZE"], np.float64)
                * float(vsa.get("SPARSE_TENSOR_STRIDE", 4)),
            ),
            name="vsa",
        )(
            vote_xyz, None, cand_valid, sp=sp, centroid_xyz=centroid_xyz,
            new_xyz=vote_xyz, training=training,
        )["new_features"]

        shared = SharedMLP(list(cfg["SHARED_FC"]), name="shared_fc")(
            feats, training, mask=cand_valid[..., None]
        )
        C = shared.shape[-1]

        # ---- transferable class statistics ----
        if statistics is not None:
            stat_value = statistics
        else:
            # teacher-training path: this branch owns and accumulates the
            # buffers (requires backbone feature dim == SHARED_FC[-1], the
            # reference's implicit 256==256 contract, code_board.py:93)
            stat = self.variable(
                "statistics", "object_statistic_features",
                lambda: jnp.zeros((self.num_class, C), jnp.float32),
            )
            momentum = self.variable(
                "statistics", "object_momentum",
                lambda: jnp.zeros((self.num_class, C), jnp.float32),
            )
            mean_v = self.variable(
                "statistics", "object_mean",
                lambda: jnp.zeros((self.num_class, C), jnp.float32),
            )
            if (self.update_statistics and training
                    and self.is_mutable_collection("statistics")):
                # momentum accumulation from the BACKBONE features of points
                # predicted each class with score >= 0.3 (code_board.py:884-901)
                assert point_features.shape[-1] == C, (
                    "statistic buffers require backbone dim == SHARED_FC[-1] "
                    f"({point_features.shape[-1]} != {C})"
                )
                feats_flat = point_features.reshape(-1, C)
                cls_flat = point_scores_cls.reshape(-1)
                val_flat = point_scores_val.reshape(-1)
                ok_flat = point_valid.reshape(-1)
                new_stat, new_mom, new_mean = [], [], []
                for i in range(self.num_class):
                    m = (cls_flat == i) & (val_flat >= 0.3) & ok_flat
                    cnt = m.sum()
                    mu = jnp.where(
                        cnt > 0,
                        (feats_flat * m[:, None]).sum(0) / jnp.maximum(cnt, 1),
                        mean_v.value[i],
                    )
                    delta = mu - mean_v.value[i]
                    mom_i = jnp.where(
                        cnt > 0, 0.9 * momentum.value[i] + delta,
                        momentum.value[i],
                    )
                    st_i = jnp.where(
                        cnt > 0, stat.value[i] + mom_i, stat.value[i]
                    )
                    new_mean.append(mu)
                    new_mom.append(mom_i)
                    new_stat.append(st_i)
                stat.value = jnp.stack(new_stat)
                momentum.value = jnp.stack(new_mom)
                mean_v.value = jnp.stack(new_mean)
            stat_value = stat.value

        # ---- per-class statistic-conditioned classification ----
        cls_list = []
        for i in range(self.num_class):
            cond = shared * stat_value[i][None, None, :]
            hcls = nn.Dense(64, use_bias=False, name=f"cls{i}_fc")(cond)
            hcls = nn.BatchNorm(
                use_running_average=not training, momentum=0.99,
                epsilon=1e-3, name=f"cls{i}_bn",
            )(hcls, mask=cand_valid[..., None])
            hcls = nn.relu(hcls)
            logit = nn.Dense(
                1, name=f"cls{i}_out",
                bias_init=nn.initializers.constant(-float(np.log(99.0))),
            )(hcls)
            cls_list.append(logit)
        cls_preds = jnp.concatenate(cls_list, -1)  # (B, M, num_class)

        code = self.box_coder.code_size
        if not self.gated_reg:
            # plain student reg: REG_FC MLP on the shared features
            # (reference s_reg_layers — no gate, no statistic coupling)
            h = SharedMLP(list(cfg["REG_FC"]), name="reg_fc")(
                shared, training, mask=cand_valid[..., None]
            )
            reg_preds = nn.Dense(code, name="reg_out")(h)
            box_preds = self.box_coder.decode(reg_preds, vote_xyz)
            return dict(
                candidate_xyz=cand_xyz, candidate_valid=cand_valid,
                vote_xyz=vote_xyz, cls_preds=cls_preds, reg_preds=reg_preds,
                box_preds=box_preds, shared=shared,
            )

        # ---- dynamic-weight regression (teacher branches) ----
        score_cls = jax.nn.sigmoid(cls_preds).argmax(-1)
        score_val = jax.nn.sigmoid(cls_preds).max(-1)
        stat_ext = jnp.where(
            (score_val >= 0.1)[..., None],
            stat_value[score_cls], 0.0,
        )
        aware = stat_ext + shared
        reg_feat = nn.Dense(64, use_bias=False, name="reg_feat_fc")(shared)
        reg_feat = nn.BatchNorm(
            use_running_average=not training, momentum=0.9,
            epsilon=1e-5, name="reg_feat_bn",
        )(reg_feat, mask=cand_valid[..., None])
        reg_feat = nn.relu(reg_feat)

        g = nn.Dense(512, use_bias=False, name="gate_fc")(aware)
        g = nn.BatchNorm(
            use_running_average=not training, momentum=0.9,
            epsilon=1e-5, name="gate_bn",
        )(g, mask=cand_valid[..., None])
        g = nn.relu(g)
        gate = jax.nn.sigmoid(
            nn.Dense(64 * code, use_bias=False, name="gate_out")(g)
        ).reshape(B, -1, 64, code)

        bias_h = nn.Dense(64, use_bias=False, name="wbias_fc")(aware)
        bias_h = nn.BatchNorm(
            use_running_average=not training, momentum=0.9,
            epsilon=1e-5, name="wbias_bn",
        )(bias_h, mask=cand_valid[..., None])
        bias_h = nn.relu(bias_h)
        wbias = nn.Dense(code, name="wbias_out")(bias_h)

        reg_weight = self.param(
            "reg_weight",
            lambda k, s: jax.random.normal(k, s) * float(np.sqrt(2.0 / 64)),
            (1, 1, 64, code),
        )
        reg_preds = jnp.einsum(
            "bnc,bnck->bnk", reg_feat, reg_weight * gate
        ) + wbias

        box_preds = self.box_coder.decode(reg_preds, vote_xyz)
        return dict(
            candidate_xyz=cand_xyz, candidate_valid=cand_valid,
            vote_xyz=vote_xyz, cls_preds=cls_preds, reg_preds=reg_preds,
            box_preds=box_preds, shared=shared,
        )


def _branch_losses(out, gt_boxes, gt_valid, box_coder, cfg, num_class,
                   prefix="", teacher_out=None):
    """Vote + cls(centerness x rdiou) + box(offset/angle/rdiou/corner)
    losses for one branch. Returns (targets, loss, tb_dict).

    teacher_out=None  -> teacher-training semantics (code_board.py:
      sqrt quality labels, full-weight gt terms).
    teacher_out given -> distillation semantics (point_head_vote_sasa_
      statistic_distillation.py:682-882: pow-0.25 quality labels, each
      loss blended with the teacher: cls 0.5 gt + 0.5 bce(s/3, sig(t/3)),
      offsets 0.5/0.5, rdiou 0.5/0.5, corner 0.3 gt + 0.7 teacher).
    """
    w = cfg["LOSS_CONFIG"]["LOSS_WEIGHTS"]
    tb = {}
    distill = teacher_out is not None
    qpow = 0.25 if distill else 0.5

    def quality(x):
        return (x + 1e-8) ** qpow

    # vote loss
    extra = cfg["TARGET_CONFIG"].get("VOTE_EXTRA_WIDTH")
    v_labels, v_centers = assign_targets_simple(
        out["candidate_xyz"], gt_boxes, gt_valid, extra_width=extra
    )
    pos_v = (v_labels > 0) & out["candidate_valid"]
    vw = pos_v.astype(jnp.float32)
    vw = vw / jnp.maximum(vw.sum(), 1.0)
    vote_loss = loss_utils.weighted_smooth_l1(
        out["vote_xyz"], v_centers, weights=vw
    ).sum() * w["vote_reg_weight"]
    tb[prefix + "vote_loss"] = vote_loss

    # box/cls targets at vote positions. stop_gradient on the assignment
    # input: reg targets are xt = gt_center - vote, so a differentiable
    # vote creates a target-chases-prediction feedback loop (the off loss
    # gradient pushes votes AWAY from centers to move the target toward
    # the prediction) that stalls both the vote and offset losses.  The
    # reference reproduces this path un-detached (code_board.py:305-365
    # backprops through encode into vote coords); treating targets as
    # constants is the standard and intended semantics.
    radius = float(cfg["TARGET_CONFIG"].get("GT_CENTRAL_RADIUS", 10.0))
    labels, reg_labels, box_labels = assign_targets_mask(
        jax.lax.stop_gradient(out["vote_xyz"]), gt_boxes, gt_valid,
        box_coder, radius,
    )
    labels = jnp.where(out["candidate_valid"], labels, -1)
    pos = labels > 0
    neg = labels == 0
    cls_w = (pos | neg).astype(jnp.float32)

    # centerness x rdiou cls target (sqrt teacher / pow-0.25 distillation).
    # centerness is no-grad in the reference (@torch.no_grad on
    # generate_centerness_label).  The whole quality label is treated as a
    # constant: while cls logits are negative, dBCE/dtarget = -logit > 0,
    # so a differentiable rd factor lets the cls loss (weight 1.0) shrink
    # itself by destroying box overlap (rd -> 0), overpowering the 0.1-
    # weight offset loss — observed as sizes diverging from their targets
    # in overfit runs.  Box quality gradients belong to the rdiou/corner
    # regularizers below.
    B, N = labels.shape
    cent = jax.vmap(loss_utils.centerness_label)(
        jax.lax.stop_gradient(out["vote_xyz"]), box_labels, pos
    )
    _, rd = loss_utils.rdiou(
        jax.lax.stop_gradient(out["box_preds"]), box_labels
    )
    cent = jnp.where(pos, quality(cent * rd), cent)
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0), num_class + 1)[..., 1:]
    one_hot = one_hot * cent[..., None]
    cls_loss_pt = _bce_logits(out["cls_preds"], one_hot).sum(-1) * cls_w
    if distill:
        # 0.5 gt + 0.5 soft-teacher (both logit sets tempered by /3)
        t_soft = jax.nn.sigmoid(
            jax.lax.stop_gradient(teacher_out["cls_preds"]) / 3.0
        )
        distill_pt = _bce_logits(out["cls_preds"] / 3.0, t_soft).sum(-1) * cls_w
        cls_loss_pt = 0.5 * cls_loss_pt + 0.5 * distill_pt
    cls_norm = jnp.maximum(pos.sum(), 1.0)
    cls_loss = cls_loss_pt.sum() / cls_norm * w["point_cls_weight"]
    tb[prefix + "cls_loss"] = cls_loss

    # box loss
    rw = pos.astype(jnp.float32)
    nbin = box_coder.angle_bin_num
    off_l = loss_utils.weighted_smooth_l1(
        out["reg_preds"][..., :6], reg_labels[..., :6], weights=rw
    ).sum(-1)
    if distill:
        t_off = loss_utils.weighted_smooth_l1(
            out["reg_preds"][..., :6],
            jax.lax.stop_gradient(teacher_out["reg_preds"][..., :6]),
            weights=rw,
        ).sum(-1)
        off_l = 0.5 * off_l + 0.5 * t_off
    off_l = off_l * w["point_offset_reg_weight"]
    ang_cls_lab = reg_labels[..., 6:6 + nbin]
    ang_logits = out["reg_preds"][..., 6:6 + nbin]
    ce = -jax.nn.log_softmax(ang_logits) * ang_cls_lab
    ang_cls_l = ce.sum(-1) * rw * w["point_angle_cls_weight"]
    ang_res_p = (out["reg_preds"][..., 6 + nbin:6 + 2 * nbin] * ang_cls_lab).sum(-1)
    ang_res_l = (reg_labels[..., 6 + nbin:6 + 2 * nbin] * ang_cls_lab).sum(-1)
    ang_reg_l = loss_utils.weighted_smooth_l1(
        ang_res_p[..., None], ang_res_l[..., None], weights=rw
    ).sum(-1) * w["point_angle_reg_weight"]
    box_loss_pt = off_l + ang_cls_l + ang_reg_l

    aux = jnp.zeros_like(box_loss_pt)
    if cfg["LOSS_CONFIG"].get("RDIOU_REGRESS_REGULARIZATION", False):
        cent2 = jax.vmap(loss_utils.centerness_label)(
            jax.lax.stop_gradient(out["vote_xyz"]), box_labels, pos
        )
        _, rd2 = loss_utils.rdiou(out["box_preds"], box_labels)
        iou_l = 1.0 - quality(rd2 * cent2)
        if distill:
            t_box = jax.lax.stop_gradient(teacher_out["box_preds"])
            t_cent = jax.vmap(loss_utils.centerness_label)(
                jax.lax.stop_gradient(out["vote_xyz"]), t_box, pos
            )
            _, t_rd = loss_utils.rdiou(out["box_preds"], t_box)
            iou_l = 0.5 * iou_l + 0.5 * (1.0 - quality(t_rd * t_cent))
        aux = aux + jnp.where(pos, iou_l * w["point_iou_weight"], 0.0)
    if cfg["LOSS_CONFIG"].get("CORNER_LOSS_REGULARIZATION", False):
        corner = corner_loss_points(
            out["box_preds"], box_labels, pos.astype(jnp.float32)
        ) * w["point_corner_weight"]
        if distill:
            t_corner = corner_loss_points(
                out["box_preds"],
                jax.lax.stop_gradient(teacher_out["box_preds"]),
                pos.astype(jnp.float32),
            ) * w["point_corner_weight"]
            corner = 0.3 * corner + 0.7 * t_corner
        aux = aux + corner
    box_norm = jnp.maximum(pos.sum(), 1.0)
    box_loss = (box_loss_pt * rw + aux).sum() / box_norm
    tb[prefix + "box_loss"] = box_loss
    tb[prefix + "box_off"] = (off_l * rw).sum() / box_norm
    tb[prefix + "box_ang"] = ((ang_cls_l + ang_reg_l) * rw).sum() / box_norm
    tb[prefix + "box_aux"] = aux.sum() / box_norm
    tb[prefix + "n_pos"] = pos.sum().astype(jnp.float32)
    if os.environ.get("TSM_DEBUG_LOSS"):
        pw = rw[..., None] / box_norm
        tb[prefix + "dbg_off_xyz"] = (jnp.abs(
            out["reg_preds"][..., :3] - reg_labels[..., :3]) * pw).sum()
        tb[prefix + "dbg_off_size"] = (jnp.abs(
            out["reg_preds"][..., 3:6] - reg_labels[..., 3:6]) * pw).sum()
        tb[prefix + "dbg_pred_size"] = (
            out["reg_preds"][..., 3:6] * pw).sum() / 3
        tb[prefix + "dbg_lab_size"] = (reg_labels[..., 3:6] * pw).sum() / 3
        tb[prefix + "dbg_pred_xyz_abs"] = (jnp.abs(
            out["reg_preds"][..., :3]) * pw).sum() / 3
        tb[prefix + "dbg_lab_xyz_abs"] = (jnp.abs(
            reg_labels[..., :3]) * pw).sum() / 3
        _, rdq = loss_utils.rdiou(out["box_preds"], box_labels)
        tb[prefix + "dbg_rd"] = (rdq * rw).sum() / box_norm
        cq = jax.vmap(loss_utils.centerness_label)(
            jax.lax.stop_gradient(out["vote_xyz"]), box_labels, pos)
        tb[prefix + "dbg_cent"] = (cq * rw).sum() / box_norm

    targets = dict(labels=labels, reg_labels=reg_labels,
                   box_labels=box_labels, pos=pos)
    return targets, vote_loss + cls_loss + box_loss, tb


def _sasa_loss(batch_dict, gt_boxes, gt_valid, cfg, num_class):
    sasa_cfg = cfg["LOSS_CONFIG"].get("LOSS_SASA_CONFIG")
    if not sasa_cfg:
        return 0.0, {}
    lw = list(sasa_cfg["layer_weights"])
    extra = sasa_cfg.get("extra_width")
    total, tb = 0.0, {}
    coords_l = batch_dict.get("point_coords_list", [])
    scores_l = batch_dict.get("point_scores_list", [])
    valid_l = batch_dict.get("point_valid_list", [])
    for i, (xyz, sc, vl) in enumerate(zip(coords_l, scores_l, valid_l)):
        if sc is None or i >= len(lw):
            continue
        labels = loss_utils.sasa_assign_targets(
            xyz, gt_boxes, extra_width=extra,
            set_ignore_flag=bool(sasa_cfg.get("set_ignore_flag", True)),
            num_class=num_class, gt_valid=gt_valid,
        )
        labels = jnp.where(vl, labels, -1)
        total = total + lw[i] * loss_utils.sasa_layer_loss(
            sc, labels, num_class=num_class
        )
    tb["sasa_loss"] = total
    return total, tb


class PointHeadVoteSASAStatistic(nn.Module):
    """Teacher-training head (parity: code_board.py PointHeadVoteSASAStatistic)."""
    model_cfg: dict
    num_class: int
    meta: object = None

    def setup(self):
        tc = self.model_cfg["TARGET_CONFIG"]
        self.box_coder = PointBinResidualCoder(**dict(tc.get("BOX_CODER_CONFIG", {})))
        self.branch = VoteHeadBranch(
            model_cfg=self.model_cfg,
            vote_cfg=dict(self.model_cfg["VOTE_CONFIG"]),
            vsa_cfg=dict(self.model_cfg["VSA_CONFIG"]),
            num_class=self.num_class,
            box_coder=self.box_coder,
            name="head",
        )

    def __call__(self, batch_dict, training=False):
        scores_voxel = batch_dict["point_scores"]  # (B, V, C) per-voxel
        slot = batch_dict["last_point_slot"]
        smax = jax.nn.sigmoid(scores_voxel).max(-1)
        scls = scores_voxel.argmax(-1)
        safe = jnp.clip(slot, 0, smax.shape[1] - 1)
        p_val = jnp.where(slot >= 0, jnp.take_along_axis(smax, safe, 1), 0.0)
        p_cls = jnp.where(slot >= 0, jnp.take_along_axis(scls, safe, 1), -1)

        out = self.branch(
            batch_dict["point_coords"], batch_dict["point_features"],
            batch_dict["point_valid"], batch_dict["last_sp_tensor"],
            batch_dict["last_centroid_xyz"], p_cls, p_val, training=training,
        )
        batch_dict["batch_cls_preds"] = out["cls_preds"]
        batch_dict["batch_box_preds"] = out["box_preds"]
        batch_dict["cls_preds_normalized"] = False
        batch_dict["point_vote_coords"] = out["vote_xyz"]

        if training:
            gt, gv = batch_dict["gt_boxes"], batch_dict["gt_boxes_mask"]
            _, main_loss, tb = _branch_losses(
                out, gt, gv, self.box_coder, self.model_cfg, self.num_class
            )
            sasa, tb2 = _sasa_loss(
                batch_dict, gt, gv, self.model_cfg, self.num_class
            )
            batch_dict["loss"] = main_loss + sasa
            batch_dict["tb_dict"] = {**tb, **tb2}
        return batch_dict


class PointHeadVoteSASAStatisticDistillation(nn.Module):
    """Distillation head: frozen teacher branch (training only) + trainable
    student branch (the deployed model)."""
    model_cfg: dict
    num_class: int
    meta: object = None

    def setup(self):
        tc = self.model_cfg["TARGET_CONFIG"]
        self.box_coder = PointBinResidualCoder(**dict(tc.get("BOX_CODER_CONFIG", {})))
        self.teacher = VoteHeadBranch(
            model_cfg=self.model_cfg,
            vote_cfg=dict(self.model_cfg["VOTE_CONFIG"]),
            vsa_cfg=dict(self.model_cfg["VSA_CONFIG"]),
            num_class=self.num_class, box_coder=self.box_coder,
            name="head",
        )
        self.student = VoteHeadBranch(
            model_cfg=self.model_cfg,
            vote_cfg=dict(self.model_cfg["S_VOTE_CONFIG"]),
            vsa_cfg=dict(self.model_cfg["S_VSA_CONFIG"]),
            num_class=self.num_class, box_coder=self.box_coder,
            gated_reg=False,  # reference student reg is a plain REG_FC MLP
            name="s_head",
        )
        # ONE shared statistics set for both branches (transferred from the
        # teacher checkpoint; the distillation head never updates it —
        # update code is disabled in the reference, ...distillation.py:1045)
        C = int(self.model_cfg["SHARED_FC"][-1])
        self.stat_var = self.variable(
            "statistics", "object_statistic_features",
            lambda: jnp.zeros((self.num_class, C), jnp.float32),
        )
        self.mom_var = self.variable(
            "statistics", "object_momentum",
            lambda: jnp.zeros((self.num_class, C), jnp.float32),
        )
        self.mean_var = self.variable(
            "statistics", "object_mean",
            lambda: jnp.zeros((self.num_class, C), jnp.float32),
        )

    def _point_scores(self, batch_dict, prefix):
        scores_voxel = batch_dict[prefix + "point_scores"]
        slot = batch_dict[prefix + "last_point_slot"]
        smax = jax.nn.sigmoid(scores_voxel).max(-1)
        scls = scores_voxel.argmax(-1)
        safe = jnp.clip(slot, 0, smax.shape[1] - 1)
        p_val = jnp.where(slot >= 0, jnp.take_along_axis(smax, safe, 1), 0.0)
        p_cls = jnp.where(slot >= 0, jnp.take_along_axis(scls, safe, 1), -1)
        return p_cls, p_val

    def __call__(self, batch_dict, training=False):
        s_cls, s_val = self._point_scores(batch_dict, "s_")
        stats = self.stat_var.value
        s_out = self.student(
            batch_dict["s_point_coords"], batch_dict["s_point_features"],
            batch_dict["s_point_valid"], batch_dict["s_last_sp_tensor"],
            batch_dict["s_last_centroid_xyz"], s_cls, s_val,
            training=training, statistics=stats,
        )
        batch_dict["batch_cls_preds"] = s_out["cls_preds"]
        batch_dict["batch_box_preds"] = s_out["box_preds"]
        batch_dict["cls_preds_normalized"] = False
        batch_dict["point_vote_coords"] = s_out["vote_xyz"]

        if training:
            t_cls, t_val = self._point_scores(batch_dict, "")
            t_out = self.teacher(
                batch_dict["point_coords"], batch_dict["point_features"],
                batch_dict["point_valid"], batch_dict["last_sp_tensor"],
                batch_dict["last_centroid_xyz"], t_cls, t_val,
                training=training, statistics=stats,
            )
            t_out = jax.tree_util.tree_map(jax.lax.stop_gradient, t_out)

            gt, gv = batch_dict["gt_boxes"], batch_dict["gt_boxes_mask"]
            # distillation terms are blended INSIDE each loss (0.5 gt +
            # 0.5 teacher; corner 0.3/0.7; pow-0.25 quality labels) —
            # point_head_vote_sasa_statistic_distillation.py:682-882
            targets, s_loss, tb = _branch_losses(
                s_out, gt, gv, self.box_coder, self.model_cfg,
                self.num_class, prefix="s_", teacher_out=t_out,
            )

            sasa, tb2 = _sasa_loss(
                batch_dict, gt, gv, self.model_cfg, self.num_class
            )
            batch_dict["loss"] = s_loss + sasa
            batch_dict["tb_dict"] = {**tb, **tb2}
        return batch_dict
