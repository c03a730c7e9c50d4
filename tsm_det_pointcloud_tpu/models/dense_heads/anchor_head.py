"""Anchor-based dense head (flax) + fully-vectorized target assignment.

Parity targets:
  AnchorGenerator            <- dense_heads/target_assigner/anchor_generator.py:4-79
  AxisAlignedTargetAssigner  <- .../axis_aligned_target_assigner.py:8-210
  AnchorHeadTemplate/Single  <- dense_heads/anchor_head_{template,single}.py

The reference assigns targets with a per-sample, per-class python loop and
dynamic nonzero() indexing; here the whole assignment is one vmapped masked
computation over (num_anchors, max_gt) IoU tables — no host sync, jit-safe.
"""
from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import box_coder_utils, loss_utils
from ...utils.common_utils import limit_period


# ---------------------------------------------------------------------------
# anchor generation (host-side, static)
# ---------------------------------------------------------------------------

def generate_anchors(anchor_range, grid_sizes, anchor_generator_configs):
    """Returns (anchors (nz*ny*nx*A, 7) f32 stacked per class on the A axis,
    num_anchors_per_location_total).
    Layout matches the reference's permute(2,1,0,3,4,5) + class cat(dim=-2):
    slowest..fastest = z, y, x, class, size, rotation."""
    per_class = []
    for grid_size, cfg in zip(grid_sizes, anchor_generator_configs):
        sizes = np.array(cfg["anchor_sizes"], np.float32)           # (S, 3)
        rotations = np.array(cfg["anchor_rotations"], np.float32)   # (R,)
        heights = np.array(cfg["anchor_bottom_heights"], np.float32)  # (Z,)
        align_center = cfg.get("align_center", False)

        nx, ny = int(grid_size[0]), int(grid_size[1])
        if align_center:
            x_stride = (anchor_range[3] - anchor_range[0]) / nx
            y_stride = (anchor_range[4] - anchor_range[1]) / ny
            x_offset, y_offset = x_stride / 2, y_stride / 2
        else:
            x_stride = (anchor_range[3] - anchor_range[0]) / (nx - 1)
            y_stride = (anchor_range[4] - anchor_range[1]) / (ny - 1)
            x_offset = y_offset = 0.0
        xs = anchor_range[0] + x_offset + x_stride * np.arange(nx, dtype=np.float32)
        ys = anchor_range[1] + y_offset + y_stride * np.arange(ny, dtype=np.float32)
        zs = heights

        Z, S, R = len(zs), len(sizes), len(rotations)
        # (Z, Y, X, S, R, 7)
        a = np.zeros((Z, ny, nx, S, R, 7), np.float32)
        a[..., 0] = xs[None, None, :, None, None]
        a[..., 1] = ys[None, :, None, None, None]
        a[..., 2] = zs[:, None, None, None, None]
        a[..., 3:6] = sizes[None, None, None, :, None, :]
        a[..., 6] = rotations[None, None, None, None, :]
        a[..., 2] += a[..., 5] / 2  # bottom -> center
        per_class.append(a)

    num_per_loc = sum(a.shape[3] * a.shape[4] for a in per_class)
    # concat classes on the per-location axis: (Z, Y, X, sum(S*R), 7)
    flat = [a.reshape(a.shape[0], a.shape[1], a.shape[2], -1, 7) for a in per_class]
    anchors = np.concatenate(flat, axis=3)
    return anchors.reshape(-1, 7), num_per_loc


# ---------------------------------------------------------------------------
# target assignment (device-side)
# ---------------------------------------------------------------------------

def nearest_bev_iou(boxes_a, boxes_b):
    """Axis-aligned IoU of the heading-snapped BEV boxes
    (parity: box_utils.boxes3d_nearest_bev_iou)."""

    def to_aabb(b):
        rot = limit_period(jnp.abs(b[:, 6]), 0.5, jnp.pi)
        cond = (rot > jnp.pi / 4)[:, None]
        dxy = jnp.where(cond, b[:, [4, 3]], b[:, [3, 4]])
        return jnp.concatenate(
            [b[:, :2] - dxy / 2, b[:, :2] + dxy / 2], axis=-1
        )

    aa, bb = to_aabb(boxes_a), to_aabb(boxes_b)
    lt = jnp.maximum(aa[:, None, :2], bb[None, :, :2])
    rb = jnp.minimum(aa[:, None, 2:], bb[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (aa[:, 2] - aa[:, 0]) * (aa[:, 3] - aa[:, 1])
    area_b = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
    return inter / jnp.clip(area_a[:, None] + area_b[None] - inter, 1e-6)


def assign_targets(anchors, gt_boxes, gt_valid, class_ids, anchor_class_ids,
                   matched_thresholds, unmatched_thresholds, box_coder,
                   match_height=False):
    """Vectorized AxisAlignedTargetAssigner.assign_targets_single over a
    padded batch and all classes at once.

    anchors (A, 7); gt_boxes (B, M, 8) with 1-based class at [...,7];
    gt_valid (B, M); anchor_class_ids (A,) int32 1-based;
    matched/unmatched_thresholds (A,) per-anchor thresholds.
    Returns dict with box_cls_labels (B, A), box_reg_targets (B, A, code),
    reg_weights (B, A).
    """
    from ...ops.iou3d import boxes_iou3d

    def single(gts, valid):
        gt_cls = gts[:, 7].astype(jnp.int32)
        iou_fn = boxes_iou3d if match_height else nearest_bev_iou
        iou = iou_fn(anchors, gts[:, :7])  # (A, M)
        # class-gated: anchor of class c only matches gt of class c
        class_ok = anchor_class_ids[:, None] == gt_cls[None, :]
        iou = jnp.where(class_ok & valid[None, :], iou, 0.0)

        a2g_max = iou.max(axis=1)
        a2g_arg = iou.argmax(axis=1)
        g2a_max = jnp.where(valid, iou.max(axis=0), -1.0)
        g2a_max = jnp.where(g2a_max == 0, -1.0, g2a_max)  # empty gt -> no force
        force = jnp.any(iou == g2a_max[None, :], axis=1) & (a2g_max > 0)

        pos = a2g_max >= matched_thresholds
        bg = a2g_max < unmatched_thresholds

        labels = jnp.full(anchors.shape[0], -1, jnp.int32)
        labels = jnp.where(bg, 0, labels)
        labels = jnp.where(pos | force, gt_cls[a2g_arg], labels)

        fg = labels > 0
        tgt_boxes = gts[a2g_arg][:, :7]
        reg_targets = box_coder.encode(tgt_boxes, anchors)
        reg_targets = jnp.where(fg[:, None], reg_targets, 0.0)
        reg_weights = fg.astype(jnp.float32)
        return labels, reg_targets, reg_weights

    labels, reg_targets, reg_weights = jax.vmap(single)(gt_boxes, gt_valid)
    return {
        "box_cls_labels": labels,
        "box_reg_targets": reg_targets,
        "reg_weights": reg_weights,
    }


# ---------------------------------------------------------------------------
# head module
# ---------------------------------------------------------------------------

class AnchorHeadSingle(nn.Module):
    """Parity: dense_heads/anchor_head_single.py — 1x1 conv cls/box/dir heads
    over BEV features."""
    model_cfg: dict
    input_channels: int
    num_class: int
    class_names: tuple
    grid_size: tuple          # (nx, ny, nz)
    point_cloud_range: tuple
    predict_boxes_when_training: bool = False

    def setup(self):
        cfg = self.model_cfg
        anchor_cfgs = cfg["ANCHOR_GENERATOR_CONFIG"]
        stride = anchor_cfgs[0].get("feature_map_stride", 2)
        grid_xy = [
            (self.grid_size[0] // stride, self.grid_size[1] // stride)
            for _ in anchor_cfgs
        ]
        anchors_np, self.num_anchors_per_location = generate_anchors(
            self.point_cloud_range, grid_xy, anchor_cfgs
        )
        self.anchors = jnp.asarray(anchors_np)
        self.feature_map_stride = stride

        # per-anchor class ids + thresholds (order matches generate_anchors)
        per_loc_cls, per_loc_m, per_loc_u = [], [], []
        for ci, acfg in enumerate(anchor_cfgs):
            n = len(acfg["anchor_sizes"]) * len(acfg["anchor_rotations"]) * len(
                acfg["anchor_bottom_heights"]
            )
            per_loc_cls += [ci + 1] * n
            per_loc_m += [acfg["matched_threshold"]] * n
            per_loc_u += [acfg["unmatched_threshold"]] * n
        n_loc = anchors_np.shape[0] // len(per_loc_cls)
        self.anchor_class_ids = jnp.tile(jnp.array(per_loc_cls, jnp.int32), n_loc)
        self.matched_thresholds = jnp.tile(jnp.array(per_loc_m, jnp.float32), n_loc)
        self.unmatched_thresholds = jnp.tile(jnp.array(per_loc_u, jnp.float32), n_loc)

        self.box_coder = getattr(
            box_coder_utils, cfg.get("BOX_CODER", "ResidualCoder")
        )(**cfg.get("BOX_CODER_CONFIG", {}))
        self.use_dir = cfg.get("USE_DIRECTION_CLASSIFIER", False)
        self.num_dir_bins = cfg.get("NUM_DIR_BINS", 2)
        self.dir_offset = cfg.get("DIR_OFFSET", 0.78539)
        self.dir_limit_offset = cfg.get("DIR_LIMIT_OFFSET", 0.0)

        A = self.num_anchors_per_location
        self.conv_cls = nn.Conv(A * self.num_class, (1, 1), name="conv_cls",
                                bias_init=nn.initializers.constant(-float(np.log((1 - 0.01) / 0.01))))
        self.conv_box = nn.Conv(A * self.box_coder.code_size, (1, 1), name="conv_box")
        if self.use_dir:
            self.conv_dir = nn.Conv(A * self.num_dir_bins, (1, 1), name="conv_dir_cls")

    def __call__(self, batch_dict, training=False):
        x = batch_dict["spatial_features_2d"]  # (B, H, W, C)
        B = x.shape[0]
        cls_preds = self.conv_cls(x).reshape(B, -1, self.num_class)
        box_preds = self.conv_box(x).reshape(B, -1, self.box_coder.code_size)
        batch_dict["cls_preds"] = cls_preds        # (B, A, num_class)
        batch_dict["box_preds"] = box_preds        # (B, A, code)
        if self.use_dir:
            batch_dict["dir_cls_preds"] = self.conv_dir(x).reshape(
                B, -1, self.num_dir_bins
            )
        if not training or self.predict_boxes_when_training:
            batch_cls, batch_box = self.generate_predicted_boxes(
                cls_preds, box_preds, batch_dict.get("dir_cls_preds")
            )
            batch_dict["batch_cls_preds"] = batch_cls
            batch_dict["batch_box_preds"] = batch_box
            batch_dict["cls_preds_normalized"] = False
        return batch_dict

    # -- pure helpers (no params) --------------------------------------------

    def generate_predicted_boxes(self, cls_preds, box_preds, dir_cls_preds=None):
        boxes = self.box_coder.decode(box_preds, self.anchors[None])
        if self.use_dir and dir_cls_preds is not None:
            dir_labels = jnp.argmax(dir_cls_preds, axis=-1)
            period = 2 * jnp.pi / self.num_dir_bins
            val = limit_period(
                boxes[..., 6] - self.dir_offset, self.dir_limit_offset, period
            )
            rot = val + self.dir_offset + period * dir_labels.astype(boxes.dtype)
            boxes = boxes.at[..., 6].set(rot)
        return cls_preds, boxes

    def assign(self, gt_boxes, gt_valid):
        return assign_targets(
            self.anchors, gt_boxes, gt_valid, None, self.anchor_class_ids,
            self.matched_thresholds, self.unmatched_thresholds, self.box_coder,
            match_height=self.model_cfg.get("TARGET_ASSIGNER_CONFIG", {}).get(
                "MATCH_HEIGHT", False
            ),
        )

    def get_direction_target(self, reg_targets):
        rot_gt = reg_targets[..., 6] + self.anchors[None, :, 6]
        offset_rot = limit_period(rot_gt - self.dir_offset, 0, 2 * jnp.pi)
        dir_cls = jnp.clip(
            jnp.floor(offset_rot / (2 * jnp.pi / self.num_dir_bins)),
            0, self.num_dir_bins - 1,
        ).astype(jnp.int32)
        return dir_cls

    def loss(self, batch_dict):
        """Total head loss + tb_dict (parity: anchor_head_template.py:101-216)."""
        cfg = self.model_cfg["LOSS_CONFIG"]
        lw = cfg["LOSS_WEIGHTS"]
        targets = self.assign(batch_dict["gt_boxes"], batch_dict["gt_boxes_mask"])
        cls_labels = targets["box_cls_labels"]      # (B, A)
        reg_targets = targets["box_reg_targets"]    # (B, A, code)

        cls_preds = batch_dict["cls_preds"]
        box_preds = batch_dict["box_preds"]

        cared = cls_labels >= 0
        positives = cls_labels > 0
        negatives = cls_labels == 0
        cls_weights = (negatives * 1.0 + positives * 1.0).astype(jnp.float32)
        reg_weights = positives.astype(jnp.float32)
        pos_normalizer = jnp.clip(positives.sum(axis=1, keepdims=True), 1.0)
        cls_weights = cls_weights / pos_normalizer
        reg_weights = reg_weights / pos_normalizer

        cls_targets = jnp.where(cared, cls_labels, 0)
        one_hot = jax.nn.one_hot(cls_targets, self.num_class + 1)[..., 1:]
        cls_loss = loss_utils.sigmoid_focal_loss(
            cls_preds, one_hot, cls_weights
        ).sum() / batch_dict["batch_size"]
        cls_loss = cls_loss * lw["cls_weight"]

        # sin-difference on the heading channel
        bp, rt = self._add_sin_difference(box_preds, reg_targets)
        loc_loss = loss_utils.weighted_smooth_l1(
            bp, rt, reg_weights, code_weights=lw.get("code_weights"),
        ).sum() / batch_dict["batch_size"]
        loc_loss = loc_loss * lw["loc_weight"]

        tb = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}
        total = cls_loss + loc_loss
        if self.use_dir and "dir_cls_preds" in batch_dict:
            dir_targets = self.get_direction_target(reg_targets)
            dir_one_hot = jax.nn.one_hot(dir_targets, self.num_dir_bins)
            dir_w = positives.astype(jnp.float32) / pos_normalizer
            dir_loss = loss_utils.weighted_cross_entropy(
                batch_dict["dir_cls_preds"], dir_one_hot, dir_w
            ).sum() / batch_dict["batch_size"]
            dir_loss = dir_loss * lw["dir_weight"]
            tb["rpn_loss_dir"] = dir_loss
            total = total + dir_loss
        tb["rpn_loss"] = total
        return total, tb

    @staticmethod
    def _add_sin_difference(boxes1, boxes2):
        rad_pred = jnp.sin(boxes1[..., 6:7]) * jnp.cos(boxes2[..., 6:7])
        rad_tg = jnp.cos(boxes1[..., 6:7]) * jnp.sin(boxes2[..., 6:7])
        b1 = jnp.concatenate([boxes1[..., :6], rad_pred, boxes1[..., 7:]], axis=-1)
        b2 = jnp.concatenate([boxes2[..., :6], rad_tg, boxes2[..., 7:]], axis=-1)
        return b1, b2


def atss_assign_targets(anchors, gt_boxes, gt_valid, class_ids,
                        anchor_class_ids, box_coder, topk=9):
    """ATSS target assignment (parity: target_assigner/atss_target_assigner
    .py:7-141): per gt, take the top-k anchors by center distance, set the
    IoU threshold to mean+std of their IoUs, positives are candidates above
    it whose centers fall inside the gt box."""
    from ...ops.iou3d import boxes_iou3d

    def single(gts, valid):
        gt_cls = gts[:, 7].astype(jnp.int32)
        iou = boxes_iou3d(anchors, gts[:, :7])                 # (A, M)
        class_ok = anchor_class_ids[:, None] == gt_cls[None, :]
        iou = jnp.where(class_ok & valid[None, :], iou, 0.0)

        d2 = jnp.sum(
            (anchors[:, None, :3] - gts[None, :, :3]) ** 2, -1
        )
        d2 = jnp.where(class_ok & valid[None, :], d2, 1e10)
        # top-k nearest anchors per gt
        _, cand = jax.lax.top_k(-d2.T, topk)                   # (M, k)
        cand_iou = jnp.take_along_axis(iou.T, cand, axis=1)    # (M, k)
        thr = cand_iou.mean(1) + cand_iou.std(1)               # (M,)

        # center-inside-gt test for candidates
        rel = anchors[:, :3][cand] - gts[:, None, :3]          # (M, k, 3)
        cosa = jnp.cos(-gts[:, 6])[:, None]
        sina = jnp.sin(-gts[:, 6])[:, None]
        lx = rel[..., 0] * cosa - rel[..., 1] * sina
        ly = rel[..., 0] * sina + rel[..., 1] * cosa
        inside = (
            (jnp.abs(lx) < gts[:, None, 3] / 2)
            & (jnp.abs(ly) < gts[:, None, 4] / 2)
            & (jnp.abs(rel[..., 2]) < gts[:, None, 5] / 2)
        )
        is_pos = (cand_iou >= thr[:, None]) & inside & valid[:, None]

        # scatter candidate decisions back to anchors (max-iou wins ties)
        A = anchors.shape[0]
        pos_iou = jnp.zeros((A,))
        pos_cls = jnp.zeros((A,), jnp.int32)
        M, K = cand.shape
        flat_c = cand.reshape(-1)
        flat_i = jnp.where(is_pos, cand_iou, -1.0).reshape(-1)
        gt_of = jnp.repeat(gt_cls, K)
        gt_row = jnp.repeat(jnp.arange(M), K)
        best = jax.ops.segment_max(flat_i, flat_c, num_segments=A)
        chosen = (flat_i == best[flat_c]) & (flat_i > 0)
        pos_cls = pos_cls.at[jnp.where(chosen, flat_c, A)].set(
            gt_of, mode="drop"
        )
        gt_idx = jnp.zeros((A,), jnp.int32).at[
            jnp.where(chosen, flat_c, A)
        ].set(gt_row, mode="drop")

        fg = pos_cls > 0
        labels = jnp.where(fg, pos_cls, 0)
        reg_targets = box_coder.encode(gts[gt_idx][:, :7], anchors)
        reg_targets = jnp.where(fg[:, None], reg_targets, 0.0)
        return labels, reg_targets, fg.astype(jnp.float32)

    labels, reg_targets, reg_weights = jax.vmap(single)(gt_boxes, gt_valid)
    return {
        "box_cls_labels": labels,
        "box_reg_targets": reg_targets,
        "reg_weights": reg_weights,
    }


class AnchorHeadMulti(AnchorHeadSingle):
    """Grouped multi-head anchor head (parity: anchor_head_multi.py):
    a shared conv trunk + per-class-group conv branches. Functionally the
    per-location channel layout matches AnchorHeadSingle (the groups
    partition the class axis), so targets/losses/decode are inherited; the
    branch structure adds per-group capacity like the reference."""
    model_cfg: dict = None
    input_channels: int = None
    num_class: int = None
    class_names: tuple = None
    grid_size: tuple = None
    point_cloud_range: tuple = None
    predict_boxes_when_training: bool = False

    def setup(self):
        super().setup()
        shared_ch = int(self.model_cfg.get("SHARED_CONV_NUM_FILTER", 0) or 0)
        self.shared_conv = (
            nn.Conv(shared_ch, (3, 3), use_bias=True, name="shared_conv")
            if shared_ch else None
        )

    def __call__(self, batch_dict, training=False):
        if self.shared_conv is not None:
            batch_dict = dict(batch_dict)
            batch_dict["spatial_features_2d"] = nn.relu(
                self.shared_conv(batch_dict["spatial_features_2d"])
            )
        return super().__call__(batch_dict, training=training)


def _cls_only_loss(head, batch_dict):
    """Focal classification loss alone (the _cls head variants drop the
    box/dir branches; parity: anchor_head_single_cls.py get_loss)."""
    targets = head.assign(batch_dict["gt_boxes"], batch_dict["gt_boxes_mask"])
    cls_labels = targets["box_cls_labels"]
    cls_preds = batch_dict["cls_preds"]
    cared = cls_labels >= 0
    positives = cls_labels > 0
    negatives = cls_labels == 0
    cls_weights = (negatives * 1.0 + positives * 1.0).astype(jnp.float32)
    pos_normalizer = jnp.clip(positives.sum(axis=1, keepdims=True), 1.0)
    cls_weights = cls_weights / pos_normalizer
    cls_targets = jnp.where(cared, cls_labels, 0)
    one_hot = jax.nn.one_hot(cls_targets, head.num_class + 1)[..., 1:]
    lw = head.model_cfg.get("LOSS_CONFIG", {}).get("LOSS_WEIGHTS", {})
    cls_loss = loss_utils.sigmoid_focal_loss(
        cls_preds, one_hot, cls_weights
    ).sum() / batch_dict["batch_size"] * lw.get("cls_weight", 1.0)
    return cls_loss, {"rpn_loss_cls": cls_loss, "rpn_loss": cls_loss}


class AnchorHeadSingleCls(AnchorHeadSingle):
    """Classification-only auxiliary RPN over the stride-8 sparse pyramid
    level (parity: anchor_head_single_cls.py:8-68). The reference variant is
    experimental dead code as shipped — it indexes
    multi_scale_3d_features['scale4'] (a key no backbone emits) with a
    hard-coded 160-ch conv and its box branch commented out. Here it reads
    'x_conv4', collapses z into channels, and predicts per-anchor class
    logits only; configs must set feature_map_stride to the x_conv4 stride.
    """
    model_cfg: dict = None
    input_channels: int = None
    num_class: int = None
    class_names: tuple = None
    grid_size: tuple = None
    point_cloud_range: tuple = None
    predict_boxes_when_training: bool = False

    def __call__(self, batch_dict, training=False):
        from ...ops import spconv as sp

        t = batch_dict["multi_scale_3d_features"]["x_conv4"]
        dense = sp.sparse_to_dense(t.features, t.coords, t.valid, t.grid)
        B, nz, ny, nx, C = dense.shape
        x = dense.transpose(0, 2, 3, 1, 4).reshape(B, ny, nx, nz * C)
        batch_dict["cls_preds"] = self.conv_cls(x).reshape(
            B, -1, self.num_class
        )
        return batch_dict

    def loss(self, batch_dict):
        return _cls_only_loss(self, batch_dict)


class AnchorHeadMultiCls(AnchorHeadSingle):
    """Cls-only grouped multi-head RPN (parity: anchor_head_multi_cls.py:
    9-300 — the reference keeps only the classification branch of
    AnchorHeadMulti; box/dir are commented out). Each RPN group owns a
    contiguous slice of class_names (RPN_HEAD_CFGS order must follow
    CLASS_NAMES, as the reference asserts) and its logits are embedded into
    the global class axis at the group's column offset."""
    model_cfg: dict = None
    input_channels: int = None
    num_class: int = None
    class_names: tuple = None
    grid_size: tuple = None
    point_cloud_range: tuple = None
    predict_boxes_when_training: bool = False

    def setup(self):
        super().setup()
        cfg = self.model_cfg
        head_cfgs = cfg.get("RPN_HEAD_CFGS")
        if head_cfgs:
            self.group_classes = [list(h["HEAD_CLS_NAME"]) for h in head_cfgs]
        else:
            self.group_classes = [[c] for c in self.class_names]
        flat = [c for g in self.group_classes for c in g]
        assert flat == list(self.class_names), (
            "RPN_HEAD_CFGS must partition CLASS_NAMES in order"
        )
        shared_ch = int(cfg.get("SHARED_CONV_NUM_FILTER", 0) or 0)
        self.shared_conv_m = (
            nn.Conv(shared_ch, (3, 3), name="shared_conv") if shared_ch
            else None
        )
        # anchors per class at one location (same for every class cfg here)
        a_per_class = self.num_anchors_per_location // self.num_class
        convs = []
        for gi, names in enumerate(self.group_classes):
            convs.append(nn.Conv(
                a_per_class * len(names), (1, 1), name=f"conv_cls_g{gi}",
                bias_init=nn.initializers.constant(
                    -float(np.log((1 - 0.01) / 0.01))
                ),
            ))
        self.group_convs = convs
        self._a_per_class = a_per_class

    def __call__(self, batch_dict, training=False):
        x = batch_dict["spatial_features_2d"]
        if self.shared_conv_m is not None:
            x = nn.relu(self.shared_conv_m(x))
        B, H, W, _ = x.shape
        per_loc = []  # per-location logits, global class axis
        col = 0
        for names, conv in zip(self.group_classes, self.group_convs):
            n_g = len(names)
            a = self._a_per_class
            # channel layout is class-major to match generate_anchors'
            # per-location ordering ([class0's a anchors, class1's, ...])
            g = conv(x).reshape(B, H * W, n_g * a)
            # one column per own class, zeros elsewhere (reference scatters
            # group logits into a (num_class+1)-wide one-hot layout)
            full = jnp.zeros((B, H * W, n_g * a, self.num_class), g.dtype)
            rows = jnp.arange(n_g * a)
            cols = col + jnp.repeat(jnp.arange(n_g), a)
            full = full.at[:, :, rows, cols].set(g)
            per_loc.append(full)
            col += n_g
        cls_preds = jnp.concatenate(per_loc, axis=2).reshape(
            B, -1, self.num_class
        )
        batch_dict["cls_preds"] = cls_preds
        return batch_dict

    def loss(self, batch_dict):
        return _cls_only_loss(self, batch_dict)
