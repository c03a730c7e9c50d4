"""On-device sanity fit: overfit the TSM pipeline on synthetic scenes.

Phase 1 trains the full teacher model (PointHeadVoteSASAStatistic — vote +
cls + box + SASA losses, statistics momentum updates) on a handful of
synthetic scenes with known car boxes; phase 2 (--phase2) transfers the
teacher into the distillation model (frozen teacher branch + trainable
student, the fast_cpc recipe) and trains the student. Checks per phase:
(a) the loss drops by a large factor, (b) post-processed detections land
on the ground truth, and (c) with --val, held-out synthetic scenes score a
nonzero Car AP through the FULL official KITTI protocol
(eval/kitti_eval.py) — the closest available proxy for the reference's
res_kitti.txt eval until real data exists.

This exercises the entire learning loop (target assignment, losses,
optimizer, BN/statistics state, teacher->student transfer, official
metrics) — a much stronger signal than finiteness checks.

Usage: python tools/sanity_overfit.py [--steps 300] [--scale small|full]
       [--phase2] [--val] [--out artifact.json]
Prints one JSON line per phase + writes the combined artifact to --out.
"""
import argparse
import os

# Training graphs tip the 256-channel bykey convs over the 16 MB scoped-
# VMEM stack at the plain model's picks (operand relayout copies from
# while-loop carries); the tight model degrades them one ladder rung.
os.environ.setdefault("TSM_BYKEY_TIGHT_VMEM", "1")
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def make_scene(rng, n_points, boxes):
    """Points on box surfaces + ground clutter. boxes (M, 7)."""
    pts = np.zeros((n_points, 4), np.float32)
    # ground plane clutter (same compact extent as the boxes)
    pts[:, 0] = rng.uniform(0.0, 32.0, n_points)
    pts[:, 1] = rng.uniform(-16.0, 16.0, n_points)
    pts[:, 2] = rng.uniform(-1.9, -1.6, n_points)
    pts[:, 3] = rng.uniform(0, 1, n_points)
    # Dense on-object clusters: the backbone's fusion sampling (FPS +
    # confidence s-fps) allocates candidates by spatial extent, so thin
    # 400-point surface shells yield only a handful of on-object
    # candidates per scene — too few for the cls quality labels to
    # bootstrap in a few hundred steps. The sanity question is the
    # learning loop, not FPS sample-efficiency on sparse shells.
    per = 1200
    for bi, (cx, cy, cz, dx, dy, dz, ry) in enumerate(boxes):
        s = slice(bi * per, (bi + 1) * per)
        # sample on the box's top + sides in the box frame
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


def sample_boxes(rng, k=5):
    # compact scene: FPS/s-fps allocate candidates by spatial extent, so
    # boxes scattered over the full 69 x 78 m range get ~1-3 candidates
    # each; a 32 x 32 m scene with 1.5 m-tall boxes over a thin ground
    # slab gives object points enough extent share to bootstrap the cls
    # quality labels within a few hundred steps.
    # Centers are rejection-sampled >= 5 m apart: overlapping cars are
    # physically impossible on real KITTI, and two GT overlapping above
    # the deployed NMS_THRESH (0.1) make even PERFECT detections
    # unrecoverable — one of the two is correctly suppressed (verified via
    # tools/oracle_eval.py), which would corrupt every recovery gate here.
    centers = []
    while len(centers) < k:
        c = np.array([rng.uniform(8, 28), rng.uniform(-12, 12)])
        if all(np.linalg.norm(c - p) >= 5.0 for p in centers):
            centers.append(c)
    boxes = []
    for cx, cy in centers:
        boxes.append([cx, cy, rng.uniform(-1.2, -0.8), 3.9, 1.6, 1.56,
                      rng.uniform(-np.pi, np.pi)])
    return np.asarray(boxes, np.float32)


def make_batch(rng, batch, n_points, jnp):
    gt = np.zeros((batch, 12, 8), np.float32)
    gtm = np.zeros((batch, 12), bool)
    pts = np.zeros((batch, n_points, 4), np.float32)
    for b in range(batch):
        boxes = sample_boxes(rng)
        pts[b] = make_scene(rng, n_points, boxes)
        gt[b, :5, :7] = boxes
        gt[b, :5, 7] = 1  # Car
        gtm[b, :5] = True
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


def shrink_cfg(cfg, n_points):
    """Small-scale overrides for CPU debugging (same topology, fewer
    samples)."""
    sa = cfg.MODEL.BACKBONE_3D.SA_CONFIG
    sa.NPOINT_LIST = [[1024], [256]]
    sa.SAMPLE_RANGE_LIST = [[[0, n_points]], [[0, 1024]]]
    if "S_SA_CONFIG" in cfg.MODEL.BACKBONE_3D:
        ssa = cfg.MODEL.BACKBONE_3D.S_SA_CONFIG
        ssa.NPOINT_LIST = [[1024], [256]]
        ssa.SAMPLE_RANGE_LIST = [[[0, n_points]], [[0, 1024]]]
    cfg.MODEL.POINT_HEAD.SAMPLE_RANGE = [0, 256]
    return cfg


def run_phase(cfg, meta, args, train_batches, gt_np, val_scenes,
              init_params=None, init_statistics=None, tag="teacher",
              stat_mode="learned"):
    # train_batches: list of same-shaped batch dicts. One batch = the
    # classic overfit; several = a small FIT over varied scenes (cycled
    # per step), which is what a nonzero held-out val AP requires.
    train_batch = train_batches[0]
    nb = len(train_batches)
    import jax
    import jax.numpy as jnp
    import optax

    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.ops.iou3d import boxes_iou3d
    from tsm_det_pointcloud_tpu.runtime.checkpoint import (
        partial_load,
        transfer_statistics,
    )
    from tsm_det_pointcloud_tpu.runtime.optimization import build_optimizer
    from tsm_det_pointcloud_tpu.parallel.train_state import wrap_student_only

    # sanity threshold: the cls target is centerness x RDIoU quality
    # (capped well below 1 off-center), so a correctly-overfit model's
    # best candidates can sit under the deployment SCORE_THRESH (0.62
    # Car). The sanity question is "do detections land on the planted
    # boxes", so score-gate at 0.2 and let NMS + IoU>0.5 do the judging.
    pp = cfg.MODEL.POST_PROCESSING
    pp["SCORE_THRESH"] = [0.2] * len(
        pp.get("SCORE_THRESH", [0.2, 0.2, 0.2]))
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=meta)
    variables = jax.jit(lambda r, b: model.init(r, b, training=True))(
        jax.random.PRNGKey(1), dict(train_batch))
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    distill = tag == "student"
    if init_params is not None:
        params = partial_load(params, init_params)
    if init_statistics is not None and "statistics" in rest:
        rest["statistics"] = transfer_statistics(
            rest["statistics"], init_statistics
        )
    if stat_mode == "ones" and "statistics" in rest:
        # Controlled ablation (VERDICT r2 #1b): freeze the class-statistic
        # buffers at ONES and skip their momentum updates. Frozen-at-ZERO
        # is provably dead (cond = shared * 0 -> constant logits, zero cls
        # gradient — verified by grad probe, SURVEY §8b); ones removes the
        # multiplicative saturation mechanism (buffers bootstrapping to
        # magnitude ~40 within ~100 repeated-data steps, reference
        # code_board.py:884-901 dynamics) while keeping the architecture
        # unchanged — the regime real-data long schedules approximate.
        def _force(path, v):
            name = getattr(path[-1], "key", str(path[-1]))
            return (jnp.ones_like(v) if name == "object_statistic_features"
                    else jnp.zeros_like(v))

        rest["statistics"] = jax.tree_util.tree_map_with_path(
            _force, rest["statistics"]
        )
    mutable_cols = (["batch_stats", "statistics"] if stat_mode == "learned"
                    else ["batch_stats"])
    tx, _ = build_optimizer(dict(cfg.OPTIMIZATION), total_steps=args.steps)
    if distill:
        tx = wrap_student_only(tx, params)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, rest, batch, it):
        batch = dict(batch)
        batch["accumulated_iter"] = it
        ret, upd = model.apply(
            {"params": p, **rest}, batch, training=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=mutable_cols,
        )
        tb = {k: v for k, v in ret.get("tb_dict", {}).items()}
        return ret["loss"], (upd, tb)

    import functools

    tb_shapes = jax.eval_shape(
        lambda p, r: loss_fn(p, r, train_batch, jnp.int32(0))[1][1],
        params, rest)
    tb_keys = tuple(sorted(tb_shapes.keys()))

    # several train batches -> stack the array leaves once and cycle
    # per step (it % nb) inside the jit
    arr_keys = [k for k, v in train_batch.items() if hasattr(v, "ndim")]
    stacked = ({k: jnp.stack([jnp.asarray(b[k]) for b in train_batches])
                for k in arr_keys} if nb > 1 else None)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(p, os_, rest, it0, n):
        def step(i, carry):
            p, os_, rest, acc, tbacc = carry
            if nb > 1:
                bi = (it0 + i) % nb
                b = {**train_batch,
                     **{k: stacked[k][bi] for k in arr_keys}}
            else:
                b = train_batch
            (l, (upd, tbd)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, rest, b, it0 + i)
            u, os_ = tx.update(g, os_, p)
            p = optax.apply_updates(p, u)
            rest = {**rest, **{k: upd[k] for k in upd}}
            tbacc = {k: tbacc[k].at[i].set(
                jnp.asarray(tbd[k], jnp.float32).reshape(())) for k in
                tb_keys}
            return p, os_, rest, acc.at[i].set(l), tbacc
        acc = jnp.zeros((n,), jnp.float32)
        tbacc = {k: jnp.zeros((n,), jnp.float32) for k in tb_keys}
        return jax.lax.fori_loop(0, n, step, (p, os_, rest, acc, tbacc))

    chunk = min(50, args.steps)
    losses = []
    it = 0
    t0 = time.time()
    while it < args.steps:
        params, opt_state, rest, ls, tbl = run_chunk(
            params, opt_state, rest, jnp.int32(it), chunk)
        ls = np.asarray(ls)
        losses.extend(ls.tolist())
        it += chunk
        comps = " ".join(
            f"{k}={float(np.asarray(v)[-1]):.2f}" for k, v in
            sorted(tbl.items()) if not k.startswith("dbg"))
        print(f"[{tag}] step {it}: loss {ls[-1]:.3f} {comps}", flush=True)

    # eval: detections vs train gt
    @jax.jit
    def infer(v, b):
        out = model.apply(v, b, training=False)
        pred, _ = model.apply(v, out,
                              method=lambda m, bd: m.post_processing(bd))
        return pred

    B = train_batch["batch_size"]
    ev = {"points": train_batch["points"],
          "points_mask": train_batch["points_mask"], "batch_size": B}
    pred = infer({"params": params, **rest}, ev)
    pb = np.asarray(pred["pred_boxes"])
    ps = np.asarray(pred["pred_scores"])
    cnt = np.asarray(pred["count"])
    raw = model.apply({"params": params, **rest}, dict(ev), training=False)
    raw_s = np.asarray(jax.nn.sigmoid(raw["batch_cls_preds"]).max(
        axis=(1, 2)))
    # eval-mode cls-independent box recovery: does ANY eval-forward
    # decoded row land on each planted box? Separates "eval-mode boxes
    # are wrong" from "eval-mode scores are miscalibrated".
    raw_boxes_ev = np.asarray(raw["batch_box_preds"])
    box_hits_ev = 0
    for b in range(B):
        iou_ev = np.asarray(boxes_iou3d(
            jnp.asarray(raw_boxes_ev[b]), jnp.asarray(gt_np[b, :5, :7])))
        box_hits_ev += int((iou_ev.max(axis=0) >= 0.5).sum())
    # statistic-buffer magnitude: the multiplicative class-statistic
    # conditioning starts from ZERO buffers (reference
    # code_board.py:93-95) and only moves once backbone confidence
    # crosses 0.3 (:884-901) — until then the classifier is a constant
    # and phase 2 would inherit a dead conditioner, so surface it.
    stat_mag = float(max(
        (float(np.abs(np.asarray(v)).max()) for v in
         jax.tree_util.tree_leaves(rest.get("statistics", {}))),
        default=0.0,
    ))
    print(f"[{tag}] max score per sample:",
          [round(float(s.max()), 3) for s in ps],
          "raw:", [round(float(s), 3) for s in raw_s],
          f"stat_mag: {stat_mag:.4f}", flush=True)
    # cls-independent box-recovery check: does ANY decoded row land on
    # each planted box at IoU>=0.5? The multiplicative statistic
    # conditioning (a reference property, code_board.py:93-95,965) makes
    # cls calibration saturate and run-to-run unstable at overfit scale
    # (logits blow up when the statistic buffers bootstrap in hundreds
    # rather than tens of thousands of steps), so detection-level hits
    # under a score gate measure that saturation, not the learning loop.
    # Box recovery via the supervised positives exercises votes, the
    # PointBinResidual coder, the reg/RDIoU/corner losses and decode.
    # train-mode forward: batch-stat BN + the T R A I N candidate set.
    # A few-hundred-step overfit memorizes per-candidate outputs; the
    # eval-mode forward picks a slightly different s-fps candidate set
    # under running-average BN, which an overfit (as opposed to a
    # generalizing) model has never seen — so the box-recovery probe must
    # look at the boxes the model was actually trained to produce.
    tr_ev = dict(train_batch)  # training=True needs gt for the loss path
    tr_ev["accumulated_iter"] = jnp.int32(10 ** 6)
    raw_tr = model.apply({"params": params, **rest}, tr_ev, training=True,
                         mutable=["batch_stats", "statistics"])[0]
    raw_boxes = np.asarray(raw_tr["batch_box_preds"])
    votes_tr = np.asarray(raw_tr["point_vote_coords"])
    from tsm_det_pointcloud_tpu.ops.boxes import points_in_boxes_np

    box_hits = 0
    boxes_with_vote = 0  # gt boxes containing >= 1 vote (candidate
    # coverage, cls- and reg-independent): separates "no candidates on
    # the box" from "candidates there but decoded boxes wrong"
    for b in range(B):
        iou_all = np.asarray(boxes_iou3d(
            jnp.asarray(raw_boxes[b]), jnp.asarray(gt_np[b, :5, :7])))
        box_hits += int((iou_all.max(axis=0) >= 0.5).sum())
        vidx = points_in_boxes_np(votes_tr[b], gt_np[b, :5, :7])
        boxes_with_vote += len(set(int(i) for i in vidx if i >= 0))

    hits = 0
    total_gt = 0
    for b in range(B):
        k = cnt[b]
        total_gt += 5
        if k == 0:
            continue
        iou = np.asarray(boxes_iou3d(jnp.asarray(pb[b, :k]),
                                     jnp.asarray(gt_np[b, :5, :7])))
        hits += int((iou.max(axis=0) > 0.5).sum())
        if b == 0:
            np.set_printoptions(precision=2, suppress=True)
            print(f"[{tag}] sample0 top pred boxes (score {ps[b][:2]}):\n",
                  pb[b, :2], "\n gt:\n", gt_np[b, :2, :7],
                  "\n best IoU per gt:", iou.max(axis=0), flush=True)
    first, last = float(np.mean(losses[:10])), float(np.mean(losses[-10:]))

    res = {
        "stat_mag": round(stat_mag, 4),
        "box_hits@0.5": box_hits,
        "box_hits_eval@0.5": box_hits_ev,
        "boxes_with_vote": boxes_with_vote,
        "loss_first10": round(first, 3), "loss_last10": round(last, 3),
        "det_counts": cnt.tolist(),
        "gt_hits@0.5": hits, "gt_total": total_gt,
        "train_s": round(time.time() - t0, 1),
    }

    # held-out val AP via the official protocol
    if val_scenes is not None:
        from tsm_det_pointcloud_tpu.eval.kitti_eval import (
            get_official_eval_result,
        )

        val_batch, val_gt = val_scenes
        vB = val_batch["batch_size"]
        gt_annos, dt_annos = [], []
        for b0 in range(0, vB, B):
            sl = {k: (v[b0:b0 + B] if hasattr(v, "ndim") else v)
                  for k, v in val_batch.items()}
            sl["batch_size"] = B
            vp = infer({"params": params, **rest}, sl)
            vpb, vps = np.asarray(vp["pred_boxes"]), np.asarray(vp["pred_scores"])
            vcnt = np.asarray(vp["count"])
            for b in range(min(B, vB - b0)):
                gt_annos.append(cam_anno(
                    lidar_boxes_to_cam(val_gt[b0 + b, :5, :7]), ["Car"] * 5))
                k = int(vcnt[b])
                dt_annos.append(cam_anno(
                    lidar_boxes_to_cam(vpb[b, :k]) if k else np.zeros((0, 7)),
                    ["Car"] * k, scores=vps[b, :k]))
        _, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])
        res["val_ap_3d_moderate_R40"] = round(float(ret["Car_3d/moderate_R40"]), 2)
        res["val_ap_bev_moderate_R40"] = round(float(ret["Car_bev/moderate_R40"]), 2)

    return res, params, rest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--scale", choices=["full", "small"], default="full")
    ap.add_argument("--phase2", action="store_true",
                    help="also run the distillation phase (fast_cpc.yaml)")
    ap.add_argument("--val", action="store_true",
                    help="score held-out synthetic scenes with official AP")
    # >= 40 scenes (200 GT): the official protocol caps AP_R40 at
    # ~num_gt_matched/40 below ~160 GT even for perfect detections
    # (tests/test_oracle_detection_path.py documents this property)
    ap.add_argument("--val_scenes", type=int, default=40)
    ap.add_argument("--train_scenes", type=int, default=0,
                    help="total distinct training scenes (0 = one batch, "
                         "the classic overfit). More scenes turn the run "
                         "into a small FIT whose held-out val AP can be "
                         "nonzero (overfitting 4 scenes cannot generalize)")
    ap.add_argument("--stat_mode", choices=["learned", "ones"],
                    default="learned",
                    help="'ones' freezes the class-statistic buffers at 1 "
                         "and disables their updates — the controlled "
                         "ablation of the multiplicative conditioning's "
                         "overfit-scale saturation (SURVEY §8b)")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "overrides the JAX_PLATFORMS env var)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
        DatasetMeta,
    )
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    root = pathlib.Path(__file__).resolve().parent.parent
    B, N = args.batch, args.points
    meta = DatasetMeta(
        class_names=("Car", "Pedestrian", "Cyclist"),
        point_cloud_range=(0, -40, -3, 70.4, 40, 1),
        voxel_size=(0.05, 0.05, 0.1), grid_size=(1408, 1600, 40),
        max_voxels=16000, max_points_per_voxel=5,
        num_point_features=4, max_points=N,
    )

    rng = np.random.default_rng(0)
    n_tb = max(1, -(-args.train_scenes // B)) if args.train_scenes else 1
    train_batches = [make_batch(rng, B, N, jnp) for _ in range(n_tb)]
    gt_np = train_batches[0][1]
    train_batches = [b for b, _ in train_batches]
    val_scenes = None
    if args.val:
        vrng = np.random.default_rng(1234)
        vb, vgt = make_batch(vrng, args.val_scenes, N, jnp)
        val_scenes = (vb, vgt)

    def load_cfg(name):
        cfg = cfg_from_yaml_file(
            str(root / f"tools/cfgs/kitti_models/{name}"),
            EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}),
        )
        if args.scale == "small":
            shrink_cfg(cfg, N)
        return cfg

    artifact = {"metric": "tsm_sanity_overfit", "scale": args.scale,
                "steps": args.steps, "batch": B, "points": N,
                "stat_mode": args.stat_mode,
                "train_scenes": args.train_scenes or B}

    cfg1 = load_cfg("fast_cpc_teacher.yaml")
    res1, t_params, t_rest = run_phase(
        cfg1, meta, args, train_batches, gt_np, val_scenes, tag="teacher",
        stat_mode=args.stat_mode)
    # pass = loss collapses AND the supervised box path recovers the
    # planted boxes (box_hits is cls-independent; the statistic-
    # conditioned cls saturates at overfit scale — see run_phase)
    ok1 = (res1["loss_last10"] < res1["loss_first10"] * 0.2
           and res1["box_hits@0.5"] >= res1["gt_total"] * 0.6)
    res1["pass"] = bool(ok1)
    artifact["teacher"] = res1
    print(json.dumps({"phase": "teacher", **res1}), flush=True)

    ok2 = True
    if args.phase2:
        cfg2 = load_cfg("fast_cpc.yaml")
        res2, _, _ = run_phase(
            cfg2, meta, args, train_batches, gt_np, val_scenes,
            init_params=t_params,
            init_statistics=t_rest.get("statistics"), tag="student",
            stat_mode=args.stat_mode)
        ok2 = (res2["loss_last10"] < res2["loss_first10"] * 0.5
               and res2["box_hits@0.5"] >= res2["gt_total"] * 0.5)
        res2["pass"] = bool(ok2)
        artifact["student"] = res2
        print(json.dumps({"phase": "student", **res2}), flush=True)

    artifact["pass"] = bool(ok1 and ok2)
    print(json.dumps(artifact), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
    sys.exit(0 if artifact["pass"] else 1)


if __name__ == "__main__":
    main()
