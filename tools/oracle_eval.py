"""Oracle certification of the deployed detection path.

Isolates decode + NMS + AP plumbing from training dynamics (VERDICT r2
item 1a): run the REAL eval-mode forward of the deployed fast_cpc
distillation model (random weights are fine — only its candidate/vote
positions are used), then bypass the learned classifier/regressor by
injecting GT-derived predictions at the model's actual vote positions:

  * reg:  PointBinResidualCoder.encode(gt_box_at(vote), vote) — then run
    the deployed decode (the same ``box_coder.decode`` call the head uses,
    models/dense_heads/point_head_vote.py:297) to produce batch_box_preds.
  * cls:  logits +8 for the containing box's class at in-box votes (ball
    constraint, the head's own assign_targets_mask), -8 everywhere else.

The injected batch then goes through the UNMODIFIED deployed chain:
Detector3DTemplate.post_processing (multi_thresh NMS with the shipped
per-class SCORE_THRESH [0.62, 0.3, 0.3]) -> camera-frame annos -> the full
official KITTI protocol (eval/kitti_eval.py). If that chain is correct,
Car 3D AP must be ~100 on synthetic scenes; anything else is a plumbing
bug independent of what the network learned.

Reference chain being certified: pcdet post_processing
(detector3d_template.py:207-349) -> multi_thresh (model_nms_utils.py:52-87)
-> get_official_eval_result (kitti_object_eval_python/eval.py).

Usage: python tools/oracle_eval.py [--scenes 12] [--points 16384]
       [--scale full|small] [--cpu] [--out artifacts/oracle_eval.json]
"""
import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def make_oracle(cfg, meta, example_batch, seed=1, mode="model"):
    """Build the oracle once (model, params, jitted fns); returns a
    callable(batch, gt_np) -> (pred, recall, aux, wall_s) reusable across
    same-shaped batches without recompiling. batch is an eval batch dict
    (points/points_mask/batch_size); gt_np (B, M, 8) numpy with class idx
    in col 7 (0 rows invalid).

    mode="model": inject at the real eval forward's vote positions — also
      measures the deployed candidate coverage of the GT boxes.
    mode="pure":  inject at hand-built positions guaranteed to cover every
      GT (its center + 3 jittered copies, rest scene points) — pure
      plumbing: AP must be ~100 regardless of model sampling.
    """
    import jax
    import jax.numpy as jnp

    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.models.dense_heads.point_head_vote import (
        assign_targets_mask,
    )
    from tsm_det_pointcloud_tpu.ops.box_coder_utils import PointBinResidualCoder

    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=meta)
    num_class = len(cfg.CLASS_NAMES)
    tc = cfg.MODEL.POINT_HEAD["TARGET_CONFIG"]
    coder = PointBinResidualCoder(**dict(tc.get("BOX_CODER_CONFIG", {})))
    radius = float(tc.get("GT_CENTRAL_RADIUS", 10.0))
    lo, hi = cfg.MODEL.POINT_HEAD["SAMPLE_RANGE"]
    M = hi - lo

    variables = None
    if mode == "model":
        variables = jax.jit(lambda r, b: model.init(r, b, training=False))(
            jax.random.PRNGKey(seed), dict(example_batch)
        )

    def inject_and_post(out, votes, valid, gt, gtm, key):
        """GT-derived predictions at `votes` through the deployed decode +
        post-processing. Distinct per-row scores: the official protocol's
        41 score cutoffs collapse when every detection ties, so jitter
        fg logits by U(0,1) — all stay above every SCORE_THRESH."""
        labels, reg_labels, _ = assign_targets_mask(votes, gt, gtm, coder, radius)
        fg = (labels > 0) & valid
        one_hot = jax.nn.one_hot(jnp.clip(labels - 1, 0), num_class) * fg[..., None]
        jitter = jax.random.uniform(key, labels.shape)[..., None]
        out["batch_cls_preds"] = jnp.where(one_hot > 0, 8.0 + jitter, -8.0)
        out["batch_box_preds"] = coder.decode(reg_labels, votes)
        out["cls_preds_normalized"] = False
        out["gt_boxes"] = gt
        out["gt_boxes_mask"] = gtm
        pred, recall = model.apply(
            {}, out, method=lambda m, bd: m.post_processing(bd)
        )
        # coverage: GTs owning at least one fg vote (achievable recall)
        d2 = jnp.sum(
            (votes[:, :, None, :] - gt[:, None, :, :3]) ** 2, -1)
        near = d2 <= (jnp.minimum(gt[:, None, :, 3], gt[:, None, :, 4])
                      / 2.0) ** 2
        covered = (near & fg[:, :, None] & gtm[:, None, :]).any(1)
        aux = {"n_fg": fg.sum(), "covered": covered.sum(),
               "gt_total": gtm.sum()}
        return pred, recall, aux

    @jax.jit
    def oracle_model(v, b, gt, gtm, key):
        # the real deployed forward supplies candidate/vote positions
        out = model.apply(v, dict(b), training=False)
        votes = out["point_vote_coords"]                 # (B, M, 3)
        valid = out["s_point_valid"][:, lo:hi]           # (B, M)
        return inject_and_post(out, votes, valid, gt, gtm, key)

    @jax.jit
    def oracle_pure(b, gt, gtm, key):
        # hand-built positions: per GT its center + 3 jittered interior
        # copies, remaining slots filled from the scene points
        B = gt.shape[0]
        pts = b["points"][..., :3]
        votes = pts[:, :M, :]
        ctr = gt[..., :3]                               # (B, G, 3)
        jit3 = jax.random.uniform(key, (B, 3) + ctr.shape[1:],
                                  minval=-0.3, maxval=0.3)
        planted = jnp.concatenate(
            [ctr[:, None]] + [ctr[:, None] + jit3[:, i:i + 1]
                              for i in range(3)], 1,
        ).reshape(B, -1, 3)                             # (B, 4G, 3)
        nP = planted.shape[1]
        votes = jnp.concatenate([planted, votes[:, nP:]], 1)
        valid = jnp.ones(votes.shape[:2], bool)
        out = {"batch_size": B}
        return inject_and_post(out, votes, valid, gt, gtm,
                               jax.random.fold_in(key, 1))

    def run(batch, gt_np, key_seed=0):
        t0 = time.time()
        gt = jnp.asarray(gt_np)
        gtm = jnp.asarray(gt_np[..., :7].any(-1))
        key = jax.random.fold_in(jax.random.PRNGKey(seed + 100), key_seed)
        if mode == "pure":
            pred, recall, aux = oracle_pure(dict(batch), gt, gtm, key)
        else:
            pred, recall, aux = oracle_model(variables, batch, gt, gtm, key)
        pred = {k: np.asarray(v) for k, v in pred.items()}
        recall = {k: float(v) for k, v in recall.items()}
        aux = {k: int(v) for k, v in aux.items()}
        return pred, recall, aux, time.time() - t0

    return run


def run_oracle(cfg, meta, batch, gt_np, seed=1, mode="model"):
    """One-shot convenience wrapper over make_oracle."""
    return make_oracle(cfg, meta, batch, seed=seed, mode=mode)(batch, gt_np)


def main():
    ap = argparse.ArgumentParser()
    # >= 40 scenes (200 GT): the official protocol fills at most one of its
    # 41 threshold slots per TP at recall spacing 1/num_gt, so num_gt < ~160
    # caps AP_R40 below 100 even for PERFECT detections (a property of the
    # reference protocol, eval.py get_thresholds/get_mAP_R40 — verified
    # against hand-built perfect detections, see tests/test_oracle_*)
    ap.add_argument("--scenes", type=int, default=40)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--scale", choices=["full", "small"], default="full")
    ap.add_argument("--mode", choices=["model", "pure"], default="model")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tools.sanity_overfit import (
        cam_anno,
        lidar_boxes_to_cam,
        make_batch,
        shrink_cfg,
    )
    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.eval.kitti_eval import get_official_eval_result
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
        DatasetMeta,
    )
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    root = pathlib.Path(__file__).resolve().parent.parent
    N = args.points
    meta = DatasetMeta(
        class_names=("Car", "Pedestrian", "Cyclist"),
        point_cloud_range=(0, -40, -3, 70.4, 40, 1),
        voxel_size=(0.05, 0.05, 0.1), grid_size=(1408, 1600, 40),
        max_voxels=16000, max_points_per_voxel=5,
        num_point_features=4, max_points=N,
    )
    cfg = cfg_from_yaml_file(
        str(root / "tools/cfgs/kitti_models/fast_cpc.yaml"),
        EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}),
    )
    if args.scale == "small":
        shrink_cfg(cfg, N)

    rng = np.random.default_rng(1234)
    gt_annos, dt_annos = [], []
    total_time = 0.0
    recall_sum = {}
    n_fg_total = 0
    covered_total = 0
    gt_count_total = 0
    args.scenes -= args.scenes % args.batch  # one compiled shape
    batch0, gt0 = make_batch(rng, args.batch, N, jnp)
    ev0 = {"points": batch0["points"], "points_mask": batch0["points_mask"],
           "batch_size": args.batch}
    oracle = make_oracle(cfg, meta, ev0, mode=args.mode)
    for s0 in range(0, args.scenes, args.batch):
        b = args.batch
        if s0 == 0:
            batch, gt_np = batch0, gt0
        else:
            batch, gt_np = make_batch(rng, b, N, jnp)
        ev = {"points": batch["points"], "points_mask": batch["points_mask"],
              "batch_size": b}
        pred, recall, aux, dt = oracle(ev, gt_np, key_seed=s0)
        total_time += dt
        n_fg_total += aux["n_fg"]
        covered_total = covered_total + aux["covered"]
        gt_count_total = gt_count_total + aux["gt_total"]
        for k, v in recall.items():
            recall_sum[k] = recall_sum.get(k, 0.0) + v
        for i in range(b):
            gt_annos.append(cam_anno(
                lidar_boxes_to_cam(gt_np[i, :5, :7]), ["Car"] * 5))
            k = int(pred["count"][i])
            dt_annos.append(cam_anno(
                lidar_boxes_to_cam(pred["pred_boxes"][i, :k])
                if k else np.zeros((0, 7)),
                ["Car"] * k, scores=pred["pred_scores"][i, :k]))
        print(f"scenes {s0}..{s0 + b}: det_counts "
              f"{pred['count'].tolist()} n_fg {aux['n_fg']}", flush=True)

    _, ret = get_official_eval_result(gt_annos, dt_annos, ["Car"])
    res = {
        "metric": "oracle_detection_path",
        "mode": args.mode,
        "scenes": args.scenes, "points": N, "scale": args.scale,
        "n_fg_votes": int(n_fg_total),
        "gt_coverage": round(covered_total / max(gt_count_total, 1), 4),
        "ap_3d_moderate_R40": round(float(ret["Car_3d/moderate_R40"]), 2),
        "ap_bev_moderate_R40": round(float(ret["Car_bev/moderate_R40"]), 2),
        "recall_rcnn_0.5": round(
            recall_sum.get("rcnn_0.5", 0.0) / max(recall_sum.get("gt", 1), 1), 4),
        "recall_rcnn_0.7": round(
            recall_sum.get("rcnn_0.7", 0.0) / max(recall_sum.get("gt", 1), 1), 4),
        "wall_s": round(total_time, 1),
    }
    res["pass"] = bool(res["ap_3d_moderate_R40"] >= 95.0)
    print(json.dumps(res), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
    sys.exit(0 if res["pass"] else 1)


if __name__ == "__main__":
    main()
