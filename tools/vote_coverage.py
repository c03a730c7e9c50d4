"""Vote-coverage instrumentation for the deployed sampling chain (VERDICT
r3 #5: model-mode oracle measured gt_coverage 0.765 at RANDOM init).

Measures, per stage of the candidate chain (raw points -> SA-layer
centroids -> head candidates -> SAMPLE_RANGE slice -> fg votes), the
fraction of GT boxes with >= 1 candidate within min(dx, dy)/2 of their
center — the same "achievable recall" metric tools/oracle_eval.py uses —
under two arms:

  random:  freshly initialized params (reproduces the r3 measurement)
  trained: the distillation-proof teacher (artifacts/distill_teacher.pkl),
           i.e. the chain the s-fps confidence pyramid was TRAINED to
           steer (reference: confidence-driven s-fps,
           pointnet2_modules.py:1682-1697 -> next layer's sampling)

The hypothesis to test: the 0.765 hole is a property of measuring at
random init (uninformative s-fps scores), not of the rebuilt chain.

Usage: python tools/vote_coverage.py --scenes 40 --out artifacts/vote_coverage.json
"""
import argparse
import json
import os
import pathlib
import pickle
import sys
import time

os.environ.setdefault("TSM_BYKEY_TIGHT_VMEM", "1")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

from tsm_det_pointcloud_tpu.utils.synthetic_scenes import make_batch

CLASS_MIX = (1, 1, 1, 2, 3)  # the distill-proof training mix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=40)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--teacher_ckpt", default="artifacts/distill_teacher.pkl")
    ap.add_argument("--warm_steps", type=int, default=256,
                    help="train-mode forwards to rebuild BN running stats "
                         "when the ckpt lacks batch_stats (BN momentum is "
                         "0.01, so ~256 steps to converge the running "
                         "stats; ckpts written by the current "
                         "distill_proof.py include batch_stats and skip "
                         "this)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.models.dense_heads.point_head_vote import (
        assign_targets_mask,
    )
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
        DatasetMeta,
    )
    from tsm_det_pointcloud_tpu.ops.box_coder_utils import PointBinResidualCoder
    from tsm_det_pointcloud_tpu.runtime.checkpoint import (
        partial_load, transfer_statistics,
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
        str(root / "tools/cfgs/kitti_models/fast_cpc_teacher.yaml"),
        EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}),
    )
    model = build_network(cfg.MODEL, num_class=3, dataset=meta)
    tc = cfg.MODEL.POINT_HEAD["TARGET_CONFIG"]
    coder = PointBinResidualCoder(**dict(tc.get("BOX_CODER_CONFIG", {})))
    radius = float(tc.get("GT_CENTRAL_RADIUS", 10.0))
    lo, hi = cfg.MODEL.POINT_HEAD["SAMPLE_RANGE"]

    # held-out scene stream (training used default_rng(7); val used 9999)
    rng = np.random.default_rng(424242)
    B = args.batch
    n_batches = max(1, args.scenes // B)
    template, _ = make_batch(rng, B, N, jnp, class_mix=CLASS_MIX)

    init = jax.jit(lambda r, b: model.init(r, b, training=True))
    variables = init(jax.random.PRNGKey(11), dict(template))

    def arm_variables(which):
        if which == "random":
            return variables
        with open(args.teacher_ckpt, "rb") as f:
            saved = pickle.load(f)
        params = partial_load(variables["params"], saved["params"])
        rest = {k: v for k, v in variables.items() if k != "params"}
        if saved.get("statistics") is not None and "statistics" in rest:
            rest["statistics"] = transfer_statistics(
                rest["statistics"], saved["statistics"])
        if "batch_stats" in saved:
            rest["batch_stats"] = saved["batch_stats"]
            return {"params": params, **rest}
        # re-warm BN running stats with train-mode forwards on the
        # TRAINING scene stream (default_rng(7), matching the proof run)
        wrng = np.random.default_rng(7)

        @jax.jit
        def warm(v, b):
            # statistics mutable so the train-mode forward traces, but the
            # update is DISCARDED — only BN stats are re-warmed
            _, upd = model.apply(v, dict(b), training=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)},
                                 mutable=["batch_stats", "statistics"])
            return upd["batch_stats"]

        cur = {"params": params, **rest}
        for _ in range(args.warm_steps):
            wb, _ = make_batch(wrng, B, N, jnp, class_mix=CLASS_MIX)
            wb["accumulated_iter"] = jnp.int32(0)
            cur = {**cur, "batch_stats": warm(cur, wb)}
        return cur

    @jax.jit
    def stages(v, b, gt, gtm):
        """Per-stage (covered_gt, gt_total) under the near-center metric."""
        out = model.apply(v, dict(b), training=False)

        def near_cover(xyz, valid):
            d2 = jnp.sum((xyz[:, :, None, :] - gt[:, None, :, :3]) ** 2, -1)
            r2 = (jnp.minimum(gt[:, None, :, 3], gt[:, None, :, 4]) / 2.0) ** 2
            return ((d2 <= r2) & valid[:, :, None] & gtm[:, None, :]).any(1)

        res = {}
        res["raw_points"] = near_cover(
            b["points"][..., :3], b["points_mask"])
        for i, (xyz, vl) in enumerate(zip(out.get("point_coords_list", []),
                                          out.get("point_valid_list", []))):
            res[f"sa_layer_{i}"] = near_cover(xyz, vl)
        cand_xyz = out["point_coords"][..., :3]
        cand_valid = out["point_valid"]
        res["head_candidates"] = near_cover(cand_xyz, cand_valid)
        res["sample_range"] = near_cover(
            cand_xyz[:, lo:hi], cand_valid[:, lo:hi])
        votes = out["point_vote_coords"]
        vvalid = cand_valid[:, lo:hi]
        labels, _, _ = assign_targets_mask(votes, gt, gtm, coder, radius)
        res["fg_votes"] = near_cover(votes, (labels > 0) & vvalid)
        return {k: (v.sum(), gtm.sum()) for k, v in res.items()}

    results = {}
    for which in ("random", "trained"):
        v = arm_variables(which)
        srng = np.random.default_rng(424242)
        totals = {}
        t0 = time.time()
        for i in range(n_batches):
            b, gt_np = make_batch(srng, B, N, jnp, class_mix=CLASS_MIX)
            gt = jnp.asarray(gt_np)
            gtm = jnp.asarray(gt_np[..., :7].any(-1))
            b.pop("gt_boxes"), b.pop("gt_boxes_mask")
            out = stages(v, b, gt, gtm)
            for k, (c, t) in out.items():
                cc, tt = totals.get(k, (0, 0))
                totals[k] = (cc + int(c), tt + int(t))
        results[which] = {
            k: round(c / max(t, 1), 4) for k, (c, t) in totals.items()}
        results[which]["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps({which: results[which]}), flush=True)

    artifact = {
        "metric": "vote_coverage_by_stage",
        "scenes": n_batches * B, "points": N, "class_mix": list(CLASS_MIX),
        "near_metric": "candidate within min(dx,dy)/2 of gt center",
        **results,
        "verdict_r3_random_init_value": 0.765,
    }
    print(json.dumps(artifact), flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)


if __name__ == "__main__":
    main()
