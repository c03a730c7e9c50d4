"""End-to-end proof of the TSM distillation + class-statistics mechanism.

The paper's contribution (reference point_head_vote_sasa_statistic_
distillation.py; statistic momentum update code_board.py:884-901) is a
student conditioned on transferable class statistics distilled from a
frozen teacher. This harness proves the rebuilt mechanism works — on a
"mini-KITTI" of varied multi-class synthetic scenes, with the DEPLOYED
statistics pathway (momentum updates on, no ablation) — by gating on:

  (a) BOUNDED: the statistic buffers stay bounded and the cls logits stay
      finite through phase-1 teacher training (the r2 "saturation ghost"
      was measured on 4 repeated scenes; this is the varied-data regime).
  (b) CLOSE:   the distilled student's held-out Car 3D AP (official KITTI
      protocol, R40) lands within 10 points of its teacher.
  (c) HELPS:   the student trained with the transferred statistics beats
      (>=) the same student with the conditioning ablated to ones.

Phases (each a full on-chip training run):
  1   teacher  (fast_cpc_teacher.yaml, statistics LEARNED)   -> ckpt
  2a  student  (fast_cpc.yaml, statistics transferred from 1)
  2b  student  (fast_cpc.yaml, statistics forced to ones)     [A/B arm]

Usage:
  python tools/distill_proof.py --train_scenes 256 --steps 2400 \
      --out artifacts/distill_proof.json
  # iterate on phase 2 without retraining the teacher:
  python tools/distill_proof.py --teacher_ckpt artifacts/distill_teacher.pkl

Writes one JSON artifact with per-phase series (loss, stat magnitude, max
|logit|) and the three gates.
"""
import argparse
import functools
import json
import os
import pathlib
import pickle
import sys
import time

os.environ.setdefault("TSM_BYKEY_TIGHT_VMEM", "1")  # train graphs: see
# tools/sanity_overfit.py — 256-ch conv relayouts vs the 16 MB VMEM stack

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

from tsm_det_pointcloud_tpu.utils.synthetic_scenes import (
    CLASS_NAMES,
    HARD_V1,
    cam_anno,
    lidar_boxes_to_cam,
    make_batch,
)

CLASS_MIX = (1, 1, 1, 2, 3)  # 3 cars + 1 pedestrian + 1 cyclist per scene
# hard preset: denser scenes — 4 cars + 2 peds + 2 cyclists
CLASS_MIX_HARD = (1, 1, 1, 1, 2, 2, 3, 3)


def run_phase(cfg, meta, args, stacked_scenes, val_scenes, init_params=None,
              init_statistics=None, tag="teacher", stat_mode="learned",
              steps=None, eval_at=()):
    """One full training phase + held-out official-protocol eval.

    stacked_scenes: dict of stacked leaves (nb, B, ...) + template batch.
    stat_mode: 'learned' = the DEPLOYED pathway (teacher phase updates the
    buffers; the distillation head never does, matching the reference's
    disabled update :1045-1060). 'ones' = the conditioning ablation arm.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.runtime.checkpoint import (
        partial_load,
        transfer_statistics,
    )
    from tsm_det_pointcloud_tpu.runtime.optimization import build_optimizer
    from tsm_det_pointcloud_tpu.parallel.train_state import wrap_student_only

    template = stacked_scenes["template"]
    stacked = stacked_scenes["stacked"]
    arr_keys = stacked_scenes["arr_keys"]
    nb = stacked_scenes["nb"]

    # quality cls targets (centerness x RDIoU) cap well below 1 off-center,
    # so gate at 0.2 and let NMS + the protocol's IoU matching judge
    pp = cfg.MODEL.POST_PROCESSING
    pp["SCORE_THRESH"] = [0.2] * len(pp.get("SCORE_THRESH", [0.2] * 3))
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=meta)
    variables = jax.jit(lambda r, b: model.init(r, b, training=True))(
        jax.random.PRNGKey(1), dict(template))
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    distill = tag.startswith("student")
    if init_params is not None:
        params = partial_load(params, init_params)
    if init_statistics is not None and "statistics" in rest:
        rest["statistics"] = transfer_statistics(
            rest["statistics"], init_statistics)
    if stat_mode == "ones" and "statistics" in rest:
        def _force(path, v):
            name = getattr(path[-1], "key", str(path[-1]))
            return (jnp.ones_like(v) if name == "object_statistic_features"
                    else jnp.zeros_like(v))
        rest["statistics"] = jax.tree_util.tree_map_with_path(
            _force, rest["statistics"])
    # the distillation head never updates the buffers (reference parity);
    # 'ones' additionally freezes them in the teacher phase
    mutable_cols = (["batch_stats", "statistics"]
                    if (stat_mode == "learned" and not distill)
                    else ["batch_stats"])
    opt_cfg = dict(cfg.OPTIMIZATION)
    if distill and getattr(args, "lr_scale", 1.0) != 1.0:
        # Compressed-regime delta (documented): the student's cls path is
        # multiplicatively conditioned on transferred statistics of
        # magnitude ~55, so the reference LR (tuned for 93k-iter real-data
        # schedules) saturates the fresh student cls block within a few
        # hundred mini-KITTI steps (logits +-30, flat cls loss). Scale the
        # student phase's peak LR; the reference uses the same LR for both
        # phases but a 23x longer schedule on 14x more data.
        opt_cfg["LR"] = float(opt_cfg["LR"]) * args.lr_scale
    steps = args.steps if steps is None else steps
    tx, _ = build_optimizer(opt_cfg, total_steps=steps)
    if distill:
        tx = wrap_student_only(tx, params)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, rest, batch, it):
        batch = dict(batch)
        batch["accumulated_iter"] = it
        ret, upd = model.apply(
            {"params": p, **rest}, batch, training=True,
            rngs={"dropout": jax.random.PRNGKey(2)}, mutable=mutable_cols)
        tb = dict(ret.get("tb_dict", {}))
        tb["max_abs_logit"] = jnp.abs(ret["batch_cls_preds"]).max()
        return ret["loss"], (upd, tb)

    tb_shapes = jax.eval_shape(
        lambda p, r: loss_fn(p, r, template, jnp.int32(0))[1][1],
        params, rest)
    tb_keys = tuple(sorted(tb_shapes.keys()))

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(p, os_, rest, it0, n):
        def step(i, carry):
            p, os_, rest, acc, tbacc = carry
            bi = (it0 + i) % nb
            b = {**template, **{k: stacked[k][bi] for k in arr_keys}}
            (l, (upd, tbd)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, rest, b, it0 + i)
            u, os_ = tx.update(g, os_, p)
            p = optax.apply_updates(p, u)
            rest = {**rest, **{k: upd[k] for k in upd}}
            tbacc = {k: tbacc[k].at[i].set(
                jnp.asarray(tbd[k], jnp.float32).reshape(())) for k in tb_keys}
            return p, os_, rest, acc.at[i].set(l), tbacc
        acc = jnp.zeros((n,), jnp.float32)
        tbacc = {k: jnp.zeros((n,), jnp.float32) for k in tb_keys}
        return jax.lax.fori_loop(0, n, step, (p, os_, rest, acc, tbacc))

    # ---- held-out eval through the deployed path + official protocol ----
    @jax.jit
    def infer(v, b):
        out = model.apply(v, b, training=False)
        pred, _ = model.apply(
            v, out, method=lambda m, bd: m.post_processing(bd))
        return pred

    from tsm_det_pointcloud_tpu.eval.kitti_eval import get_official_eval_result

    val_batch, val_gt = val_scenes
    names = list(cfg.CLASS_NAMES)

    def do_eval(p, r, boot=0):
        B = template["batch_size"]
        vB = val_batch["batch_size"]
        gt_annos, dt_annos = [], []
        for b0 in range(0, vB, B):
            sl = {k: (v[b0:b0 + B] if hasattr(v, "ndim") else v)
                  for k, v in val_batch.items()}
            sl["batch_size"] = B
            sl.pop("gt_boxes", None), sl.pop("gt_boxes_mask", None)
            vp = infer({"params": p, **r}, sl)
            vpb = np.asarray(vp["pred_boxes"])
            vps = np.asarray(vp["pred_scores"])
            vpl = np.asarray(vp["pred_labels"])
            vcnt = np.asarray(vp["count"])
            for b in range(min(B, vB - b0)):
                g = val_gt[b0 + b]
                gm = g[:, 3] > 0  # zero-padded rows have zero size
                gt_annos.append(cam_anno(
                    lidar_boxes_to_cam(g[gm, :7]),
                    [CLASS_NAMES[int(c)] for c in g[gm, 7]]))
                k = int(vcnt[b])
                dt_annos.append(cam_anno(
                    lidar_boxes_to_cam(vpb[b, :k]) if k else np.zeros((0, 7)),
                    [names[int(l) - 1] for l in vpl[b, :k]],
                    scores=vps[b, :k]))
        _, ret = get_official_eval_result(gt_annos, dt_annos, names)
        out = {
            "val_car_3d_mod_R40": round(float(ret["Car_3d/moderate_R40"]), 2),
            "val_car_bev_mod_R40": round(float(ret["Car_bev/moderate_R40"]), 2),
        }
        for cls in ("Pedestrian", "Cyclist"):
            key = f"{cls}_3d/moderate_R40"
            if key in ret:
                out[f"val_{cls.lower()[:3]}_3d_mod_R40"] = round(
                    float(ret[key]), 2)
        # per-class variance (VERDICT r4 #1): bootstrap over val scenes —
        # without this, small-val per-class AP deltas were unjudgeable
        if boot:
            brng = np.random.default_rng(123)
            samples = {c: [] for c in names}
            for _ in range(boot):
                idx = brng.integers(0, len(gt_annos), len(gt_annos))
                _, rr = get_official_eval_result(
                    [gt_annos[i] for i in idx], [dt_annos[i] for i in idx],
                    names)
                for c in names:
                    key = f"{c}_3d/moderate_R40"
                    if key in rr:
                        samples[c].append(float(rr[key]))
            out["val_boot_std"] = {
                c: round(float(np.std(v)), 2)
                for c, v in samples.items() if v}
        return out

    chunk = min(100, steps)
    series = {"loss": [], "stat_mag": [], "max_abs_logit": []}
    evals_at = {}
    eval_pending = sorted(int(e) for e in eval_at if int(e) < steps)
    it, t0 = 0, time.time()
    while it < steps:
        params, opt_state, rest, ls, tbl = run_chunk(
            params, opt_state, rest, jnp.int32(it), chunk)
        it += chunk
        while eval_pending and it >= eval_pending[0]:
            e = eval_pending.pop(0)
            evals_at[str(it)] = ev = do_eval(params, rest)
            print(f"[{tag}] eval@{it}: {json.dumps(ev)}", flush=True)
        ls = np.asarray(ls)
        stat_mag = float(max(
            (float(np.abs(np.asarray(v)).max()) for v in
             jax.tree_util.tree_leaves(rest.get("statistics", {}))),
            default=0.0))
        mlogit = float(np.asarray(tbl["max_abs_logit"]).max())
        series["loss"].append(round(float(ls[-1]), 4))
        series["stat_mag"].append(round(stat_mag, 4))
        series["max_abs_logit"].append(round(mlogit, 3))
        comps = " ".join(
            f"{k}={float(np.asarray(v)[-1]):.2f}" for k, v in sorted(
                tbl.items()) if not k.startswith("dbg"))
        print(f"[{tag}] step {it}: loss {ls[-1]:.3f} stat_mag "
              f"{stat_mag:.2f} max|logit| {mlogit:.1f} {comps}", flush=True)

    res = {
        "series": series,
        "stat_mag_final": series["stat_mag"][-1],
        "loss_first": series["loss"][0], "loss_last": series["loss"][-1],
        "train_s": round(time.time() - t0, 1),
        **do_eval(params, rest, boot=getattr(args, "boot", 0)),
    }
    if evals_at:
        res["evals_at"] = evals_at
    return res, params, rest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2400)
    # (resolved after parse: teacher_steps defaults to steps)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--train_scenes", type=int, default=256)
    ap.add_argument("--val_scenes", type=int, default=60)
    ap.add_argument("--teacher_ckpt", type=str,
                    default="artifacts/distill_teacher.pkl",
                    help="save (after phase 1) / load (--skip_teacher) path")
    ap.add_argument("--skip_teacher", action="store_true",
                    help="load the teacher from --teacher_ckpt instead of "
                         "training phase 1")
    ap.add_argument("--skip_ablation", action="store_true",
                    help="skip the phase-2b ones-ablation A/B arm")
    ap.add_argument("--teacher_steps", type=int, default=None,
                    help="phase-1 step count (default: --steps); the "
                         "teacher converges far faster than the student")
    ap.add_argument("--lr_scale", type=float, default=1.0,
                    help="scale the student phases' peak LR (compressed-"
                         "regime delta; see run_phase)")
    ap.add_argument("--hard", action="store_true",
                    help="round-5 hardened mini-KITTI (HARD_V1: far sparse "
                         "objects, occlusion, size jitter, clutter) so the "
                         "teacher lands below saturation")
    ap.add_argument("--phases", type=str, default="teacher,student,ablation",
                    help="comma list of phases to run (calibration runs "
                         "use 'teacher')")
    ap.add_argument("--boot", type=int, default=16,
                    help="bootstrap resamples for per-class AP variance "
                         "(0 = off)")
    ap.add_argument("--eval_at", type=str, default="",
                    help="comma list of student-phase step counts at which "
                         "to run an intermediate held-out eval (one long "
                         "run yields the 4k-vs-12k parity trend)")
    ap.add_argument("--out", type=str, default="artifacts/distill_proof.json")
    args = ap.parse_args()
    phases = set(args.phases.split(","))

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

    rng = np.random.default_rng(7)
    nb = max(1, -(-args.train_scenes // B))
    mix = CLASS_MIX_HARD if args.hard else CLASS_MIX
    hard = HARD_V1 if args.hard else None
    batches = [make_batch(rng, B, N, jnp, class_mix=mix, hard=hard)[0]
               for _ in range(nb)]
    template = batches[0]
    arr_keys = [k for k, v in template.items() if hasattr(v, "ndim")]
    stacked_scenes = {
        "template": template, "nb": nb, "arr_keys": arr_keys,
        "stacked": {k: jnp.stack([b[k] for b in batches]) for k in arr_keys},
    }
    del batches
    vrng = np.random.default_rng(9999)
    val_scenes = make_batch(vrng, args.val_scenes, N, jnp,
                            class_mix=mix, hard=hard)

    def load_cfg(name):
        return cfg_from_yaml_file(
            str(root / f"tools/cfgs/kitti_models/{name}"),
            EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}))

    artifact = {"metric": "tsm_distill_proof", "steps": args.steps,
                "teacher_steps": args.teacher_steps or args.steps,
                "batch": B, "points": N, "train_scenes": nb * B,
                "val_scenes": args.val_scenes, "class_mix": list(mix),
                "hard": bool(args.hard)}

    # ---- phase 1: teacher with the DEPLOYED statistics pathway ----
    if args.skip_teacher:
        with open(args.teacher_ckpt, "rb") as f:
            saved = pickle.load(f)
        t_params, t_stats = saved["params"], saved["statistics"]
        artifact["teacher"] = saved["result"]
        print(f"[teacher] loaded {args.teacher_ckpt}: "
              f"{json.dumps(saved['result'], default=str)[:300]}", flush=True)
    else:
        cfg1 = load_cfg("fast_cpc_teacher.yaml")
        res1, t_params, t_rest = run_phase(
            cfg1, meta, args, stacked_scenes, val_scenes, tag="teacher",
            stat_mode="learned", steps=args.teacher_steps)
        t_stats = t_rest.get("statistics")
        artifact["teacher"] = res1
        print(json.dumps({"phase": "teacher", **{
            k: v for k, v in res1.items() if k != "series"}}), flush=True)
        import jax
        os.makedirs(os.path.dirname(args.teacher_ckpt) or ".", exist_ok=True)
        with open(args.teacher_ckpt, "wb") as f:
            pickle.dump({
                "params": jax.tree_util.tree_map(np.asarray, t_params),
                "statistics": jax.tree_util.tree_map(np.asarray, t_stats),
                "batch_stats": jax.tree_util.tree_map(
                    np.asarray, t_rest.get("batch_stats", {})),
                "result": res1,
            }, f)

    # gate (a): bounded statistics + finite logits through phase 1
    tser = artifact["teacher"]["series"]
    mags = tser["stat_mag"]
    tail = mags[-max(1, len(mags) // 4):]
    drift = (max(tail) - min(tail)) / max(max(tail), 1e-6)
    gate_a = (all(np.isfinite(tser["max_abs_logit"]))
              and max(tser["max_abs_logit"]) < 500.0
              and mags[-1] < 100.0 and drift < 0.25)
    artifact["gate_a_bounded"] = {
        "pass": bool(gate_a), "stat_mag_final": mags[-1],
        "stat_mag_tail_drift": round(float(drift), 4),
        "max_abs_logit": max(tser["max_abs_logit"]),
    }
    print(json.dumps({"gate_a": artifact["gate_a_bounded"]}), flush=True)

    if "student" not in phases:
        if args.out:
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as f:
                json.dump(artifact, f, indent=1)
        sys.exit(0 if artifact["gate_a_bounded"]["pass"] else 1)

    # ---- phase 2a: student with transferred statistics (deployed) ----
    cfg2 = load_cfg("fast_cpc.yaml")
    eval_at = tuple(int(s) for s in args.eval_at.split(",") if s)
    res2, _, _ = run_phase(
        cfg2, meta, args, stacked_scenes, val_scenes,
        init_params=t_params, init_statistics=t_stats,
        tag="student_stats", stat_mode="learned", eval_at=eval_at)
    artifact["student_stats"] = res2
    print(json.dumps({"phase": "student_stats", **{
        k: v for k, v in res2.items() if k != "series"}}), flush=True)

    gate_b = (res2["val_car_3d_mod_R40"]
              >= artifact["teacher"]["val_car_3d_mod_R40"] - 10.0)
    artifact["gate_b_close"] = {
        "pass": bool(gate_b),
        "teacher_ap": artifact["teacher"]["val_car_3d_mod_R40"],
        "student_ap": res2["val_car_3d_mod_R40"],
    }
    print(json.dumps({"gate_b": artifact["gate_b_close"]}), flush=True)

    # ---- phase 2b: ablation arm (conditioning forced to ones) ----
    if not args.skip_ablation and "ablation" in phases:
        res3, _, _ = run_phase(
            cfg2, meta, args, stacked_scenes, val_scenes,
            init_params=t_params, init_statistics=None,
            tag="student_ones", stat_mode="ones")
        artifact["student_ones"] = res3
        print(json.dumps({"phase": "student_ones", **{
            k: v for k, v in res3.items() if k != "series"}}), flush=True)
        gate_c = (res2["val_car_3d_mod_R40"] >= res3["val_car_3d_mod_R40"])
        artifact["gate_c_helps"] = {
            "pass": bool(gate_c),
            "student_stats_ap": res2["val_car_3d_mod_R40"],
            "student_ones_ap": res3["val_car_3d_mod_R40"],
        }
        print(json.dumps({"gate_c": artifact["gate_c_helps"]}), flush=True)

    gates = [artifact["gate_a_bounded"]["pass"], artifact["gate_b_close"]["pass"]]
    if "gate_c_helps" in artifact:
        gates.append(artifact["gate_c_helps"]["pass"])
    artifact["pass"] = bool(all(gates))
    print(json.dumps({k: v for k, v in artifact.items()
                      if not isinstance(v, dict) or "series" not in v}),
          flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
    sys.exit(0 if artifact["pass"] else 1)


if __name__ == "__main__":
    main()
