"""Per-op device-time profile of the TSM distill TRAIN step.

Splits the step into three traced programs to attribute time across
phases (VERDICT r2 #2 — the train-side twin of profile_eval.py):
  fwd   — training-mode loss forward only (teacher + student + losses)
  grad  — value_and_grad of the same loss (fwd + VJP)
  full  — grad + optimizer update (the deployed train step)
Phase deltas give the VJP cost (grad - fwd) and optimizer cost
(full - grad). Also prints the top ops of the full step.

Reference budget being chased: 20.6 scans/s sustained on a 2080 Ti
(README.md:132, 5 h / 100 epochs at b16).

Usage:
  python tools/profile_train.py [--cfg_file tools/cfgs/kitti_models/fast_cpc.yaml]
      [--batch 8] [--points 16384] [--top 40] [--out /tmp/profile_train]
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

from tools.profile_eval import aggregate_trace, synth_points


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file",
                    default="tools/cfgs/kitti_models/fast_cpc.yaml")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/profile_train")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
        DatasetMeta,
    )
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    root = pathlib.Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(str(root / args.cfg_file),
                             EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}))
    is_waymo = "waymo" in args.cfg_file
    if is_waymo:
        meta = DatasetMeta(
            class_names=tuple(cfg.CLASS_NAMES),
            point_cloud_range=(-75.2, -75.2, -2, 75.2, 75.2, 4),
            voxel_size=(0.1, 0.1, 0.15), grid_size=(1504, 1504, 40),
            max_voxels=80000, max_points_per_voxel=5,
            num_point_features=5, max_points=args.points,
        )
    else:
        meta = DatasetMeta(
            class_names=tuple(cfg.CLASS_NAMES),
            point_cloud_range=(0, -40, -3, 70.4, 40, 1),
            voxel_size=(0.05, 0.05, 0.1), grid_size=(1408, 1600, 40),
            max_voxels=16000, max_points_per_voxel=5,
            num_point_features=4, max_points=args.points,
        )
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=meta)
    B, N = args.batch, args.points
    pts = jnp.asarray(synth_points(B, N, nf=meta.num_point_features))
    mask = jnp.ones((B, N), bool)
    gt = np.zeros((B, 12, 8), np.float32)
    gt[:, 0] = [10, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [20, 5, -1, 0.8, 0.6, 1.73, -0.2, 2]
    gtm = np.zeros((B, 12), bool)
    gtm[:, :2] = True
    gt, gtm = jnp.asarray(gt), jnp.asarray(gtm)

    def make_batch(p):
        return {"points": p, "points_mask": mask, "batch_size": B,
                "gt_boxes": gt, "gt_boxes_mask": gtm,
                "accumulated_iter": jnp.zeros((), jnp.int32)}

    variables = jax.jit(lambda r, b: model.init(r, b, training=True))(
        jax.random.PRNGKey(1), make_batch(pts))
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(1e-3)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, rest, batch):
        ret, upd = model.apply(
            {"params": p, **rest}, batch, training=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats", "statistics"],
        )
        return ret["loss"], upd

    @jax.jit
    def fwd_only(p, rest, x):
        l, upd = loss_fn(p, rest, make_batch(x))
        return l

    @jax.jit
    def grad_only(p, rest, x):
        (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, rest, make_batch(x))
        return l, jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum(), g, 0.0)

    @jax.jit
    def full_step(p, os_, rest, x):
        (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, rest, make_batch(x))
        u, os_ = tx.update(g, os_, p)
        p = optax.apply_updates(p, u)
        return l, jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum(), p, 0.0), os_

    def trace_phase(tag, fn):
        fn(np.float32(0.0))  # compile outside the trace
        out = pathlib.Path(args.out) / tag
        with jax.profiler.trace(str(out)):
            for rep in range(1, args.reps + 1):
                fn(np.float32(rep * 1e-6))
        by_op, total = aggregate_trace(str(out))
        return by_op, total / args.reps / 1e3  # ms per invocation

    phases = {}
    _, phases["fwd"] = trace_phase(
        "fwd", lambda d: float(fwd_only(params, rest, pts + d)))
    _, phases["grad"] = trace_phase(
        "grad", lambda d: float(grad_only(params, rest, pts + d)[1]))
    by_op, phases["full"] = trace_phase(
        "full", lambda d: float(full_step(params, opt_state, rest,
                                          pts + d)[1]))

    if jax.devices()[0].platform != "tpu":
        print("\nNOTE: CPU backend — parallel Eigen lanes OVERCOUNT wall "
              "time; use relative shares only.")
    print(json.dumps({
        "metric": "train_step_phase_profile_ms",
        "batch": B, "points": N,
        "fwd_ms": round(phases["fwd"], 1),
        "vjp_ms": round(phases["grad"] - phases["fwd"], 1),
        "optimizer_ms": round(phases["full"] - phases["grad"], 1),
        "full_ms": round(phases["full"], 1),
        "scans_per_s_device": round(B / phases["full"] * 1e3, 1),
    }))
    total = sum(us for _, us in by_op.items())
    print(f"\ntop ops, FULL train step ({phases['full']:.1f} ms/step "
          f"device-side, b{B}):")
    print(f"{'op':<72} {'ms/step':>8} {'%':>6}")
    for name, us in by_op.most_common(args.top):
        ms = us / args.reps / 1e3
        print(f"{name[:72]:<72} {ms:8.2f} {100 * us / total:6.2f}")


if __name__ == "__main__":
    main()
