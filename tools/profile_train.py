"""Per-op device-time profile of the TSM distill TRAIN step.

Traces the DEPLOYED step once and attributes device time across
phases via each op's jax path (VERDICT r2 #2 — train-side twin of
profile_eval.py): primal ops run under `jvp(...)` -> fwd, backward ops
under `transpose(jvp(...))` -> vjp, optimizer/update/infra ops -> other.
Also prints the top ops of the full step with their phase.

Reference budget being chased: 20.6 scans/s sustained on a 2080 Ti
(README.md:132, 5 h / 100 epochs at b16).

Usage:
  python tools/profile_train.py [--cfg_file tools/cfgs/kitti_models/fast_cpc.yaml]
      [--batch 8] [--points 16384] [--top 40] [--out /tmp/profile_train]
"""
import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

# see tools/train.py: training graphs need the tight bykey VMEM model
os.environ.setdefault("TSM_BYKEY_TIGHT_VMEM", "1")

from tools.profile_eval import _GEN, synth_points


def aggregate_trace_phased(trace_dir):
    """Like profile_eval.aggregate_trace but also buckets each op-lane
    event into fwd / vjp / other via its jax op path (`tf_op` arg):
    `transpose(jvp(...))` -> vjp, plain `jvp(...)` -> fwd, else other."""
    import collections
    import glob
    import gzip
    import re

    paths = glob.glob(
        str(pathlib.Path(trace_dir) / "**" / "*.trace.json.gz"),
        recursive=True,
    )
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    p = max(paths, key=lambda q: pathlib.Path(q).stat().st_mtime)
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    tid_lanes = set()
    for ev in events:
        if ev.get("ph") != "M" or ev.get("name") != "thread_name":
            continue
        nm = ev.get("args", {}).get("name", "")
        if nm == "XLA Ops" or re.search(r"XLAEigen", nm):
            tid_lanes.add((ev["pid"], ev["tid"]))
    by_op = collections.Counter()
    by_phase = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid")) not in tid_lanes:
            continue
        name = ev.get("name", "?")
        if name.startswith(("end: ", "ThunkExecutor", "Threadpool")):
            continue
        path = ev.get("args", {}).get("tf_op", "")
        if "transpose(jvp" in path:
            phase = "vjp"
        elif "jvp(" in path:
            phase = "fwd"
        else:
            phase = "other"
        dur = float(ev.get("dur", 0.0))
        by_op[(_GEN.sub("", name), phase)] += dur
        by_phase[phase] += dur
        total += dur
    return by_op, by_phase, max(total, 1e-9)


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

    # One traced program: the DEPLOYED step (value_and_grad + optimizer in
    # a fori_loop, the bench_train/run_chunk shape). Phase attribution
    # comes from each op event's `tf_op` path: primal ops run under
    # `jvp(...)`, VJP ops under `transpose(jvp(...))`, optimizer/update
    # ops under neither. (Phase-isolated jits were tried first and tip a
    # spconv bykey kernel over the 16 MB scoped-VMEM stack that the
    # deployed loop shape compiles fine.)
    @jax.jit
    def full_step(p, os_, rest, x):
        def body(_, carry):
            p, os_, acc = carry
            (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, rest, make_batch(x + acc * 1e-12))
            u, os_ = tx.update(g, os_, p)
            p = optax.apply_updates(p, u)
            return p, os_, acc + l
        p, os_, acc = jax.lax.fori_loop(0, 1, body,
                                        (p, os_, jnp.float32(0.0)))
        # the returned scalar MUST depend on the updated params: with a
        # 1-trip loop and only `acc` returned, XLA dead-code-eliminates
        # the whole backward + optimizer (observed: vjp_ms == 0)
        return acc + jax.tree_util.tree_reduce(
            lambda a, b: a + b.sum(), p, 0.0) * 1e-20

    out = pathlib.Path(args.out)
    float(full_step(params, opt_state, rest, pts))  # compile outside
    with jax.profiler.trace(str(out)):
        for rep in range(1, args.reps + 1):
            float(full_step(params, opt_state, rest,
                            pts + np.float32(rep * 1e-6)))

    by_op, by_phase, total = aggregate_trace_phased(str(out))
    full_ms = total / args.reps / 1e3

    if jax.devices()[0].platform != "tpu":
        print("\nNOTE: CPU backend — parallel Eigen lanes OVERCOUNT wall "
              "time; use relative shares only.")
    print(json.dumps({
        "metric": "train_step_phase_profile_ms",
        "batch": B, "points": N,
        "fwd_ms": round(by_phase.get("fwd", 0.0) / args.reps / 1e3, 1),
        "vjp_ms": round(by_phase.get("vjp", 0.0) / args.reps / 1e3, 1),
        "other_ms": round(by_phase.get("other", 0.0) / args.reps / 1e3, 1),
        "full_ms": round(full_ms, 1),
        "scans_per_s_device": round(B / full_ms * 1e3, 1),
    }))
    print(f"\ntop ops, FULL train step ({full_ms:.1f} ms/step "
          f"device-side, b{B}):")
    print(f"{'op':<58} {'phase':>6} {'ms/step':>8} {'%':>6}")
    for (name, phase), us in by_op.most_common(args.top):
        ms = us / args.reps / 1e3
        print(f"{name[:58]:<58} {phase:>6} {ms:8.2f} {100 * us / total:6.2f}")


if __name__ == "__main__":
    main()
