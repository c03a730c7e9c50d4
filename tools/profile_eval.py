"""Per-op device-time profile of a model's eval forward.

Runs the full deployed path (forward + post_processing) under
jax.profiler.trace and aggregates device-side op durations from the
generated perfetto trace (plugins/profile/.../xx.trace.json.gz), printing the
top ops by total device time. This is the instrument behind the "op-level
profile" numbers in SURVEY.md §8 / README — use it to find where the eval
milliseconds actually go before optimizing anything.

Usage:
  python tools/profile_eval.py [--cfg_file tools/cfgs/kitti_models/fast_cpc.yaml]
      [--batch 16] [--points 16384] [--top 40] [--out /tmp/prof]
"""
import argparse
import collections
import glob
import gzip
import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def synth_points(batch, n, seed=0, nf=4):
    rng = np.random.RandomState(seed)
    pts = np.zeros((batch, n, nf), np.float32)
    pts[..., 0] = rng.uniform(0.0, 69.0, (batch, n))
    pts[..., 1] = rng.uniform(-39.0, 39.0, (batch, n))
    pts[..., 2] = rng.uniform(-2.0, 0.5, (batch, n))
    pts[..., 3:] = rng.uniform(0, 1, (batch, n, nf - 3))
    for b in range(batch):
        for k in range(8):
            cx, cy = rng.uniform(5, 60), rng.uniform(-30, 30)
            s = slice(k * 200, (k + 1) * 200)
            pts[b, s, 0] = rng.uniform(cx - 2, cx + 2, 200)
            pts[b, s, 1] = rng.uniform(cy - 1, cy + 1, 200)
            pts[b, s, 2] = rng.uniform(-1.6, -0.2, 200)
    return pts


# fusion names like "fusion.1234" / "loop_add_fusion.5" are XLA-generated;
# strip trailing .N so repeated instances of one computation aggregate
_GEN = re.compile(r"\.\d+$")


def aggregate_trace(trace_dir):
    """Sum op-lane event durations by (cleaned) op name from the NEWEST
    perfetto trace under `trace_dir`. Returns {name: total_us} and the
    total op-lane time.

    Only the per-op lane is summed ("XLA Ops" on TPU, XLAEigen codegen
    threads on the CPU backend). A TPU trace also carries an "XLA Modules"
    lane whose events span whole executions; summing both lanes (as an
    earlier version of this tool did) double-counts every op and surfaces
    bogus jit_<fn>(hash) rows. Likewise, only the newest trace file is
    read: --out accumulates a new plugins/profile/<ts>/ dir per run, so a
    recursive sum over all of them mixes in stale runs."""
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
    by_fusion = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid")) not in tid_lanes:
            continue
        name = ev.get("name", "?")
        # Eigen lanes carry paired begin/"end: x" markers + infra rows
        if name.startswith(("end: ", "ThunkExecutor", "Threadpool")):
            continue
        dur = float(ev.get("dur", 0.0))
        clean = _GEN.sub("", name)
        by_op[clean] += dur
        if clean in ("fusion", "copy", "sort"):
            # attribute anonymous fusions/copies/sorts by tf_op path /
            # long_name so the "fusion tail" decomposes into model sites
            a = ev.get("args", {})
            key = clean + " | " + (
                a.get("tf_op") or a.get("long_name") or "?")[:96]
            by_fusion[key] += dur
        total += dur
    aggregate_trace.by_fusion = by_fusion  # stashed for --fusion_detail
    return by_op, max(total, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file",
                    default="tools/cfgs/kitti_models/fast_cpc.yaml")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3,
                    help="traced forward invocations (post-compile)")
    ap.add_argument("--out", default="/tmp/profile_eval")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "overrides the JAX_PLATFORMS env var)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

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
    pts = jnp.asarray(synth_points(args.batch, args.points,
                                   nf=meta.num_point_features))
    mask = jnp.ones((args.batch, args.points), bool)
    batch = {"points": pts, "points_mask": mask, "batch_size": args.batch}
    variables = jax.jit(lambda r, b: model.init(r, b, training=False))(
        jax.random.PRNGKey(0), dict(batch))

    @jax.jit
    def infer(v, p):
        b = {"points": p, "points_mask": mask, "batch_size": args.batch}
        out = model.apply(v, b, training=False)
        pred, _ = model.apply(
            v, out, method=lambda m, bd: m.post_processing(bd))
        return (pred["pred_boxes"].sum() + pred["pred_scores"].sum()
                + pred["count"].sum())

    float(infer(variables, pts))  # compile outside the trace
    with jax.profiler.trace(args.out):
        for rep in range(1, args.reps + 1):
            # distinct inputs: the relay dedups byte-identical requests
            float(infer(variables, pts + np.float32(rep * 1e-6)))

    by_op, total = aggregate_trace(args.out)
    per_fwd_ms = total / args.reps / 1e3
    if jax.devices()[0].platform != "tpu":
        print("\nNOTE: CPU backend — lanes are the parallel Eigen pool, "
              "so the total OVERCOUNTS wall time; use relative shares only.")
    print(f"\ndevice time: {per_fwd_ms:.1f} ms/forward "
          f"(b{args.batch}, {args.reps} reps) -> "
          f"{args.batch / max(per_fwd_ms, 1e-9) * 1e3:.1f} scans/s "
          f"device-side")
    print(f"{'op':<72} {'ms/fwd':>8} {'%':>6}")
    for name, us in by_op.most_common(args.top):
        ms = us / args.reps / 1e3
        print(f"{name[:72]:<72} {ms:8.2f} {100 * us / total:6.2f}")
    by_fusion = getattr(aggregate_trace, "by_fusion", None)
    if by_fusion:
        print(f"\nfusion/copy/sort breakdown (by tf_op/long_name):")
        for key, us in by_fusion.most_common(20):
            ms = us / args.reps / 1e3
            print(f"{key[:86]:<86} {ms:8.2f}")


if __name__ == "__main__":
    main()
