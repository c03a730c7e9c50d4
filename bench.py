"""Benchmark: KITTI-scale inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference evaluates KITTI val at 0.0163 s/scan on a
RTX 2080 Ti (res_kitti.txt:208-209) = 61.35 scans/s/GPU. North star
(BASELINE.json): >= 100 scans/s/chip on v5e.

Measures the flagship model's full inference path (voxelize -> model ->
decode -> on-device NMS) at the reference eval scale (batch 16, KITTI grid).
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SCANS_PER_SEC = 1.0 / 0.0163  # 61.35 scans/s on 2080 Ti


def synth_points(batch, n, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((batch, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.0, 69.0, (batch, n))
    pts[..., 1] = rng.uniform(-39.0, 39.0, (batch, n))
    pts[..., 2] = rng.uniform(-2.0, 0.5, (batch, n))
    pts[..., 3] = rng.uniform(0, 1, (batch, n))
    for b in range(batch):  # a few car-like clusters for non-trivial NMS
        for k in range(8):
            cx, cy = rng.uniform(5, 60), rng.uniform(-30, 30)
            pts[b, k * 200 : (k + 1) * 200, 0] = rng.uniform(cx - 2, cx + 2, 200)
            pts[b, k * 200 : (k + 1) * 200, 1] = rng.uniform(cy - 1, cy + 1, 200)
            pts[b, k * 200 : (k + 1) * 200, 2] = rng.uniform(-1.6, -0.2, 200)
    return pts


def main():
    import pathlib

    import jax
    import jax.numpy as jnp

    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    root = pathlib.Path(__file__).resolve().parent
    cfg = cfg_from_yaml_file(
        str(root / "tools/cfgs/kitti_models/pointpillar.yaml"),
        EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}),
    )
    pcr = cfg.DATA_CONFIG.POINT_CLOUD_RANGE
    vs = [0.16, 0.16, 4.0]
    grid = tuple(int(round((pcr[3 + i] - pcr[i]) / vs[i])) for i in range(3))

    batch_size, n_points = 16, 16384
    meta = DatasetMeta(
        class_names=tuple(cfg.CLASS_NAMES), point_cloud_range=tuple(pcr),
        voxel_size=tuple(vs), grid_size=grid, max_voxels=12000,
        max_points_per_voxel=32, num_point_features=4, max_points=n_points,
    )
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=meta)

    pts = synth_points(batch_size, n_points)
    batch = {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((batch_size, n_points), bool),
        "batch_size": batch_size,
    }
    variables = model.init(jax.random.PRNGKey(0), batch, training=False)

    # Honest timing through the axon relay: block_until_ready is a no-op
    # there (execution is deferred until a host fetch), so run n_iters
    # CHAINED iterations inside one jit and time the scalar fetch, then
    # subtract the fetch RTT measured on a trivial program.
    def infer_core(v, pts):
        b = {
            "points": pts,
            "points_mask": jnp.ones(pts.shape[:2], bool),
            "batch_size": pts.shape[0],
        }
        out = model.apply(v, b, training=False)
        pred, _ = model.apply(v, out, method=lambda m, bd: m.post_processing(bd))
        return (
            pred["pred_boxes"].sum()
            + pred["pred_scores"].sum()
            + pred["count"].sum()
        )

    n_iters = 10

    @jax.jit
    def chained(v, pts):
        def body(_, carry):
            p, acc = carry
            s = infer_core(v, p)
            # data dependency so XLA cannot hoist/elide iterations
            return p + 1e-12 * s, acc + s

        _, acc = jax.lax.fori_loop(
            0, n_iters, body, (pts, jnp.zeros((), jnp.float32))
        )
        return acc

    pts_j = jnp.asarray(pts)
    float(chained(variables, pts_j))  # compile + first run

    t0 = time.perf_counter()
    rtt = float(jax.jit(lambda x: (x * 2).sum())(jnp.ones(8)))
    rtt_t = time.perf_counter() - t0

    t0 = time.perf_counter()
    float(chained(variables, pts_j))  # fetch forces execution
    dt = max(time.perf_counter() - t0 - rtt_t, 1e-9) / n_iters
    scans_per_sec = batch_size / dt

    print(json.dumps({
        "metric": "kitti_scans_per_sec_per_chip",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / REFERENCE_SCANS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
