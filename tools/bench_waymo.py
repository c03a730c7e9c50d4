"""Waymo-scale TSM throughput on one chip (waymo_fast_cpc, b8 x 120k pts).
Reference: 0.1991 s/scan on a 2080 Ti (res_waymo.txt:204-205) = 5.02 scans/s.
"""
import json
import pathlib

import sys
import pathlib
sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def synth_waymo(batch, n, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((batch, n, 5), np.float32)
    pts[..., 0] = rng.uniform(-74, 74, (batch, n))
    pts[..., 1] = rng.uniform(-74, 74, (batch, n))
    pts[..., 2] = rng.uniform(-1.9, 3.9, (batch, n))
    pts[..., 3] = rng.uniform(0, 1, (batch, n))
    pts[..., 4] = rng.uniform(0, 1, (batch, n))
    for b in range(batch):
        for k in range(16):
            cx, cy = rng.uniform(-60, 60), rng.uniform(-60, 60)
            s = slice(k * 200, (k + 1) * 200)
            pts[b, s, 0] = rng.uniform(cx - 2, cx + 2, 200)
            pts[b, s, 1] = rng.uniform(cy - 1, cy + 1, 200)
            pts[b, s, 2] = rng.uniform(0.0, 1.8, 200)
    return pts


def main():
    import jax
    import jax.numpy as jnp

    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
        DatasetMeta,
    )
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    root = pathlib.Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(
        str(root / "tools/cfgs/waymo_models/waymo_fast_cpc.yaml"),
        EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}),
    )
    batch_size, n_points = 8, 122880
    meta = DatasetMeta(
        class_names=tuple(cfg.CLASS_NAMES),
        point_cloud_range=(-75.2, -75.2, -2, 75.2, 75.2, 4),
        voxel_size=(0.1, 0.1, 0.15), grid_size=(1504, 1504, 40),
        max_voxels=80000, max_points_per_voxel=5,
        num_point_features=5, max_points=n_points,
    )
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=meta)
    pts = jnp.asarray(synth_waymo(batch_size, n_points))
    mask = jnp.ones((batch_size, n_points), bool)
    batch = {"points": pts, "points_mask": mask, "batch_size": batch_size}
    variables = jax.jit(lambda r, b: model.init(r, b, training=False))(
        jax.random.PRNGKey(0), dict(batch))

    def infer_core(v, p):
        b = {"points": p, "points_mask": mask, "batch_size": batch_size}
        out = model.apply(v, b, training=False)
        pred, _ = model.apply(v, out,
                              method=lambda m, bd: m.post_processing(bd))
        return (pred["pred_boxes"].sum() + pred["pred_scores"].sum()
                + pred["count"].sum())

    @jax.jit
    def chained(v, p, n):
        def body(_, carry):
            p_, acc = carry
            s = infer_core(v, p_)
            return p_ + 1e-12 * s, acc + s

        _, acc = jax.lax.fori_loop(0, n, body,
                                   (p, jnp.zeros((), jnp.float32)))
        return acc

    from bench_timing import measure_per_iter

    dt = measure_per_iter(
        lambda n, tag: float(chained(
            variables, pts + np.float32((tag * 31 + n) * 1e-6),
            jnp.int32(n))),
        n_small=2, n_big=6,
    )
    sps = batch_size / dt
    print(json.dumps({
        "metric": "waymo_tsm_scans_per_sec_per_chip",
        "value": round(sps, 2), "unit": "scans/s",
        "vs_baseline": round(sps / (1.0 / 0.1991), 3),
    }))


if __name__ == "__main__":
    main()
