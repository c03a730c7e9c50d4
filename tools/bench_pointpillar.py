"""PointPillars eval throughput under the honest two-point protocol.

Round 1's 139 scans/s reading predates the protocol fix (README/SURVEY
flag it as not re-measured); this re-times the full deployed path
(voxelize -> PillarVFE -> scatter -> BEV backbone -> anchor head ->
on-device NMS) at b16 x 16384 with tools/bench_timing.py.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import synth_points
    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
        DatasetMeta,
    )
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    root = pathlib.Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(
        str(root / "tools/cfgs/kitti_models/pointpillar.yaml"),
        EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}),
    )
    B, N = 16, 16384
    meta = DatasetMeta(
        class_names=tuple(cfg.CLASS_NAMES),
        point_cloud_range=(0, -39.68, -3, 69.12, 39.68, 1),
        voxel_size=(0.16, 0.16, 4.0), grid_size=(432, 496, 1),
        max_voxels=16000, max_points_per_voxel=32,
        num_point_features=4, max_points=N,
    )
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=meta)
    pts = jnp.asarray(synth_points(B, N))
    mask = jnp.ones((B, N), bool)
    batch = {"points": pts, "points_mask": mask, "batch_size": B}
    variables = jax.jit(lambda r, b: model.init(r, b, training=False))(
        jax.random.PRNGKey(0), dict(batch))

    def infer_core(v, p):
        b = {"points": p, "points_mask": mask, "batch_size": B}
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

    sys.path.insert(0, str(root / "tools"))
    from bench_timing import measure_per_iter

    dt = measure_per_iter(
        lambda n, tag: float(chained(
            variables, pts + np.float32((tag * 31 + n) * 1e-6),
            jnp.int32(n))),
        n_small=8, n_big=24,
    )
    print(json.dumps({
        "metric": "kitti_pointpillar_scans_per_sec_per_chip",
        "value": round(B / dt, 2), "unit": "scans/s",
    }))


if __name__ == "__main__":
    main()
