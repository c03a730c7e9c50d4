"""TSM training-step throughput (teacher-frozen distill step, KITTI scale).
Reference budget: 100 epochs x 3712 scans / ~5 h on a 2080 Ti at b16
(README.md:132) ~= 20.6 scans/s sustained training throughput.
"""
import json
import os

# Training graphs tip the 256-channel bykey convs over the 16 MB scoped-
# VMEM stack at the plain model's picks (operand relayout copies from
# while-loop carries); the tight model degrades them one ladder rung.
os.environ.setdefault("TSM_BYKEY_TIGHT_VMEM", "1")
import pathlib

import sys
import pathlib
sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
        DatasetMeta,
    )
    from tsm_det_pointcloud_tpu.utils.edict import EDict
    from bench import synth_points

    root = pathlib.Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(
        str(root / "tools/cfgs/kitti_models/fast_cpc.yaml"),
        EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}),
    )
    B, N = 8, 16384
    meta = DatasetMeta(
        class_names=tuple(cfg.CLASS_NAMES),
        point_cloud_range=(0, -40, -3, 70.4, 40, 1),
        voxel_size=(0.05, 0.05, 0.1), grid_size=(1408, 1600, 40),
        max_voxels=16000, max_points_per_voxel=5,
        num_point_features=4, max_points=N,
    )
    model = build_network(cfg.MODEL, num_class=3, dataset=meta)
    pts = jnp.asarray(synth_points(B, N))
    mask = jnp.ones((B, N), bool)
    gt = np.zeros((B, 12, 8), np.float32)
    gt[:, 0] = [10, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
    gt[:, 1] = [20, 5, -1, 0.8, 0.6, 1.73, -0.2, 2]
    gtm = np.zeros((B, 12), bool)
    gtm[:, :2] = True
    tb = {"points": pts, "points_mask": mask, "batch_size": B,
          "gt_boxes": jnp.asarray(gt), "gt_boxes_mask": jnp.asarray(gtm),
          "accumulated_iter": jnp.zeros((), jnp.int32)}
    variables = jax.jit(lambda r, b: model.init(r, b, training=True))(
        jax.random.PRNGKey(1), dict(tb))
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(1e-3)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, rest, batch):
        ret, updated = model.apply(
            {"params": p, **rest}, batch, training=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats", "statistics"],
        )
        return ret["loss"], updated

    @jax.jit
    def train_n(p, os, rest, pts0, n):
        def step(_, carry):
            p, os, rest, x = carry
            b = {"points": x, "points_mask": mask, "batch_size": B,
                 "gt_boxes": jnp.asarray(gt),
                 "gt_boxes_mask": jnp.asarray(gtm),
                 "accumulated_iter": jnp.zeros((), jnp.int32)}
            (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, rest, b)
            u, os = tx.update(g, os, p)
            p = optax.apply_updates(p, u)
            rest = {**rest, **{k: upd[k] for k in upd}}
            return p, os, rest, x + 1e-12 * l
        p, os, rest, x = jax.lax.fori_loop(0, n, step, (p, os, rest, pts0))
        return p, os, rest, x.sum()

    from bench_timing import measure_per_iter

    dt = measure_per_iter(
        lambda n, tag: float(train_n(
            params, opt_state, rest,
            pts + np.float32((tag * 31 + n) * 1e-6), jnp.int32(n))[-1]),
        n_small=2, n_big=6,
    )

    # MFU: XLA's own flop count for ONE train step / wall / peak MXU rate.
    # v5e peak is 197 TFLOP/s bf16 (the MXU ceiling this code can reach;
    # f32 ops run at half that, so f32-heavy graphs cap at ~0.5 MFU here).
    mfu = hbm_frac = None
    try:
        lowered = train_n.lower(params, opt_state, rest, pts, jnp.int32(1))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = flops / dt / 197e12
        # achieved HBM bandwidth (roofline companion to MFU — the
        # "gather-bound" claim measured, not asserted): XLA's bytes
        # accessed for one step / wall / v5e peak 819 GB/s
        bytes_acc = float(cost.get("bytes accessed", 0.0))
        if bytes_acc > 0:
            hbm_frac = bytes_acc / dt / 819e9
    except Exception:
        pass
    print(json.dumps({
        "metric": "kitti_tsm_train_scans_per_sec",
        "value": round(B / dt, 2), "unit": "scans/s",
        "s_per_step_b8": round(dt, 4),
        "vs_ref_train": round((B / dt) / 20.6, 2),
        "mfu_vs_bf16_peak": round(mfu, 4) if mfu is not None else None,
        "hbm_bw_vs_819GBs_peak": (round(hbm_frac, 4)
                                  if hbm_frac is not None else None),
    }))


if __name__ == "__main__":
    main()
