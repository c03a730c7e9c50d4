"""On-device sanity fit: overfit the TSM teacher on synthetic scenes.

Trains the full teacher model (PointHeadVoteSASAStatistic — vote + cls +
box + SASA losses, statistics momentum updates) on a handful of synthetic
scenes with known car boxes, then checks that (a) the loss drops by a
large factor and (b) post-processed detections land on the ground truth.
This exercises the entire learning loop (target assignment, losses,
optimizer, BN/statistics state) at real scale on the real chip — a much
stronger signal than finiteness checks.

Usage: python tools/sanity_overfit.py [--steps 300]
Prints one JSON line with loss trajectory + detection hits.
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np


def make_scene(rng, n_points, boxes):
    """Points on box surfaces + ground clutter. boxes (M, 7)."""
    pts = np.zeros((n_points, 4), np.float32)
    # ground plane clutter
    pts[:, 0] = rng.uniform(0.0, 69.0, n_points)
    pts[:, 1] = rng.uniform(-39.0, 39.0, n_points)
    pts[:, 2] = rng.uniform(-1.9, -1.6, n_points)
    pts[:, 3] = rng.uniform(0, 1, n_points)
    per = 400
    for bi, (cx, cy, cz, dx, dy, dz, ry) in enumerate(boxes):
        s = slice(bi * per, (bi + 1) * per)
        # sample on the box's top + sides in the box frame
        u = rng.uniform(-0.5, 0.5, (per, 2))
        face = rng.integers(0, 3, per)
        lx = np.where(face == 0, u[:, 0] * dx, np.where(
            face == 1, np.sign(u[:, 0]) * dx / 2, u[:, 0] * dx))
        ly = np.where(face == 0, u[:, 1] * dy, np.where(
            face == 1, u[:, 1] * dy, np.sign(u[:, 1]) * dy / 2))
        lz = np.where(face == 0, dz / 2, rng.uniform(-0.5, 0.5, per) * dz)
        c, s_ = np.cos(ry), np.sin(ry)
        pts[s, 0] = cx + lx * c - ly * s_
        pts[s, 1] = cy + lx * s_ + ly * c
        pts[s, 2] = cz + lz
        pts[s, 3] = rng.uniform(0.3, 0.9, per)
    return pts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
    from tsm_det_pointcloud_tpu.models import build_network
    from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import (
        DatasetMeta,
    )
    from tsm_det_pointcloud_tpu.ops.iou3d import boxes_iou3d
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    root = pathlib.Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(
        str(root / "tools/cfgs/kitti_models/fast_cpc_teacher.yaml"),
        EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}),
    )
    B, N = args.batch, 16384
    meta = DatasetMeta(
        class_names=tuple(cfg.CLASS_NAMES),
        point_cloud_range=(0, -40, -3, 70.4, 40, 1),
        voxel_size=(0.05, 0.05, 0.1), grid_size=(1408, 1600, 40),
        max_voxels=16000, max_points_per_voxel=5,
        num_point_features=4, max_points=N,
    )
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=meta)

    rng = np.random.default_rng(0)
    gt = np.zeros((B, 12, 8), np.float32)
    gtm = np.zeros((B, 12), bool)
    pts = np.zeros((B, N, 4), np.float32)
    for b in range(B):
        boxes = []
        for k in range(5):
            boxes.append([rng.uniform(8, 60), rng.uniform(-30, 30),
                          rng.uniform(-1.2, -0.8), 3.9, 1.6, 1.56,
                          rng.uniform(-np.pi, np.pi)])
        boxes = np.asarray(boxes, np.float32)
        pts[b] = make_scene(rng, N, boxes)
        gt[b, :5, :7] = boxes
        gt[b, :5, 7] = 1  # Car
        gtm[b, :5] = True

    pts_j = jnp.asarray(pts)
    mask = jnp.ones((B, N), bool)
    tb = {"points": pts_j, "points_mask": mask, "batch_size": B,
          "gt_boxes": jnp.asarray(gt), "gt_boxes_mask": jnp.asarray(gtm),
          "accumulated_iter": jnp.zeros((), jnp.int32)}
    variables = jax.jit(lambda r, b: model.init(r, b, training=True))(
        jax.random.PRNGKey(1), dict(tb))
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    # the real optimization stack (adam_onecycle + clip), exactly as
    # tools/train.py builds it — the statistic conditioning is only
    # stable under the reference's warmup profile
    from tsm_det_pointcloud_tpu.runtime.optimization import build_optimizer
    tx, _ = build_optimizer(dict(cfg.OPTIMIZATION), total_steps=args.steps)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, rest, batch, it):
        batch = dict(batch)
        batch["accumulated_iter"] = it
        ret, upd = model.apply(
            {"params": p, **rest}, batch, training=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats", "statistics"],
        )
        tb = {k: v for k, v in ret.get("tb_dict", {}).items()}
        return ret["loss"], (upd, tb)

    import functools

    tb_shapes = jax.eval_shape(
        lambda p, r: loss_fn(p, r, tb, jnp.int32(0))[1][1], params, rest)
    tb_keys = tuple(sorted(tb_shapes.keys()))

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_chunk(p, os, rest, it0, n):
        def step(i, carry):
            p, os, rest, acc, tbacc = carry
            (l, (upd, tbd)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                p, rest, tb, it0 + i)
            u, os = tx.update(g, os, p)
            p = optax.apply_updates(p, u)
            rest = {**rest, **{k: upd[k] for k in upd}}
            tbacc = {k: tbacc[k].at[i].set(
                jnp.asarray(tbd[k], jnp.float32).reshape(())) for k in
                tb_keys}
            return p, os, rest, acc.at[i].set(l), tbacc
        acc = jnp.zeros((n,), jnp.float32)
        tbacc = {k: jnp.zeros((n,), jnp.float32) for k in tb_keys}
        return jax.lax.fori_loop(0, n, step, (p, os, rest, acc, tbacc))

    chunk = 50
    losses = []
    it = 0
    for _ in range(args.steps // chunk):
        params, opt_state, rest, ls, tbl = run_chunk(
            params, opt_state, rest, jnp.int32(it), chunk)
        ls = np.asarray(ls)
        losses.extend(ls.tolist())
        it += chunk
        stat_norm = float(sum(
            float(jnp.abs(x).sum()) for x in jax.tree.leaves(
                rest.get("statistics", {}))
        ))
        comps = " ".join(
            f"{k}={float(np.asarray(v)[-1]):.2f}" for k, v in
            sorted(tbl.items()))
        print(f"step {it}: loss {ls[-1]:.3f} |stats|={stat_norm:.1f} "
              f"{comps}", flush=True)

    # eval: detections vs gt
    @jax.jit
    def infer(v, b):
        out = model.apply(v, b, training=False)
        pred, _ = model.apply(v, out,
                              method=lambda m, bd: m.post_processing(bd))
        return pred

    ev = {"points": pts_j, "points_mask": mask, "batch_size": B}
    pred = infer({"params": params, **rest}, ev)
    pb = np.asarray(pred["pred_boxes"])
    ps = np.asarray(pred["pred_scores"])
    cnt = np.asarray(pred["count"])
    print("max score per sample:",
          [round(float(s.max()), 3) for s in ps], flush=True)
    hits = 0
    total_gt = 0
    for b in range(B):
        k = cnt[b]
        total_gt += 5
        if k == 0:
            continue
        iou = np.asarray(boxes_iou3d(jnp.asarray(pb[b, :k]),
                                     jnp.asarray(gt[b, :5, :7])))
        hits += int((iou.max(axis=0) > 0.5).sum())
    first, last = float(np.mean(losses[:10])), float(np.mean(losses[-10:]))
    ok = last < first * 0.2 and hits >= total_gt * 0.6
    print(json.dumps({
        "metric": "tsm_teacher_overfit",
        "loss_first10": round(first, 2), "loss_last10": round(last, 2),
        "det_counts": cnt.tolist(),
        "gt_hits@0.5": hits, "gt_total": total_gt,
        "pass": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
