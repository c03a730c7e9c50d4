"""Quantify the Hungarian-vs-greedy matcher delta in the Waymo evaluator.

The official waymo_open_dataset TF estimator
(pcdet/datasets/waymo/waymo_eval.py:23, config :87-106) uses
TYPE_HUNGARIAN matching; `eval/waymo_eval.py` implements that directly.
This tool re-runs the same synthetic-but-adversarial frame set through a
greedy score-ordered max-IoU matcher (the round-1 evaluator) and records
the per-metric delta, so the matcher-fidelity question raised in
VERDICT.md item 8 has a recorded quantitative answer even though the TF
package cannot be installed here (zero egress).

Usage:  python tools/waymo_eval_crosscheck.py [--frames 60] [--seed 0]
Writes: artifacts/waymo_crosscheck.json
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tsm_det_pointcloud_tpu.eval import waymo_eval


def greedy_match(iou, thresh):
    """Round-1 matcher: score order is applied by the caller feeding rows
    in score order, so here plain row order = score order."""
    D, G = iou.shape
    matched = np.full(D, -1, np.int64)
    taken = np.zeros(G, bool)
    for j in range(D):
        cand = np.where(~taken & (iou[j] >= thresh))[0]
        if len(cand):
            best = cand[np.argmax(iou[j][cand])]
            taken[best] = True
            matched[j] = best
    return matched


def make_frames(n_frames, rng):
    """Frames engineered to stress the matcher: clustered gts with
    overlapping detections, heading noise, low-point L2 boxes."""
    gts, dts = [], []
    for _ in range(n_frames):
        n_gt = rng.integers(3, 12)
        centers = rng.uniform(-60, 60, (n_gt, 2))
        # force a few near-collisions so greedy and Hungarian disagree
        for k in range(0, n_gt - 1, 3):
            centers[k + 1] = centers[k] + rng.uniform(-2.5, 2.5, 2)
        g = np.zeros((n_gt, 7), np.float32)
        g[:, :2] = centers
        g[:, 2] = rng.uniform(-1, 1, n_gt)
        g[:, 3:6] = rng.uniform(1.5, 5.0, (n_gt, 3))
        g[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
        names = rng.choice(["Vehicle", "Pedestrian", "Cyclist"], n_gt)
        npts = rng.integers(1, 40, n_gt)
        gts.append({
            "name": names,
            "gt_boxes_lidar": g,
            "num_points_in_gt": npts,
            "difficulty": (npts <= 5).astype(np.int64) * 2,
        })

        # detections: jittered copies (some doubled), some pure FPs
        rows, dnames, scores = [], [], []
        for i in range(n_gt):
            for _ in range(int(rng.integers(1, 3))):
                d = g[i].copy()
                d[:3] += rng.normal(0, 0.35, 3)
                d[3:6] *= rng.uniform(0.85, 1.15, 3)
                d[6] += rng.normal(0, 0.3)
                rows.append(d)
                dnames.append(names[i])
                scores.append(rng.uniform(0.3, 1.0))
        for _ in range(int(rng.integers(0, 4))):
            d = np.zeros(7, np.float32)
            d[:2] = rng.uniform(-60, 60, 2)
            d[3:6] = rng.uniform(1.5, 5.0, 3)
            rows.append(d)
            dnames.append(str(rng.choice(["Vehicle", "Pedestrian", "Cyclist"])))
            scores.append(rng.uniform(0.05, 0.6))
        dts.append({
            "name": np.asarray(dnames),
            "boxes_lidar": np.stack(rows) if rows else np.zeros((0, 7)),
            "score": np.asarray(scores, np.float32),
        })
    return gts, dts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    gts, dts = make_frames(args.frames, rng)

    _, hungarian = waymo_eval.waymo_evaluation(gts, dts, breakdown_range=True)

    orig = waymo_eval.hungarian_match
    waymo_eval.hungarian_match = greedy_match
    try:
        _, greedy = waymo_eval.waymo_evaluation(gts, dts, breakdown_range=True)
    finally:
        waymo_eval.hungarian_match = orig

    deltas = {k: hungarian[k] - greedy[k] for k in hungarian}
    worst = max(deltas, key=lambda k: abs(deltas[k]))
    summary = {
        "frames": args.frames,
        "seed": args.seed,
        "hungarian": hungarian,
        "greedy": greedy,
        "delta_hungarian_minus_greedy": deltas,
        "max_abs_delta": abs(deltas[worst]),
        "max_abs_delta_metric": worst,
        "mean_abs_delta": float(np.mean([abs(v) for v in deltas.values()])),
    }
    out = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    out.mkdir(exist_ok=True)
    path = out / "waymo_crosscheck.json"
    path.write_text(json.dumps(summary, indent=2))
    print(f"max |delta| = {summary['max_abs_delta']:.4f} AP points "
          f"({worst}); mean |delta| = {summary['mean_abs_delta']:.4f}")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
