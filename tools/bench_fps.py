"""Standalone FPS kernel bench at KITTI and Waymo scales (real chip).

Times furthest_point_sample_pallas with the two-point chained protocol
(tools/bench_timing.py). The Waymo eval forward pays two 122,880->16,384
selections per batch (teacher + student layer 0) = 61% of device time
(SURVEY.md 8b), so this is the round's top perf lever.

Usage: python tools/bench_fps.py [--waymo-only]
"""
from __future__ import annotations

import argparse
import functools
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tools.bench_timing import measure_per_iter


def bench_case(name, B, N, M, kind="pallas", n_small=2, n_big=6,
               dist="uniform", full_sweep=False, rows=0):
    from tsm_det_pointcloud_tpu.ops import fps_pallas

    rng = np.random.RandomState(0)
    if dist == "bench":
        # the clustered eval-bench distribution (tools/profile_eval.py
        # synth_points, Waymo extents) — pruning behaves differently on
        # clusters vs uniform (round-2 negative-results log)
        from tools.profile_eval import synth_points

        pts = synth_points(B, N, nf=3) * np.float32([2.0, 2.0, 1.0])
    else:
        pts = rng.uniform(-40, 40, (B, N, 3)).astype(np.float32)
        pts[..., 2] = rng.uniform(-2, 1, (B, N))

    if kind == "pallas":
        fps = functools.partial(fps_pallas.furthest_point_sample_pallas,
                                npoint=M)
    else:
        fps = functools.partial(
            fps_pallas.furthest_point_sample_block_pruned, npoint=M,
            full_sweep=full_sweep, rows=rows)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chained(x, n):
        def body(i, acc):
            idx = fps(x + acc * 1e-12)
            return acc + jnp.sum(idx.astype(jnp.float32)) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def run(n, tag):
        x = jnp.asarray(pts + np.float32(tag) * 1e-6)
        return float(chained(x, n))

    dt = measure_per_iter(run, n_small, n_big)
    print(f"{name}: {dt*1e3:.2f} ms per ({B},{N})->{M} selection "
          f"[{kind}]")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--waymo-only", action="store_true")
    ap.add_argument("--kind", default="pallas",
                    choices=["pallas", "block"])
    ap.add_argument("--dist", default="uniform",
                    choices=["uniform", "bench"])
    ap.add_argument("--full-sweep", action="store_true")
    ap.add_argument("--rows", type=int, default=0,
                    help="block kind: batch rows per program (0=single, "
                         "2=r4 two-row, 4=r5 n-row)")
    args = ap.parse_args()
    print("devices:", jax.devices())
    if not args.waymo_only:
        bench_case("KITTI layer0 (b16)", 16, 16384, 4096, kind=args.kind,
                   dist=args.dist, full_sweep=args.full_sweep,
                   rows=args.rows)
    bench_case("Waymo layer0 (b8)", 8, 122880, 16384, kind=args.kind,
               n_small=1, n_big=3, dist=args.dist,
               full_sweep=args.full_sweep, rows=args.rows)


if __name__ == "__main__":
    main()
