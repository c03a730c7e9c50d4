"""Microbench + parameter sweep for the two hot Pallas kernels on real
TSM shapes (recorded from the b16 KITTI fast_cpc forward; see SURVEY §8).

Times gather_matmul_bykey (sparse-conv implicit GEMM, ~29% of the eval
forward) and _fused_group (query+group, ~25%) at their exact production
shapes under the two-point chained protocol (tools/bench_timing.py), over
a grid of block-size parameters. Prints ms per call for each variant.

r5 (VERDICT r4 #6): every configuration runs in its OWN subprocess by
default — the r4 sweep produced degenerate 0.000 ms rows when configs
switched inside one process (compilation-cache/allocator state leaks
between timings). `--inproc` restores the old single-claim behavior for
quick smoke runs; trust only subprocess rows for tuning decisions.

Usage: python tools/tune_kernels.py [--which bykey|group|all] [--b 16]
"""
import argparse
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import numpy as np

from bench_timing import measure_per_iter


def make_conv_inputs(B, V, C, Co, grid_cells, key_density=0.35, seed=0):
    """Key-sorted sparse conv inputs mirroring ops/spconv.py rulebooks:
    skeys strictly ascending valid prefix, qkeys = 27-tap neighbor keys."""
    rng = np.random.RandomState(seed)
    # valid voxels: V' = 0.9 V of capacity, random distinct keys
    nvalid = int(V * 0.9)
    sk = np.full((B, V), 2**31 - 1, np.int64)
    qk = np.full((B, 27, V), 2**31 - 1, np.int64)
    # grid dims roughly cubic-ish like the stride-4 KITTI grid 352x400x10
    gx, gy, gz = 352, 400, max(grid_cells // (352 * 400), 1)
    for b in range(B):
        # cluster keys: sample cell centers then occupy near neighbors —
        # mimics real occupancy locality (Morton-ish density)
        base = rng.choice(gx * gy * gz, size=nvalid * 2, replace=False)
        keys = np.unique(base)[:nvalid]
        sk[b, :len(keys)] = np.sort(keys)
        # 27-tap neighbor keys of each output voxel
        k = 0
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    off = (dz * gy + dy) * gx + dx
                    cand = keys + off
                    ok = (cand >= 0) & (cand < gx * gy * gz)
                    qq = np.where(ok, cand, 2**31 - 1)
                    qk[b, k, :len(keys)] = qq
                    k += 1
    f = rng.randn(B, V, C).astype(np.float32)
    w = (rng.randn(27, C, Co) * 0.05).astype(np.float32)
    return f, sk.astype(np.int32), qk.astype(np.int32), w, gx * gy * gz


def bench_bykey(args):
    import jax
    import jax.numpy as jnp

    from tsm_det_pointcloud_tpu.ops import spconv_pallas as sp

    B = args.b
    shapes = [
        (4096, 64, 64, 1408000),
        (4096, 64, 128, 176000),
        (4096, 128, 128, 26400),
    ]
    if args.shape >= 0:
        shapes = [shapes[args.shape]]
    for V, C, Co, sent in shapes:
        f, sk, qk, w, sentinel = make_conv_inputs(B, V, C, Co, sent)
        fj, skj, qkj, wj = map(jnp.asarray, (f, sk, qk, w))

        for qb, sb, tg in args.conv_params:
            def run(n, tag, qb=qb, sb=sb, tg=tg):
                @jax.jit
                def chained(f0, n):
                    def body(_, carry):
                        f_, acc = carry
                        o = sp.gather_matmul_bykey(
                            f_, skj, qkj, wj, sentinel, qb=qb, sb=sb,
                            tg=tg)
                        s = o.sum()
                        return f_ + 1e-12 * s, acc + s
                    _, acc = jax.lax.fori_loop(
                        0, n, body, (f0, jnp.zeros((), jnp.float32)))
                    return acc
                r = chained(fj + 1e-6 * tag, jnp.asarray(n, jnp.int32))
                r.block_until_ready()
                return float(r)

            try:
                dt = measure_per_iter(run, args.n_small, args.n_big, reps=args.reps)
                print(f"bykey V={V} C={C} Co={Co} sent={sent} "
                      f"qb={qb} sb={sb} tg={tg}: {dt*1e3:.3f} ms/call",
                      flush=True)
            except Exception as e:
                print(f"bykey qb={qb} sb={sb} tg={tg}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


def make_group_inputs(B, N, Q, C, seed=0):
    rng = np.random.RandomState(seed)
    xyz = np.zeros((B, N, 3), np.float32)
    xyz[..., 0] = rng.uniform(0, 69, (B, N))
    xyz[..., 1] = rng.uniform(-39, 39, (B, N))
    xyz[..., 2] = rng.uniform(-2, 0.5, (B, N))
    feat = rng.randn(B, N, C).astype(np.float32)
    valid = np.ones((B, N), bool)
    qi = rng.choice(N, Q, replace=False)
    return xyz, feat, valid, xyz[:, qi]


def bench_group(args):
    import jax
    import jax.numpy as jnp

    from tsm_det_pointcloud_tpu.ops import group_pallas as gp

    B = args.b
    cases = [
        # layer-0 SA: 16384 src, 4096 q, ns=32, C=1 (small-C int path)
        ("sa0", 16384, 4096, 1, 32, 0.8, 0.4),
        # VSA: 4096 src, 512 q, ns=32, C=64
        ("vsa", 4096, 512, 64, 32, 3.2, 0.0),
        # Waymo layer-0 scale (b8 is the bench batch for this shape)
        ("wy0", 122880, 16384, 1, 32, 0.8, 0.4),
    ]
    if args.b > 8:
        cases = [c for c in cases if c[0] != "wy0"]
    for name, N, Q, C, ns, rmax, rmin in cases:
        xyz, feat, valid, q = make_group_inputs(B, N, Q, C)
        xyzj, featj, validj, qj = map(jnp.asarray, (xyz, feat, valid, q))

        for qb, sb, kc in args.group_params:
            gp.QB = qb
            gp.KC = kc
            gp.SB = sb          # prepare_sources picks sb from these
            gp.SB_LARGE_C = min(sb, 256)
            gp._fused_group._clear_cache()  # QB/KC/SB read at trace time

            def run(n, tag, sb=sb):
                @jax.jit
                def chained(q0, n):
                    def body(_, carry):
                        q_, acc = carry
                        prep = gp.prepare_sources(xyzj, featj, validj)
                        grouped, idx, cnt = gp.fused_query_group(
                            prep, q_, ns, rmax, rmin,
                            q_valid=jnp.ones((B, Q), bool))
                        s = grouped.sum() + jnp.sum(cnt).astype(jnp.float32)
                        return q_ + 1e-12 * s, acc + s
                    _, acc = jax.lax.fori_loop(
                        0, n, body, (q0, jnp.zeros((), jnp.float32)))
                    return acc
                r = chained(qj + 1e-6 * tag, jnp.asarray(n, jnp.int32))
                r.block_until_ready()
                return float(r)

            try:
                dt = measure_per_iter(run, args.n_small, args.n_big, reps=args.reps)
                print(f"group {name} N={N} Q={Q} C={C} ns={ns} "
                      f"QB={qb} SB={sb} KC={kc}: {dt*1e3:.3f} ms/call",
                      flush=True)
            except Exception as e:
                print(f"group {name} QB={qb} SB={sb} KC={kc}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


CONV_PARAMS = [(256, 512, 9), (256, 384, 9), (256, 256, 9),
               (256, 128, 9), (128, 256, 9)]
GROUP_PARAMS = [(128, 512, 4), (128, 256, 4), (128, 384, 4)]


def _parse_params(s):
    return [tuple(int(x) for x in grp.split(",")) for grp in s.split(";")]


def _sweep_subprocess(args):
    """Parent mode: one subprocess per (which, params) configuration. Each
    child claims the device fresh, so no compilation-cache or allocator
    state crosses configurations (the r4 0.000-ms failure mode)."""
    jobs = []
    if args.which in ("bykey", "all"):
        jobs += [("bykey", p) for p in CONV_PARAMS]
    if args.which in ("group", "all"):
        jobs += [("group", p) for p in GROUP_PARAMS]
    me = str(pathlib.Path(__file__).resolve())
    for which, p in jobs:
        cmd = [sys.executable, me, "--inproc", "--which", which,
               "--params", ",".join(map(str, p)),
               "--b", str(args.b), "--reps", str(args.reps),
               "--n_small", str(args.n_small), "--n_big", str(args.n_big),
               "--shape", str(args.shape)]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=1800)
        for line in r.stdout.splitlines():
            if line.startswith(("bykey", "group")):
                print(line, flush=True)
        if r.returncode != 0:
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            print(f"{which} {p}: SUBPROCESS FAIL rc={r.returncode} "
                  f"{' | '.join(tail)}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all",
                    choices=["bykey", "group", "all"])
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n_small", type=int, default=20)
    ap.add_argument("--n_big", type=int, default=120)
    ap.add_argument("--shape", type=int, default=-1,
                    help="bykey: only run this shape index")
    ap.add_argument("--inproc", action="store_true",
                    help="run all configs in THIS process (old behavior; "
                         "later rows are untrustworthy across config "
                         "switches — see module docstring)")
    ap.add_argument("--params", type=str, default="",
                    help="semicolon-separated qb,sb,tg (bykey) or QB,SB,KC "
                         "(group) triples; replaces the built-in grid")
    args = ap.parse_args()
    args.conv_params = (_parse_params(args.params) if args.params
                        else CONV_PARAMS)
    args.group_params = (_parse_params(args.params) if args.params
                         else GROUP_PARAMS)
    if not args.inproc:
        _sweep_subprocess(args)
        return
    if args.which in ("bykey", "all"):
        bench_bykey(args)
    if args.which in ("group", "all"):
        bench_group(args)


if __name__ == "__main__":
    main()
