"""Run every headline benchmark, one SUBPROCESS per bench (r5 default).

r4 measured that benches sharing one process pollute each other: waymo
read 16.06 in-process vs 17.68/17.92 standalone on the same commit
(compilation-cache/allocator state from the preceding KITTI run). Each
bench now runs in its own process — it pays an axon device claim per
bench, but the numbers match standalone runs by construction.

  * bench.py           KITTI TSM eval throughput (b16 x 16384)
  * tools/bench_waymo  Waymo TSM eval throughput (b8 x 122880)
  * tools/bench_train  TSM distill train-step throughput (b8)

`--inproc` restores the old single-claim behavior (first number clean,
later ones low-reading — smoke use only).
"""
import argparse
import pathlib
import subprocess
import sys
import traceback

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

BENCHES = (
    ("kitti_eval", ROOT / "bench.py"),
    ("waymo_eval", ROOT / "tools" / "bench_waymo.py"),
    ("train_step", ROOT / "tools" / "bench_train.py"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inproc", action="store_true",
                    help="one process / one device claim (later benches "
                         "read low; see module docstring)")
    args, _ = ap.parse_known_args()

    if args.inproc:
        import bench
        import bench_train
        import bench_waymo

        for name, fn in (("kitti_eval", bench.main),
                         ("waymo_eval", bench_waymo.main),
                         ("train_step", bench_train.main)):
            print(f"=== {name} ===", flush=True)
            try:
                fn()
            except Exception:
                traceback.print_exc()
        return

    for name, path in BENCHES:
        print(f"=== {name} ===", flush=True)
        try:
            r = subprocess.run([sys.executable, str(path)], timeout=3600,
                               capture_output=True, text=True)
            sys.stdout.write(r.stdout)
            if r.returncode != 0:
                tail = (r.stderr or "").strip().splitlines()[-5:]
                print(f"{name}: FAIL rc={r.returncode} "
                      f"{' | '.join(tail)}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
