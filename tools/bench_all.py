"""Run every headline benchmark in ONE process (one TPU claim).

The axon relay serializes device claims and a claim can take minutes, so
separate bench invocations pay it repeatedly — this driver imports the
individual benches and runs them back-to-back inside a single process:

  * bench.py           KITTI TSM eval throughput (b16 x 16384)
  * tools/bench_waymo  Waymo TSM eval throughput (b8 x 122880)
  * tools/bench_train  TSM distill train-step throughput (b8)

Each prints its own one-line JSON; failures in one bench don't stop the
rest (the traceback is printed and the driver moves on).

CAVEAT (measured r4): the LATER benches read low in this shared process
(waymo 16.06 here vs 17.68/17.92 standalone on the same commit —
compilation-cache/allocator state from the KITTI run pollutes them). The
first (KITTI) number is clean; for waymo/train use standalone runs of
tools/bench_waymo.py / tools/bench_train.py.
"""
import pathlib
import sys
import traceback

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))


def main():
    import bench
    import bench_train
    import bench_waymo

    for name, fn in (
        ("kitti_eval", bench.main),
        ("waymo_eval", bench_waymo.main),
        ("train_step", bench_train.main),
    ):
        print(f"=== {name} ===", flush=True)
        try:
            fn()
        except Exception:
            traceback.print_exc()


if __name__ == "__main__":
    main()
