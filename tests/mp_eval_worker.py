"""Worker for the true multi-process eval test (spawned as a subprocess
by tests/test_multiprocess_dist.py — 2 of these form a real
jax.distributed job on the CPU backend with gloo collectives).

Mirrors tools/test.py's sharded-eval flow (:93-106): disjoint loader
shard per process -> per-sample det annos -> parallel/comm collectives
(merge_results_dist / all_reduce_mean / reduce_dict). Rank 0 dumps the
merged results for the parent test to assert on.

Usage: python tests/mp_eval_worker.py <rank> <world> <port> <root> <out>
"""
import json
import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    rank, world, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    root, out = pathlib.Path(sys.argv[4]), pathlib.Path(sys.argv[5])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=world,
        process_id=rank,
    )
    assert jax.process_count() == world

    from tests.test_kitti_pipeline import dataset_cfg
    from tsm_det_pointcloud_tpu.datasets import build_dataloader
    from tsm_det_pointcloud_tpu.parallel import comm

    cfg = dataset_cfg(root)
    dataset, loader, _ = build_dataloader(
        dataset_cfg=cfg, class_names=["Car", "Pedestrian", "Cyclist"],
        batch_size=2, training=False, workers=0,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
    )

    det_annos = []
    seen = []
    for batch in loader:
        for fid in batch["frame_id"]:
            fid = str(fid)
            seen.append(fid)
            det_annos.append({"frame_id": fid, "rank": rank})

    merged = comm.merge_results_dist(det_annos, len(dataset))
    mean_rank = comm.all_reduce_mean(float(rank))
    red = comm.reduce_dict({"loss": 1.0 + rank, "n": 10.0 * (rank + 1)},
                           average=True)
    red_sum = comm.reduce_dict({"n": 10.0 * (rank + 1)}, average=False)
    gathered_objs = comm.all_gather_object({"rank": rank, "n": len(seen)})

    if rank == 0:
        with open(out / "result.json", "w") as f:
            json.dump({
                "merged": merged,
                "my_shard": seen,
                "dataset_len": len(dataset),
                "mean_rank": mean_rank,
                "reduced": red,
                "reduced_sum": red_sum,
                "gathered": gathered_objs,
            }, f)
    else:
        with open(out / f"shard_{rank}.json", "w") as f:
            json.dump({"my_shard": seen}, f)
    print(f"rank{rank} done", flush=True)


if __name__ == "__main__":
    main()
