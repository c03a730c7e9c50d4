"""True multi-PROCESS distributed path (VERDICT r2 #6): two real
subprocess workers form a jax.distributed job (CPU backend, gloo
collectives, local coordinator), run a tools/test.py-style sharded eval
over a mini KITTI root, and rank 0 must recover the FULL, ordered,
deduplicated result set through parallel/comm.merge_results_dist.

This executes every code path in parallel/comm.py with
process_count == 2 for real — the round-2 gap was that all of it had
only ever run single-process (where each helper short-circuits).
Reference equivalent: tools/test.py:144-151 + commu_utils.all_gather.
"""
import json
import pickle
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from tests.test_kitti_pipeline import dataset_cfg, make_kitti_root

pytestmark = pytest.mark.slow
REPO = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_eval(tmp_path):
    from tsm_det_pointcloud_tpu.datasets.kitti.kitti_dataset import (
        create_kitti_infos,
    )

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    root, ids = make_kitti_root(data_dir, n_frames=6)
    cfg = dataset_cfg(root)
    create_kitti_infos(
        cfg, class_names=["Car", "Pedestrian", "Cyclist"],
        data_path=root, save_path=root, workers=1,
    )
    out = tmp_path / "out"
    out.mkdir()

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "mp_eval_worker.py"),
             str(rank), "2", str(port), str(root), str(out)],
            cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        outputs.append(stdout)
    assert all(p.returncode == 0 for p in procs), \
        "worker failed:\n" + "\n----\n".join(outputs)

    with open(out / "result.json") as f:
        res = json.load(f)
    with open(out / "shard_1.json") as f:
        shard1 = json.load(f)

    # the eval split of the mini root (val == train ids here)
    with open(root / "kitti_infos_train.pkl", "rb") as f:
        order = [info["point_cloud"]["lidar_idx"]
                 for info in pickle.load(f)]

    # disjoint shards covering the dataset
    s0, s1 = set(res["my_shard"]), set(shard1["my_shard"])
    assert s0.isdisjoint(s1)
    assert s0 | s1 == set(order)

    # merged: full, deduplicated, dataset order
    merged_ids = [d["frame_id"] for d in res["merged"]]
    assert merged_ids == order
    assert len(set(merged_ids)) == res["dataset_len"]
    # provenance: both ranks contributed
    assert {d["rank"] for d in res["merged"]} == {0, 1}

    # scalar collectives
    assert res["mean_rank"] == pytest.approx(0.5)
    assert res["reduced"]["loss"] == pytest.approx(1.5)   # mean(1, 2)
    assert res["reduced"]["n"] == pytest.approx(15.0)     # mean(10, 20)
    assert res["reduced_sum"]["n"] == pytest.approx(30.0)  # sum(10, 20)
    # arbitrary-object gather with per-rank payload sizes
    assert res["gathered"] == [{"rank": 0, "n": 3}, {"rank": 1, "n": 3}]
