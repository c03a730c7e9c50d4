"""tools/train.py on the 8-device virtual CPU mesh: the production CLI
must build the data mesh itself (reference trains distributed out of the
box, tools/train.py:60-73,154-155), shard each batch disjointly across
devices, keep params replicated, stream tb_dict metrics to JSONL, and
repeat-eval the trailing checkpoints in-process (tools/train.py:192-209)."""
import pytest
import json
import sys
from pathlib import Path

import numpy as np

from tests.test_cli_roundtrip import write_mini_cfg
from tests.test_kitti_pipeline import dataset_cfg, make_kitti_root


pytestmark = pytest.mark.slow
REPO = Path(__file__).resolve().parent.parent


def test_train_cli_multidevice(tmp_path, monkeypatch):
    import jax

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"

    root, _ids = make_kitti_root(tmp_path, n_frames=8)
    from tsm_det_pointcloud_tpu.datasets.kitti.kitti_dataset import (
        create_kitti_infos,
    )

    create_kitti_infos(dataset_cfg(root), ["Car"], root, root, workers=1)
    cfg_path = write_mini_cfg(tmp_path, root)

    sys.path.insert(0, str(REPO / "tools"))
    import train as train_cli

    from tsm_det_pointcloud_tpu.runtime import train_loop as tl

    captured = {"batches": [], "states": []}
    real_shard = tl.shard_batch
    real_create = tl.create_train_step

    def spy_shard(batch, mesh, axis="data"):
        out = real_shard(batch, mesh, axis=axis)
        captured["batches"].append(out)
        return out

    def spy_create(model, tx, **kw):
        step = real_create(model, tx, **kw)

        def wrapped(state, batch):
            new_state, metrics = step(state, batch)
            captured["states"].append(new_state)
            return new_state, metrics

        return wrapped

    monkeypatch.setattr(tl, "shard_batch", spy_shard)
    monkeypatch.setattr(tl, "create_train_step", spy_create)

    monkeypatch.setattr(sys, "argv", [
        "train.py", "--cfg_file", str(cfg_path), "--epochs", "2",
        "--extra_tag", "multidev_test", "--workers", "0",
        "--num_epochs_to_eval", "2",
        "--set", "OPTIMIZATION.BATCH_SIZE_PER_GPU", "8",
    ])
    train_cli.main()

    # ---- the CLI actually used the mesh ----
    assert captured["batches"], "train.py never sharded a batch over a mesh"
    pts = captured["batches"][0]["points"]
    assert len(pts.sharding.device_set) == 8, (
        "batch not sharded over all 8 devices: %s" % (pts.sharding,)
    )
    # disjoint equal slices along the batch axis: every device holds
    # exactly batch/8 frames, and the shard index ranges tile [0, 8)
    starts = set()
    for shard in pts.addressable_shards:
        assert shard.data.shape[0] == 1
        starts.add(shard.index[0].start or 0)
    assert starts == set(range(8)), f"shards not disjoint/covering: {starts}"

    # ---- params replicated across the mesh ----
    assert captured["states"], "no train step executed"
    leaf = jax.tree_util.tree_leaves(captured["states"][-1].params)[0]
    assert leaf.sharding.is_fully_replicated
    assert len(leaf.sharding.device_set) == 8

    exp_group = "/".join(str(cfg_path).split("/")[1:-1])
    out_dir = (
        REPO / "output" / exp_group / "mini_pointpillar" / "multidev_test"
    )

    # ---- tb_dict streaming (reference train_utils.py:101-105) ----
    metrics_file = out_dir / "metrics.jsonl"
    assert metrics_file.exists(), "no metrics.jsonl written"
    rows = [json.loads(l) for l in metrics_file.read_text().splitlines()]
    train_rows = [r for r in rows if "train/loss" in r]
    assert train_rows, "no train loss rows streamed"
    # every tb_dict key, not just the mean loss
    assert any(
        len([k for k in r if k.startswith("train/")]) > 1 for r in train_rows
    ), "only loss streamed; tb_dict keys missing"
    eval_rows = [r for r in rows if any(k.startswith("eval/") for k in r)]
    assert eval_rows, "no eval scalars streamed"

    # ---- in-train repeat-eval summaries per epoch ----
    summaries = sorted(
        (out_dir / "eval" / "eval_with_train").glob("epoch_*/val/eval_summary.json")
    )
    assert len(summaries) == 2, (
        "expected eval summaries for the last 2 epochs, got %s" % summaries
    )
    for s in summaries:
        data = json.loads(s.read_text())
        assert "sec_per_example" in data
