"""Runtime tests: optimizer factory, student-only masking, checkpoint
save/rotate/restore, and the train loop over a synthetic loader."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tsm_det_pointcloud_tpu.parallel.train_state import (
    TrainState,
    create_train_step,
    student_mask,
    wrap_student_only,
)
from tsm_det_pointcloud_tpu.runtime.checkpoint import (
    latest_checkpoint,
    partial_load,
    restore_checkpoint,
    save_checkpoint,
)
from tsm_det_pointcloud_tpu.runtime.optimization import build_optimizer


def test_onecycle_schedule_shape():
    tx, lr_fn = build_optimizer(
        {"OPTIMIZER": "adam_onecycle", "LR": 0.01, "WEIGHT_DECAY": 0.01,
         "MOMS": [0.95, 0.85], "DIV_FACTOR": 10, "PCT_START": 0.3,
         "GRAD_NORM_CLIP": 10.0},
        total_steps=100,
    )
    lrs = [float(lr_fn(s)) for s in range(0, 101, 10)]
    assert abs(lrs[0] - 0.001) < 1e-6           # lr/div_factor at step 0
    assert abs(max(lrs) - 0.01) < 1e-3          # peaks at LR
    assert lrs[-1] < 1e-4                       # anneals to ~lr*1e-4


def test_student_mask_and_wrap():
    params = {
        "sa0": {"w": jnp.ones((3,))},
        "s_sa1": {"w": jnp.ones((3,))},
        "head": {"s_head_not_top": {"w": jnp.ones((2,))}},
    }
    mask = student_mask(params)
    assert mask["s_sa1"]["w"] is True
    assert mask["sa0"]["w"] is False
    assert mask["head"]["s_head_not_top"]["w"] is True  # any segment

    tx = wrap_student_only(optax.sgd(1.0), params)
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(grads, st, params)
    assert float(jnp.abs(upd["sa0"]["w"]).max()) == 0.0
    assert float(jnp.abs(upd["s_sa1"]["w"]).max()) == 1.0


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    state = {
        "params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "batch_stats": {}, "statistics": {}, "opt_state": {"m": np.ones(3)},
        "epoch": 3, "it": 42,
    }
    for e in range(1, 5):
        save_checkpoint(dict(state, epoch=e), tmp_path, e, max_ckpt_save_num=2)
    latest = latest_checkpoint(tmp_path)
    assert latest.endswith("checkpoint_epoch_4")
    # rotation kept only 2
    kept = sorted(os.listdir(tmp_path))
    assert len([k for k in kept if k.startswith("checkpoint_epoch")]) == 2
    loaded = restore_checkpoint(latest)
    np.testing.assert_array_equal(loaded["params"]["a"], state["params"]["a"])
    assert int(loaded["it"]) == 42


def test_checkpoint_fallback_format_roundtrip(tmp_path, monkeypatch):
    """The no-orbax fallback (state.pkl) must round-trip, and a fallback
    checkpoint must restore even when orbax IS available (portability
    across dependency states)."""
    import tsm_det_pointcloud_tpu.runtime.checkpoint as ck

    state = {
        "params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "batch_stats": {}, "statistics": {}, "opt_state": {"m": np.ones(3)},
        "epoch": 1, "it": 7,
    }
    monkeypatch.setattr(ck, "_HAS_ORBAX", False)
    path = ck.save_checkpoint(state, tmp_path, 1)
    assert os.path.exists(os.path.join(path, "state.pkl"))
    loaded = ck.restore_checkpoint(path)
    np.testing.assert_array_equal(loaded["params"]["a"], state["params"]["a"])
    assert int(loaded["it"]) == 7
    # restore-into-target path
    tgt = {k: (np.zeros_like(v) if isinstance(v, np.ndarray) else 0)
           for k, v in [("epoch", 0), ("it", 0)]}
    # full-structure target
    import jax

    tgt = jax.tree_util.tree_map(lambda x: np.zeros_like(np.asarray(x)), state)
    loaded2 = ck.restore_checkpoint(path, target=tgt)
    np.testing.assert_array_equal(loaded2["params"]["a"], state["params"]["a"])
    # orbax present again: the pkl format still restores (auto-detect)
    monkeypatch.setattr(ck, "_HAS_ORBAX", True)
    loaded3 = ck.restore_checkpoint(path)
    np.testing.assert_array_equal(loaded3["params"]["a"], state["params"]["a"])


def test_partial_load_merges_matching():
    params = {"a": np.zeros((2,)), "b": {"c": np.zeros((3,))}}
    loaded = {"a": np.ones((2,)), "b": {"c": np.ones((4,))}}  # c mismatched
    merged = partial_load(params, loaded)
    np.testing.assert_array_equal(merged["a"], np.ones((2,)))
    np.testing.assert_array_equal(merged["b"]["c"], np.zeros((3,)))

pytestmark = pytest.mark.slow


def test_train_step_with_statistics_collection():
    import flax.linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, batch_dict, training=False):
            x = batch_dict["x"]
            w = self.param("s_w", nn.initializers.ones, (4,))
            stat = self.variable(
                "statistics", "buf", lambda: jnp.zeros((4,))
            )
            if training and self.is_mutable_collection("statistics"):
                stat.value = stat.value + x.mean(0)
            batch_dict["loss"] = ((x * w) ** 2).mean() + 0.0 * stat.value.sum()
            batch_dict["tb_dict"] = {}
            return batch_dict

    model = Toy()
    batch = {"x": jnp.ones((2, 4))}
    variables = model.init(jax.random.PRNGKey(0), dict(batch), training=False)
    tx = optax.sgd(0.1)
    state = TrainState(
        params=variables["params"], batch_stats={},
        opt_state=tx.init(variables["params"]), step=0,
        statistics=variables["statistics"],
    )
    step = create_train_step(model, tx)
    s1, m1 = step(state, batch)
    s2, m2 = step(s1, batch)
    assert float(m2["loss"]) < float(m1["loss"])
    np.testing.assert_allclose(np.asarray(s2.statistics["buf"]), 2.0)
    assert int(s2.step) == 2


def test_bn_stats_are_global_under_mesh():
    """SyncBatchNorm parity: under jit + batch sharding, BN batch stats are
    computed over the GLOBAL batch (XLA inserts the cross-replica reduce),
    so --sync_bn semantics hold by construction."""
    import flax.linen as nn
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, training=True):
            return nn.BatchNorm(use_running_average=not training,
                                momentum=0.0)(x)

    model = M()
    rng = np.random.RandomState(0)
    x = rng.randn(8, 4).astype(np.float32) * 3 + 1
    variables = model.init(jax.random.PRNGKey(0), x)

    # single device
    _, m1 = model.apply(variables, x, mutable=["batch_stats"])

    # 8-device mesh, batch sharded
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vr = jax.device_put(variables, NamedSharding(mesh, P()))
    m8 = jax.jit(
        lambda v, xx: model.apply(v, xx, mutable=["batch_stats"])[1]
    )(vr, xs)

    np.testing.assert_allclose(
        np.asarray(m1["batch_stats"]["BatchNorm_0"]["mean"]),
        np.asarray(m8["batch_stats"]["BatchNorm_0"]["mean"]),
        rtol=1e-5, atol=1e-6,
    )


def test_transfer_statistics_across_nestings():
    """Teacher heads own the statistic buffers inside a 'head' submodule;
    the distillation head declares them at its own scope. The transfer
    must match by leaf name + shape, not structure — a structural copy
    silently leaves the student's buffers at zero (dead conditioning)."""
    import numpy as np
    from tsm_det_pointcloud_tpu.runtime.checkpoint import transfer_statistics

    teacher = {"point_head": {"head": {
        "object_statistic_features": np.full((3, 8), 2.0),
        "object_momentum": np.full((3, 8), 3.0),
        "object_mean": np.full((3, 8), 4.0),
    }}}
    student = {"point_head": {
        "object_statistic_features": np.zeros((3, 8)),
        "object_momentum": np.zeros((3, 8)),
        "object_mean": np.zeros((3, 8)),
    }}
    out = transfer_statistics(student, teacher)
    np.testing.assert_array_equal(
        out["point_head"]["object_statistic_features"], 2.0 * np.ones((3, 8)))
    np.testing.assert_array_equal(
        out["point_head"]["object_momentum"], 3.0 * np.ones((3, 8)))
    np.testing.assert_array_equal(
        out["point_head"]["object_mean"], 4.0 * np.ones((3, 8)))

    # shape mismatch -> keep destination
    teacher_bad = {"a": {"object_mean": np.ones((5, 5))}}
    out2 = transfer_statistics({"object_mean": np.zeros((3, 8))}, teacher_bad)
    np.testing.assert_array_equal(out2["object_mean"], np.zeros((3, 8)))
