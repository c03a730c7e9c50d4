"""Voxel-hash SA backbone tests (the TSM core) on tiny CPU shapes:
layer-0 centroid construction, layer-1 voxel-query + U-Net update,
distillation teacher/student wiring + stop_gradient contract."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.models.backbones_3d.voxel_pointnet2_backbone import (
    VoxelPointNet2FSMSG,
    VoxelPointNet2FSMSGDistillation,
    factored_grid,
)
from tsm_det_pointcloud_tpu.utils.edict import EDict

pytestmark = pytest.mark.slow

PCR = [0.0, -8.0, -2.0, 16.0, 8.0, 2.0]
VOXEL = [0.25, 0.25, 0.25]  # factored size = 1.0 with FACTOR=4


def sa_config(npoints=((64,), (16,)), agg=((32,), (48,)), nsample=8):
    return {
        "NPOINT_LIST": [list(n) for n in npoints],
        "SAMPLE_RANGE_LIST": [[[0, 256]], [[0, 64]]],
        "SAMPLE_METHOD_LIST": [["d-fps"], ["s-fps"]],
        "QUERY_RANGE": [
            [[0, 0, 0], [0, 0, 0]],
            [[2, 2, 2], [4, 4, 4]],
        ],
        "STRIDE": [[[0, 0, 0], [0, 0, 0]], [[1, 1, 1], [1, 1, 1]]],
        "RADIUS": [[0.5, 1.0], [1.0, 3.0]],
        "NSAMPLE": [[nsample, nsample], [nsample, nsample]],
        "MLPS": [[[8, 16], [8, 16]], [[16, 24], [16, 24]]],
        "SPCONV_MLPS_PRE": [[0, 0, 32], [48]],
        "AGGREGATION_MLPS": [list(a) for a in agg],
        "CONFIDENCE_MLPS": [[16], [16]],
        "WEIGHT_GAMMA": 1.0,
        "DILATED_RADIUS_GROUP": True,
    }


def model_cfg():
    return EDict({
        "NAME": "VoxelPointNet2FSMSG",
        "FACTOR": 4,
        "VOXEL_CONFIG": {
            "POINT_CLOUD_RANGE": PCR,
            "VOXEL_SIZE": VOXEL,
        },
        "SA_CONFIG": sa_config(),
        "S_SA_CONFIG": sa_config(agg=((32,), (24,))),
    })


def batch(b=2, n=256, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 15.5, (b, n))
    pts[..., 1] = rng.uniform(-7.5, 7.5, (b, n))
    pts[..., 2] = rng.uniform(-1.5, 1.5, (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "batch_size": b,
    }


def test_factored_grid():
    assert factored_grid(PCR, (1.0, 1.0, 1.0)) == (4, 16, 16)


def test_teacher_backbone_forward():
    cfg = model_cfg()
    m = VoxelPointNet2FSMSG(model_cfg=cfg, input_channels=4, meta=None)
    bd = batch()
    vars_ = m.init(jax.random.PRNGKey(0), dict(bd), training=False)
    out = m.apply(vars_, dict(bd), training=False)
    assert out["point_features"].shape == (2, 16, 48)
    assert out["point_coords"].shape == (2, 16, 3)
    # per-voxel confidence on the layer-1 sp tensor (capacity = 64)
    assert out["point_scores"].shape == (2, 64, 3)
    assert out["statistic_feature"].shape == (2, 64, 48)
    assert len(out["point_scores_list"]) == 2
    assert np.isfinite(np.asarray(out["point_features"])).all()
    # sampled point slots map into the sp tensor
    slot = np.asarray(out["last_point_slot"])
    assert slot.shape == (2, 16)
    assert (slot < 64).all()


def test_teacher_backbone_grads():
    cfg = model_cfg()
    m = VoxelPointNet2FSMSG(model_cfg=cfg, input_channels=4, meta=None)
    bd = batch()
    vars_ = m.init(jax.random.PRNGKey(0), dict(bd), training=False)
    params = vars_["params"]
    other = {k: v for k, v in vars_.items() if k != "params"}

    def loss_fn(p):
        out, _ = m.apply({"params": p, **other}, dict(bd), training=True,
                         mutable=["batch_stats"])
        return (out["point_features"] ** 2).mean() + (
            jax.nn.sigmoid(out["point_scores"]) ** 2
        ).mean()

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_distillation_backbone_train_and_eval():
    cfg = model_cfg()
    cfg["NAME"] = "VoxelPointNet2FSMSGDistillation"
    m = VoxelPointNet2FSMSGDistillation(
        model_cfg=cfg, input_channels=4, meta=None
    )
    bd = batch()
    vars_tr = m.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out_tr = m.apply(vars_tr, dict(bd), training=True,
                     mutable=["batch_stats"])[0]
    # teacher keys exist in training
    assert out_tr["point_features"].shape == (2, 16, 48)
    assert out_tr["s_point_features"].shape == (2, 16, 24)
    assert out_tr["s_statistic_feature"].shape == (2, 64, 24)

    out_ev = m.apply(vars_tr, dict(bd), training=False)
    assert "s_point_features" in out_ev
    assert "point_features" not in out_ev  # teacher tail skipped at eval

    # teacher params get ZERO gradient (stop_gradient contract)
    params = vars_tr["params"]
    other = {k: v for k, v in vars_tr.items() if k != "params"}

    def loss_fn(p):
        o, _ = m.apply({"params": p, **other}, dict(bd), training=True,
                       mutable=["batch_stats"])
        return (o["s_point_features"] ** 2).mean()

    g = jax.grad(loss_fn)(params)
    t_leaves = jax.tree_util.tree_leaves(g.get("sa0", {})) + \
        jax.tree_util.tree_leaves(g.get("sa1", {}))
    s_leaves = jax.tree_util.tree_leaves(g.get("s_sa1", {}))
    assert all(float(jnp.abs(x).max()) == 0 for x in t_leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in s_leaves)
