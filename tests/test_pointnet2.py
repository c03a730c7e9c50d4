"""PointNet++ SA/FP module and backbone tests (CPU, tiny shapes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.models.backbones_3d.pointnet2_modules import (
    PointnetFPModule,
    PointnetSAModuleFSMSG,
    PointnetSAModuleMSG,
    sample_by_methods,
)
from tsm_det_pointcloud_tpu.models.backbones_3d.pointnet2_backbone import (
    PointNet2FSMSG,
    PointNet2MSG,
)
from tsm_det_pointcloud_tpu.utils.edict import EDict


def cloud(b=2, n=256, c=4, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-5, 5, (b, n, 3)).astype(np.float32)
    feats = rng.randn(b, n, c).astype(np.float32)
    valid = np.ones((b, n), bool)
    valid[:, n - 20:] = False  # padded tail
    return jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(valid)


def test_sa_msg_shapes_and_mask():
    xyz, feats, valid = cloud()
    m = PointnetSAModuleMSG(
        npoint=64, radii=[0.5, 1.0], nsamples=[8, 16], mlps=[[8, 16], [8, 32]]
    )
    vars_ = m.init(jax.random.PRNGKey(0), xyz, feats, valid, training=False)
    new_xyz, new_feats, new_valid = m.apply(vars_, xyz, feats, valid)
    assert new_xyz.shape == (2, 64, 3)
    assert new_feats.shape == (2, 64, 16 + 32)
    assert np.isfinite(np.asarray(new_feats)).all()
    # sampled points must come from the valid set
    pts = np.asarray(xyz)
    sel = np.asarray(new_xyz)
    ok = np.asarray(new_valid)
    for b in range(2):
        for i in range(64):
            if ok[b, i]:
                d = np.abs(pts[b, :236] - sel[b, i]).sum(-1).min()
                assert d < 1e-5


def test_fusion_sampling_methods():
    xyz, feats, valid = cloud(n=128)
    scores = jnp.asarray(np.random.RandomState(1).randn(2, 128, 3))
    idx = sample_by_methods(
        xyz, feats, scores, valid,
        npoint_list=[16, 16],
        sample_range_list=[[0, 64], [64, 128]],
        sample_method_list=["d-fps", "s-fps"],
    )
    assert idx.shape == (2, 32)
    assert int(idx[:, :16].max()) < 64
    assert int(idx[:, 16:].min()) >= 64


@pytest.mark.slow  # module-level forward: full-suite tier
def test_sa_fsmsg_with_confidence():
    xyz, feats, valid = cloud(n=128)
    m = PointnetSAModuleFSMSG(
        npoint_list=[32], sample_range_list=[[0, 128]],
        sample_method_list=["d-fps"], radii=[0.5, 1.5],
        nsamples=[8, 8], mlps=[[8, 16], [8, 16]],
        dilated_group=True, aggregation_mlp=[24], confidence_mlp=[16],
        num_class=3,
    )
    vars_ = m.init(jax.random.PRNGKey(0), xyz, feats, valid, training=False)
    new_xyz, new_feats, new_valid, new_scores = m.apply(
        vars_, xyz, feats, valid
    )
    assert new_feats.shape == (2, 32, 24)
    assert new_scores.shape == (2, 32, 3)
    # focal bias init -> scores near log(1/99)
    s = np.asarray(new_scores)[np.asarray(new_valid)]
    assert (jax.nn.sigmoid(s) < 0.2).all()


def test_fp_module_interpolates():
    xyz, feats, valid = cloud(n=64, c=8)
    known = xyz[:, :16]
    known_feats = feats[:, :16]
    m = PointnetFPModule(mlp=[8])
    vars_ = m.init(
        jax.random.PRNGKey(0), xyz, known, feats, known_feats,
        valid[:, :16], False, valid,
    )
    out = m.apply(vars_, xyz, known, feats, known_feats, valid[:, :16],
                  False, valid)
    assert out.shape == (2, 64, 8)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow  # module-level forward: full-suite tier
def test_pointnet2msg_backbone():
    xyz, feats, valid = cloud(n=256, c=1)
    cfg = EDict({
        "SA_CONFIG": {
            "NPOINTS": [64, 16],
            "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
            "NSAMPLE": [[8, 8], [8, 8]],
            "MLPS": [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
        },
        "FP_MLPS": [[16], [16]],
    })
    m = PointNet2MSG(model_cfg=cfg, input_channels=4)
    batch = {
        "points": jnp.concatenate([xyz, feats], -1),
        "points_mask": valid, "batch_size": 2,
    }
    vars_ = m.init(jax.random.PRNGKey(0), dict(batch), training=False)
    out = m.apply(vars_, dict(batch), training=False)
    assert out["point_features"].shape == (2, 256, 16)
    assert out["point_coords"].shape == (2, 256, 3)


@pytest.mark.slow  # module-level forward: full-suite tier
def test_pointnet2fsmsg_backbone_pyramid():
    xyz, feats, valid = cloud(n=256, c=1)
    cfg = EDict({
        "SA_CONFIG": {
            "NPOINT_LIST": [[64], [16]],
            "SAMPLE_RANGE_LIST": [[[0, 256]], [[0, 64]]],
            "SAMPLE_METHOD_LIST": [["d-fps"], ["s-fps"]],
            "RADIUS": [[0.5, 1.0], [1.0, 2.0]],
            "NSAMPLE": [[8, 8], [8, 8]],
            "MLPS": [[[8, 8], [8, 8]], [[16, 16], [16, 16]]],
            "AGGREGATION_MLPS": [[16], [32]],
            "CONFIDENCE_MLPS": [[8], [8]],
            "DILATED_RADIUS_GROUP": True,
            "WEIGHT_GAMMA": 1.0,
        },
    })
    m = PointNet2FSMSG(model_cfg=cfg, input_channels=4)
    batch = {
        "points": jnp.concatenate([xyz, feats], -1),
        "points_mask": valid, "batch_size": 2,
    }
    vars_ = m.init(jax.random.PRNGKey(0), dict(batch), training=False)
    out = m.apply(vars_, dict(batch), training=False)
    assert out["point_features"].shape == (2, 16, 32)
    assert out["point_coords"].shape == (2, 16, 3)
    assert out["point_scores"].shape == (2, 16, 3)
    assert len(out["point_scores_list"]) == 2
    assert out["point_scores_list"][0].shape == (2, 64, 3)
    # gradients flow end to end
    def loss_fn(p):
        o = m.apply({"params": p, **{k: v for k, v in vars_.items() if k != "params"}},
                    dict(batch), training=True, mutable=["batch_stats"])[0]
        return (o["point_features"] ** 2).mean()
    g = jax.grad(loss_fn)(vars_["params"])
    assert any(float(jnp.abs(x).max()) > 0 for x in jax.tree_util.tree_leaves(g))


def test_shared_mlp_bf16_compute_dtype(monkeypatch):
    """TSM_COMPUTE_DTYPE=bfloat16 switches the SharedMLP activation stream
    to bf16 (params stay f32) and stays numerically close to the f32 path;
    default (unset) remains float32."""
    from tsm_det_pointcloud_tpu.models.backbones_3d.pointnet2_modules import (
        SharedMLP,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 8).astype(np.float32))
    mlp = SharedMLP([16, 32])
    monkeypatch.delenv("TSM_COMPUTE_DTYPE", raising=False)
    variables = mlp.init(jax.random.PRNGKey(0), x)
    y32 = mlp.apply(variables, x)
    assert y32.dtype == jnp.float32

    monkeypatch.setenv("TSM_COMPUTE_DTYPE", "bfloat16")
    y16 = mlp.apply(variables, x)
    assert y16.dtype == jnp.bfloat16
    # params untouched (master copies stay f32)
    assert variables["params"]["fc0"]["kernel"].dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(y32))) + 1e-6
    err = float(jnp.max(jnp.abs(y32 - y16.astype(jnp.float32)))) / scale
    assert err < 0.05, f"bf16 path diverged from f32: rel err {err}"
