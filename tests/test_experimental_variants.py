"""Experimental TSM-project variants: the BEV/point hybrid 2D backbones
(BEVPoint / PointFromVoxel / SparsePointBackbone / VoxelPointCross), the
VoxelPointCross neck, SPVFE, and the PVSSDA detector path.

The hybrids consume the spconv multi-scale pyramid
(multi_scale_3d_features); the tests build a small synthetic pyramid
directly (sorted-key SparseTensor rows, the backbone's layout contract)
and drive each module's full contract: output shapes, masks, statistics
buffers, gradient flow, and the train/eval selection paths."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta
from tsm_det_pointcloud_tpu.models.backbones_3d.spconv_backbone import SparseTensor
from tsm_det_pointcloud_tpu.models.backbones_2d.point_bev_hybrids import (
    BEVPoint, PointFromVoxel, SparsePointBackbone,
    VoxelPointCross as VoxelPointCross2D, split_select, subset_fps,
)
from tsm_det_pointcloud_tpu.models.neck.voxel_point_cross import (
    VoxelPointCross as VPCNeck,
)
from tsm_det_pointcloud_tpu.ops import spconv as sp_ops

pytestmark = pytest.mark.slow

PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
VOXEL = (0.5, 0.5, 0.1)

META = DatasetMeta(
    class_names=("Car",), point_cloud_range=PCR,
    voxel_size=(0.5, 0.5, 4.0), grid_size=(32, 32, 1),
    max_voxels=256, max_points_per_voxel=8,
    num_point_features=4, max_points=256,
)


def batch(b=2, n=256, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.zeros((b, n, 4), np.float32)
    pts[..., 0] = rng.uniform(0.5, 15.5, (b, n))
    pts[..., 1] = rng.uniform(-7.5, 7.5, (b, n))
    pts[..., 2] = rng.uniform(-2.5, 0.5, (b, n))
    pts[..., 3] = rng.uniform(0, 1, (b, n))
    gt = np.zeros((b, 2, 8), np.float32)
    gv = np.zeros((b, 2), bool)
    gt[:, 0] = [8, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
    gv[:, 0] = True
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_boxes_mask": jnp.asarray(gv),
        "batch_size": b,
        "accumulated_iter": jnp.zeros((), jnp.int32),
    }


def make_sparse(rng, b, v, c, grid, stride):
    """Synthetic SparseTensor with rows sorted by linearized key (the
    layout every probe-based consumer assumes)."""
    gz, gy, gx = grid
    rows = []
    coords = np.full((b, v, 3), -1, np.int32)
    feats = rng.standard_normal((b, v, c)).astype(np.float32)
    valid = np.zeros((b, v), bool)
    for i in range(b):
        n = rng.integers(v // 2, v + 1)
        keys = rng.choice(gz * gy * gx, size=n, replace=False)
        keys.sort()
        coords[i, :n, 0] = keys // (gy * gx)
        coords[i, :n, 1] = (keys // gx) % gy
        coords[i, :n, 2] = keys % gx
        valid[i, :n] = True
    return SparseTensor(
        features=jnp.asarray(feats), coords=jnp.asarray(coords),
        valid=jnp.asarray(valid), grid=grid, stride=stride,
    )


def make_pyramid(b=2, seed=0):
    """x_conv2..4-style pyramid over the PCR/VOXEL geometry + batch dict."""
    rng = np.random.default_rng(seed)
    bd = batch(b)
    g0 = (40, 32, 32)  # z, y, x at stride 1 for VOXEL
    msf = {
        "x_conv2": make_sparse(rng, b, 96, 8, (20, 16, 16), 2),
        "x_conv3": make_sparse(rng, b, 64, 16, (10, 8, 8), 4),
        "x_conv4": make_sparse(rng, b, 48, 16, (5, 4, 4), 8),
    }
    bd["multi_scale_3d_features"] = msf
    bd["multi_scale_3d_strides"] = {"x_conv2": 2, "x_conv3": 4, "x_conv4": 8}
    bd["spatial_features"] = jnp.asarray(
        rng.standard_normal((b, 16, 16, 32)).astype(np.float32))
    bd["encoded_spconv_tensor_stride"] = 8
    return bd


POOL = {
    "FEATURES_SOURCE": ["x_conv3", "x_conv4"],
    "POOL_LAYERS": {
        "x_conv3": {"MLPS": [[8, 8]], "POOL_RADIUS": [1.2],
                    "NSAMPLE": [8], "QUERY_RANGES": [[2, 2, 2]]},
        "x_conv4": {"MLPS": [[8, 8]], "POOL_RADIUS": [2.4],
                    "NSAMPLE": [8], "QUERY_RANGES": [[2, 2, 2]]},
    },
}


def _init_apply(module, bd, training=True, mutable=("batch_stats",
                                                    "statistics")):
    variables = module.init(jax.random.PRNGKey(0), dict(bd),
                            training=training)
    out, upd = module.apply(variables, dict(bd), training=training,
                            mutable=list(mutable))
    return variables, out, upd


def test_split_select_train_eval():
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(0, 10, (2, 64, 3)).astype(np.float32))
    score = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    valid = jnp.ones((2, 64), bool)
    idx = split_select(xyz, score, valid, 8, 8, training=True)
    assert idx.shape == (2, 16)
    # top-8 kept verbatim, FPS picks come from OUTSIDE the top-8
    order = np.argsort(-np.asarray(score), axis=1)
    for b in range(2):
        assert set(np.asarray(idx)[b, :8]) == set(order[b, :8])
        assert not (set(np.asarray(idx)[b, 8:]) & set(order[b, :8]))
    idx_e = split_select(xyz, score, valid, 8, 8, training=False)
    for b in range(2):
        assert set(np.asarray(idx_e)[b]) == set(order[b, :16])


def test_subset_fps_respects_mask():
    rng = np.random.default_rng(1)
    xyz = jnp.asarray(rng.uniform(0, 10, (1, 32, 3)).astype(np.float32))
    mask = jnp.asarray((np.arange(32) % 2 == 1)[None])
    idx = np.asarray(subset_fps(xyz, mask, 8))
    assert (idx % 2 == 1).all()


def test_bevpoint_pyramid():
    bd = make_pyramid()
    mod = BEVPoint(
        model_cfg={"N_BLOCK": [1, 2, 2], "NUM_FILTERS": 16,
                   "NUM_RAW_KEYPOINTS": 32},
        input_channels=32, voxel_size=VOXEL, point_cloud_range=PCR,
    )
    variables, out, _ = _init_apply(mod, bd)
    assert out["spatial_features_2d"].shape[-1] == 48  # 3 * NUM_FILTERS
    # point pyramid = topk raw + the three trunk scales
    n_expected = 32 + 96 + 64 + 48
    assert out["point_coords"].shape == (2, n_expected, 3)
    assert out["point_features"].shape == (2, n_expected, 48)
    assert out["raw_fg_preds"].shape[-1] == 3
    assert np.isfinite(np.asarray(out["point_features"])).all()
    # the shallow scales were refreshed in place (:354-359)
    assert out["multi_scale_3d_features"]["x_conv3"].features.shape[-1] == 48


def test_pointfromvoxel_contract_and_statistics():
    bd = make_pyramid()
    mod = PointFromVoxel(
        model_cfg={"Z_GROUPS": 4, "LOCAL_CH": 8, "GLOBAL_CH": 8,
                   "FG_CORNER_POINTS": [[64, 32], [16, 8]],
                   "SAMPLE_FPS": True, "STAT_START_ITER": 0},
        input_channels=32, voxel_size=VOXEL, point_cloud_range=PCR,
    )
    variables, out, upd = _init_apply(mod, bd)
    K = 64  # 2 * FG_CORNER_POINTS[0][1]
    assert out["point_coords"].shape == (2, K, 3)
    assert out["candidate_coords"].shape == (2, K, 3)
    assert out["candidate_features"].shape == (2, K, 256)
    assert out["fg_preds"].shape == (2, 256, 3)
    assert np.isfinite(np.asarray(out["candidate_features"])).all()
    # statistics buffer updated at iter >= start
    stats = jax.tree.leaves(upd["statistics"])
    assert any(float(jnp.abs(s).sum()) > 0 for s in stats)
    # eval path: plain top-k
    out_e = mod.apply(variables, dict(bd), training=False)
    assert out_e["candidate_features"].shape == (2, K, 256)


def test_sparse_point_backbone_contract():
    bd = make_pyramid()
    mod = SparsePointBackbone(
        model_cfg={"FG_CORNER_POINTS": [128, 64],
                   "PTS_NUM_SAMPLE": [48, 16],
                   "MAX_TRANSLATION_RANGE": [3.0, 3.0, 2.0],
                   "N_CLS": 3, "NUM_POINT_FEATURES": 32,
                   "SP_SOURCE": "x_conv4",
                   "POINT_GRID_POOL": POOL,
                   "STAT_START_ITER": 0},
        input_channels=32, voxel_size=VOXEL, point_cloud_range=PCR,
    )
    variables, out, upd = _init_apply(mod, bd)
    assert out["point_coords"].shape == (2, 64, 3)
    assert out["vote_coords"].shape == (2, 64, 3)
    assert out["point_cls_preds"].shape == (2, 64, 3)
    assert out["fg_preds"].shape == (2, 128, 3)
    # votes clamped to MAX_TRANSLATION_RANGE (:855-858)
    delta = np.asarray(out["vote_coords"] - out["point_coords"])
    assert (np.abs(delta) <= [3.0 + 1e-5, 3.0 + 1e-5, 2.0 + 1e-5]).all()
    # two-stage selection: the two parts are disjoint
    assert np.isfinite(np.asarray(out["vote_cls_aware"])).all()
    assert out["vote_cls_aware"].shape[-1] == 64  # cls feats + stat tag
    assert np.isfinite(np.asarray(out["pts_depth"])).all()
    # gradient flows end-to-end through lookup + pooling + fps
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def f(p):
        o, _ = mod.apply({"params": p, **others}, dict(bd), training=True,
                         mutable=["batch_stats", "statistics"])
        return (o["point_cls_preds"].sum() + o["features_for_reg"].sum()
                + o["point_center_preds"].sum())

    g = jax.grad(f)(params)
    leaves = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)]
    assert all(np.isfinite(v) for v in leaves)
    assert sum(v > 0 for v in leaves) > len(leaves) // 2


def test_voxelpointcross2d_contract():
    bd = make_pyramid()
    mod = VoxelPointCross2D(
        model_cfg={"Z_GROUPS": 4, "TRUNK_CH": 32, "N_BLOCK": [1, 1],
                   "FG_CORNER_POINTS": [[32, 32], [24, 8]],
                   "SAMPLE_FPS": True,
                   "SA_CONFIG": {"RADIUS": [1.6], "NSAMPLE": [8],
                                 "MLPS": [[16, 16]]}},
        input_channels=32, voxel_size=VOXEL, point_cloud_range=PCR,
    )
    variables, out, _ = _init_apply(mod, bd, mutable=("batch_stats",))
    assert out["point_coords"].shape == (2, 64, 3)
    assert out["point_features"].shape == (2, 64, 256)
    assert out["point_corner_preds"].shape == (2, 64, 24)
    assert out["candidate_coords"].shape == (2, 32, 3)
    assert out["candidate_features"].shape == (2, 32, 256)
    assert np.isfinite(np.asarray(out["candidate_features"])).all()
    out_e = mod.apply(variables, dict(bd), training=False)
    assert out_e["candidate_features"].shape == (2, 32, 256)


def test_neck_voxel_point_cross_full():
    bd = make_pyramid()
    mod = VPCNeck(
        model_cfg={"NUM_FILTERS": 16, "POINT_GRID_POOL": POOL},
        voxel_size=VOXEL, point_cloud_range=PCR,
    )
    variables, out, _ = _init_apply(mod, bd, mutable=("batch_stats",))
    assert out["spatial_features_2d"].shape == (2, 16, 16, 16)
    assert out["point_features"].shape == (2, 256, 16)
    assert np.isfinite(np.asarray(out["point_features"])).all()


# ---------------------------------------------------------------------------
# detector-path tests (build_network wiring)
# ---------------------------------------------------------------------------

def head_cfg(stride=2):
    return {
        "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
        "USE_DIRECTION_CLASSIFIER": False, "NUM_DIR_BINS": 2,
        "DIR_OFFSET": 0.78539, "DIR_LIMIT_OFFSET": 0.0,
        "ANCHOR_GENERATOR_CONFIG": [{
            "class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
            "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.78],
            "align_center": False, "feature_map_stride": stride,
            "matched_threshold": 0.6, "unmatched_threshold": 0.45,
        }],
        "TARGET_ASSIGNER_CONFIG": {"MATCH_HEIGHT": False},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
            "code_weights": [1.0] * 7}},
    }


POST = {
    "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
    "EVAL_METRIC": "kitti",
    "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                   "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 32,
                   "NMS_POST_MAXSIZE": 8},
}

PN2 = {
    "NAME": "PointNet2MSG",
    "SA_CONFIG": {
        "NPOINTS": [64], "RADIUS": [[0.5, 1.0]], "NSAMPLE": [[8, 8]],
        "MLPS": [[[8, 8], [8, 8]]],
    },
    "FP_MLPS": [[16]],
}


def test_voxel_point_cross_neck_in_detector():
    cfg = EDict({
        "NAME": "PVSSDA",
        "VFE": {"NAME": "PillarVFE", "WITH_DISTANCE": False,
                "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
                "NUM_FILTERS": [16]},
        "BACKBONE_3D": PN2,
        "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 16},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1], "LAYER_STRIDES": [2], "NUM_FILTERS": [16],
            "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16],
        },
        "NECK": {"NAME": "VoxelPointCross", "NUM_FILTERS": 16},
        "DENSE_HEAD": head_cfg(stride=2),
        "POST_PROCESSING": POST,
    })
    model = build_network(cfg, num_class=1, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    assert out["point_features"].shape[-1] == 16  # fused by the neck


def test_spvfe_path():
    cfg = EDict({
        "NAME": "DSASNet",
        "VFE": {"NAME": "SPVFE", "NUM_FILTERS": [16]},
        "BACKBONE_3D": PN2,
        "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 16},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1], "LAYER_STRIDES": [2], "NUM_FILTERS": [16],
            "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16],
        },
        "DENSE_HEAD": head_cfg(stride=2),
        "POST_PROCESSING": POST,
    })
    model = build_network(cfg, num_class=1, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))


def test_pvssda_point_head_path():
    cfg = EDict({
        "NAME": "PVSSDA",
        "BACKBONE_3D": PN2,
        "POINT_HEAD": {
            "NAME": "PVSSDAHead",
            "CLS_FC": [16], "REG_FC": [16],
            "CLASS_AGNOSTIC": False,
            "TARGET_CONFIG": {
                "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
                "BOX_CODER": "PointResidualCoder",
                "BOX_CODER_CONFIG": {"use_mean_size": False},
            },
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "point_cls_weight": 1.0, "point_box_weight": 1.0}},
        },
        "POST_PROCESSING": POST,
    })
    model = build_network(cfg, num_class=1, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    pred, _ = model.apply(
        variables, model.apply(variables, dict(bd), training=False),
        method=lambda m, b_: m.post_processing(b_),
    )
    assert np.isfinite(np.asarray(pred["pred_boxes"])).all()
