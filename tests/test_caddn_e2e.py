"""CaDDN camera-only slice: ImageVFE (depth distribution + frustum-to-voxel
gather) -> Conv2DCollapse -> BEV backbone -> anchor head."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.backbones_3d.image_vfe import lid_to_bin
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta


pytestmark = pytest.mark.slow
PCR = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)


def model_cfg():
    return EDict({
        "NAME": "CaDDN",
        "VFE": {
            "NAME": "ImageVFE",
            "NUM_OUTPUT_FEATURES": 16,
            "NUM_DEPTH_BINS": 16,
            "DEPTH_RANGE": [1.0, 20.0],
            "LOSS_CONFIG": {"WEIGHTS": {"ddn_loss": 3.0}},
        },
        "MAP_TO_BEV": {"NAME": "Conv2DCollapse", "NUM_BEV_FEATURES": 16},
        "BACKBONE_2D": {
            "NAME": "BaseBEVBackbone",
            "LAYER_NUMS": [1], "LAYER_STRIDES": [1], "NUM_FILTERS": [16],
            "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [16],
        },
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle", "CLASS_AGNOSTIC": False,
            "USE_DIRECTION_CLASSIFIER": True, "DIR_OFFSET": 0.78539,
            "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [{
                "class_name": "Car", "anchor_sizes": [[3.9, 1.6, 1.56]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-1.78],
                "align_center": False, "feature_map_stride": 1,
                "matched_threshold": 0.6, "unmatched_threshold": 0.45,
            }],
            "TARGET_ASSIGNER_CONFIG": {"MATCH_HEIGHT": False},
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                "code_weights": [1.0] * 7}},
        },
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
            "EVAL_METRIC": "kitti",
            "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_TYPE": "nms_gpu",
                           "NMS_THRESH": 0.1, "NMS_PRE_MAXSIZE": 64,
                           "NMS_POST_MAXSIZE": 8},
        },
    })


META = DatasetMeta(
    class_names=("Car",), point_cloud_range=PCR,
    voxel_size=(0.5, 0.5, 0.25), grid_size=(32, 32, 16),
    max_voxels=256, max_points_per_voxel=5,
    num_point_features=4, max_points=128,
    depth_downsample_factor=8,
)


def batch(b=2):
    rng = np.random.RandomState(0)
    images = rng.rand(b, 64, 96, 3).astype(np.float32)
    # simple pinhole looking down +x (lidar) => u ~ -y, v ~ -z
    P = np.zeros((b, 3, 4), np.float32)
    fx = 50.0
    for i in range(b):
        P[i] = [[-fx, 0, 48 * 1.0, 0],
                [0, -fx, 32 * 1.0, 0],
                [0, 0, 1, 0]]
        # depth along +x: remap axes (x->z_cam)
        P[i] = np.asarray([[0, -fx, 0, 48.0], [0, 0, -fx, 32.0],
                           [1, 0, 0, 0]], np.float32)
    pts = np.zeros((b, 128, 4), np.float32)
    pts[..., 0] = rng.uniform(2, 15, (b, 128))
    pts[..., 1] = rng.uniform(-5, 5, (b, 128))
    pts[..., 2] = rng.uniform(-2, 0.5, (b, 128))
    gt = np.zeros((b, 2, 8), np.float32)
    gv = np.zeros((b, 2), bool)
    gt[:, 0] = [8, 0, -1, 3.9, 1.6, 1.56, 0.3, 1]
    gv[:, 0] = True
    return {
        "images": jnp.asarray(images),
        "trans_lidar_to_cam_img": jnp.asarray(P),
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, 128), bool),
        "gt_boxes": jnp.asarray(gt),
        "gt_boxes_mask": jnp.asarray(gv),
        "batch_size": b,
    }


def test_lid_binning_monotonic():
    d = jnp.linspace(1.0, 20.0, 50)
    bins = np.asarray(lid_to_bin(d, 16, 1.0, 20.0))
    assert (np.diff(bins) >= 0).all()
    assert bins[0] == 0 and bins[-1] == 15


def test_caddn_train_and_eval():
    model = build_network(model_cfg(), num_class=1, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    out, _ = model.apply(variables, dict(bd), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    assert "depth_loss" in out["tb_dict"]

    ev = model.apply(variables, dict(bd), training=False)
    pred, _ = model.apply(variables, ev,
                          method=lambda m, b_: m.post_processing(b_))
    assert np.isfinite(np.asarray(pred["pred_boxes"])).all()


def test_ddn_deeplabv3_architecture():
    """The real ResNet+ASPP DDN (tiny plan) produces aligned /8 feature +
    logit maps and trains (finite grads) — the architecture-parity path
    (reference ffn/ddn_deeplabv3.py; pretrained weights are the
    documented unportable delta)."""
    from tsm_det_pointcloud_tpu.models.backbones_3d.ddn import DDNDeepLabV3

    ddn = DDNDeepLabV3(num_feat=8, num_logits=12, layers=(1, 1, 1, 1),
                       width=8)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 96, 3),
                       jnp.float32)
    variables = ddn.init(jax.random.PRNGKey(0), imgs, training=False)
    feats, logits = ddn.apply(variables, imgs, training=False)
    assert feats.shape == (2, 8, 12, 8)
    assert logits.shape == (2, 8, 12, 12)
    assert np.isfinite(np.asarray(feats)).all()

    def loss(p):
        f, lg = ddn.apply(
            {"params": p, **{k: v for k, v in variables.items()
                             if k != "params"}},
            imgs, training=True, mutable=["batch_stats"],
        )[0]
        return (f ** 2).mean() + (lg ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_caddn_deeplab_vfe_and_balancer():
    """ImageVFE with the DeepLabV3 DDN selected by config + the fg/bg
    balancer (gt_boxes2d present): loss is finite and fg weighting
    raises the loss versus uniform when fg pixels exist."""
    cfg = model_cfg()
    cfg["VFE"]["DDN"] = {"NAME": "DDNDeepLabV3", "LAYERS": [1, 1, 1, 1],
                         "WIDTH": 8}
    cfg["VFE"]["FG_WEIGHT"] = 13.0
    cfg["VFE"]["BG_WEIGHT"] = 1.0
    model = build_network(cfg, num_class=1, dataset=META)
    b = batch()
    # every point projects somewhere; make one big fg box covering the
    # image so the balancer's fg branch is exercised
    b["gt_boxes2d"] = jnp.asarray(
        np.tile(np.array([0.0, 0.0, 96.0, 64.0], np.float32), (2, 1, 1)))
    variables = jax.jit(lambda r, bb: model.init(r, bb, training=True))(
        jax.random.PRNGKey(0), dict(b))
    out, _ = model.apply(variables, dict(b), training=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    b2 = dict(b)
    del b2["gt_boxes2d"]
    out2, _ = model.apply(variables, dict(b2), training=True,
                          mutable=["batch_stats"])
    # all points fg at weight 13 vs unweighted: balancer must scale
    ld1 = float(out["tb_dict"].get("loss_depth", out["loss"]))
    ld2 = float(out2["tb_dict"].get("loss_depth", out2["loss"]))
    assert ld1 > ld2
