"""ATSS target assigner + AnchorHeadMulti + legacy decoders + softmax focal."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tsm_det_pointcloud_tpu.models.dense_heads.anchor_head import (
    atss_assign_targets,
)
from tsm_det_pointcloud_tpu.ops.box_coder_utils import (
    PreviousResidualDecoder,
    PreviousResidualRoIDecoder,
    ResidualCoder,
)
from tsm_det_pointcloud_tpu.ops.loss_utils import softmax_focal_loss


def _grid_anchors():
    A = 64
    anchors = np.zeros((A, 7), np.float32)
    anchors[:, 0] = np.repeat(np.linspace(0, 30, 8), 8)
    anchors[:, 1] = np.tile(np.linspace(-10, 10, 8), 8)
    anchors[:, 2] = -1
    anchors[:, 3:6] = [3.9, 1.6, 1.56]
    return anchors


@pytest.mark.slow  # module-level forward: full-suite tier
def test_atss_assigns_on_anchor_gt():
    anchors = _grid_anchors()
    # gt exactly on an anchor center -> candidate iou 1.0, inside, positive
    gts = np.zeros((1, 2, 8), np.float32)
    gts[0, 0] = [*anchors[20][:6], 0.0, 1]
    gv = np.zeros((1, 2), bool)
    gv[0, 0] = True
    out = atss_assign_targets(
        jnp.asarray(anchors), jnp.asarray(gts), jnp.asarray(gv), None,
        jnp.ones((64,), jnp.int32), ResidualCoder(), topk=9,
    )
    lab = np.asarray(out["box_cls_labels"][0])
    assert lab[20] == 1
    assert (lab > 0).sum() >= 1
    # the positive anchor's reg target is ~zero residual
    np.testing.assert_allclose(
        np.asarray(out["box_reg_targets"][0, 20]), 0.0, atol=1e-5
    )


def test_previous_residual_decoders():
    anchors = jnp.asarray(np.random.RandomState(0).rand(4, 7) + 1)
    zero = jnp.zeros((4, 7))
    out = PreviousResidualDecoder.decode(zero, anchors)
    # zero encodings decode to the anchors themselves
    np.testing.assert_allclose(np.asarray(out), np.asarray(anchors), rtol=1e-5)
    out2 = PreviousResidualRoIDecoder.decode(zero, anchors)
    assert np.abs(np.asarray(out2[..., 6])).max() <= np.pi


def test_softmax_focal_basics():
    logits = jnp.asarray([[10.0, -10, -10], [-10, 10, -10]])
    l = softmax_focal_loss(logits, jnp.asarray([0, 1]))
    assert float(l.max()) < 1e-4  # confident correct -> ~0 loss
    l2 = softmax_focal_loss(logits, jnp.asarray([1, 0]))
    assert float(l2.min()) > 1.0  # confident wrong -> large


@pytest.mark.slow  # module-level forward: full-suite tier
def test_anchor_head_multi_forward():
    from tests.test_pointpillar_e2e import META, synthetic_batch, tiny_model_cfg
    from tsm_det_pointcloud_tpu.models import build_network

    cfg = tiny_model_cfg()
    cfg["DENSE_HEAD"]["NAME"] = "AnchorHeadMulti"
    cfg["DENSE_HEAD"]["SHARED_CONV_NUM_FILTER"] = 16
    model = build_network(cfg, num_class=1, dataset=META)
    bd = synthetic_batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=False)
    out = model.apply(variables, dict(bd), training=False)
    assert out["batch_box_preds"].shape[-1] == 7
    tr, _ = model.apply(variables, dict(bd), training=True,
                        mutable=["batch_stats"])
    assert np.isfinite(float(tr["loss"]))


def _cls_head_cfg():
    return {
        "ANCHOR_GENERATOR_CONFIG": [
            {
                "class_name": "Car",
                "anchor_sizes": [[3.9, 1.6, 1.56]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-1.78],
                "matched_threshold": 0.6,
                "unmatched_threshold": 0.45,
                "feature_map_stride": 8,
            },
            {
                "class_name": "Pedestrian",
                "anchor_sizes": [[0.8, 0.6, 1.73]],
                "anchor_rotations": [0, 1.57],
                "anchor_bottom_heights": [-0.6],
                "matched_threshold": 0.5,
                "unmatched_threshold": 0.35,
                "feature_map_stride": 8,
            },
        ],
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0}},
    }


def _gt_batch(B=2):
    gts = np.zeros((B, 3, 8), np.float32)
    gts[:, 0] = [10, 0, -1, 3.9, 1.6, 1.56, 0, 1]
    gts[:, 1] = [20, 5, -0.6, 0.8, 0.6, 1.73, 0, 2]
    mask = np.zeros((B, 3), bool)
    mask[:, :2] = True
    return jnp.asarray(gts), jnp.asarray(mask)


@pytest.mark.slow  # module-level forward: full-suite tier
def test_anchor_head_single_cls():
    from tsm_det_pointcloud_tpu.models.backbones_3d.spconv_backbone import (
        SparseTensor,
    )
    from tsm_det_pointcloud_tpu.models.dense_heads.anchor_head import (
        AnchorHeadSingleCls,
    )

    B, V, C = 2, 64, 16
    grid = (2, 8, 8)  # x_conv4 grid (stride 8 of a 64x64 bev)
    rng = np.random.RandomState(0)
    coords = np.stack([
        rng.randint(0, 2, (B, V)), rng.randint(0, 8, (B, V)),
        rng.randint(0, 8, (B, V)),
    ], -1).astype(np.int32)
    st = SparseTensor(
        features=jnp.asarray(rng.randn(B, V, C).astype(np.float32)),
        coords=jnp.asarray(coords), valid=jnp.ones((B, V), bool),
        grid=grid, stride=8,
    )
    gts, mask = _gt_batch(B)
    head = AnchorHeadSingleCls(
        model_cfg=_cls_head_cfg(), input_channels=C * 2, num_class=2,
        class_names=("Car", "Pedestrian"), grid_size=(64, 64, 2),
        point_cloud_range=(0, -32, -3, 64, 32, 1),
    )
    bd = {"multi_scale_3d_features": {"x_conv4": st},
          "gt_boxes": gts, "gt_boxes_mask": mask, "batch_size": B}
    vars_ = head.init(jax.random.PRNGKey(0), bd, training=True)
    out = head.apply(vars_, bd, training=True)
    # 8x8 map, 2 classes x 2 rot anchors per loc
    assert out["cls_preds"].shape == (B, 8 * 8 * 4, 2)
    loss, tb = head.apply(vars_, out, method=lambda m, b: m.loss(b))
    assert np.isfinite(float(loss))
    assert "rpn_loss_cls" in tb


def test_anchor_head_multi_cls_grouping():
    from tsm_det_pointcloud_tpu.models.dense_heads.anchor_head import (
        AnchorHeadMultiCls,
    )

    B, H, W, C = 2, 8, 8, 32
    cfg = _cls_head_cfg()
    cfg["RPN_HEAD_CFGS"] = [
        {"HEAD_CLS_NAME": ["Car"]},
        {"HEAD_CLS_NAME": ["Pedestrian"]},
    ]
    cfg["SHARED_CONV_NUM_FILTER"] = 16
    head = AnchorHeadMultiCls(
        model_cfg=cfg, input_channels=C, num_class=2,
        class_names=("Car", "Pedestrian"), grid_size=(64, 64, 2),
        point_cloud_range=(0, -32, -3, 64, 32, 1),
    )
    gts, mask = _gt_batch(B)
    x = jnp.asarray(np.random.RandomState(1).randn(B, H, W, C), jnp.float32)
    bd = {"spatial_features_2d": x, "gt_boxes": gts, "gt_boxes_mask": mask,
          "batch_size": B}
    vars_ = head.init(jax.random.PRNGKey(0), bd, training=True)
    out = head.apply(vars_, bd, training=True)
    cls_preds = out["cls_preds"]
    assert cls_preds.shape == (B, H * W * 4, 2)
    # group logits land only in their own class column: per location the
    # first 2 anchors are Car (col 0), next 2 Pedestrian (col 1)
    per_loc = np.asarray(cls_preds).reshape(B, H * W, 4, 2)
    assert np.all(per_loc[:, :, :2, 1] == 0)
    assert np.all(per_loc[:, :, 2:, 0] == 0)
    assert np.any(per_loc[:, :, :2, 0] != 0)
    loss, tb = head.apply(vars_, out, method=lambda m, b: m.loss(b))
    assert np.isfinite(float(loss))


def test_downsample_depth_map():
    from tsm_det_pointcloud_tpu.datasets.processor.data_processor import (
        DataProcessor,
    )
    from tsm_det_pointcloud_tpu.utils.edict import EDict

    dp = DataProcessor(
        [EDict({"NAME": "downsample_depth_map", "DOWNSAMPLE_FACTOR": 2})],
        point_cloud_range=np.array([0, -40, -3, 70.4, 40, 1]),
        training=True, num_point_features=4,
    )
    dm = np.arange(5 * 6, dtype=np.float32).reshape(5, 6)  # odd height
    out = dp.forward({"depth_maps": dm.copy()})
    assert out["depth_maps"].shape == (3, 3)
    # interior block = plain 2x2 mean
    np.testing.assert_allclose(
        out["depth_maps"][0, 0], dm[:2, :2].mean()
    )
    # edge row block zero-padded like skimage downscale_local_mean
    np.testing.assert_allclose(
        out["depth_maps"][2, 0], dm[4:5, :2].sum() / 4.0
    )
