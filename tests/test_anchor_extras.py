"""ATSS target assigner + AnchorHeadMulti + legacy decoders + softmax focal."""
import numpy as np
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
