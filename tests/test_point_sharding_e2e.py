"""Point-axis sharding as a USABLE FEATURE (VERDICT r4 #5): the full TSM
fast_cpc-style forward runs with its layer-0 FPS + grouping routed through
parallel/point_sharding.py on a real (CPU-virtual) mesh.

Covers the two claims the primitive tests can't:
  * D=1 degenerate mesh reproduces the plain unsharded forward (same
    sampled set, same pooled features -> same head outputs), so the
    feature changes nothing when inactive-in-effect;
  * D=8 runs the whole detector (backbone + distill head +
    post-processing) at a point count whose per-device slice is 1/8 of
    the cloud, producing finite predictions.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.parallel import point_sharding as pa

from test_point3dssd_e2e import META, batch, model_cfg

pytestmark = pytest.mark.slow


def make_mesh(d):
    devs = jax.devices()
    if len(devs) < d:
        pytest.skip(f"need {d} devices")
    return Mesh(np.array(devs[:d]), ("points",))


def _forward(model, variables, bd, mesh=None):
    if mesh is None:
        out = model.apply(variables, dict(bd), training=False)
    else:
        shard = pa.point_sharding(mesh)
        bd = dict(bd)
        for k in ("points", "points_mask"):
            bd[k] = jax.device_put(bd[k], shard)
        with pa.activate(mesh):
            out = model.apply(variables, dict(bd), training=False)
    return out


def test_full_forward_d1_matches_unsharded():
    mesh = make_mesh(1)
    model = build_network(model_cfg(distill=True), num_class=3, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    ref = _forward(model, variables, bd)
    got = _forward(model, variables, bd, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(got["batch_cls_preds"]),
        np.asarray(ref["batch_cls_preds"]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got["batch_box_preds"]),
        np.asarray(ref["batch_box_preds"]), rtol=2e-5, atol=2e-4)


def test_full_forward_8dev_large_cloud():
    mesh = make_mesh(8)
    # 2048 points: each device holds a 256-row slice — the per-device
    # capacity the plain config was built for; the full cloud only ever
    # exists sharded. Layer-0 SAMPLE_RANGE widens to the full cloud (the
    # reference's fast_cpc uses the full range too, fast_cpc.yaml).
    cfg = model_cfg(distill=True)
    for sa in (cfg.BACKBONE_3D.SA_CONFIG, cfg.BACKBONE_3D.S_SA_CONFIG):
        sa.SAMPLE_RANGE_LIST = [[[0, 2048]]] + list(
            sa.SAMPLE_RANGE_LIST[1:])
    model = build_network(cfg, num_class=3, dataset=META)
    bd = batch(b=2, n=2048, seed=3)
    variables = model.init(jax.random.PRNGKey(0), dict(batch()), training=True)
    out = _forward(model, variables, bd, mesh=mesh)
    cls = np.asarray(out["batch_cls_preds"])
    box = np.asarray(out["batch_box_preds"])
    assert np.isfinite(cls).all() and np.isfinite(box).all()
    pred, _ = model.apply(
        variables, out, method=lambda m, b: m.post_processing(b))
    assert np.isfinite(np.asarray(pred["pred_boxes"])).all()
    assert (np.asarray(pred["count"]) >= 0).all()


def test_grads_flow_through_sharded_layer0():
    """Backward through the sharded FPS-gather + group merge (psum /
    all_gather transposes): finite, nonzero param grads — the property
    tools/train.py --point_axis relies on."""
    mesh = make_mesh(8)
    model = build_network(model_cfg(distill=True), num_class=3, dataset=META)
    bd = batch()
    variables = model.init(jax.random.PRNGKey(0), dict(bd), training=True)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    shard = pa.point_sharding(mesh)
    sbd = dict(bd)
    for k in ("points", "points_mask"):
        sbd[k] = jax.device_put(sbd[k], shard)

    def loss(p):
        out = model.apply({"params": p, **rest}, dict(sbd), training=False)
        return jnp.sum(jnp.abs(out["batch_cls_preds"]))

    with pa.activate(mesh):
        g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0.0


def test_sharded_group_matches_xla_fallback():
    """sharded_ball_group_multi (D=8) returns the same candidate SETS and
    counts as the unsharded XLA nearest-k fallback."""
    from tsm_det_pointcloud_tpu.ops import grouping

    mesh = make_mesh(8)
    rng = np.random.RandomState(11)
    B, N, M, C, ns = 2, 512, 64, 5, 8
    xyz = jnp.asarray(rng.uniform(-6, 6, (B, N, 3)).astype(np.float32))
    feat = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, N) > 0.1)
    q = jnp.asarray(rng.uniform(-5, 5, (B, M, 3)).astype(np.float32))
    pairs = ((0.0, 2.0), (2.0, 4.0))

    got = pa.sharded_ball_group_multi(
        pairs, (ns, ns), xyz, feat, valid, q, mesh)
    ref = grouping.ball_query_multi(pairs, (ns, ns), xyz, q, valid)
    for s in range(2):
        g_xyz, g_feat, cnt = got[s]
        idx_r, cnt_r = ref[s]
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_r))
        # same candidate set: compare the SORTED per-slot distances of
        # filled slots (slot order may differ; the pooled consumer is
        # order-invariant)
        filled = np.arange(ns)[None, None] < np.minimum(
            np.asarray(cnt), ns)[..., None]
        d_got = np.linalg.norm(
            np.asarray(g_xyz) - np.asarray(q)[:, :, None], axis=-1)
        ref_xyz = np.asarray(grouping.group_points(xyz, idx_r))
        d_ref = np.linalg.norm(
            ref_xyz - np.asarray(q)[:, :, None], axis=-1)
        d_got = np.where(filled, d_got, 0.0)
        d_ref = np.where(filled, d_ref, 0.0)
        np.testing.assert_allclose(
            np.sort(d_got, -1), np.sort(d_ref, -1), rtol=1e-5, atol=1e-5)
