"""Shared builders for the module-level golden-forward tests
(VERDICT r2 #7): three fixed-seed tiny models + fixed inputs whose
eval-forward outputs are committed as goldens.

Regeneration workflow (run ON CPU — the goldens pin the CPU backend the
suite uses; do it ONLY when an intentional numeric change lands, and say
so in the commit):

    python tools/gen_golden_forwards.py

Each case returns (name, outputs dict of np arrays). Everything is
deterministic: PRNGKey(0) init, fixed synthetic batches, eval mode
(init-state BN, no dropout).
"""
import numpy as np


def _eval_outputs(model, variables, batch):
    import jax

    @jax.jit
    def fwd(v, b):
        out = model.apply(v, dict(b), training=False)
        return out["batch_cls_preds"], out["batch_box_preds"]

    cls, box = fwd(variables, batch)
    return {"batch_cls_preds": np.asarray(cls),
            "batch_box_preds": np.asarray(box)}


def tsm_case():
    """The __graft_entry__ flagship config (distilled TSM, student path)."""
    import jax

    import __graft_entry__ as ge

    model = ge._tsm_model()
    batch_tr = ge._synth_batch(2, with_gt=True, seed=0)
    variables = jax.jit(
        lambda r, b: model.init(r, b, training=True)
    )(jax.random.PRNGKey(0), dict(batch_tr))
    ev = {k: batch_tr[k] for k in ("points", "points_mask", "batch_size")}
    return "tsm", _eval_outputs(model, variables, ev)


def pointpillar_case():
    import jax

    from tests.test_pointpillar_e2e import (
        META,
        synthetic_batch,
        tiny_model_cfg,
    )
    from tsm_det_pointcloud_tpu.models import build_network

    model = build_network(tiny_model_cfg(), num_class=1, dataset=META)
    batch = synthetic_batch()
    variables = jax.jit(
        lambda r, b: model.init(r, b, training=False)
    )(jax.random.PRNGKey(0), dict(batch))
    ev = {k: batch[k] for k in ("points", "points_mask", "batch_size")}
    return "pointpillar", _eval_outputs(model, variables, ev)


def second_case():
    import jax

    from tests.test_second_e2e import META, second_model_cfg, synthetic_batch
    from tsm_det_pointcloud_tpu.models import build_network

    model = build_network(second_model_cfg(), num_class=1, dataset=META)
    batch = synthetic_batch()
    variables = jax.jit(
        lambda r, b: model.init(r, b, training=False)
    )(jax.random.PRNGKey(0), dict(batch))
    ev = {k: batch[k] for k in ("points", "points_mask", "batch_size")}
    return "second", _eval_outputs(model, variables, ev)


ALL_CASES = (tsm_case, pointpillar_case, second_case)
