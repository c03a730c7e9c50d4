import sys, numpy as np
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax
import __graft_entry__ as g
from tsm_det_pointcloud_tpu.runtime.optimization import build_optimizer
from tsm_det_pointcloud_tpu.parallel.train_state import wrap_student_only

model = g._tsm_model()
batch = g._synth_batch(2, with_gt=True, seed=5)
v = jax.jit(lambda r, b: model.init(r, b, training=True))(jax.random.PRNGKey(0), dict(batch))
params, rest0 = v["params"], {k: x for k, x in v.items() if k != "params"}
tx, _ = build_optimizer({"OPTIMIZER": "adam_onecycle", "LR": 0.01, "WEIGHT_DECAY": 0.01,
    "MOMS": [0.95, 0.85], "DIV_FACTOR": 10, "PCT_START": 0.3, "GRAD_NORM_CLIP": 10.0}, total_steps=40)
txm = wrap_student_only(tx, params)

def run(stats_mode, steps=40):
    rest = dict(rest0)
    st = rest["statistics"]
    rng = np.random.default_rng(7)
    def fill(x):
        if stats_mode == "zero":
            return jnp.zeros_like(x)
        return jnp.asarray(rng.normal(0, 1.0, x.shape), x.dtype)
    rest["statistics"] = jax.tree_util.tree_map(fill, st)
    p = params
    os_ = txm.init(p)

    @jax.jit
    def step(p, os_, rest, it):
        def lf(p):
            bd = dict(batch); bd["accumulated_iter"] = it
            out, mut = model.apply({"params": p, **rest}, bd, training=True,
                                   mutable=["batch_stats", "statistics"])
            return out["loss"], (mut, out.get("tb_dict", {}))
        (l, (mut, tb)), gr = jax.value_and_grad(lf, has_aux=True)(p)
        u, os2 = txm.update(gr, os_, p)
        return optax.apply_updates(p, u), os2, {**rest, **mut}, l, tb, gr

    hist = []
    for it in range(steps):
        p, os_, rest, l, tb, gr = step(p, os_, rest, jnp.int32(it))
        hist.append((float(l), float(tb.get("s_cls_loss", -1))))
    def norm_of(tree, sub):
        tot = 0.0
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            ps = "/".join(str(getattr(q, "key", q)) for q in path)
            if sub in ps:
                tot += float(jnp.sum(leaf * leaf))
        return tot ** 0.5
    print(f"[stats={stats_mode}] loss {hist[0][0]:.2f}->{hist[-1][0]:.2f}  "
          f"s_cls {hist[0][1]:.3f}->{hist[-1][1]:.3f}  "
          f"g(s_head cls)={norm_of(gr, 's_head'):.3e}", flush=True)
    # where do the cls grads live?
    ph = gr.get("point_head", gr)
    for path, leaf in jax.tree_util.tree_flatten_with_path(ph)[0]:
        ps = "/".join(str(getattr(q, "key", q)) for q in path)
        if "cls" in ps and "s_" in ps:
            print("   ", ps, float(jnp.abs(leaf).max()))

run("zero")
run("rand")
