import sys, pathlib, numpy as np
sys.path.insert(0, ".")
sys.path.insert(0, "tools")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax
from sanity_overfit import make_batch, shrink_cfg
from tsm_det_pointcloud_tpu.config import cfg_from_yaml_file
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta
from tsm_det_pointcloud_tpu.utils.edict import EDict
from tsm_det_pointcloud_tpu.runtime.checkpoint import partial_load, transfer_statistics
from tsm_det_pointcloud_tpu.runtime.optimization import build_optimizer
from tsm_det_pointcloud_tpu.parallel.train_state import wrap_student_only

root = pathlib.Path(".").resolve()
B, N = 1, 2048
meta = DatasetMeta(class_names=("Car", "Pedestrian", "Cyclist"),
    point_cloud_range=(0, -40, -3, 70.4, 40, 1),
    voxel_size=(0.05, 0.05, 0.1), grid_size=(1408, 1600, 40),
    max_voxels=4096, max_points_per_voxel=5,
    num_point_features=4, max_points=N)
rng = np.random.default_rng(0)
batch, gt_np = make_batch(rng, B, N, jnp)

def load(name):
    cfg = cfg_from_yaml_file(f"tools/cfgs/kitti_models/{name}", EDict({"ROOT_DIR": root, "LOCAL_RANK": 0}))
    return shrink_cfg(cfg, N)

STEPS1, STEPS2 = 60, 20
cfg1 = load("fast_cpc_teacher.yaml")
m1 = build_network(cfg1.MODEL, num_class=3, dataset=meta)
v1 = jax.jit(lambda r, b: m1.init(r, b, training=True))(jax.random.PRNGKey(1), dict(batch))
p1, rest1 = v1["params"], {k: v for k, v in v1.items() if k != "params"}
tx1, _ = build_optimizer(dict(cfg1.OPTIMIZATION), total_steps=STEPS1)
os1 = tx1.init(p1)

@jax.jit
def step1(p, os_, rest, it):
    def lf(p):
        bd = dict(batch); bd["accumulated_iter"] = it
        out, mut = m1.apply({"params": p, **rest}, bd, training=True,
                            mutable=["batch_stats", "statistics"], rngs={"dropout": jax.random.PRNGKey(it)})
        return out["loss"], (mut, out.get("tb_dict", {}))
    (l, (mut, tb)), g = jax.value_and_grad(lf, has_aux=True)(p)
    u, os2 = tx1.update(g, os_, p)
    return optax.apply_updates(p, u), os2, {**rest, **mut}, l, tb

for it in range(STEPS1):
    p1, os1, rest1, l, tb = step1(p1, os1, rest1, jnp.int32(it))
    if it % 20 == 0 or it == STEPS1 - 1:
        sv = rest1["statistics"]
        flat = jax.tree_util.tree_leaves(sv)
        print(f"T it={it} loss={float(l):.3f} stat_norms={[round(float(jnp.abs(x).max()),4) for x in flat]}")

# phase 2
cfg2 = load("fast_cpc.yaml")
m2 = build_network(cfg2.MODEL, num_class=3, dataset=meta)
v2 = jax.jit(lambda r, b: m2.init(r, b, training=True))(jax.random.PRNGKey(2), dict(batch))
p2, rest2 = v2["params"], {k: v for k, v in v2.items() if k != "params"}
p2 = partial_load(p2, p1)
rest2["statistics"] = transfer_statistics(rest2["statistics"], rest1["statistics"])
print("P2 stat max:", [round(float(jnp.abs(x).max()), 4) for x in jax.tree_util.tree_leaves(rest2["statistics"])])
tx2, _ = build_optimizer(dict(cfg2.OPTIMIZATION), total_steps=STEPS2)
tx2 = wrap_student_only(tx2, p2)
os2_ = tx2.init(p2)

@jax.jit
def step2(p, os_, rest, it):
    def lf(p):
        bd = dict(batch); bd["accumulated_iter"] = it
        out, mut = m2.apply({"params": p, **rest}, bd, training=True,
                            mutable=["batch_stats", "statistics"], rngs={"dropout": jax.random.PRNGKey(1000+it)})
        return out["loss"], (mut, out.get("tb_dict", {}))
    (l, (mut, tb)), g = jax.value_and_grad(lf, has_aux=True)(p)
    u, os2 = tx2.update(g, os_, p)
    return optax.apply_updates(p, u), os2, {**rest, **mut}, l, tb, g

for it in range(STEPS2):
    p2, os2_, rest2, l, tb, g = step2(p2, os2_, rest2, jnp.int32(it))
    if it % 5 == 0 or it == STEPS2 - 1:
        scl = float(tb.get("s_cls_loss", -1))
        # grad norms of student head cls params
        gh = g.get("point_head", {})
        def norm_of(tree, key_sub):
            tot = 0.0
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                ps = "/".join(str(getattr(q, "key", q)) for q in path)
                if key_sub in ps:
                    tot += float(jnp.sum(leaf * leaf))
            return tot ** 0.5
        print(f"S it={it} loss={float(l):.3f} s_cls={scl:.3f} "
              f"g_scls={norm_of(gh, 's_head/cls'):.2e} g_svote={norm_of(gh, 's_head/vote'):.2e}")
print("keys under point_head grad:", list(g.get("point_head", {}).keys()))
