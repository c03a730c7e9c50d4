import sys, numpy as np
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax
import __graft_entry__ as g
from tsm_det_pointcloud_tpu.models import build_network
from tsm_det_pointcloud_tpu.models.detectors.detector3d_template import DatasetMeta
from tsm_det_pointcloud_tpu.runtime.optimization import build_optimizer
from tsm_det_pointcloud_tpu.utils.edict import EDict

cfg = g._tsm_model_cfg()
# teacher variant: non-distill backbone + head
cfg["BACKBONE_3D"]["NAME"] = "VoxelPointNet2FSMSG"
cfg["POINT_HEAD"]["NAME"] = "PointHeadVoteSASAStatistic"
meta = DatasetMeta(class_names=("Car", "Pedestrian", "Cyclist"),
    point_cloud_range=tuple(g.PCR), voxel_size=tuple(g.VOXEL),
    grid_size=(64, 64, 16), max_voxels=256, max_points_per_voxel=5,
    num_point_features=4, max_points=256)
model = build_network(cfg, num_class=3, dataset=meta)
batch = g._synth_batch(2, with_gt=True, seed=5)
v = jax.jit(lambda r, b: model.init(r, b, training=True))(jax.random.PRNGKey(0), dict(batch))
params, rest = v["params"], {k: x for k, x in v.items() if k != "params"}
tx, _ = build_optimizer({"OPTIMIZER": "adam_onecycle", "LR": 0.01, "WEIGHT_DECAY": 0.01,
    "MOMS": [0.95, 0.85], "DIV_FACTOR": 10, "PCT_START": 0.3, "GRAD_NORM_CLIP": 10.0}, total_steps=200)
os_ = tx.init(params)

@jax.jit
def step(p, os_, rest, it):
    def lf(p):
        bd = dict(batch); bd["accumulated_iter"] = it
        out, mut = model.apply({"params": p, **rest}, bd, training=True,
                               mutable=["batch_stats", "statistics"])
        tb = out.get("tb_dict", {})
        aux = (mut, tb, out.get("point_vote_coords"))
        return out["loss"], aux
    (l, (mut, tb, votes)), gr = jax.value_and_grad(lf, has_aux=True)(p)
    u, os2 = tx.update(gr, os_, p)
    return optax.apply_updates(p, u), os2, {**rest, **mut}, l, tb, gr

for it in range(200):
    params, os_, rest, l, tb, gr = step(params, os_, rest, jnp.int32(it))
    if it % 40 == 0 or it == 199:
        vl = float(tb.get("vote_loss", -1))
        def norm_of(tree, sub):
            tot = 0.0
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                ps = "/".join(str(getattr(q, "key", q)) for q in path)
                if sub in ps:
                    tot += float(jnp.sum(leaf * leaf))
            return tot ** 0.5
        print(f"it={it} loss={float(l):.3f} vote={vl:.3f} "
              f"g(vote)={norm_of(gr, 'vote'):.2e}", flush=True)
# list vote-related param paths
for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
    ps = "/".join(str(getattr(q, "key", q)) for q in path)
    if "vote" in ps:
        print(ps, leaf.shape)
