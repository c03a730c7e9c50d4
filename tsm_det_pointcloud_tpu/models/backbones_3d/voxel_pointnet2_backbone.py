"""Voxel-hash PointNet++ backbones — the TSM model core (flax).

Parity targets:
  * `VoxelPointnetSAModuleFSMSG(Distillation)` — pcdet/ops/pointnet2/
    pointnet2_batch/pointnet2_modules.py:448-1038,1092-1700: fusion sampling,
    voxel_query grouping against a voxel-centroid sparse tensor, point-MLP +
    position-MLP fusion, "multi-scale feature approximation" (a 3-level
    sparse U-Net over the centroid tensor gated by per-voxel confidence),
    per-voxel 3-class confidence driving the next layer's s-fps.
  * `VoxelPointNet2FSMSG` / `VoxelPointNet2FSMSGDistillation` —
    pcdet/models/backbones_3d/pointnet2_backbone.py:367-617,619-925.

TPU design notes:
  * Everything is batched fixed-capacity: points (B, N, 3) + masks; the
    centroid sparse tensor is a SparseTensor (B, V, C) on the FACTOR-strided
    voxel grid (repository_info semantics: voxel_size = base * FACTOR,
    data_processor.py:116-125), rows sorted by linearized key.
  * voxel_query is a masked (M, V) distance search (ops/voxel.py) — the
    CUDA hash-walk is an accel structure for SIMT; the dense masked grid
    rides the VPU and feeds one MXU einsum per MLP layer.
  * The teacher branch of the distillation backbone is wrapped in
    stop_gradient (replaces `torch.no_grad` + name-prefix param freezing,
    train.py:117-122); parameter partitioning for the optimizer lives in
    parallel/train_state.py.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import group_pallas, grouping, sampling, spconv as sp_ops, topk
from ...ops.voxel import voxel_centroids, voxel_query
from ...parallel import point_sharding as point_axis
from .pointnet2_modules import SharedMLP, safe_bn_mask
from .spconv_backbone import (
    SparseConv,
    SparseInverseConv,
    SparseTensor,
    SubMConv,
    _out_grid,
)


def build_unet_plan(sp: SparseTensor, capacity: int):
    """Weight-independent pieces of the 3-level mini U-Net on `sp`'s
    position set: subm rulebooks at each level, strided-conv plans
    (out coords + rulebook) and inverse rulebooks. The base position set
    is FIXED after SA layer 0 (every later layer `_replace`s features
    only), so teacher layers 1..2 and the student layer share ONE plan
    per forward instead of re-probing ~8 rulebooks each (the probes were
    ~2.5 ms apiece of the round-1 TSM forward profile)."""
    rb4 = sp_ops.build_subm_rulebook(sp.coords, sp.valid, sp.grid)
    g8 = _out_grid(sp.grid, 3, 2, 1)
    ds8 = sp_ops.build_conv_plan(
        sp.coords, sp.valid, sp.grid, g8, 3, 2, 1, capacity
    )
    oc8, ov8, _ = ds8
    rb8 = sp_ops.build_subm_rulebook(oc8, ov8, g8)
    g16 = _out_grid(g8, 3, 2, 1)
    ds16 = sp_ops.build_conv_plan(oc8, ov8, g8, g16, 3, 2, 1, capacity)
    oc16, ov16, _ = ds16
    rb16 = sp_ops.build_subm_rulebook(oc16, ov16, g16)
    inv16to8 = sp_ops.build_inverse_rulebook(
        oc16, ov16, oc8, ov8, g16, 3, 2, 1
    )
    inv8to4 = sp_ops.build_inverse_rulebook(
        oc8, ov8, sp.coords, sp.valid, g8, 3, 2, 1
    )
    return dict(rb4=rb4, ds8=ds8, rb8=rb8, ds16=ds16, rb16=rb16,
                inv16to8=inv16to8, inv8to4=inv8to4)


def factored_grid(point_cloud_range, voxel_size):
    """(gz, gy, gx) ints for the already-FACTOR-multiplied voxel size."""
    pc = np.asarray(point_cloud_range, np.float64)
    vs = np.asarray(voxel_size, np.float64)
    g = np.round((pc[3:6] - pc[0:3]) / vs).astype(np.int64)
    return int(g[2]), int(g[1]), int(g[0])


def points_to_voxel_coords(xyz, point_cloud_range, voxel_size):
    """(..., 3) xyz -> int32 zyx coords on the factored grid."""
    pc = jnp.asarray(point_cloud_range[:3], xyz.dtype)
    vs = jnp.asarray(voxel_size, xyz.dtype)
    cxyz = jnp.floor((xyz - pc) / vs).astype(jnp.int32)
    return cxyz[..., ::-1]


class _MLPNoFinalRelu(nn.Module):
    """Dense+BN(+ReLU) stack whose LAST layer has BN but no ReLU
    (the reference's point/pos MLP tails before the fused add)."""
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x, training=False, mask=None):
        from ...ops.spconv import compute_dtype

        cd = compute_dtype()  # bf16 activation stream, f32 params/stats
        n = len(self.channels)
        mask = safe_bn_mask(mask)
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, dtype=cd, name=f"fc{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not training, momentum=0.99,
                epsilon=1e-3, dtype=cd, name=f"bn{i}",
            )(x, mask=mask)
            if i < n - 1:
                x = nn.relu(x)
        return x


class VoxelSAModule(nn.Module):
    """One voxel-hash SA layer; behavior switches on sa_layer_idx:
       0        : ball-query SA over raw points + build centroid sp tensor
       1..2     : voxel-query SA over centroids + U-Net sp update
       >=3 (VSA): voxel-query aggregation only (head usage, new_xyz given)
    """
    sa_layer_idx: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    query_ranges: Sequence[Sequence[int]] = None
    npoint_list: Sequence[int] = None
    sample_range_list: Sequence[Sequence[int]] = None
    sample_method_list: Sequence[str] = None
    dilated_group: bool = False
    aggregation_mlp: Sequence[int] = None
    confidence_mlp: Sequence[int] = None
    sp_channels: Sequence[int] = None      # (in, out) for the sp update conv
    num_class: int = 3
    weight_gamma: float = 1.0
    voxel_size: Sequence[float] = None      # factored (base * FACTOR)
    point_cloud_range: Sequence[float] = None
    grid: tuple = None                      # (gz, gy, gx) factored
    voxel_capacity: int = 4096

    def _sample(self, xyz, features, scores_point, valid):
        out = []
        for npoint, (lo, hi), method in zip(
            self.npoint_list, self.sample_range_list, self.sample_method_list
        ):
            sub_xyz = xyz[:, lo:hi]
            sub_valid = valid[:, lo:hi]
            psh = point_axis.active() if self.sa_layer_idx == 0 else None
            if psh is not None and method not in ("d-fps", "D-FPS"):
                raise NotImplementedError(
                    f"point-axis sharding supports d-fps at layer 0, got "
                    f"{method} (SURVEY §5.7: layer-0 is the sharded scale; "
                    f"later layers run replicated on the sampled set)")
            if method in ("d-fps", "D-FPS"):
                if self.sa_layer_idx == 0:
                    if psh is not None:
                        if lo != 0 or hi < xyz.shape[1]:
                            raise NotImplementedError(
                                "point-axis sharding needs a full-range "
                                "layer-0 SAMPLE_RANGE (a sub-slice of the "
                                "sharded axis would regather the cloud)")
                        idx = point_axis.segment_local_fps(
                            sub_xyz, npoint, psh.mesh, sub_valid,
                            axis=psh.axis)
                    else:
                        idx = sampling.furthest_point_sample(
                            sub_xyz, npoint, sub_valid)
                else:
                    # layers >0 reuse the previous ordering: take-first-N
                    # (reference behavior, pointnet2_modules.py:1161-1165)
                    idx = jnp.broadcast_to(
                        jnp.arange(npoint, dtype=jnp.int32)[None],
                        (xyz.shape[0], npoint),
                    )
            elif method in ("f-fps", "F-FPS"):
                feats = features[:, lo:hi]
                d_xyz = jnp.sum(
                    (sub_xyz[:, :, None, :] - sub_xyz[:, None, :, :]) ** 2, -1
                )
                d_f = jnp.sum(
                    (feats[:, :, None, :] - feats[:, None, :, :]) ** 2, -1
                )
                idx = sampling.furthest_point_sample_matrix(
                    d_xyz + self.weight_gamma * d_f, npoint, sub_valid
                )
            elif method in ("s-fps", "S-FPS"):
                w = jax.nn.sigmoid(scores_point[:, lo:hi]) ** self.weight_gamma
                idx = sampling.furthest_point_sample_weights(
                    sub_xyz, w, npoint, sub_valid
                )
            elif method == "s-topk":
                _, idx = topk.top_k(scores_point[:, lo:hi], npoint)
            else:
                raise NotImplementedError(method)
            out.append(idx + lo)
        return jnp.concatenate(out, axis=1)

    @nn.compact
    def __call__(self, xyz, features, valid, scores_voxel=None,
                 point_slot=None, sp=None, centroid_xyz=None, new_xyz=None,
                 training=False, unet_plan=None):
        B = xyz.shape[0]

        # ---- per-point scores from per-voxel confidence (prev layer) ----
        scores_point = None
        ori_scores_voxel = None
        if scores_voxel is not None:
            smax = scores_voxel.max(axis=-1)                     # (B, V)
            ori_scores_voxel = jax.nn.sigmoid(smax)[..., None]   # (B, V, 1)
            if point_slot is not None:
                slot_ok = point_slot >= 0
                gathered = jnp.take_along_axis(
                    smax, jnp.clip(point_slot, 0, smax.shape[1] - 1), axis=1
                )
                scores_point = jnp.where(gathered * 0 == 0, gathered, 0.0)
                scores_point = jnp.where(slot_ok, gathered, -1e9)

        # ---- sampling ----
        psh = point_axis.active() if self.sa_layer_idx == 0 else None
        new_valid = None
        if new_xyz is None:
            idx_s = self._sample(xyz, features, scores_point, valid)
            if psh is not None:
                # xyz is sharded on the point axis; fetch the sampled rows
                # as a REPLICATED set (owner-masked psum — everything after
                # layer-0 grouping runs replicated on these npoint rows)
                payload = jnp.concatenate(
                    [xyz, valid[..., None].astype(xyz.dtype)], -1)
                got = point_axis.gather_from_sharded(
                    payload, idx_s, psh.mesh, axis=psh.axis)
                new_xyz = got[..., :3]
                new_valid = got[..., 3] > 0.5
            else:
                new_xyz = sampling.gather_points(xyz, idx_s)
                new_valid = jnp.take_along_axis(valid, idx_s, axis=1)
        else:
            new_valid = jnp.ones(new_xyz.shape[:2], bool)

        # ---- grouping + per-scale MLPs ----
        outs = []
        if sp is None:
            # layer 0: ball query over raw points, xyz-augmented MLPs.
            pairs = []
            for i, r in enumerate(self.radii):
                lo = self.radii[i - 1] if (self.dilated_group and i > 0) else 0.0
                pairs.append((float(lo), float(r)))
            if psh is not None:
                # point-axis-sharded sources: per-shard nearest-k + global
                # (d2, idx)-lex merge; the raw cloud never gathers to one
                # device (parallel/point_sharding.sharded_ball_group_multi)
                groups = point_axis.sharded_ball_group_multi(
                    tuple(pairs),
                    tuple(int(n) for n in self.nsamples),
                    xyz, features, valid, new_xyz, psh.mesh, axis=psh.axis)
                for i, ((lo, r), ns, mlp) in enumerate(
                    zip(pairs, self.nsamples, self.mlps)
                ):
                    ns = int(ns)
                    g_xyz_abs, g_feat, cnt = groups[i]
                    slot_ok = (
                        (jnp.arange(ns)[None, None, :] < cnt[:, :, None])
                        & new_valid[:, :, None]
                    )
                    g_xyz = g_xyz_abs - new_xyz[:, :, None, :]
                    parts = [jnp.where(slot_ok[..., None], g_xyz, 0.0)]
                    if features is not None:
                        parts.append(
                            jnp.where(slot_ok[..., None], g_feat, 0.0))
                    grouped = jnp.concatenate(parts, -1)
                    h = SharedMLP(mlp, name=f"point_mlp{i}")(
                        grouped, training, mask=slot_ok[..., None]
                    )
                    h = jnp.where(slot_ok[..., None], h, -1e9).max(axis=2)
                    h = jnp.where(
                        new_valid[..., None] & (cnt[..., None] > 0), h, 0.0
                    )
                    outs.append(h)
                scales = ()  # sharded path handled all scales above
            else:
                use_fused = group_pallas.enabled()
                scales = tuple(zip(pairs, self.nsamples, self.mlps))
                if use_fused:
                    # fused Pallas query+group: one Morton-sorted payload
                    # AND one sorted query set shared by all scales;
                    # outputs stay in the kernel's blocked layout through
                    # the MLP+pool and only the pooled (B, Q, C) is
                    # unsorted (group_pallas.py)
                    prep = group_pallas.prepare_sources(xyz, features, valid)
                    qs = group_pallas.sort_queries_shared(new_xyz, new_valid)
                else:
                    # XLA fallback: all scales share one (M, N) dist grid
                    queries = grouping.ball_query_multi(
                        tuple(pairs), tuple(int(n) for n in self.nsamples),
                        xyz, new_xyz, valid,
                    )
            for i, ((lo, r), ns, mlp) in enumerate(scales):
                ns = int(ns)
                if use_fused:
                    gb, _, cnt = group_pallas.fused_query_group_blocked(
                        prep, qs, ns, r, lo
                    )
                    vb = qs["valid_b"]                     # (B, nq, QB)
                    slot_ok = (
                        (jnp.arange(ns)[None, None, :, None]
                         < cnt[:, :, None, :]) & vb[:, :, None, :]
                    )
                    parts = [gb[..., :3] - qs["xyz_b"][:, :, None]]
                    if features is not None:
                        parts.append(gb[..., 3:])
                    grouped = jnp.where(
                        slot_ok[..., None], jnp.concatenate(parts, -1), 0.0
                    )
                    h = SharedMLP(mlp, name=f"point_mlp{i}")(
                        grouped, training, mask=slot_ok[..., None]
                    )
                    h = jnp.where(slot_ok[..., None], h, -1e9).max(axis=2)
                    h = jnp.where(
                        vb[..., None] & (cnt[..., None] > 0), h, 0.0
                    )
                    h = h.reshape(h.shape[0], -1, h.shape[-1])[:, :qs["Q"]]
                    h = jnp.take_along_axis(h, qs["inv"][..., None], axis=1)
                    outs.append(h)
                    continue
                idx, cnt = queries[i]
                g_xyz = (grouping.group_points(xyz, idx)
                         - new_xyz[:, :, None, :])
                parts = [g_xyz]
                if features is not None:
                    parts.append(grouping.group_points(features, idx))
                slot_ok = (
                    (jnp.arange(ns)[None, None, :] < cnt[:, :, None])
                    & new_valid[:, :, None]
                )
                grouped = jnp.where(
                    slot_ok[..., None], jnp.concatenate(parts, -1), 0.0
                )
                h = SharedMLP(mlp, name=f"point_mlp{i}")(
                    grouped, training, mask=slot_ok[..., None]
                )
                h = jnp.where(slot_ok[..., None], h, -1e9).max(axis=2)
                h = jnp.where(
                    new_valid[..., None] & (cnt[..., None] > 0), h, 0.0
                )
                outs.append(h)
        else:
            # layer >0: voxel query against the centroid sparse tensor
            new_coords = points_to_voxel_coords(
                new_xyz, self.point_cloud_range, self.voxel_size
            )
            use_fused = group_pallas.enabled()
            if use_fused:
                prep = group_pallas.prepare_sources(
                    centroid_xyz, sp.features, sp.valid, src_coords=sp.coords
                )
                qs = group_pallas.sort_queries_shared(
                    new_xyz, new_valid, q_coords=new_coords
                )
            for i, (r, ns, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)
            ):
                ns = int(ns)
                min_r = self.radii[i - 1] if (self.dilated_group and i > 0) else 0.0
                qr = tuple(int(v) for v in self.query_ranges[i])

                if use_fused:
                    gb, _, cnt = group_pallas.fused_query_group_blocked(
                        prep, qs, ns, float(r), float(min_r),
                        query_range=qr,
                    )
                    vb = qs["valid_b"]                     # (B, nq, QB)
                    slot_ok = (
                        (jnp.arange(ns)[None, None, :, None]
                         < cnt[:, :, None, :]) & vb[:, :, None, :]
                    )
                    g_xyz = gb[..., :3] - qs["xyz_b"][:, :, None]
                    g_feat = jnp.where(slot_ok[..., None], gb[..., 3:], 0.0)
                    g_xyz = jnp.where(slot_ok[..., None], g_xyz, 0.0)
                    hf = _MLPNoFinalRelu(mlp, name=f"point_mlp{i}")(
                        g_feat, training, mask=slot_ok[..., None]
                    )
                    c_last = mlp[-1]
                    hx = _MLPNoFinalRelu(
                        [c_last // 2, c_last], name=f"pos_mlp{i}"
                    )(g_xyz, training, mask=slot_ok[..., None])
                    h = nn.relu(hf + hx)
                    h = jnp.where(slot_ok[..., None], h, -1e9).max(axis=2)
                    h = jnp.where(
                        vb[..., None] & (cnt[..., None] > 0), h, 0.0
                    )
                    h = h.reshape(h.shape[0], -1, h.shape[-1])[:, :qs["Q"]]
                    h = jnp.take_along_axis(h, qs["inv"][..., None], axis=1)
                    outs.append(h)
                    continue
                if True:
                    def one(nx, nc, cx, scoords, svalid, sfeat):
                        return voxel_query(
                            nx, nc, cx, scoords, svalid,
                            radius=float(r), nsample=int(ns),
                            query_range=qr, min_radius=float(min_r),
                        )

                    idx, cnt = jax.vmap(one)(
                        new_xyz, new_coords, centroid_xyz, sp.coords,
                        sp.valid, sp.features,
                    )
                    g_feat = grouping.group_points(sp.features, idx)
                    g_xyz_abs = grouping.group_points(centroid_xyz, idx)
                slot_ok = (
                    (jnp.arange(ns)[None, None, :] < cnt[:, :, None])
                    & new_valid[:, :, None]
                )
                g_xyz = g_xyz_abs - new_xyz[:, :, None, :]
                g_feat = jnp.where(slot_ok[..., None], g_feat, 0.0)
                g_xyz = jnp.where(slot_ok[..., None], g_xyz, 0.0)
                hf = _MLPNoFinalRelu(mlp, name=f"point_mlp{i}")(
                    g_feat, training, mask=slot_ok[..., None]
                )
                c_last = mlp[-1]
                hx = _MLPNoFinalRelu(
                    [c_last // 2, c_last], name=f"pos_mlp{i}"
                )(g_xyz, training, mask=slot_ok[..., None])
                h = nn.relu(hf + hx)
                h = jnp.where(slot_ok[..., None], h, -1e9).max(axis=2)
                h = jnp.where(
                    new_valid[..., None] & (cnt[..., None] > 0), h, 0.0
                )
                outs.append(h)

        new_features = jnp.concatenate(outs, -1)
        if self.aggregation_mlp:
            new_features = SharedMLP(self.aggregation_mlp, name="aggregation")(
                new_features, training, mask=new_valid[..., None]
            )
            new_features = jnp.where(new_valid[..., None], new_features, 0.0)

        # ---- sparse-tensor construction / update ----
        new_point_slot = None
        new_centroid_xyz = centroid_xyz
        sp_out = sp
        if self.sa_layer_idx == 0:
            coords = points_to_voxel_coords(
                new_xyz, self.point_cloud_range, self.voxel_size
            )
            feats_in = jnp.concatenate([new_xyz, new_features], -1)

            def build(c, f, v):
                return voxel_centroids(
                    c, f, v, num_voxels=self.voxel_capacity,
                    grid_dims=self.grid,
                )

            out = jax.vmap(build)(coords, feats_in, new_valid)
            new_centroid_xyz = out["centroids"][..., :3]
            sp_out = SparseTensor(
                features=out["centroids"][..., 3:],
                coords=out["coordinates"],
                valid=out["valid"],
                grid=self.grid, stride=1,
            )
            new_point_slot = out["point_slot"]
        elif 0 < self.sa_layer_idx < 3:
            # scatter new point features onto the existing sp rows
            coords = points_to_voxel_coords(
                new_xyz, self.point_cloud_range, self.voxel_size
            )

            def build(c, f, v):
                return voxel_centroids(
                    c, f, v, num_voxels=new_xyz.shape[1],
                    grid_dims=self.grid,
                )

            upd = jax.vmap(build)(coords, new_features, new_valid)

            gz, gy, gx = self.grid
            sentinel = gz * gy * gx

            # rank-align the update rows onto the sp rows (shared keys);
            # the probe dispatches to the Pallas searchsorted on TPU
            sp_keys_b = sp_ops.linearize(sp.coords, self.grid, sp.valid)
            u_keys_b = sp_ops.linearize(
                upd["coordinates"], self.grid, upd["valid"]
            )
            pos_b, hit_b = sp_ops._lookup_batched(
                sp_keys_b, u_keys_b[:, None, :], sentinel
            )
            pos_b, hit_b = pos_b[:, 0], hit_b[:, 0]

            def align(pos, hit, u_feats, v_rows):
                src = jnp.zeros((v_rows, u_feats.shape[-1]), u_feats.dtype)
                return src.at[jnp.where(hit, pos, v_rows)].set(
                    u_feats, mode="drop"
                )

            source = jax.vmap(
                lambda p, h, f: align(p, h, f, sp.coords.shape[1])
            )(pos_b, hit_b, upd["centroids"])
            src_st = SparseTensor(source, sp.coords, sp.valid, sp.grid, sp.stride)

            n_out = new_features.shape[-1]
            n_en = n_out // 2
            cap = self.voxel_capacity
            if unet_plan is not None and unet_plan["ds8"][0].shape[1] != cap:
                unet_plan = None  # capacity mismatch: plan not reusable
            if unet_plan is None:
                unet_plan = build_unet_plan(sp, cap)
            sp4x = SubMConv(n_en, kernel_size=1, name="spconv4x")(src_st, training)
            sp8x = SparseConv(
                n_en, out_capacity=cap, name="spconv8x"
            )(sp4x, training, plan=unet_plan["ds8"])
            sp16x = SparseConv(
                n_en * 2, out_capacity=cap, name="spconv16x"
            )(sp8x, training, plan=unet_plan["ds16"])
            rb16 = unet_plan["rb16"]
            h16 = SubMConv(n_en * 2, name="inv16x_a")(sp16x, training,
                                                      rulebook=rb16)
            h16 = SubMConv(n_en * 2, name="inv16x_b")(h16, training,
                                                      rulebook=rb16)
            h16 = h16._replace(features=h16.features + sp16x.features)
            h8 = SparseInverseConv(n_en, name="inv8x")(
                h16, sp8x, training, rulebook=unet_plan["inv16to8"]
            )
            rb8 = unet_plan["rb8"]
            h8 = SubMConv(n_en, name="inv8x_a")(h8, training, rulebook=rb8)
            h8 = SubMConv(n_en, name="inv8x_b")(h8, training, rulebook=rb8)
            h8 = h8._replace(features=h8.features + sp8x.features)
            h4 = SparseInverseConv(n_en, name="inv4x")(
                h8, sp4x, training, rulebook=unet_plan["inv8to4"]
            )
            rb4 = unet_plan["rb4"]
            h4 = SubMConv(n_en, name="inv4x_a")(h4, training, rulebook=rb4)
            h4 = SubMConv(n_en, name="inv4x_b")(h4, training, rulebook=rb4)
            h4 = h4._replace(features=h4.features + sp4x.features)
            dest = SubMConv(
                n_out, kernel_size=1, use_relu=False, name="spconv_out"
            )(h4, training)

            sp_upd = SubMConv(
                int(self.sp_channels[-1]), kernel_size=1, use_relu=False,
                name="sp_update",
            )(sp, training)
            fused = nn.relu(
                sp_upd.features + ori_scores_voxel * dest.features
            )
            fused = jnp.where(sp.valid[..., None], fused, 0.0)
            sp_out = sp._replace(features=fused)

            # the new (sampled) points' voxel slots in the sp row order
            pkeys_b = sp_ops.linearize(coords, self.grid, new_valid)
            ppos, phit = sp_ops._lookup_batched(
                sp_keys_b, pkeys_b[:, None, :], sentinel
            )
            new_point_slot = jnp.where(
                phit[:, 0], ppos[:, 0], -1
            ).astype(jnp.int32)

        # ---- per-voxel confidence ----
        new_scores_voxel = None
        if self.confidence_mlp:
            h = SharedMLP(self.confidence_mlp, name="confidence")(
                sp_out.features, training, mask=sp_out.valid[..., None]
            )
            logits = nn.Dense(
                self.num_class, name="confidence_out",
                bias_init=nn.initializers.constant(-float(np.log(99.0))),
            )(h)
            new_scores_voxel = jnp.where(
                sp_out.valid[..., None], logits, -1e9
            )

        return dict(
            new_xyz=new_xyz, new_features=new_features, new_valid=new_valid,
            scores_voxel=new_scores_voxel, sp=sp_out,
            centroid_xyz=new_centroid_xyz, point_slot=new_point_slot,
        )


def _sa_kwargs(cfg, k, channel_in, voxel_size, point_cloud_range, grid,
               num_class, capacity):
    """Shared cfg->kwargs mapping for one SA layer."""
    agg = cfg.get("AGGREGATION_MLPS")
    conf = cfg.get("CONFIDENCE_MLPS")
    return dict(
        sa_layer_idx=k,
        npoint_list=[int(n) for n in cfg["NPOINT_LIST"][k]],
        sample_range_list=[list(r) for r in cfg["SAMPLE_RANGE_LIST"][k]],
        sample_method_list=list(cfg["SAMPLE_METHOD_LIST"][k]),
        radii=[float(r) for r in cfg["RADIUS"][k]],
        nsamples=[int(n) for n in cfg["NSAMPLE"][k]],
        mlps=[list(m) for m in cfg["MLPS"][k]],
        query_ranges=(
            [list(q) for q in cfg["QUERY_RANGE"][k]]
            if cfg.get("QUERY_RANGE") else None
        ),
        dilated_group=bool(cfg.get("DILATED_RADIUS_GROUP", False)),
        aggregation_mlp=list(agg[k]) if agg and agg[k] else None,
        confidence_mlp=list(conf[k]) if conf and conf[k] else None,
        sp_channels=None,  # filled by caller for k>0
        num_class=num_class,
        weight_gamma=float(cfg.get("WEIGHT_GAMMA", 1.0)),
        voxel_size=tuple(voxel_size),
        point_cloud_range=tuple(point_cloud_range),
        grid=grid,
        voxel_capacity=capacity,
    )


class _VoxelFSBase(nn.Module):
    """Shared plumbing: run a list of SA-layer configs sequentially."""
    model_cfg: dict
    input_channels: int
    meta: object

    def _run_layers(self, cfg_key, batch_dict, training, n_layers=None,
                    unet_plan=None):
        cfg = self.model_cfg[cfg_key]
        voxel_cfg = self.model_cfg["VOXEL_CONFIG"]
        base_vs = np.asarray(voxel_cfg["VOXEL_SIZE"], np.float64)
        factor = float(self.model_cfg.get("FACTOR", 4))
        vs = tuple(base_vs * factor)
        pcr = tuple(voxel_cfg["POINT_CLOUD_RANGE"])
        grid = factored_grid(pcr, vs)
        num_class = int(cfg.get("NUM_CLASS", 3))

        points = batch_dict["points"]
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None
        valid = batch_dict["points_mask"]

        state = dict(
            xyz=xyz, features=feats, valid=valid, scores_voxel=None,
            point_slot=None, sp=None, centroid_xyz=None,
        )
        layers = len(cfg["NPOINT_LIST"]) if n_layers is None else n_layers
        outs = []
        capacity = sum(int(n) for n in cfg["NPOINT_LIST"][0])
        prefix = "s_sa" if cfg_key == "S_SA_CONFIG" else "sa"
        sp_ch_in = None
        for k in range(layers):
            kw = _sa_kwargs(cfg, k, None, vs, pcr, grid, num_class, capacity)
            if k > 0:
                agg = cfg.get("AGGREGATION_MLPS")
                out_ch = int(agg[k][-1]) if agg and agg[k] else int(
                    cfg["MLPS"][k][-1][-1]
                )
                kw["sp_channels"] = (sp_ch_in, out_ch)
            if 0 < k < 3 and unet_plan is None and state["sp"] is not None:
                unet_plan = build_unet_plan(state["sp"], capacity)
            r = VoxelSAModule(**kw, name=f"{prefix}{k}")(
                state["xyz"], state["features"], state["valid"],
                scores_voxel=state["scores_voxel"],
                point_slot=state["point_slot"], sp=state["sp"],
                centroid_xyz=state["centroid_xyz"], training=training,
                unet_plan=unet_plan if 0 < k < 3 else None,
            )
            state = dict(
                xyz=r["new_xyz"], features=r["new_features"],
                valid=r["new_valid"], scores_voxel=r["scores_voxel"],
                point_slot=r["point_slot"], sp=r["sp"],
                centroid_xyz=r["centroid_xyz"],
            )
            agg0 = cfg.get("AGGREGATION_MLPS")
            sp_ch_in = int(agg0[0][-1]) if agg0 and agg0[0] else int(
                cfg["MLPS"][0][-1][-1]
            )
            outs.append(r)
        return outs, unet_plan


class VoxelPointNet2FSMSG(_VoxelFSBase):
    """Teacher-training backbone (parity: pointnet2_backbone.py:367-617)."""

    @property
    def num_point_features(self):
        agg = self.model_cfg["SA_CONFIG"].get("AGGREGATION_MLPS")
        return int(agg[-1][-1])

    @nn.compact
    def __call__(self, batch_dict, training=False):
        outs, _ = self._run_layers("SA_CONFIG", batch_dict, training)
        last = outs[-1]
        batch_dict["point_features"] = last["new_features"]
        batch_dict["point_coords"] = last["new_xyz"]
        batch_dict["point_valid"] = last["new_valid"]
        batch_dict["point_scores"] = last["scores_voxel"]
        batch_dict["last_sp_tensor"] = last["sp"]
        batch_dict["last_centroid_xyz"] = last["centroid_xyz"]
        batch_dict["last_point_slot"] = last["point_slot"]
        batch_dict["statistic_feature"] = last["sp"].features
        # SASA pyramid: per-layer centroid coords + per-voxel scores
        batch_dict["point_coords_list"] = [o["centroid_xyz"] for o in outs]
        batch_dict["point_scores_list"] = [o["scores_voxel"] for o in outs]
        batch_dict["point_valid_list"] = [o["sp"].valid for o in outs]
        return batch_dict


class VoxelPointNet2FSMSGDistillation(_VoxelFSBase):
    """Frozen-teacher / trainable-student backbone
    (parity: pointnet2_backbone.py:619-925). Teacher layers run under
    stop_gradient; at eval only teacher layer 0 runs (its outputs feed the
    student layer, :832-835,860-864)."""

    @property
    def num_point_features(self):
        agg = self.model_cfg["S_SA_CONFIG"].get("AGGREGATION_MLPS")
        return int(agg[-1][-1])

    @nn.compact
    def __call__(self, batch_dict, training=False):
        import contextlib
        import os

        n_teacher = None if training else len(
            self.model_cfg["SA_CONFIG"]["NPOINT_LIST"]
        ) - 1
        # r5 (VERDICT r4 #3ii): the frozen teacher needs no f32 — under
        # TSM_TEACHER_BF16=1 its whole branch (MLPs, convs, grouping
        # payloads) computes in bf16 during TRAINING; loss targets are
        # f32-cast by the head. Eval keeps f32 (it runs the truncated
        # teacher on the deployed path). Flag-gated: changes training
        # numerics (documented delta), default off.
        t_ctx = (
            sp_ops.force_compute_dtype(jnp.bfloat16)
            if training and os.environ.get("TSM_TEACHER_BF16", "") == "1"
            else contextlib.nullcontext()
        )
        with t_ctx:
            t_outs, unet_plan = self._run_layers(
                "SA_CONFIG", batch_dict, training, n_layers=n_teacher
            )
        # stop_gradient on array leaves only — SparseTensor.grid/stride are
        # static python ints that must NOT become tracers (subm_conv3d needs
        # them concrete for sentinel/shape computation)
        t_outs = jax.tree_util.tree_map(
            lambda x: jax.lax.stop_gradient(x)
            if isinstance(x, jnp.ndarray) else x,
            t_outs,
        )

        # student layer consumes teacher layer-0 outputs
        cfg = self.model_cfg["S_SA_CONFIG"]
        voxel_cfg = self.model_cfg["VOXEL_CONFIG"]
        base_vs = np.asarray(voxel_cfg["VOXEL_SIZE"], np.float64)
        factor = float(self.model_cfg.get("FACTOR", 4))
        vs = tuple(base_vs * factor)
        pcr = tuple(voxel_cfg["POINT_CLOUD_RANGE"])
        grid = factored_grid(pcr, vs)
        t0 = t_outs[0]
        capacity = sum(int(n) for n in cfg["NPOINT_LIST"][0])
        kw = _sa_kwargs(cfg, 1, None, vs, pcr, grid, 3, capacity)
        agg = cfg.get("AGGREGATION_MLPS")
        sp_in = int(
            self.model_cfg["SA_CONFIG"]["AGGREGATION_MLPS"][0][-1]
        )
        kw["sp_channels"] = (sp_in, int(agg[1][-1]))
        # the student U-Net runs on the same layer-0 position set as the
        # teacher's — reuse the teacher's plan (build one if the teacher
        # ran only layer 0, i.e. eval)
        if unet_plan is None:
            unet_plan = build_unet_plan(t0["sp"], capacity)
        s_out = VoxelSAModule(**kw, name="s_sa1")(
            t0["new_xyz"], t0["new_features"], t0["new_valid"],
            scores_voxel=t0["scores_voxel"], point_slot=t0["point_slot"],
            sp=t0["sp"], centroid_xyz=t0["centroid_xyz"], training=training,
            unet_plan=unet_plan,
        )

        if training:
            tl = t_outs[-1]
            batch_dict["point_features"] = tl["new_features"]
            batch_dict["point_coords"] = tl["new_xyz"]
            batch_dict["point_valid"] = tl["new_valid"]
            batch_dict["point_scores"] = tl["scores_voxel"]
            batch_dict["last_sp_tensor"] = tl["sp"]
            batch_dict["last_centroid_xyz"] = tl["centroid_xyz"]
            batch_dict["last_point_slot"] = tl["point_slot"]
            batch_dict["statistic_feature"] = tl["sp"].features

        batch_dict["s_point_features"] = s_out["new_features"]
        batch_dict["s_point_coords"] = s_out["new_xyz"]
        batch_dict["s_point_valid"] = s_out["new_valid"]
        batch_dict["s_point_scores"] = s_out["scores_voxel"]
        batch_dict["s_last_sp_tensor"] = s_out["sp"]
        batch_dict["s_last_centroid_xyz"] = s_out["centroid_xyz"]
        batch_dict["s_last_point_slot"] = s_out["point_slot"]
        batch_dict["s_statistic_feature"] = s_out["sp"].features

        outs = t_outs + [s_out]
        batch_dict["point_coords_list"] = [o["centroid_xyz"] for o in outs]
        batch_dict["point_scores_list"] = [o["scores_voxel"] for o in outs]
        batch_dict["point_valid_list"] = [o["sp"].valid for o in outs]
        return batch_dict
