"""Sparse 3D convolution — gather-GEMM-scatter with static capacities.

TPU-native replacement for the external spconv 2.x dependency
(pcdet/utils/spconv_utils.py:3-6; used by VoxelBackBone8x, UNetV2 and the TSM
mini U-Nets, SURVEY.md §2.1). Design (SURVEY.md §7.2 "the hard one"):

  * A sparse tensor is a dict of fixed-capacity arrays per batch element:
      features (B, V, C) f32, coords (B, V, 3) int32 zyx (-1 pad),
      valid (B, V) bool — with the INVARIANT that rows are sorted by the
      linearized voxel key (voxelize/unique emit this order for free).
  * Rulebook construction: a dense voxel->slot hash table per sample
    (one scatter to build, one gather per tap — like the reference's
    generate_voxel2pinds, common_utils.py:248-265) when the grid fits
    DENSE_TABLE_MAX_CELLS; sorted-key binary search otherwise (KITTI's
    stride-1 grid is 41x1600x1408 = 92M cells — a table would be 370MB
    per sample, so searches over the V<=16k sorted keys win there).
  * Submanifold conv: out positions == in positions; per-tap gather + one
    (V, Cin)x(Cin, Cout) GEMM on the MXU, accumulated over taps.
  * Strided conv: exact spconv output set — the union over inputs of every
    output whose receptive field covers them (<= ceil(k/s)^3 candidates per
    input), sort-unique to a static capacity.
  * Inverse conv: transpose rulebook — each fine output gathers the coarse
    voxels whose receptive field covers it, with the matching mirrored tap
    weight.

Reference numerics: BN eps 1e-3 / momentum 0.01 live in the model layer
(pointnet2_modules.py:1608); here only the linear ops.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LazyRulebook(NamedTuple):
    """A rulebook that was never materialized: the fused by-key kernel
    (spconv_pallas.gather_matmul_bykey) matches target voxel keys against
    the sorted key list inside the gather itself, so building (idx, found)
    would be a wasted pass. Carries the probe INPUTS instead. Invalid /
    out-of-grid queries are already folded in as sentinel keys."""
    skeys: jax.Array   # (B, V) int32 ascending, sentinel tail
    qkeys: jax.Array   # (B, K, Q) int32 target keys, sentinel = skip


def linearize(coords_zyx, grid, valid=None):
    """(..., 3) zyx -> scalar keys; invalid / out-of-grid -> sentinel.

    Both bounds are checked: an un-checked high coordinate (e.g. y == gy
    from a +1 neighbor query at the grid edge) would alias-wrap onto the
    key of a different voxel.
    """
    gz, gy, gx = grid
    key = (coords_zyx[..., 0] * gy + coords_zyx[..., 1]) * gx + coords_zyx[..., 2]
    sentinel = gz * gy * gx
    bad = jnp.any(coords_zyx < 0, axis=-1) | jnp.any(
        coords_zyx >= jnp.asarray([gz, gy, gx], coords_zyx.dtype), axis=-1
    )
    if valid is not None:
        bad = bad | ~valid
    return jnp.where(bad, sentinel, key)


def kernel_offsets(kernel_size):
    """Static (K, 3) zyx offsets, centered (k odd) or from 0 (k even)."""
    ks = (
        (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
    )
    ranges = []
    for k in ks:
        lo = -(k // 2) if k % 2 == 1 else 0
        ranges.append(np.arange(lo, lo + k))
    off = np.stack(np.meshgrid(*ranges, indexing="ij"), axis=-1).reshape(-1, 3)
    return off.astype(np.int32)  # (K, 3) zyx


# Dense voxel->slot tables beat binary search ~3x on TPU (searchsorted
# lowers to a 12-step scan of dynamic gathers; a table is one scatter to
# build and one gather to probe). Above this cell count the table's HBM
# footprint stops paying for itself — fall back to binary search.
DENSE_TABLE_MAX_CELLS = 16_000_000


# Trace-time compute-dtype override stack (r5): the distillation
# backbone wraps its FROZEN teacher branch in force_compute_dtype(bf16)
# under TSM_TEACHER_BF16=1 — the teacher needs no f32 (it gets no
# gradients; its outputs are loss targets), and bf16 halves its gather
# bytes / doubles its MXU rate in the training step.
_DTYPE_OVERRIDE = []


class force_compute_dtype:
    """Context manager: modules constructed inside use this compute
    dtype (read at flax trace time through compute_dtype())."""

    def __init__(self, dtype):
        self.dtype = dtype

    def __enter__(self):
        _DTYPE_OVERRIDE.append(self.dtype)
        return self

    def __exit__(self, *exc):
        _DTYPE_OVERRIDE.pop()
        return False


def compute_dtype():
    """Gather/GEMM compute dtype for sparse convs. bf16 halves the gather
    bytes and doubles MXU rate; accumulation stays f32
    (preferred_element_type). Opt-in via TSM_COMPUTE_DTYPE=bfloat16, or
    scoped via force_compute_dtype (teacher-branch bf16)."""
    import os

    if _DTYPE_OVERRIDE:
        return _DTYPE_OVERRIDE[-1]
    return (
        jnp.bfloat16
        if os.environ.get("TSM_COMPUTE_DTYPE", "") == "bfloat16"
        else None
    )


def _use_pallas_gather():
    """The Pallas one-hot implicit-GEMM path (spconv_pallas.py) replaces
    XLA's serialized row gather on TPU (~2.7x per 27-tap conv). Kill
    switch: TSM_NO_PALLAS_SPCONV=1."""
    import os

    if os.environ.get("TSM_NO_PALLAS_SPCONV", ""):
        return False
    return jax.devices()[0].platform == "tpu"


def _use_bykey():
    """Fuse the rulebook probe into the gather (one-hot on keys) on TPU —
    the probe pass disappears from the forward entirely. Kill switch:
    TSM_NO_PALLAS_BYKEY=1 (falls back to probe + gather)."""
    import os

    if os.environ.get("TSM_NO_PALLAS_BYKEY", ""):
        return False
    return _use_pallas_gather()


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _bykey_conv(features, skeys, qkeys, weight, sentinel, subm=False):
    from . import spconv_pallas

    return spconv_pallas.gather_matmul_bykey(
        features, skeys, qkeys, weight, sentinel,
        bf16=compute_dtype() is not None, subm=subm,
    )


def _bykey_fwd(features, skeys, qkeys, weight, sentinel, subm=False):
    return (_bykey_conv(features, skeys, qkeys, weight, sentinel, subm),
            (features, skeys, qkeys, weight))


def _bykey_bwd(sentinel, subm, res, g):
    features, skeys, qkeys, weight = res
    from . import spconv_pallas

    B, V, C = features.shape
    K = qkeys.shape[1]
    Co = weight.shape[-1]
    if (_use_pallas_gather()
            and spconv_pallas.bykey_bwd_fits_vmem(B, V, C, Co, K)):
        # windowed one-hot MXU backward (spconv_pallas._bykey_bwd_kernel)
        # — replaces ~120 ms/step of serialized XLA row scatters
        df, dw = spconv_pallas.gather_matmul_bykey_bwd(
            features, skeys, qkeys, weight, g, sentinel,
            bf16=compute_dtype() is not None,
        )
        return df.astype(features.dtype), None, None, dw.astype(weight.dtype)

    # fallback: differentiate the XLA gather reference (re-probing the
    # rulebook — eval never materializes idx)
    idx, found = _lookup_batched(skeys, qkeys, sentinel)
    idxm = jnp.where(found, idx, -1)
    _, vjp = jax.vjp(
        lambda f, w: spconv_pallas._xla_reference(f, idxm, w),
        features, weight,
    )
    df, dw = vjp(g)
    return df, None, None, dw


_bykey_conv.defvjp(_bykey_fwd, _bykey_bwd)


def _gather_conv_bykey(features, rulebook, weight, out_valid, grid,
                       subm=False):
    # subm: source/target key sets coincide, so a target block's matching
    # source span is ~qb rows and narrow (128-wide) kernel windows win
    # (r4 sweep); strided/inverse convs span ~8x more source rows per
    # block and keep the wide windows.
    out = _bykey_conv(
        features, rulebook.skeys, rulebook.qkeys, weight,
        int(np.prod(grid)), subm,
    )
    return jnp.where(out_valid[..., None], out, 0.0)


def _gather_conv(features, idx, found, weight, out_valid):
    """Batched gather+GEMM core shared by all three conv flavors.
    features (B, V, C); idx/found (B, K, Vo); weight (K, Cin, Cout);
    out_valid (B, Vo). Dispatches to the Pallas implicit-GEMM kernel on
    TPU, XLA gather elsewhere."""
    if _use_pallas_gather():
        from . import spconv_pallas

        idxm = jnp.where(found, idx, -1)
        out = spconv_pallas.gather_matmul(features, idxm, weight)
        return jnp.where(out_valid[..., None], out, 0.0)

    cd = compute_dtype()
    wg = weight.astype(cd) if cd else weight

    def single(f, i, fd, ov):
        fg = f.astype(cd) if cd else f
        gathered = jnp.where(fd[..., None], fg[i], 0.0)  # (K, Vo, Cin)
        out = jnp.einsum(
            "kvi,kio->vo", gathered, wg, preferred_element_type=f.dtype
        ).astype(f.dtype)
        return jnp.where(ov[:, None], out, 0.0)

    return jax.vmap(single)(features, idx, found, out_valid)


def build_hash_table(coords_zyx, valid, grid):
    """(V, 3) sorted coords -> (prod(grid),) int32 voxel->slot table
    (-1 = empty). Costs one scatter; amortize across all convs that share
    the position set (parity: common_utils.generate_voxel2pinds)."""
    gz, gy, gx = grid
    keys = linearize(coords_zyx, grid, valid)
    V = coords_zyx.shape[0]
    table = jnp.full((gz * gy * gx + 1,), -1, jnp.int32)
    return table.at[keys].set(jnp.arange(V, dtype=jnp.int32), mode="drop")[:-1]


def _lookup(sorted_keys, query_keys, sentinel, table=None):
    """Rulebook probe: query_keys -> (slot idx, found). Uses the dense
    table when given, else binary search over the sorted keys."""
    if table is not None:
        safe = jnp.where(query_keys < sentinel, query_keys, 0)
        idx = table[safe]
        found = (idx >= 0) & (query_keys < sentinel)
        return jnp.maximum(idx, 0), found
    idx = jnp.searchsorted(sorted_keys, query_keys)
    idx = jnp.clip(idx, 0, sorted_keys.shape[0] - 1)
    found = (sorted_keys[idx] == query_keys) & (query_keys < sentinel)
    return idx, found


def _use_pallas_probe():
    """The Pallas blocked-counting searchsorted (searchsorted_pallas.py)
    replaces both the dense voxel->slot table and XLA searchsorted on TPU
    (~2.7x per 27-tap probe, and no table scatter / HBM footprint at all).
    Kill switch: TSM_NO_PALLAS_PROBE=1."""
    import os

    if os.environ.get("TSM_NO_PALLAS_PROBE", ""):
        return False
    return jax.devices()[0].platform == "tpu"


def _lookup_batched(skeys, query_keys, sentinel, table=None):
    """Batched rulebook probe. skeys (B, V) ascending per row (invalid
    tail = sentinel); query_keys (B, K, Q); returns idx/found (B, K, Q).
    Dispatches to the Pallas blocked-counting kernel on TPU; dense-table
    gather or binary search elsewhere."""
    if _use_pallas_probe():
        from . import searchsorted_pallas

        # flatten taps into one long near-sorted query axis: the kernel's
        # per-tap fori overhead dominates at small Q, and per-block window
        # bounds don't care about tap boundaries
        B, K, Q = query_keys.shape
        idx, fnd = searchsorted_pallas.searchsorted_rulebook(
            skeys, query_keys.reshape(B, 1, K * Q), sentinel
        )
        idx = idx.reshape(B, K, Q)
        fnd = fnd.reshape(B, K, Q)
        return idx, fnd & (query_keys < sentinel)
    if table is not None:
        return jax.vmap(
            lambda k, q, t: _lookup(k, q, sentinel, t)
        )(skeys, query_keys, table)
    return jax.vmap(lambda k, q: _lookup(k, q, sentinel))(skeys, query_keys)


def build_subm_rulebook(coords, valid, grid, kernel_size=3, table=None):
    """Precompute the (B, K, V) neighbor-slot rulebook (idx, found) for a
    position set. The table PROBE is the dominant sparse-conv cost
    (~0.2us per scalar gather); convs sharing a position set must share
    one rulebook instead of re-probing."""
    K = kernel_size ** 3 if isinstance(kernel_size, int) else int(
        np.prod(kernel_size)
    )
    offs = jnp.asarray(kernel_offsets(
        kernel_size if not isinstance(kernel_size, int) else kernel_size
    ))
    sentinel = int(np.prod(grid))
    if (table is None and not _use_pallas_probe()
            and sentinel <= DENSE_TABLE_MAX_CELLS):
        table = jax.vmap(lambda c, v: build_hash_table(c, v, grid))(
            coords, valid
        )

    keys = linearize(coords, grid, valid)                    # (B, V)
    qc = coords[:, None, :, :] + offs[None, :, None, :]      # (B, K, V, 3)
    qk = linearize(qc, grid, valid[:, None, :])
    if _use_bykey():
        return LazyRulebook(keys, qk)
    return _lookup_batched(keys, qk, sentinel, table)


def subm_conv3d(features, coords, valid, weight, grid, table=None,
                rulebook=None):
    """Submanifold sparse conv: output at exactly the input positions.

    features (B, V, Cin), coords (B, V, 3) sorted-by-key, valid (B, V),
    weight (K, Cin, Cout) with K = prod(kernel_size) taps ordered like
    kernel_offsets(). `table` (B, prod(grid)) optional precomputed
    voxel->slot hash; `rulebook` optional (idx, found) from
    build_subm_rulebook (shared across convs on the same position set).
    Returns (B, V, Cout).
    """
    K = weight.shape[0]
    if K == 1:
        # 1x1x1 conv: the rulebook is the identity — pure per-voxel GEMM
        out = jnp.einsum(
            "bvi,io->bvo", features, weight[0],
            preferred_element_type=features.dtype,
        )
        return jnp.where(valid[..., None], out, 0.0)

    k = round(K ** (1 / 3))
    if rulebook is None:
        rulebook = build_subm_rulebook(coords, valid, grid, k, table)
    if isinstance(rulebook, LazyRulebook):
        return _gather_conv_bykey(features, rulebook, weight, valid, grid,
                                  subm=True)
    idx_all, found_all = rulebook
    return _gather_conv(
        features, idx_all, found_all & valid[:, None, :], weight, valid
    )


def _downsample_out_coords(coords, valid, grid, out_grid, kernel_size, stride,
                           padding, out_capacity):
    """Exact spconv strided-conv output set: union over inputs of all output
    positions whose receptive field covers them; sorted-unique to capacity.
    Returns (out_coords (Vo, 3), out_valid (Vo,)) sorted by key."""
    ks = np.asarray(
        (kernel_size,) * 3 if isinstance(kernel_size, int) else kernel_size
    )
    st = np.asarray((stride,) * 3 if isinstance(stride, int) else stride)
    pd = np.asarray((padding,) * 3 if isinstance(padding, int) else padding)
    # per-axis candidate counts
    n_cand = [int(np.ceil(k / s)) for k, s in zip(ks, st)]
    cand_offsets = np.stack(
        np.meshgrid(*[np.arange(n) for n in n_cand], indexing="ij"), axis=-1
    ).reshape(-1, 3)  # (C, 3)

    st_j = jnp.asarray(st, jnp.int32)
    pd_j = jnp.asarray(pd, jnp.int32)
    ks_j = jnp.asarray(ks, jnp.int32)

    # o_min = ceil((i + p - k + 1)/s) with sign-correct ceiling;
    # candidates o_min + cand_offset, clipped to [0, o_max]
    o_min = jnp.where(
        coords + pd_j - ks_j + 1 >= 0,
        (coords + pd_j - ks_j + 1 + st_j - 1) // st_j,
        -((-(coords + pd_j - ks_j + 1)) // st_j),
    )
    o_max = (coords + pd_j) // st_j

    cands = o_min[:, None, :] + jnp.asarray(cand_offsets)[None, :, :]  # (V, C, 3)
    ok = (
        valid[:, None]
        & jnp.all(cands <= o_max[:, None, :], axis=-1)
        & jnp.all(cands >= 0, axis=-1)
        & jnp.all(cands < jnp.asarray(out_grid, jnp.int32), axis=-1)
    )
    cands = cands.reshape(-1, 3)
    ok = ok.reshape(-1)

    keys = linearize(cands, out_grid, ok)
    # variadic sort carries the coord payload through the sort network —
    # argsort + payload gathers lower to serialized row gathers on TPU
    # (~9 ms/fwd across the shared conv plans; the carried sort is ~4x
    # cheaper)
    skeys, sc0, sc1, sc2 = jax.lax.sort(
        (keys, cands[:, 0], cands[:, 1], cands[:, 2]), num_keys=1
    )
    sentinel = int(np.prod(out_grid))
    svalid = skeys < sentinel
    is_start = jnp.concatenate(
        [svalid[:1], (skeys[1:] != skeys[:-1]) & svalid[1:]]
    )
    slot = jnp.cumsum(is_start) - 1
    # compact the unique starts to the front: a second carried sort on
    # (is_start ? slot : BIG) replaces the row scatter (.at[write].set),
    # which XLA also serializes
    ckey = jnp.where(is_start, slot, np.int32(2**31 - 1))
    if ckey.shape[0] < out_capacity:  # tiny inputs: pad to capacity
        pad = out_capacity - ckey.shape[0]
        ckey = jnp.pad(ckey, (0, pad), constant_values=2**31 - 1)
        sc0, sc1, sc2 = (jnp.pad(x, (0, pad)) for x in (sc0, sc1, sc2))
    _, oc0, oc1, oc2 = jax.lax.sort((ckey, sc0, sc1, sc2), num_keys=1)
    out_coords = jnp.stack(
        [oc0[:out_capacity], oc1[:out_capacity], oc2[:out_capacity]], -1
    )
    n_out = jnp.minimum(jnp.sum(is_start), out_capacity)
    out_valid = jnp.arange(out_capacity) < n_out
    out_coords = jnp.where(out_valid[:, None], out_coords, -1)
    return out_coords, out_valid


def build_conv_plan(coords, valid, grid, out_grid, kernel_size, stride,
                    padding, out_capacity, table=None):
    """Everything weight-independent about a strided conv on a position
    set: (out_coords (B, Vo, 3), out_valid (B, Vo), rulebook (idx, found)).
    The TSM mini U-Nets run on the SAME base position set in every SA
    layer (teacher layers 1..2 + the student layer all `_replace` features
    on layer-0's coords), so one plan serves all of them per forward."""
    offs = jnp.asarray(kernel_offsets(kernel_size))  # (K, 3) zyx
    ks = np.asarray(
        (kernel_size,) * 3 if isinstance(kernel_size, int) else kernel_size
    )
    st_j = jnp.asarray(
        (stride,) * 3 if isinstance(stride, int) else stride, jnp.int32
    )
    pd_j = jnp.asarray(
        (padding,) * 3 if isinstance(padding, int) else padding, jnp.int32
    )
    lo = jnp.asarray([-(k // 2) if k % 2 == 1 else 0 for k in ks], jnp.int32)
    sentinel = int(np.prod(grid))
    if (table is None and not _use_pallas_probe()
            and sentinel <= DENSE_TABLE_MAX_CELLS):
        table = jax.vmap(lambda c, v: build_hash_table(c, v, grid))(
            coords, valid
        )

    oc, ov = jax.vmap(
        lambda c, v: _downsample_out_coords(
            c, v, grid, out_grid, kernel_size, stride, padding, out_capacity
        )
    )(coords, valid)
    in_keys = linearize(coords, grid, valid)               # (B, V)
    # input position for tap t at output o (spconv convention):
    # i = o*s - p + tap, tap in [0, k)
    taps = offs - lo[None, :]                              # (K, 3) in [0, k)
    qc = oc[:, None, :, :] * st_j - pd_j + taps[None, :, None, :]
    qk = linearize(qc, grid, ov[:, None, :])               # (B, K, Vo)
    if _use_bykey():
        return oc, ov, LazyRulebook(in_keys, qk)
    idx, found = _lookup_batched(in_keys, qk, sentinel, table)
    found = found & ov[:, None, :]
    return oc, ov, (idx, found)


def sparse_conv3d(features, coords, valid, weight, grid, out_grid,
                  kernel_size, stride, padding, out_capacity, table=None,
                  plan=None):
    """Strided (downsampling) sparse conv.
    `plan` optional precomputed build_conv_plan output (shared across convs
    on the same position set). Returns (out_features (B, Vo, Cout),
    out_coords (B, Vo, 3), out_valid (B, Vo)) with out coords in out_grid
    units, sorted."""
    if plan is None:
        plan = build_conv_plan(
            coords, valid, grid, out_grid, kernel_size, stride, padding,
            out_capacity, table,
        )
    oc, ov, rulebook = plan
    if isinstance(rulebook, LazyRulebook):
        return _gather_conv_bykey(features, rulebook, weight, ov, grid), oc, ov
    idx, found = rulebook
    return _gather_conv(features, idx, found, weight, ov), oc, ov


def build_inverse_rulebook(coarse_coords, coarse_valid, fine_coords,
                           fine_valid, coarse_grid, kernel_size, stride,
                           padding, table=None):
    """Weight-independent rulebook (idx, found) for inverse_conv3d —
    shareable across inverse convs with the same coarse/fine position
    pair. Fine position o receives coarse c with tap = o - (c*s - p) when
    0 <= tap < k  <=>  c in the candidate window of o."""
    ks = np.asarray(
        (kernel_size,) * 3 if isinstance(kernel_size, int) else kernel_size
    )
    st = np.asarray((stride,) * 3 if isinstance(stride, int) else stride)
    pd = np.asarray((padding,) * 3 if isinstance(padding, int) else padding)
    offs = jnp.asarray(kernel_offsets(kernel_size))
    lo = jnp.asarray([-(k // 2) if k % 2 == 1 else 0 for k in ks], jnp.int32)
    st_j = jnp.asarray(st, jnp.int32)
    pd_j = jnp.asarray(pd, jnp.int32)
    sentinel = int(np.prod(coarse_grid))
    if (table is None and not _use_pallas_probe()
            and sentinel <= DENSE_TABLE_MAX_CELLS):
        table = jax.vmap(
            lambda c, v: build_hash_table(c, v, coarse_grid)
        )(coarse_coords, coarse_valid)

    ckeys = linearize(coarse_coords, coarse_grid, coarse_valid)  # (B, Vc)
    taps = offs - lo[None, :]                              # (K, 3) in [0, k)
    # fine o gets coarse c where o = c*s - p + tap  =>  c = (o + p - tap)/s
    num = fine_coords[:, None, :, :] + pd_j - taps[None, :, None, :]
    c_cand = num // st_j                                   # (B, K, Vf, 3)
    exact = jnp.all(c_cand * st_j == num, axis=-1)         # (B, K, Vf)
    qk = linearize(c_cand, coarse_grid, fine_valid[:, None, :] & exact)
    if _use_bykey():
        return LazyRulebook(ckeys, qk)
    idx, found = _lookup_batched(ckeys, qk, sentinel, table)
    return idx, found & fine_valid[:, None, :] & exact


def inverse_conv3d(coarse_features, coarse_coords, coarse_valid, weight,
                   fine_coords, fine_valid, coarse_grid, kernel_size, stride,
                   padding, table=None, rulebook=None):
    """Sparse inverse (transposed) conv: scatter coarse features back onto a
    known fine position set (the paired encoder layer's positions — spconv's
    indice_key mechanism becomes an explicit argument).
    weight (K, Cin, Cout); `rulebook` optional build_inverse_rulebook
    output. Returns (B, Vf, Cout) on fine positions, sorted."""
    if rulebook is None:
        rulebook = build_inverse_rulebook(
            coarse_coords, coarse_valid, fine_coords, fine_valid,
            coarse_grid, kernel_size, stride, padding, table,
        )
    if isinstance(rulebook, LazyRulebook):
        return _gather_conv_bykey(
            coarse_features, rulebook, weight, fine_valid, coarse_grid
        )
    idx, found = rulebook
    return _gather_conv(coarse_features, idx, found, weight, fine_valid)


def sparse_to_dense(features, coords, valid, grid):
    """(B, V, C) sparse -> (B, gz, gy, gx, C) dense (spconv .dense())."""
    gz, gy, gx = grid

    def single(f, c, v):
        dense = jnp.zeros((gz, gy, gx, f.shape[-1]), f.dtype)
        zz = jnp.where(v, c[:, 0], gz)
        return dense.at[zz, c[:, 1], c[:, 2]].set(f, mode="drop")

    return jax.vmap(single)(features, coords, valid)
