"""Furthest-point sampling as a Pallas TPU kernel.

The FPS recursion (each step argmaxes a running min-distance vector) is the
reference's hottest sequential kernel (sampling_gpu.cu:101-180, SURVEY.md
§7.4 hard part #2). The XLA fori_loop formulation keeps the (B, N) state in
HBM and pays dispatch overhead per step; this kernel holds the state in
VMEM for the whole loop — one pallas_call per batch element (grid=(B,)),
M sequential steps of pure VPU work:

    d2      = (x - x[j])^2 + (y - y[j])^2 + (z - z[j])^2     (1, N) lanes
    mindist = min(mindist, d2)      [invalid lanes pinned at -1]
    j       = argmax(mindist [* w])

Numerics match ops/sampling.py exactly (same seeding at index 0, same
first-max tie-breaking), so the XLA path remains the CPU/test oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel_batched(npoint, weighted, xyz_ref, init_ref, w_ref, out_ref):
    """All batch rows advance in lockstep within ONE program: the per-step
    loop overhead (reductions, masked stores) is paid once for the whole
    batch instead of once per sample (grid=(B,) serializes on a TensorCore).
    State: mindist (B, N) f32 in VMEM; B*N is bounded by the caller."""
    xs = xyz_ref[0]                    # (B, N)
    ys = xyz_ref[1]
    zs = xyz_ref[2]
    w = w_ref[0] if weighted else None # (B, N)
    B, N = xs.shape

    lanes = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), 1)
    out_ref[0] = jnp.zeros((B, npoint), jnp.int32)

    def body(i, carry):
        mindist, last = carry          # last (B, 1) int32
        sel = lanes == last
        xj = jnp.sum(jnp.where(sel, xs, 0.0), axis=1, keepdims=True)
        yj = jnp.sum(jnp.where(sel, ys, 0.0), axis=1, keepdims=True)
        zj = jnp.sum(jnp.where(sel, zs, 0.0), axis=1, keepdims=True)
        d2 = (xs - xj) ** 2 + (ys - yj) ** 2 + (zs - zj) ** 2
        mindist = jnp.minimum(mindist, d2)
        key = mindist * w if weighted else mindist
        # first-max index via max + min-lane reductions (in-kernel argmax
        # trips a Mosaic f32->i32 legalization bug at small shapes)
        kmax = jnp.max(key, axis=1, keepdims=True)
        nxt = jnp.min(
            jnp.where(key == kmax, lanes, N), axis=1, keepdims=True
        ).astype(jnp.int32)
        out_ref[0] = jnp.where(out_lanes == i, nxt, out_ref[0])
        return mindist, nxt

    jax.lax.fori_loop(
        1, npoint, body,
        (init_ref[0], jnp.zeros((B, 1), jnp.int32)),
    )


def _fps_kernel(npoint, weighted, xyz_ref, init_ref, w_ref, out_ref):
    xs = xyz_ref[0, 0:1, :]            # (1, N)
    ys = xyz_ref[0, 1:2, :]
    zs = xyz_ref[0, 2:3, :]
    w = w_ref[0, 0:1, :] if weighted else None
    N = xs.shape[1]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)
    # Mosaic forbids scalar VMEM stores/loads: indices are written with
    # masked full-row stores, and the selected point's coordinates are
    # extracted with masked reductions.
    out_ref[0] = jnp.where(out_lanes == 0, 0, jnp.zeros_like(out_lanes))

    def body(i, carry):
        mindist, last = carry
        sel = lanes == last
        xj = jnp.sum(jnp.where(sel, xs, 0.0))
        yj = jnp.sum(jnp.where(sel, ys, 0.0))
        zj = jnp.sum(jnp.where(sel, zs, 0.0))
        d2 = (xs - xj) ** 2 + (ys - yj) ** 2 + (zs - zj) ** 2
        mindist = jnp.minimum(mindist, d2)   # invalid lanes stay at -1
        key = mindist * w if weighted else mindist
        kmax = jnp.max(key)
        nxt = jnp.min(jnp.where(key == kmax, lanes, N)).astype(jnp.int32)
        out_ref[0] = jnp.where(out_lanes == i, nxt, out_ref[0])
        return mindist, nxt

    jax.lax.fori_loop(
        1, npoint, body, (init_ref[0, 0:1, :], jnp.int32(0))
    )


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_pallas(xyz, npoint, valid_mask=None, weights=None):
    """(B, N, 3) -> (B, npoint) int32. Drop-in for
    sampling.furthest_point_sample(_weights); TPU-only (callers dispatch).

    Index outputs carry no gradients (the CUDA op had none either); inputs
    are stop_gradient'ed so autodiff never tries to linearize pallas_call
    (s-fps weights come from trainable confidence logits in training)."""
    xyz = jax.lax.stop_gradient(xyz)
    if weights is not None:
        weights = jax.lax.stop_gradient(weights)
    B, N, _ = xyz.shape
    Np = -(-N // 128) * 128
    xyzT = jnp.moveaxis(xyz, -1, 1)                      # (B, 3, N)
    xyzT = jnp.pad(xyzT, ((0, 0), (0, 0), (0, Np - N)))
    if valid_mask is None:
        init = jnp.full((B, 1, N), 1e10, jnp.float32)
    else:
        init = jnp.where(valid_mask[:, None, :], 1e10, -1.0).astype(jnp.float32)
    init = jnp.pad(init, ((0, 0), (0, 0), (0, Np - N)),
                   constant_values=-1.0)
    weighted = weights is not None
    if weighted:
        wpad = jnp.pad(
            weights[:, None, :].astype(jnp.float32),
            ((0, 0), (0, 0), (0, Np - N)),
        )
    else:
        wpad = jnp.zeros((B, 1, Np), jnp.float32)

    # batched lockstep kernel when the whole (B, N) state fits VMEM
    state_bytes = B * Np * 4 * (5 if weighted else 4)
    if state_bytes <= 10 * 1024 * 1024:
        xyzB = jnp.moveaxis(xyzT, 1, 0)               # (3, B, N)
        kernel = functools.partial(_fps_kernel_batched, npoint, weighted)
        out = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((3, B, Np), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, Np), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, Np), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, B, npoint), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, B, npoint), jnp.int32),
        )(xyzB, jnp.moveaxis(init, 1, 0), jnp.moveaxis(wpad, 1, 0))
        return out[0]

    kernel = functools.partial(_fps_kernel, npoint, weighted)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, Np), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
    )(xyzT, init, wpad)
    return out[:, 0, :]


# ---------------------------------------------------------------------------
# Block-pruned FPS — exact, for large N (the Waymo 122,880-point hot path)
# ---------------------------------------------------------------------------
#
# The lockstep kernel above sweeps the full (B, N) state ~10x per step; at
# Waymo scale (N=122,880, M=16,384) that is ~960 vregs per sweep and FPS
# becomes 61% of the eval forward (SURVEY.md §8b). This kernel exploits that
# the running min-distance ONLY DECREASES: points are Morton-sorted into
# spatially compact blocks of `_BS` and per-block maxima of the running
# min-distance are kept in one lane vector. Selecting point j can only lower
# mindist inside blocks with gap(bbox, j)^2 < block_max, so each step updates
# just those blocks (a dynamic-trip-count loop) instead of all of them — the
# pruning bound is sound, so the result is EXACT, not approximate.
#
# Bitwise parity with the XLA oracle (sampling._furthest_point_sample_xla,
# itself the parity target for sampling_gpu.cu:101-180): d2 uses the same
# association ((x)+(y))+(z) on the same f32 values, and ties at the max are
# broken by MINIMUM ORIGINAL INDEX — per block the kernel tracks the smallest
# original index attaining the block max, and across blocks it minimises
# again, which equals jnp.argmax's first-max rule in the original order.

_BS = 1024          # points per Morton block = one (8, 128) vreg
_RG = _BS // 128    # sublane rows per coordinate group in the packed (4*_RG, 128) payload
_NBIG = np.int32(2 ** 30)


def _fps_block_kernel(n_steps, nb, full_sweep, pk_ref, init_ref,
                      bbox_ref, wb0_ref, out_ref, mind_ref):
    """One batch row per program. Refs:
      pk_ref      (1, NB, 32, 128) f32  Morton-sorted blocks, packed as four
                                        8-sublane groups: x, y, z, orig index
                                        as f32 (exact: idx < 2^24; pad rows
                                        x/y/z = 0, idx = _NBIG = 2^30, a
                                        power of two so also f32-exact). ONE
                                        dynamic load per block visit replaces
                                        the previous four (x/y/z/oi refs).
      init_ref    (1, NB, 8, 128) f32   initial mindist (1e10 valid / -1)
      bbox_ref    (1, 8, NBL) f32       rows 0-5 lox,hix,loy,hiy,loz,hiz;
                                        row 6 initial block max; row 7 the
                                        initial per-block min orig idx (f32)
      wb0_ref     (1, 1, 1) i32 SMEM    block holding orig point 0 (seed)
      out_ref     (1, MB, 8, 128) i32   selected orig indices, 1024/row-group
      mind_ref    (NB, 8, 128) f32      scratch: running min-distance

    Tie-breaking stays MINIMUM ORIGINAL INDEX, now as f32 min over the
    packed index group — for non-negative f32-exact ints, float min equals
    integer min, so bitwise parity with the XLA oracle is preserved.
    """
    nbl = bbox_ref.shape[2]
    mind_ref[...] = init_ref[0]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, nbl), 1)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lox = bbox_ref[0, 0:1, :]
    hix = bbox_ref[0, 1:2, :]
    loy = bbox_ref[0, 2:3, :]
    hiy = bbox_ref[0, 3:4, :]
    loz = bbox_ref[0, 4:5, :]
    hiz = bbox_ref[0, 5:6, :]
    bm0 = bbox_ref[0, 6:7, :]
    barg0 = bbox_ref[0, 7:8, :]
    nbigf = jnp.float32(_NBIG)

    # Latency note: vector->scalar reductions pay an SREG sync (~100
    # cycles). Everything used only in later VECTOR ops (selected coords,
    # block maxima, the winning orig index) therefore stays a (1, 1)
    # vreg via keepdims; only the dynamic block indices (`find`, `wb`)
    # are true scalars. This halves the per-step critical path.

    def _upd_block(g, xj, yj, zj, bm, barg):
        pk = pk_ref[0, g]                               # (32, 128)
        xs = pk[0:_RG]
        ys = pk[_RG:2 * _RG]
        zs = pk[2 * _RG:3 * _RG]
        d2 = (xs - xj) ** 2 + (ys - yj) ** 2 + (zs - zj) ** 2
        m2 = jnp.minimum(mind_ref[g], d2)               # -1 stays pinned
        mind_ref[g] = m2
        bmax = jnp.max(m2.reshape(1, -1), axis=1, keepdims=True)
        tie = jnp.min(
            jnp.where(m2 == bmax, pk[3 * _RG:4 * _RG], nbigf).reshape(1, -1),
            axis=1, keepdims=True,
        )
        bm = jnp.where(lanes == g, bmax, bm)
        barg = jnp.where(lanes == g, tie, barg)
        return bm, barg

    def step(i, carry):
        bm, barg, outbuf, nxt, wb = carry
        # The just-picked point's own block is ALWAYS active (gap = 0
        # there) and its index is a carried SCALAR — load it once, pull
        # the picked point's coords out of that SAME load (the previous
        # step's selection never touches pk), update the block, and
        # exclude it from the residual active scan. No `find` sync and
        # no second dynamic load on the per-step critical path.
        pk = pk_ref[0, wb]                              # (32, 128)
        selm = pk[3 * _RG:4 * _RG] == nxt
        sel3 = jnp.concatenate([selm, selm, selm], axis=0)   # (24, 128)
        # one cross-lane reduce for all three coords, then cheap
        # sublane-group maxima
        lr = jnp.max(jnp.where(sel3, pk[0:3 * _RG], -jnp.inf),
                     axis=1, keepdims=True)             # (24, 1)
        xj = jnp.max(lr[0:_RG], axis=0, keepdims=True)
        yj = jnp.max(lr[_RG:2 * _RG], axis=0, keepdims=True)
        zj = jnp.max(lr[2 * _RG:3 * _RG], axis=0, keepdims=True)

        xs = pk[0:_RG]
        ys = pk[_RG:2 * _RG]
        zs = pk[2 * _RG:3 * _RG]
        d2 = (xs - xj) ** 2 + (ys - yj) ** 2 + (zs - zj) ** 2
        m2 = jnp.minimum(mind_ref[wb], d2)              # -1 stays pinned
        mind_ref[wb] = m2
        bmax = jnp.max(m2.reshape(1, -1), axis=1, keepdims=True)
        tie = jnp.min(
            jnp.where(m2 == bmax, pk[3 * _RG:4 * _RG], nbigf).reshape(1, -1),
            axis=1, keepdims=True,
        )
        bm = jnp.where(lanes == wb, bmax, bm)
        barg = jnp.where(lanes == wb, tie, barg)

        if full_sweep:
            # Unconditional static-trip sweep over EVERY block: no act
            # mask, no find() — the pruned path pays an SREG sync
            # (~100 cycles) per ACTIVE block to extract the next index,
            # which only wins when the active fraction is small. On the
            # Waymo bench distribution (122,880 clustered points, 120
            # blocks) ~70% of blocks stay active per step, so the
            # sync-free pipelined loop is faster despite touching all
            # blocks. Re-updating the own block is idempotent (same m2).
            def upd_all(g, st):
                bm, barg = st
                return _upd_block(g, xj, yj, zj, bm, barg)

            bm, barg = jax.lax.fori_loop(
                0, nb, upd_all, (bm, barg), unroll=False
            )
        else:
            gx = jnp.maximum(jnp.maximum(lox - xj, xj - hix), 0.0)
            gy = jnp.maximum(jnp.maximum(loy - yj, yj - hiy), 0.0)
            gz = jnp.maximum(jnp.maximum(loz - zj, zj - hiz), 0.0)
            g2 = gx * gx + gy * gy + gz * gz
            act = (g2 < bm) & (lanes != wb)             # (1, nbl) bool

            def find(cur):
                return jnp.min(jnp.where(act & (lanes >= cur), lanes, nb))

            def upd(st):
                g, bm, barg = st
                bm, barg = _upd_block(g, xj, yj, zj, bm, barg)
                return find(g + 1), bm, barg

            _, bm, barg = jax.lax.while_loop(
                lambda st: st[0] < nb, upd, (find(0), bm, barg)
            )

        kmax = jnp.max(bm, axis=1, keepdims=True)       # (1, 1)
        hitb = bm == kmax
        nxt = jnp.min(jnp.where(hitb, barg, nbigf), axis=1,
                      keepdims=True)                    # (1, 1) orig idx f32
        wb = jnp.min(jnp.where(hitb & (barg == nxt), lanes, nb))

        w = i % 1024
        outbuf = jnp.where(
            (sub_i == w // 128) & (lane_i == w % 128),
            nxt.astype(jnp.int32), outbuf
        )

        @pl.when(w == 1023)
        def _():
            out_ref[0, i // 1024] = outbuf

        return bm, barg, outbuf, nxt, jnp.minimum(wb, nb - 1)

    carry = (bm0, barg0, jnp.zeros((8, 128), jnp.int32),
             jnp.zeros((1, 1), jnp.float32),            # orig idx 0 (seed)
             jnp.minimum(wb0_ref[0, 0, 0], nb - 1))
    jax.lax.fori_loop(1, n_steps, step, carry)


@functools.partial(
    jax.jit, static_argnames=("npoint", "cell", "interpret", "full_sweep",
                              "two_rows", "rows")
)
def furthest_point_sample_block_pruned(xyz, npoint, valid_mask=None,
                                       cell=1.0, interpret=False,
                                       full_sweep=False, two_rows=False,
                                       rows=0):
    """Exact d-fps via Morton-block pruning: (B, N, 3) -> (B, npoint) i32.
    Bitwise-equal to sampling._furthest_point_sample_xla; intended for
    N >= ~64k where the lockstep kernel's full sweeps dominate."""
    xyz = jax.lax.stop_gradient(xyz)
    B, N, _ = xyz.shape
    valid = (jnp.ones((B, N), bool) if valid_mask is None
             else valid_mask.astype(bool))

    # Morton sort (invalid rows to the end), carrying coords + orig index.
    from .group_pallas import morton_code

    vxyz = jnp.where(valid[..., None], xyz, 1e30)
    origin = jnp.min(vxyz, axis=1, keepdims=True)
    code = jnp.where(valid, morton_code(vxyz, origin, cell=cell),
                     np.int32(2 ** 31 - 1))
    oi = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    _, xs, ys, zs, ois, vs = jax.lax.sort(
        (code, xyz[..., 0], xyz[..., 1], xyz[..., 2], oi,
         valid.astype(jnp.int32)),
        dimension=1, num_keys=1,
    )

    nb = -(-N // _BS)
    pad = nb * _BS - N
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, pad)))
        ys = jnp.pad(ys, ((0, 0), (0, pad)))
        zs = jnp.pad(zs, ((0, 0), (0, pad)))
        ois = jnp.pad(ois, ((0, 0), (0, pad)), constant_values=_NBIG)
        vs = jnp.pad(vs, ((0, 0), (0, pad)))
    vb = vs.astype(bool).reshape(B, nb, _BS)
    init = jnp.where(vb, 1e10, -1.0).astype(jnp.float32)

    def blk(a):
        return a.reshape(B, nb, 8, 128)

    def bounds(a):
        ab = a.reshape(B, nb, _BS)
        lo = jnp.min(jnp.where(vb, ab, 1e30), axis=2)
        hi = jnp.max(jnp.where(vb, ab, -1e30), axis=2)
        return lo, hi

    lox, hix = bounds(xs)
    loy, hiy = bounds(ys)
    loz, hiz = bounds(zs)
    anyv = jnp.any(vb, axis=2)
    bm0 = jnp.where(anyv, 1e10, -1.0)
    barg0 = jnp.min(
        jnp.where(vb, ois.reshape(B, nb, _BS), _NBIG), axis=2
    ).astype(jnp.float32)                       # < 2^24, exact in f32
    bbox = jnp.stack([lox, hix, loy, hiy, loz, hiz, bm0, barg0], axis=1)
    nbl = -(-nb // 128) * 128
    bbox = jnp.pad(bbox, ((0, 0), (0, 0), (0, nbl - nb)),
                   constant_values=1e30)
    # pad lanes must never be active or win: block max -1, huge bbox
    pad_lane = jnp.arange(nbl) >= nb
    bbox = bbox.at[:, 6, :].set(jnp.where(pad_lane, -1.0, bbox[:, 6, :]))
    bbox = bbox.at[:, 7, :].set(
        jnp.where(pad_lane, jnp.float32(_NBIG), bbox[:, 7, :]))

    # block (after the Morton sort) holding the seed point (orig idx 0) —
    # the kernel's carried "just-picked block" scalar for step 1; its
    # coordinates are pulled from the packed payload in-kernel
    wb0 = (jnp.argmax(ois == 0, axis=1).astype(jnp.int32)
           // _BS)[:, None, None]                        # (B, 1, 1)

    mp = -(-npoint // 1024) * 1024
    mb = mp // 1024
    packed = jnp.concatenate(
        [blk(xs), blk(ys), blk(zs), blk(ois.astype(jnp.float32))], axis=2
    )                                           # (B, nb, 32, 128)
    R = rows or (2 if two_rows else 0)
    if R > 1:
        # R batch rows per program (overlapped SREG syncs); pad B up to a
        # multiple of R with duplicates of row 0 and drop them after. The
        # dedicated 2-row kernel (hand-unrolled; the r4-benched variant)
        # stays the R=2 implementation; R>2 takes the generic n-row one.
        Bp = -(-B // R) * R
        if Bp != B:
            dup = lambda a: jnp.concatenate(
                [a] + [a[:1]] * (Bp - B), axis=0)
            packed, initb, bbox, wb0 = (dup(packed), dup(blk(init)),
                                        dup(bbox), dup(wb0))
        else:
            initb = blk(init)
        if R == 2:
            kernel = functools.partial(_fps_block_kernel_2row, mp, nb)
        else:
            kernel = functools.partial(_fps_block_kernel_nrow, mp, nb, R)
        out = pl.pallas_call(
            kernel,
            grid=(Bp // R,),
            in_specs=[
                pl.BlockSpec((R, nb, 32, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, nb, 8, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 8, nbl), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 1, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((R, mb, 8, 128), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, mb, 8, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((R, nb, 8, 128), jnp.float32)],
            interpret=interpret,
        )(packed, initb, bbox, wb0)
        return out.reshape(Bp, mp)[:B, :npoint]
    kernel = functools.partial(_fps_block_kernel, mp, nb, full_sweep)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, nb, 32, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, nbl), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, mb, 8, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, mb, 8, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nb, 8, 128), jnp.float32)],
        interpret=interpret,
    )(packed, blk(init), bbox, wb0)
    return out.reshape(B, mp)[:, :npoint]


def _fps_block_kernel_2row(n_steps, nb, pk_ref, init_ref, bbox_ref,
                           wb0_ref, out_ref, mind_ref):
    """TWO batch rows per program (r5 candidate, flag-gated, unbenched).

    The single-row kernel's per-step critical path is dominated by SREG
    syncs (the `find` scans and `wb` extraction, ~100 cycles each) that
    serialize behind vector work. Two independent rows advanced in ONE
    instruction stream issue their syncs back-to-back so the latencies
    overlap; the pruned visit loop is MERGED (one while over both rows'
    active scans) and branch-free — a finished row keeps re-applying a
    masked no-op update to its last block, so the body stays a single
    basic block for the scheduler. Bitwise-identical per row to
    _fps_block_kernel (same op order per row; tested in
    tests/test_point_ops.py::test_block_pruned_two_rows_bitwise)."""
    nbl = bbox_ref.shape[2]
    mind_ref[...] = init_ref[...]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, nbl), 1)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    nbigf = jnp.float32(_NBIG)

    def consts(r):
        return (bbox_ref[r, 0:1, :], bbox_ref[r, 1:2, :],
                bbox_ref[r, 2:3, :], bbox_ref[r, 3:4, :],
                bbox_ref[r, 4:5, :], bbox_ref[r, 5:6, :])

    cc = (consts(0), consts(1))

    def own(r, wb, nxt):
        """Apply the just-picked point of row r (always-active own block);
        returns its coords + the block's new (bmax, tie)."""
        pk = pk_ref[r, wb]
        selm = pk[3 * _RG:4 * _RG] == nxt
        sel3 = jnp.concatenate([selm, selm, selm], axis=0)
        lr = jnp.max(jnp.where(sel3, pk[0:3 * _RG], -jnp.inf),
                     axis=1, keepdims=True)
        xj = jnp.max(lr[0:_RG], axis=0, keepdims=True)
        yj = jnp.max(lr[_RG:2 * _RG], axis=0, keepdims=True)
        zj = jnp.max(lr[2 * _RG:3 * _RG], axis=0, keepdims=True)
        xs = pk[0:_RG]
        ys = pk[_RG:2 * _RG]
        zs = pk[2 * _RG:3 * _RG]
        d2 = (xs - xj) ** 2 + (ys - yj) ** 2 + (zs - zj) ** 2
        m2 = jnp.minimum(mind_ref[r, wb], d2)
        mind_ref[r, wb] = m2
        bmax = jnp.max(m2.reshape(1, -1), axis=1, keepdims=True)
        tie = jnp.min(
            jnp.where(m2 == bmax, pk[3 * _RG:4 * _RG], nbigf).reshape(1, -1),
            axis=1, keepdims=True,
        )
        return xj, yj, zj, bmax, tie

    def upd_masked(r, g, xj, yj, zj, bm, barg):
        """Visit block g of row r; g == nb means this row's scan is done —
        the clamped re-read/re-write of block nb-1 with a where-masked
        minimum is then an exact no-op (keeps the loop body branch-free)."""
        live = g < nb
        gc = jnp.minimum(g, nb - 1)
        pk = pk_ref[r, gc]
        xs = pk[0:_RG]
        ys = pk[_RG:2 * _RG]
        zs = pk[2 * _RG:3 * _RG]
        d2 = (xs - xj) ** 2 + (ys - yj) ** 2 + (zs - zj) ** 2
        m2 = jnp.where(live, jnp.minimum(mind_ref[r, gc], d2),
                       mind_ref[r, gc])
        mind_ref[r, gc] = m2
        bmax = jnp.max(m2.reshape(1, -1), axis=1, keepdims=True)
        tie = jnp.min(
            jnp.where(m2 == bmax, pk[3 * _RG:4 * _RG], nbigf).reshape(1, -1),
            axis=1, keepdims=True,
        )
        sel = (lanes == gc) & live
        return jnp.where(sel, bmax, bm), jnp.where(sel, tie, barg)

    def step(i, carry):
        (bm_a, barg_a, outbuf_a, nxt_a, wb_a,
         bm_b, barg_b, outbuf_b, nxt_b, wb_b) = carry
        xa, ya, za, bmax_a, tie_a = own(0, wb_a, nxt_a)
        xb, yb, zb, bmax_b, tie_b = own(1, wb_b, nxt_b)
        bm_a = jnp.where(lanes == wb_a, bmax_a, bm_a)
        barg_a = jnp.where(lanes == wb_a, tie_a, barg_a)
        bm_b = jnp.where(lanes == wb_b, bmax_b, bm_b)
        barg_b = jnp.where(lanes == wb_b, tie_b, barg_b)

        def gaps(c, xj, yj, zj):
            lox, hix, loy, hiy, loz, hiz = c
            gx = jnp.maximum(jnp.maximum(lox - xj, xj - hix), 0.0)
            gy = jnp.maximum(jnp.maximum(loy - yj, yj - hiy), 0.0)
            gz = jnp.maximum(jnp.maximum(loz - zj, zj - hiz), 0.0)
            return gx * gx + gy * gy + gz * gz

        act_a = (gaps(cc[0], xa, ya, za) < bm_a) & (lanes != wb_a)
        act_b = (gaps(cc[1], xb, yb, zb) < bm_b) & (lanes != wb_b)

        def find(act, cur):
            return jnp.min(jnp.where(act & (lanes >= cur), lanes, nb))

        def body(st):
            ga, gb, bm_a, barg_a, bm_b, barg_b = st
            bm_a, barg_a = upd_masked(0, ga, xa, ya, za, bm_a, barg_a)
            bm_b, barg_b = upd_masked(1, gb, xb, yb, zb, bm_b, barg_b)
            return (find(act_a, ga + 1), find(act_b, gb + 1),
                    bm_a, barg_a, bm_b, barg_b)

        _, _, bm_a, barg_a, bm_b, barg_b = jax.lax.while_loop(
            lambda st: (st[0] < nb) | (st[1] < nb), body,
            (find(act_a, 0), find(act_b, 0), bm_a, barg_a, bm_b, barg_b),
        )

        def select(bm, barg):
            kmax = jnp.max(bm, axis=1, keepdims=True)
            hitb = bm == kmax
            nxt = jnp.min(jnp.where(hitb, barg, nbigf), axis=1,
                          keepdims=True)
            wb = jnp.min(jnp.where(hitb & (barg == nxt), lanes, nb))
            return nxt, jnp.minimum(wb, nb - 1)

        nxt_a, wb_a = select(bm_a, barg_a)
        nxt_b, wb_b = select(bm_b, barg_b)

        w = i % 1024
        wmask = (sub_i == w // 128) & (lane_i == w % 128)
        outbuf_a = jnp.where(wmask, nxt_a.astype(jnp.int32), outbuf_a)
        outbuf_b = jnp.where(wmask, nxt_b.astype(jnp.int32), outbuf_b)

        @pl.when(w == 1023)
        def _():
            out_ref[0, i // 1024] = outbuf_a
            out_ref[1, i // 1024] = outbuf_b

        return (bm_a, barg_a, outbuf_a, nxt_a, wb_a,
                bm_b, barg_b, outbuf_b, nxt_b, wb_b)

    z88 = jnp.zeros((8, 128), jnp.int32)
    z11 = jnp.zeros((1, 1), jnp.float32)
    carry = (bbox_ref[0, 6:7, :], bbox_ref[0, 7:8, :], z88, z11,
             jnp.minimum(wb0_ref[0, 0, 0], nb - 1),
             bbox_ref[1, 6:7, :], bbox_ref[1, 7:8, :], z88, z11,
             jnp.minimum(wb0_ref[1, 0, 0], nb - 1))
    jax.lax.fori_loop(1, n_steps, step, carry)


def _fps_block_kernel_nrow(n_steps, nb, R, pk_ref, init_ref, bbox_ref,
                           wb0_ref, out_ref, mind_ref):
    """R batch rows per program (r5, VERDICT r4 #4: 4-row FPS).

    Generalizes _fps_block_kernel_2row: R independent rows advance in ONE
    instruction stream (Python loop over rows unrolls at trace time), so
    the per-step SREG sync latencies (~100 cy each: active-scan `find`s +
    winner extraction) of all R rows overlap instead of serializing. The
    merged visit loop is branch-free per row (a finished row re-applies a
    masked no-op on its last block). Per-row op order is IDENTICAL to the
    single-row kernel — bitwise parity holds row-by-row (tested in
    tests/test_point_ops.py).

    VMEM: R x (pk ~2 MB + init/mind ~0.5 MB each at Waymo nb=120) — R=4
    lands ~12 MB, inside the budget the 2-row kernel left unused."""
    nbl = bbox_ref.shape[2]
    mind_ref[...] = init_ref[...]

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, nbl), 1)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    nbigf = jnp.float32(_NBIG)

    cc = tuple(
        (bbox_ref[r, 0:1, :], bbox_ref[r, 1:2, :], bbox_ref[r, 2:3, :],
         bbox_ref[r, 3:4, :], bbox_ref[r, 4:5, :], bbox_ref[r, 5:6, :])
        for r in range(R))

    def own(r, wb, nxt):
        pk = pk_ref[r, wb]
        selm = pk[3 * _RG:4 * _RG] == nxt
        sel3 = jnp.concatenate([selm, selm, selm], axis=0)
        lr = jnp.max(jnp.where(sel3, pk[0:3 * _RG], -jnp.inf),
                     axis=1, keepdims=True)
        xj = jnp.max(lr[0:_RG], axis=0, keepdims=True)
        yj = jnp.max(lr[_RG:2 * _RG], axis=0, keepdims=True)
        zj = jnp.max(lr[2 * _RG:3 * _RG], axis=0, keepdims=True)
        xs = pk[0:_RG]
        ys = pk[_RG:2 * _RG]
        zs = pk[2 * _RG:3 * _RG]
        d2 = (xs - xj) ** 2 + (ys - yj) ** 2 + (zs - zj) ** 2
        m2 = jnp.minimum(mind_ref[r, wb], d2)
        mind_ref[r, wb] = m2
        bmax = jnp.max(m2.reshape(1, -1), axis=1, keepdims=True)
        tie = jnp.min(
            jnp.where(m2 == bmax, pk[3 * _RG:4 * _RG], nbigf).reshape(1, -1),
            axis=1, keepdims=True,
        )
        return xj, yj, zj, bmax, tie

    def upd_masked(r, g, xj, yj, zj, bm, barg):
        live = g < nb
        gc = jnp.minimum(g, nb - 1)
        pk = pk_ref[r, gc]
        xs = pk[0:_RG]
        ys = pk[_RG:2 * _RG]
        zs = pk[2 * _RG:3 * _RG]
        d2 = (xs - xj) ** 2 + (ys - yj) ** 2 + (zs - zj) ** 2
        m2 = jnp.where(live, jnp.minimum(mind_ref[r, gc], d2),
                       mind_ref[r, gc])
        mind_ref[r, gc] = m2
        bmax = jnp.max(m2.reshape(1, -1), axis=1, keepdims=True)
        tie = jnp.min(
            jnp.where(m2 == bmax, pk[3 * _RG:4 * _RG], nbigf).reshape(1, -1),
            axis=1, keepdims=True,
        )
        sel = (lanes == gc) & live
        return jnp.where(sel, bmax, bm), jnp.where(sel, tie, barg)

    def gaps(c, xj, yj, zj):
        lox, hix, loy, hiy, loz, hiz = c
        gx = jnp.maximum(jnp.maximum(lox - xj, xj - hix), 0.0)
        gy = jnp.maximum(jnp.maximum(loy - yj, yj - hiy), 0.0)
        gz = jnp.maximum(jnp.maximum(loz - zj, zj - hiz), 0.0)
        return gx * gx + gy * gy + gz * gz

    def find(act, cur):
        return jnp.min(jnp.where(act & (lanes >= cur), lanes, nb))

    def step(i, carry):
        rows = [list(carry[5 * r:5 * r + 5]) for r in range(R)]
        coords = []
        for r in range(R):
            bm, barg, outbuf, nxt, wb = rows[r]
            xj, yj, zj, bmax, tie = own(r, wb, nxt)
            rows[r][0] = jnp.where(lanes == wb, bmax, bm)
            rows[r][1] = jnp.where(lanes == wb, tie, barg)
            coords.append((xj, yj, zj))
        acts = [
            (gaps(cc[r], *coords[r]) < rows[r][0]) & (lanes != rows[r][4])
            for r in range(R)
        ]

        def body(st):
            gs = list(st[:R])
            bms = list(st[R:2 * R])
            bargs = list(st[2 * R:3 * R])
            for r in range(R):
                bms[r], bargs[r] = upd_masked(
                    r, gs[r], *coords[r], bms[r], bargs[r])
            gs = [find(acts[r], gs[r] + 1) for r in range(R)]
            return tuple(gs) + tuple(bms) + tuple(bargs)

        def cond(st):
            alive = st[0] < nb
            for r in range(1, R):
                alive = alive | (st[r] < nb)
            return alive

        st0 = (tuple(find(acts[r], 0) for r in range(R))
               + tuple(rows[r][0] for r in range(R))
               + tuple(rows[r][1] for r in range(R)))
        st = jax.lax.while_loop(cond, body, st0)
        for r in range(R):
            rows[r][0] = st[R + r]
            rows[r][1] = st[2 * R + r]

        w = i % 1024
        wmask = (sub_i == w // 128) & (lane_i == w % 128)
        for r in range(R):
            bm, barg = rows[r][0], rows[r][1]
            kmax = jnp.max(bm, axis=1, keepdims=True)
            hitb = bm == kmax
            nxt = jnp.min(jnp.where(hitb, barg, nbigf), axis=1,
                          keepdims=True)
            wb = jnp.min(jnp.where(hitb & (barg == nxt), lanes, nb))
            rows[r][3] = nxt
            rows[r][4] = jnp.minimum(wb, nb - 1)
            rows[r][2] = jnp.where(wmask, nxt.astype(jnp.int32), rows[r][2])

        @pl.when(w == 1023)
        def _():
            for r in range(R):
                out_ref[r, i // 1024] = rows[r][2]

        return tuple(x for row in rows for x in row)

    z88 = jnp.zeros((8, 128), jnp.int32)
    z11 = jnp.zeros((1, 1), jnp.float32)
    carry = tuple(
        x for r in range(R) for x in (
            bbox_ref[r, 6:7, :], bbox_ref[r, 7:8, :], z88, z11,
            jnp.minimum(wb0_ref[r, 0, 0], nb - 1))
    )
    jax.lax.fori_loop(1, n_steps, step, carry)


def tpu_available():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
