"""Pallas implicit-GEMM gather for sparse 3D convolution.

The sparse-conv hot loop is `out[q] = sum_k W_k^T f[idx[k, q]]` — a row
gather feeding a GEMM (SURVEY.md §7.2). XLA lowers the row gather to
serialized per-row HBM reads (~30 GB/s effective, ~15 ms per 27-tap conv at
KITTI scale); Mosaic cannot lower vectorized VMEM gathers at all. This
kernel sidesteps indexed addressing entirely by casting the gather as a
*blocked one-hot matmul* on the MXU:

    gathered_block = onehot(idx_block, source_window) @ f_window

Rulebook indices probed from key-sorted position sets are monotone per tap
(ops/spconv.py sorts by linearized voxel key), so a block of QB consecutive
queries touches a narrow window of source rows. The kernel reduces the
per-tap query block's min/max source row on the VPU, then loops only the
covered SB-row windows: one iota-compare builds the one-hot (no gather),
one MXU dot applies it. Monotonicity is purely a PERFORMANCE property —
arbitrary (even random) indices still produce exact results, just with
more window iterations.

Grid: (B, Q/QB, K) with taps innermost so the output block accumulates in
VMEM across taps and is written back once.

Backward runs the XLA gather/scatter reference (training-only cost); the
forward pallas path carries eval throughput.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 256  # query rows per block (default; see _gather_matmul_fwd)
SB = 256  # source rows per window step (idx-based gather_matmul)
SB_BYKEY = 512  # bykey window step: tuned on-chip (tools/tune_kernels.py)
                # — (qb=256, sb=512, tg=9) beats (256, 256, 1) by 1.3-2.1x
                # on all three TSM conv shapes


def _kernel(idx_ref, f_ref, w_ref, o_ref, *, nsb, out_dtype, dot_dtype,
            qb, sb):
    K = idx_ref.shape[1]
    c, co = w_ref.shape[-2], w_ref.shape[-1]
    v_cap = nsb * sb

    def tap(k, acc):
        idx2 = idx_ref[0, pl.ds(k, 1), :].reshape(qb, 1)  # int32, -1 = skip
        lo = jnp.min(jnp.where(idx2 >= 0, idx2, v_cap))
        hi = jnp.max(idx2)  # -1 when the whole block is masked
        s0 = lo // sb
        nwin = jnp.maximum(hi // sb - s0 + 1, 0)  # 0 when no valid index

        def body(j, g):
            st = (s0 + j) * sb
            fwin = f_ref[0, pl.ds(st, sb), :].astype(dot_dtype)  # (sb, C)
            src = st + jax.lax.broadcasted_iota(jnp.int32, (qb, sb), 1)
            onehot = (idx2 == src).astype(dot_dtype)  # (qb, sb)
            return g + jnp.dot(onehot, fwin,
                               preferred_element_type=jnp.float32)

        g = jax.lax.fori_loop(
            0, nwin, body, jnp.zeros((qb, c), jnp.float32), unroll=False
        )
        wk = w_ref[pl.ds(k, 1), :, :].reshape(c, co)
        return acc + jnp.dot(g.astype(dot_dtype), wk.astype(dot_dtype),
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, K, tap, jnp.zeros((qb, co), jnp.float32), unroll=False
    )
    o_ref[0] = acc.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "bf16", "qb", "sb"))
def _gather_matmul_fwd(features, idx, weight, interpret=False, bf16=False,
                       qb=QB, sb=SB):
    B, V, C = features.shape
    _, K, Q = idx.shape
    Co = weight.shape[-1]
    out_dtype = features.dtype

    v_pad = -V % sb
    q_pad = -Q % qb
    if v_pad:
        features = jnp.pad(features, ((0, 0), (0, v_pad), (0, 0)))
    if q_pad:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, q_pad)), constant_values=-1)
    Vp, Qp = V + v_pad, Q + q_pad
    nsb = Vp // sb
    # Large voxel capacities (Waymo: 16k+) don't fit a double-buffered
    # f32 feature block in VMEM — hold the resident features in bf16
    # there (accumulation stays f32). KITTI-scale caps stay f32/bitwise.
    if not bf16 and Vp * max(C, 128) * 4 * 2 > 12 * 1024 * 1024:
        _warn_forced_bf16(Vp, C)
        bf16 = True
    dot_dtype = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        features = features.astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_kernel, nsb=nsb, out_dtype=out_dtype,
                          dot_dtype=dot_dtype, qb=qb, sb=sb),
        grid=(B, Qp // qb),
        in_specs=[
            pl.BlockSpec((1, K, qb), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Co), lambda b, q: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, Co), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Qp, Co), out_dtype),
        interpret=interpret,
    )(idx, features, weight)
    return out[:, :Q, :] if q_pad else out


_BIG = np.int32(2**31 - 1)
ANCHOR_STRIDE = 128  # row-rank granularity of the key-window bound; 128 =
                     # one lane-dim vreg, so dynamic window starts stay
                     # vreg-aligned (no relayout on the kwin lane slice)


def _bykey_kernel(anch_ref, qk_ref, sk_ref, f_ref, w_ref, o_ref, *, v_hi,
                  out_dtype, dot_dtype, qb, sb, sentinel, tg):
    """Fused probe+gather: one-hot match on voxel KEYS instead of probed
    slot indices. The window of source rows that can match a block of
    target keys is located by counting anchors (skeys[::ANCHOR_STRIDE])
    <= the block's min/max care key — rows before the last anchor <= min
    are strictly smaller (keys are strictly ascending on the valid
    prefix), rows from the first anchor > max are strictly larger.

    Windows start at the 128-aligned row of the first possible match
    (not at absolute sb-grid multiples): a qb-query block's matching rows
    span ~qb rows by density, so one sb=512 visit usually covers the
    whole tap group where the sb-quantized loop needed two (the compare
    work per visit — (tg*qb, sb) lanes — is what the kernel is bound on).

    The caller remaps invalid source keys (the sentinel tail) to _BIG and
    pads qkeys with `sentinel`, so equality alone is exact — no per-window
    care mask: invalid q rows (== sentinel) match nothing because no
    source row holds `sentinel`.

    `tg` taps share one window loop (rows of the one-hot are tap-major
    stacked). Taps are x-fastest (ops/spconv.kernel_offsets) and keys are
    x-fastest (ops/spconv.linearize), so a same-z tap group's key windows
    differ only by ±(gx+1): the union window is barely wider than one tap's, and
    the per-tap scalar/loop overhead (anchor counts, while_loop control,
    dot issues) is paid K/tg times instead of K — the kernel is overhead-
    bound, not MXU-bound (SURVEY §8). tg must divide K; tg=1 is the
    original per-tap loop."""
    K = qk_ref.shape[1]
    c, co = w_ref.shape[-2], w_ref.shape[-1]
    anch = anch_ref[0, 0:1, :]

    def tap(g_i, acc):
        # target keys for tg consecutive taps, tap-major rows. Built from
        # per-tap (qb, 1) reshapes + a sublane concat — a direct
        # (1, tg, qb) -> (tg*qb, 1) reshape crashes Mosaic.
        if tg == 1:  # degenerate concat/slice below cost a ~256 KB
            # stack copy each — enough to OOM the 256-ch conv's last
            # few hundred KB of scoped VMEM headroom
            q = qk_ref[0, pl.ds(g_i, 1), :].reshape(qb, 1)
        else:
            q = jnp.concatenate(
                [qk_ref[0, pl.ds(g_i * tg + t, 1), :].reshape(qb, 1)
                 for t in range(tg)], 0)
        # bounds still mask invalid rows (== sentinel, which is larger
        # than every valid key and would drag qhi to the array end) —
        # but only here, on (tg*qb, 1) lanes once per tap group, not on
        # the (tg*qb, sb) one-hot every window visit
        care = q < sentinel
        qlo = jnp.min(jnp.where(care, q, _BIG))
        qhi = jnp.max(jnp.where(care, q, -1))
        row0 = jnp.maximum(
            jnp.sum((anch <= qlo).astype(jnp.int32)) - 1, 0
        ) * ANCHOR_STRIDE
        row_end = jnp.sum((anch <= qhi).astype(jnp.int32)) * ANCHOR_STRIDE
        row_end = jnp.minimum(row_end, v_hi)

        def cond(cr):
            return cr[0] < row_end

        def body(cr):
            r, g = cr
            st = pl.multiple_of(r, ANCHOR_STRIDE)
            kwin = sk_ref[0, 0:1, pl.ds(st, sb)]          # (1, sb)
            onehot = (q == kwin).astype(dot_dtype)
            fwin = f_ref[0, pl.ds(st, sb), :].astype(dot_dtype)
            return r + sb, g + jnp.dot(
                onehot, fwin, preferred_element_type=jnp.float32
            )

        _, g = jax.lax.while_loop(
            cond, body, (row0, jnp.zeros((tg * qb, c), jnp.float32))
        )
        for t in range(tg):
            wk = w_ref[pl.ds(g_i * tg + t, 1), :, :].reshape(c, co)
            gt = (g if tg == 1
                  else jax.lax.slice(g, (t * qb, 0), ((t + 1) * qb, c)))
            acc = acc + jnp.dot(gt.astype(dot_dtype), wk.astype(dot_dtype),
                                preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(
        0, K // tg, tap, jnp.zeros((qb, co), jnp.float32), unroll=False
    )
    o_ref[0] = acc.astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("sentinel", "interpret", "bf16", "qb",
                                    "sb", "tg", "subm"))
def gather_matmul_bykey(features, skeys, qkeys, weight, sentinel,
                        interpret=False, bf16=False, qb=QB, sb=None,
                        tg=None, subm=False):
    """out[b, q] = sum_k weight[k]^T @ features[b, row(skeys == qkeys[b,k,q])]
    — the probe (ops/spconv._lookup_batched) and gather fused in one pass.

    features (B, V, C) in key-sorted row order; skeys (B, V) int32 strictly
    ascending valid prefix with a `sentinel` tail; qkeys (B, K, Q) int32
    target keys, >= sentinel = contribute zero; weight (K, C, Co). The
    one-hot compare costs the same MXU work as gather_matmul's index
    compare, so the separate rulebook probe pass disappears entirely.
    Same VMEM bf16 heuristic as gather_matmul.
    """
    B, V, C = features.shape
    _, K, Q = qkeys.shape
    Co = weight.shape[-1]
    out_dtype = features.dtype
    cp = max(C, 128)
    cop = max(Co, 128)
    budget = 15 * 1024 * 1024
    # Escape hatches for the compile-context-sensitive scoped-VMEM edge:
    # the 256-channel 27-tap convs' (512, 9) pick compiles standalone and
    # in eval programs but can exceed the 16 MB scoped stack inside large
    # training graphs (operand scheduling pressure). TSM_BYKEY_TG_MAX=3
    # caps the tap group for every auto-picked conv in that process.
    if tg is None:
        tg_max = int(os.environ.get("TSM_BYKEY_TG_MAX", "0"))
        if tg_max and K % tg_max == 0:
            tg = tg_max
    if sb is None:
        sb_env = int(os.environ.get("TSM_BYKEY_SB", "0"))
        if sb_env:
            sb = sb_env  # A/B probe: force the window width ladder-wide

    # TSM_BYKEY_TIGHT_VMEM=1 (set by the TRAINING entry points): inside
    # training graphs, operands reach the kernel in non-native layouts
    # (while-loop carries) and Mosaic's stack grows by roughly a feature-
    # block relayout copy + a second weight buffer — measured 16.84 MB
    # for the (V=4096, C=Co=256, K=27) conv at bf16 (512, 9) where the
    # plain model says 10.8 MB, a flaky compile-time overflow of the
    # 16 MB scoped stack. Eval programs compile the plain model's picks
    # fine (round-2 calibration), so the extra terms are opt-in to avoid
    # degrading eval throughput.
    tight = bool(os.environ.get("TSM_BYKEY_TIGHT_VMEM", ""))

    def scoped_estimate(fb, sb_c, tg_c):
        # Scoped-VMEM model, calibrated against a measured 16.20 MB
        # allocation for the (V=4096, C=Co=256, K=27) conv at f32: the
        # feature block is double-buffered (x2), the weight block
        # resident once (fb bytes when pre-cast to bf16), transients are
        # the (tg*qb, sb) one-hot + f32 (tg*qb, C) accumulator +
        # (sb, C) window; lane dims pad to 128.
        vp_c = V + ANCHOR_STRIDE + sb_c  # incl. window-slack padding
        resident = (2 * vp_c * cp * fb + K * C * cop * fb
                    + 4 * (K * Q + 2 * vp_c) + 1024)
        if tight:
            resident += V * cp * fb + K * C * cop * fb
        transient = (tg_c * qb * sb_c * fb + tg_c * qb * cp * 4
                     + sb_c * cp * fb)
        return resident + transient

    # the 12 MB feature-block rule (Waymo-scale caps) still forces bf16
    if not bf16 and V * cp * 4 * 2 > 12 * 1024 * 1024:
        _warn_forced_bf16(V, C)
        bf16 = True
    if tg is None or sb is None:
        # (sb, tg) ladder: prefer the tuned (sb=512, tg=9) — one z-plane
        # of taps per window loop — and degrade window size / tap group
        # until the estimate fits. If NOTHING fits in f32 (the
        # 256-channel training convs: 7 MB of f32 weights alone), force
        # bf16 — with half-width features+weights even tg=9 fits.
        # r4 micro re-sweep: sb=128 wins 1.6-5x on SUBMANIFOLD shapes
        # (same source/target key sets, span ~ qb rows), while STRIDED /
        # inverse convs (denser source keys: a 256-target block spans ~8x
        # more source rows -> 4x the window trips) keep the wide windows —
        # a global sb=128 default made the full KITTI eval pathological.
        # The caller passes subm=True (ops/spconv.subm_conv3d) to select
        # the narrow-first ladder.
        # Model-level A/B (r4): narrow-first for subm convs measured
        # 153.1 vs 157.1 scans/s on the KITTI bench — the micro-sweep's
        # subm win does NOT transfer to the real clustered key
        # distribution (spans per 256-query block exceed qb rows). Both
        # paths keep the wide-first ladder; the subm hint plumbing stays
        # for future per-shape tuning, and narrow widths remain reachable
        # via explicit sb / TSM_BYKEY_SB.
        ladder = [(512, 9), (512, 3), (256, 9), (256, 3), (512, 1),
                  (256, 1), (384, 9), (128, 9), (128, 1)]
        cands = [(sb_c, tg_c) for sb_c, tg_c in ladder
                 if (sb is None or sb_c == sb)
                 and (tg is None or tg_c == tg) and K % tg_c == 0]
        cands = cands or [(sb or 256, tg or 1)]
        fb = 2 if bf16 else 4
        pick = next((c for c in cands
                     if scoped_estimate(fb, *c) <= budget), None)
        if pick is None and not bf16:
            _warn_forced_bf16(V, C)
            bf16 = True
            pick = next((c for c in cands
                         if scoped_estimate(2, *c) <= budget), cands[-1])
        sb, tg = pick if pick is not None else cands[-1]

    # invalid source rows (the linearize sentinel tail) -> _BIG so the
    # window body needs no care mask: invalid TARGET keys are exactly
    # `sentinel`, which after this remap no source row can hold. Windows
    # start at 128-aligned rows (not sb-grid multiples), so pad an extra
    # sb rows of slack beyond the 128-rounded V for the last window read.
    sent_i32 = np.int32(min(int(sentinel), int(_BIG)))
    skeys = jnp.where(skeys >= sent_i32, _BIG, skeys)
    # normalize every invalid target key to exactly `sentinel` (callers
    # may pass any value >= sentinel; _BIG would match the pad rows)
    qkeys = jnp.where(qkeys >= sent_i32, sent_i32, qkeys)
    v_pad = (-V % ANCHOR_STRIDE) + sb
    q_pad = -Q % qb
    features = jnp.pad(features, ((0, 0), (0, v_pad), (0, 0)))
    skeys = jnp.pad(skeys, ((0, 0), (0, v_pad)), constant_values=_BIG)
    if q_pad:
        qkeys = jnp.pad(qkeys, ((0, 0), (0, 0), (0, q_pad)),
                        constant_values=sent_i32)
    Vp, Qp = V + v_pad, Q + q_pad
    v_hi = Vp - sb  # 128-aligned cap on window starts (st + sb <= Vp)
    if not bf16 and Vp * max(C, 128) * 4 * 2 > 12 * 1024 * 1024:
        _warn_forced_bf16(Vp, C)
        bf16 = True
    dot_dtype = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        features = features.astype(jnp.bfloat16)
        weight = weight.astype(jnp.bfloat16)  # halve the resident block

    anchors = skeys[:, ::ANCHOR_STRIDE]                    # (B, A)
    a_pad = -anchors.shape[1] % 128
    if a_pad:
        anchors = jnp.pad(anchors, ((0, 0), (0, a_pad)),
                          constant_values=_BIG)
    anchors = anchors[:, None, :]                          # (B, 1, A)
    sk2 = skeys[:, None, :]                                # (B, 1, Vp)

    out = pl.pallas_call(
        functools.partial(_bykey_kernel, v_hi=v_hi, out_dtype=out_dtype,
                          dot_dtype=dot_dtype, qb=qb, sb=sb, tg=tg,
                          sentinel=sent_i32),
        grid=(B, Qp // qb),
        in_specs=[
            pl.BlockSpec((1, 1, anchors.shape[-1]), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, qb), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Vp), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Co), lambda b, q: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, Co), lambda b, q: (b, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Qp, Co), out_dtype),
        interpret=interpret,
    )(anchors, qkeys, sk2, features, weight)
    return out[:, :Q, :] if q_pad else out


def _bykey_bwd_kernel(anch_ref, qk_ref, sk_ref, f_ref, g_ref, w_ref,
                      df_ref, dw_ref, *, nsb, dot_dtype, qb, sb, sentinel,
                      tg):
    """Backward of the fused probe+gather conv, same windowed one-hot
    structure as _bykey_kernel (the profiled alternative — differentiating
    the XLA gather reference — spends ~120 ms/train-step in serialized
    row scatters at TSM scale, 38% of the whole step):

        df[v]  += sum_k onehot_k^T @ (g @ W_k^T)   (transpose-scatter)
        dW[k]  += (onehot_k @ f)^T @ g             (gather + outer product)

    Both contractions ride the MXU; the monotone key windows confine the
    one-hot exactly as in the forward. df accumulates f32 into a resident
    (Vp, C) block (zeroed at each batch's first query block); dW
    accumulates f32 across the whole grid (zeroed once)."""
    K = qk_ref.shape[1]
    c = f_ref.shape[-1]
    anch = anch_ref[0, 0:1, :]

    @pl.when(pl.program_id(1) == 0)
    def _zero_df():
        df_ref[0] = jnp.zeros_like(df_ref[0])

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _zero_dw():
        dw_ref[...] = jnp.zeros_like(dw_ref[...])

    gblk = g_ref[0, 0].astype(dot_dtype)                  # (qb, Co)

    def tap(g_i, _):
        # tg taps share one window loop, tap-major stacked rows (the same
        # control-overhead amortization as the forward). The transpose
        # contraction over all tg*qb rows sums the taps' df contributions
        # for free.
        if tg == 1:
            q = qk_ref[0, pl.ds(g_i, 1), :].reshape(qb, 1)
        else:
            q = jnp.concatenate(
                [qk_ref[0, pl.ds(g_i * tg + t, 1), :].reshape(qb, 1)
                 for t in range(tg)], 0)
        care = q < sentinel
        qlo = jnp.min(jnp.where(care, q, _BIG))
        qhi = jnp.max(jnp.where(care, q, -1))
        cnt_lo = jnp.sum((anch <= qlo).astype(jnp.int32))
        cnt_hi = jnp.sum((anch <= qhi).astype(jnp.int32))
        s0 = jnp.maximum(cnt_lo - 1, 0) * ANCHOR_STRIDE // sb
        end = jnp.minimum((cnt_hi * ANCHOR_STRIDE + sb - 1) // sb, nsb)

        gws = []
        for t in range(tg):
            wk = w_ref[pl.ds(g_i * tg + t, 1), :, :].reshape(c, -1)
            gws.append(jax.lax.dot_general(
                gblk, wk.astype(dot_dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dot_dtype))                           # (qb, C)
        gW = gws[0] if tg == 1 else jnp.concatenate(gws, 0)

        def cond(cr):
            return cr[0] < end

        def body(cr):
            j, gath = cr
            st = pl.multiple_of(j * sb, sb)
            kwin = sk_ref[0, 0:1, pl.ds(st, sb)]           # (1, sb)
            onehot = ((q == kwin) & care).astype(dot_dtype)  # (tg*qb, sb)
            dfw = jax.lax.dot_general(
                onehot, gW, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (sb, C)
            df_ref[0, pl.ds(st, sb), :] += dfw
            fwin = f_ref[0, pl.ds(st, sb), :].astype(dot_dtype)
            gath = gath + jnp.dot(onehot, fwin,
                                  preferred_element_type=jnp.float32)
            return j + 1, gath

        _, gath = jax.lax.while_loop(
            cond, body, (s0, jnp.zeros((tg * qb, c), jnp.float32))
        )
        for t in range(tg):
            gath_t = (gath if tg == 1 else jax.lax.slice(
                gath, (t * qb, 0), ((t + 1) * qb, c)))
            dwk = jax.lax.dot_general(
                gath_t.astype(dot_dtype), gblk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # (C, Co)
            dw_ref[pl.ds(g_i * tg + t, 1), :, :] += dwk[None]
        return 0

    jax.lax.fori_loop(0, K // tg, tap, 0, unroll=False)


@functools.partial(jax.jit,
                   static_argnames=("sentinel", "interpret", "bf16", "qb",
                                    "sb", "tg"))
def gather_matmul_bykey_bwd(features, skeys, qkeys, weight, g, sentinel,
                            interpret=False, bf16=False, qb=QB,
                            sb=SB_BYKEY, tg=None):
    """(d_features, d_weight) of gather_matmul_bykey w.r.t. (features,
    weight) given output cotangent g (B, Q, Co). Same operand contracts
    as the forward."""
    B, V, C = features.shape
    _, K, Q = qkeys.shape
    Co = weight.shape[-1]
    if tg is None:
        tg = bykey_bwd_plan(B, V, C, Co, K, qb=qb, sb=sb) or 1

    v_pad = -V % max(sb, ANCHOR_STRIDE)
    q_pad = -Q % qb
    if v_pad:
        features = jnp.pad(features, ((0, 0), (0, v_pad), (0, 0)))
        skeys = jnp.pad(skeys, ((0, 0), (0, v_pad)), constant_values=_BIG)
    if q_pad:
        qkeys = jnp.pad(qkeys, ((0, 0), (0, 0), (0, q_pad)),
                        constant_values=_BIG)
        g = jnp.pad(g, ((0, 0), (0, q_pad), (0, 0)))
    Vp, Qp = V + v_pad, Q + q_pad
    nsb = Vp // sb
    dot_dtype = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        features = features.astype(jnp.bfloat16)
        weight = weight.astype(jnp.bfloat16)

    anchors = skeys[:, ::ANCHOR_STRIDE]
    a_pad = -anchors.shape[1] % 128
    if a_pad:
        anchors = jnp.pad(anchors, ((0, 0), (0, a_pad)),
                          constant_values=_BIG)
    anchors = anchors[:, None, :]
    sk2 = skeys[:, None, :]

    df, dw = pl.pallas_call(
        functools.partial(_bykey_bwd_kernel, nsb=nsb, dot_dtype=dot_dtype,
                          qb=qb, sb=sb, tg=tg,
                          sentinel=np.int32(min(int(sentinel), _BIG))),
        grid=(B, Qp // qb),
        in_specs=[
            pl.BlockSpec((1, 1, anchors.shape[-1]), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, qb), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Vp), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qb, Co), lambda b, q: (b, 0, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Co), lambda b, q: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Vp, C), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, Co), lambda b, q: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Vp, C), jnp.float32),
            jax.ShapeDtypeStruct((K, C, Co), jnp.float32),
        ],
        interpret=interpret,
    )(anchors, qkeys, sk2, features, g[:, None], weight)
    return df[:, :V, :], dw


def bykey_bwd_plan(B, V, C, Co, K, qb=QB, sb=SB_BYKEY):
    """Largest tap group (9/3/1) whose backward-kernel scoped-VMEM
    estimate fits the budget, or None when nothing fits (callers fall
    back to the XLA-reference VJP). Residents: f (bf16, x2 across-batch
    double buffer) + df (f32, x2) + w + dw + g block; transients scale
    with tg (tap-major one-hot, gather carry, stacked gW)."""
    cp = max(C, 128)
    cop = max(Co, 128)
    vp = V + (-V % max(sb, ANCHOR_STRIDE))
    resident = (2 * vp * cp * 2 + 2 * vp * cp * 4
                + K * C * cop * 2 + K * C * cop * 4
                + 2 * qb * cop * 4 + 4 * 2 * vp)
    budget_mb = int(os.environ.get("TSM_BYKEY_BWD_BUDGET_MB", "12"))
    budget = budget_mb * 1024 * 1024
    for tg in (9, 3, 1):
        if K % tg:
            continue
        transient = (tg * qb * sb * 2 + 2 * tg * qb * cp * 4
                     + tg * qb * cp * 2 + sb * cp * 2 + sb * cp * 4
                     + qb * cop * 2)
        if resident + transient <= budget:
            return tg
    return None


def bykey_bwd_fits_vmem(B, V, C, Co, K, sb=SB_BYKEY):
    return bykey_bwd_plan(B, V, C, Co, K, sb=sb) is not None


def _xla_reference(features, idx, weight):
    """The XLA gather formulation — backward pass + fallback + test oracle."""

    def single(f, i):
        g = jnp.where((i >= 0)[..., None], f[jnp.maximum(i, 0)], 0.0)
        return jnp.einsum(
            "kqi,kio->qo", g, weight, preferred_element_type=jnp.float32
        ).astype(f.dtype)

    return jax.vmap(single)(features, idx)


def _env_bf16():
    import os

    return os.environ.get("TSM_COMPUTE_DTYPE", "") == "bfloat16"


_WARNED_FORCED_BF16 = set()


def _warn_forced_bf16(vp, c):
    """One-time (per shape) notice that the VMEM heuristic downgraded the
    forward gather/GEMM to bf16 without TSM_COMPUTE_DTYPE being set — the
    forward rounds to bf16 while the custom-VJP backward differentiates
    the f32 XLA reference, a deliberate but discoverable-only-here
    numeric asymmetry at Waymo-scale voxel capacities."""
    key = (vp, c)
    if key not in _WARNED_FORCED_BF16:
        _WARNED_FORCED_BF16.add(key)
        import warnings

        warnings.warn(
            f"spconv gather_matmul: padded feature block ({vp} voxels x "
            f"{c} ch) exceeds the 12 MB VMEM budget; forward gather/GEMM "
            f"runs in bfloat16 (f32 accumulation). Set "
            f"TSM_COMPUTE_DTYPE=bfloat16 to silence, or lower the voxel "
            f"capacity for f32."
        )


@jax.custom_vjp
def gather_matmul(features, idx, weight):
    """out[b, q] = sum_k weight[k]^T @ features[b, idx[b, k, q]].

    features (B, V, C); idx (B, K, Q) int32, entries in [0, V) or -1 to
    contribute zero; weight (K, C, Co). Returns (B, Q, Co) in features'
    dtype (f32 accumulation). Fast when idx is sorted per (b, k) —
    rulebooks from ops/spconv.py are; correctness never depends on it.
    TSM_COMPUTE_DTYPE=bfloat16 runs the gather + GEMM in bf16 (f32
    accumulation). bf16 is ALSO forced automatically (with a one-time
    warning) when the padded feature block exceeds the VMEM budget
    (Waymo-scale voxel caps): forward activations are then bf16-rounded
    while the backward differentiates the f32 XLA reference — a small
    forward/backward asymmetry documented here and in the warning.
    """
    return _gather_matmul_fwd(features, idx, weight, bf16=_env_bf16())


def _fwd(features, idx, weight):
    return (_gather_matmul_fwd(features, idx, weight, bf16=_env_bf16()),
            (features, idx, weight))


def _bwd(res, g):
    features, idx, weight = res
    _, vjp = jax.vjp(lambda f, w: _xla_reference(f, idx, w), features, weight)
    df, dw = vjp(g)
    return df, None, dw


gather_matmul.defvjp(_fwd, _bwd)


def available():
    return jax.devices()[0].platform == "tpu"
