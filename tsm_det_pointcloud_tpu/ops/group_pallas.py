"""Fused neighborhood-query + grouping Pallas kernel.

Replaces the two dominant costs of every SA layer (trace, b16 KITTI TSM):
ball/voxel query distance grids + top-k (~145 ms) and the XLA serialized
`take_along_axis` group gathers (~150 ms, ~12 ns per gathered row). One
kernel computes, per query block, masked distances against streamed source
blocks, assigns FIRST-K-in-scan-order slots (inclusive-cumsum of the hit
mask via log-step lane rolls), and gathers the selected sources — no
indexed addressing anywhere:

  * feature channels ride a one-hot MXU matmul in bf16 (MXU f32 "full"
    precision is 6 passes; features feed MLPs, bf16 is ample),
  * xyz and the original row index ride exact int32 VPU lane-reduces
    (sum of onehot * value); xyz is 1/1024-m fixed point (~1 mm, vs the
    5 cm voxel) because a bf16 gather of absolute coordinates would
    corrupt relative offsets by up to 0.25 m.

Semantics (parity note): the CUDA reference ball_query_kernel_fast
(ball_query_gpu.cu:75) and voxel_query reservoir both return an
order-dependent first/random nsample of the in-radius set; the XLA
fallbacks in ops/grouping.py return the nearest-k. This kernel returns the
first k in MORTON scan order (sources are pre-sorted for block locality) —
a third member of the same equivalence class. Every downstream consumer
masks group slots by `slot < cnt`, and `cnt` (exact, uncapped) matches the
fallback bit-for-bit.

Performance structure:
  * sources sorted by Morton code -> a block of consecutive rows is
    spatially compact; per-source-block bboxes are precomputed outside
    (block-major (n_sb, 16) — width-1 dynamic lane slices are illegal in
    Mosaic, sublane indexing is fine) and blocks farther than `radius`
    from the query block's bbox (or outside the voxel-query coord window)
    skip the whole body via @pl.when.
  * slot one-hot matmuls are chunked over k (KC slots at a time) and a
    chunk runs only if some query's slots reach its range (max-slot
    predicate), so sparse neighborhoods pay for one chunk.

Gradients: the custom VJP scatter-adds the feature cotangent at the
returned rows (XLA, training-only). Callers MUST mask unfilled slots
(slot >= cnt) before any use — their rows alias row 0 in the backward.
All in-tree callers do.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 128   # queries per block
SB = 512        # source rows per streamed block (small-C int path)
SB_LARGE_C = 256  # with a large-C bf16 payload the 512-block
                  # transients overflow VMEM under training
KC = 4     # k-slots per one-hot matmul chunk (VMEM transient ~ KC*QB*SB)
FP = 1024.0  # xyz fixed-point scale (1/FP metres)
SROW_OC = 4  # output channel of the (virtual) sorted-row id

# Gather int channels via base-256-digit one-hot MXU matmuls instead of
# per-channel VPU lane-reduces (exact either way; the matmul replaces
# 4-6 full-width reduces per slot chunk). Kill switch for A/B testing.
MXU_GATHER = not bool(__import__("os").environ.get("TSM_NO_MXU_GATHER"))

# Two query blocks per program (_kernel_pair). r5 on-chip A/B at
# production shapes (subprocess-isolated tune_kernels, 2026-08-21):
#   vsa (4096 src, 512 q, C=64/pf): 26.3 -> 12.4 ms  (2.1x WIN — halving
#       the program count halves the dominant per-program source fetch)
#   sa0 (16k src, 4096 q, small-C): 9.29 -> 9.96 ms  (-7%)
#   wy0 (122k src, 16k q, small-C): 55.4 -> 415.7 ms (7.5x PATHOLOGICAL)
# Default: pair ONLY the large-C (pf) path, where the win lives and the
# wy0 pathology can't occur. TSM_GROUP_PAIR=1 forces on everywhere,
# =0 forces off everywhere (A/B probes).
_PAIR_ENV = __import__("os").environ.get("TSM_GROUP_PAIR", "")


def _pair_default(has_pf):
    # r5 outcome: OPT-IN ONLY. The pf-path auto-default was tried and
    # reverted — the pair program's doubled resident output block puts
    # the s_sa1 (C=64, ns=32) compile 132 KB over the 16 MB scoped-VMEM
    # stack inside BOTH train and full-eval graphs (measured 2026-08-21;
    # kc-halving didn't move the peak), while the same kernel compiles
    # fine standalone — the bykey TIGHT_VMEM compile-context class. The
    # standalone vsa win (26.3 -> 12.4 ms) is therefore unreachable
    # in-graph; keep the kernel + env for future Mosaic headroom.
    return _PAIR_ENV == "1"


def morton_code(xyz, origin, cell=1.0, bits=10):
    """(..., 3) f32 -> int32 Morton codes on a `cell`-metre grid. Spatially
    close points get close codes, which is what gives source blocks their
    tight bboxes. Invalid rows should be pushed to +inf by the caller."""
    q = jnp.clip(((xyz - origin) / cell), 0, (1 << bits) - 1).astype(jnp.int32)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (spread(q[..., 0]) | (spread(q[..., 1]) << 1)
            | (spread(q[..., 2]) << 2))


def _kernel(vcnt_ref, vidx_ref, q_ref, pi_ref, *refs, ns, n_sb,
            max_r2, min_r2, qr, use_window, qb, sb, kc, gather_chs,
            need_srow, mxu_gather):
    if len(refs) == 4:
        pf_ref, outf_ref, outi_ref, cnt_ref = refs
        outf_ref[0, 0] = jnp.zeros_like(outf_ref[0, 0])
    else:  # small-C path: features ride the int payload (bitcast, exact)
        pf_ref = outf_ref = None
        outi_ref, cnt_ref = refs
    outi_ref[0, 0] = jnp.zeros_like(outi_ref[0, 0])
    cnt_ref[0, 0] = jnp.zeros_like(cnt_ref[0, 0])

    qv = q_ref[0, :, 6:7] > 0.0                       # (QB, 1) query valid
    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, sb), 1)
    n_visit = vcnt_ref[0, 0, 0, 0]

    def body(t, _):
        # which-source-blocks-to-visit is precomputed in XLA (bbox gap
        # tests); the kernel only streams the listed blocks.
        j = vidx_ref[0, 0, 0, t]  # SMEM scalar read
        st = pl.multiple_of(j * sb, sb)
        # distances in 1/FP-metre fixed point: diffs < 2^24 are exact in
        # f32; one int payload (no separate f32 xyz) halves resident VMEM
        d2 = jnp.zeros((qb, sb), jnp.float32)
        for a in range(3):
            sa = pi_ref[0, a:a + 1, pl.ds(st, sb)].astype(jnp.float32)
            qa = q_ref[0, :, a:a + 1]                  # (QB, 1) fp units
            d = qa - sa
            d2 = d2 + d * d
        hit = d2 < max_r2
        if min_r2 > 0.0:
            hit &= d2 >= min_r2
        if use_window:
            for a in range(3):
                sc = pi_ref[0, 3 + a:4 + a,
                            pl.ds(st, sb)].astype(jnp.float32)
                qc = q_ref[0, :, 3 + a:4 + a]
                hit &= jnp.abs(qc - sc) <= qr[a]
        hit &= qv

        hiti = hit.astype(jnp.int32)
        prior = cnt_ref[0, 0]                          # (QB, 1)
        rowcnt = jnp.sum(hiti, axis=1, keepdims=True)
        cnt_ref[0, 0] = prior + rowcnt
        # Saturation gate: a hit whose slot lands at >= ns is never
        # gathered, and the min slot any hit can take this visit is its
        # query's prior count. Once every hit query is already full
        # (lprior >= ns) the cumsum + every slot chunk are provably
        # no-ops — only the exact `cnt` update above still matters. At
        # Waymo scale (radius 0.8, in-radius counts >> nsample) this
        # skips the 9-step lane-roll cumsum and 8 one-hot chunks for
        # most visited blocks.
        lprior = jnp.min(jnp.where(rowcnt > 0, prior, np.int32(2 ** 30)))

        @pl.when(lprior < ns)
        def _gather_visit():
            # inclusive cumsum along lanes by log-step rolls
            c = hiti
            sh = 1
            while sh < sb:
                c = c + jnp.where(lane >= sh, pltpu.roll(c, sh, axis=1), 0)
                sh *= 2
            slot = prior + c - 1                       # valid where hit
            mslot = jnp.max(jnp.where(hit, slot, -1))

            fwin = (None if pf_ref is None
                    else pf_ref[0, pl.ds(st, sb), :])
            digT = None
            if mxu_gather:
                # ---- exact int gather on the MXU ----
                # All int channels (xyz fp, orig row, srow, bitcast feats)
                # are split into four base-256 digits of their raw bit
                # pattern. Digits (<= 255) are exact in bf16, one-hot rows
                # have a single nonzero product, and f32 accumulation of one
                # term is exact — so ONE (KC*QB, SB) x (SB, 4*nch) matmul
                # replaces 4-6 full-width VPU lane-reduces per slot chunk.
                # Recombination is pure int32 shift-adds (<< 24 wraps into
                # the sign bit, restoring negatives bit-for-bit).
                chans = [pi_ref[0, ch:ch + 1, pl.ds(st, sb)]
                         for _, ch in gather_chs]
                if need_srow:
                    chans.append(st + jax.lax.broadcasted_iota(
                        jnp.int32, (1, sb), 1))
                iw = jnp.concatenate(chans, 0)          # (nch, SB) i32
                digs = []
                for k in range(4):
                    digs.append(jax.lax.shift_right_logical(
                        iw, np.int32(8 * k)) & 255)
                dig = jnp.concatenate(digs, 0).astype(jnp.bfloat16)
                digT = dig.T                            # (SB, 4*nch)
            for kci in range(ns // kc):
                # chunk kci serves slots [kci*kc, kci*kc+kc): it can only
                # match when some hit reaches that range from below
                # (mslot) AND some hit query's prior starts before its
                # end (lprior — min hit slot == min hit-row prior)
                @pl.when((mslot >= kci * kc) & (lprior < (kci + 1) * kc))
                def _(kci=kci):
                    sl_t = jnp.concatenate([slot] * kc, 0)   # (KC*QB, SB)
                    hit_t = jnp.concatenate([hit] * kc, 0)
                    jrow = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (kc * qb, sb), 0
                        ) // qb + kci * kc
                    )
                    oh = (sl_t == jrow) & hit_t
                    rows = pl.ds(kci * kc * qb, kc * qb)
                    ohf = None
                    if fwin is not None or mxu_gather:
                        ohf = oh.astype(jnp.bfloat16)
                    if fwin is not None:
                        # features: one-hot matmul on the MXU (bf16)
                        add = jnp.dot(ohf, fwin,
                                      preferred_element_type=jnp.float32)
                        outf_ref[0, 0, rows, :] += add
                    if mxu_gather:
                        nch = len(gather_chs) + (1 if need_srow else 0)
                        r = jnp.dot(ohf, digT,
                                    preferred_element_type=jnp.float32)
                        ri = r.astype(jnp.int32)            # (KC*QB, 4*nch)
                        val = ri[:, 0:nch]
                        for k in range(1, 4):
                            val = val + (ri[:, k * nch:(k + 1) * nch]
                                         << np.int32(8 * k))
                        ocs = [oc for oc, _ in gather_chs]
                        if need_srow:
                            ocs.append(SROW_OC)
                        no8 = outi_ref.shape[-1]
                        cols = []
                        for oc in range(no8):
                            if oc in ocs:
                                c = ocs.index(oc)
                                cols.append(val[:, c:c + 1])
                            else:
                                cols.append(jnp.zeros((kc * qb, 1), jnp.int32))
                        outi_ref[0, 0, rows, :] += jnp.concatenate(cols, 1)
                    else:
                        # xyz fixed-point, original row, small-C features
                        # (bitcast): exact int32 reduces. Each (q, slot)
                        # receives exactly one source, so the sum is a select
                        # and bitcast payloads survive bit-for-bit.
                        ohi = oh.astype(jnp.int32)
                        for oc, ch in gather_chs:
                            v = pi_ref[0, ch:ch + 1, pl.ds(st, sb)]  # (1, SB)
                            outi_ref[0, 0, rows, oc:oc + 1] += jnp.sum(
                                ohi * v, axis=1, keepdims=True
                            )
                        if need_srow:
                            # sorted row = st + lane index (virtual channel —
                            # not worth a resident payload row); goes to slot
                            # SROW_OC. Only the VJP needs it (backward scatter
                            # target); the eval/primal path skips the reduce.
                            vs = st + jax.lax.broadcasted_iota(
                                jnp.int32, (1, sb), 1)
                            outi_ref[0, 0, rows,
                                     SROW_OC:SROW_OC + 1] += jnp.sum(
                                ohi * vs, axis=1, keepdims=True
                            )
        return 0

    # dynamic trip count: Mosaic rejects scf.for with non-constant bounds
    # but legalizes scf.while
    jax.lax.while_loop(
        lambda t: t < n_visit, lambda t: (body(t, 0), t + 1)[1], 0
    )


def _kernel_pair(vcnt_ref, vidx_ref, q_ref, pi_ref, *refs, ns, n_sb,
                 max_r2, min_r2, qr, use_window, qb, sb, kc, gather_chs,
                 need_srow, mxu_gather):
    """TWO query blocks per program (r5, VERDICT r4 #2/#4): the per-visit
    scalar-unit chain (SMEM visit-index read -> dynamic source slice,
    `lprior`/`mslot` SREG syncs) of two ADJACENT query blocks runs in one
    instruction stream so the latencies overlap — the same mechanism that
    won the 2-row FPS kernel 1.73x. Adjacent Morton query blocks have
    correlated visit lists, so the merged while loop's trip count is
    ~max(na, nb) ~ avg, not the sum. Both rows' distance/count phases are
    one branch-free basic block (a finished row visits its clamped last
    block with `hit` forced false — an exact no-op since every update is
    an accumulate); only the saturation-gated gather regions stay
    per-row conditional. Per-row op order matches _kernel, so outputs are
    bitwise-identical to the single-row kernel (tested)."""
    if len(refs) == 4:
        pf_ref, outf_ref, outi_ref, cnt_ref = refs
        outf_ref[0, 0] = jnp.zeros_like(outf_ref[0, 0])
        outf_ref[0, 1] = jnp.zeros_like(outf_ref[0, 1])
    else:
        pf_ref = outf_ref = None
        outi_ref, cnt_ref = refs
    outi_ref[0, 0] = jnp.zeros_like(outi_ref[0, 0])
    outi_ref[0, 1] = jnp.zeros_like(outi_ref[0, 1])
    cnt_ref[0, 0] = jnp.zeros_like(cnt_ref[0, 0])
    cnt_ref[0, 1] = jnp.zeros_like(cnt_ref[0, 1])

    lane = jax.lax.broadcasted_iota(jnp.int32, (qb, sb), 1)
    qv = [q_ref[0, pl.ds(r * qb, qb), 6:7] > 0.0 for r in (0, 1)]
    nv = [vcnt_ref[0, 0, 0, 0], vcnt_ref[0, 1, 0, 0]]

    def compute(r, t):
        """Distance + count phase for row r's visit t (no-op when t is
        past the row's list). Returns what the gather phase needs."""
        live = t < nv[r]
        tc = jnp.maximum(jnp.minimum(t, nv[r] - 1), 0)
        j = vidx_ref[0, r, 0, tc]
        st = pl.multiple_of(j * sb, sb)
        d2 = jnp.zeros((qb, sb), jnp.float32)
        for a in range(3):
            sa = pi_ref[0, a:a + 1, pl.ds(st, sb)].astype(jnp.float32)
            qa = q_ref[0, pl.ds(r * qb, qb), a:a + 1]
            d = qa - sa
            d2 = d2 + d * d
        hit = d2 < max_r2
        if min_r2 > 0.0:
            hit &= d2 >= min_r2
        if use_window:
            for a in range(3):
                sc = pi_ref[0, 3 + a:4 + a,
                            pl.ds(st, sb)].astype(jnp.float32)
                qc = q_ref[0, pl.ds(r * qb, qb), 3 + a:4 + a]
                hit &= jnp.abs(qc - sc) <= qr[a]
        hit &= qv[r] & live

        hiti = hit.astype(jnp.int32)
        prior = cnt_ref[0, r]
        rowcnt = jnp.sum(hiti, axis=1, keepdims=True)
        cnt_ref[0, r] = prior + rowcnt
        lprior = jnp.min(jnp.where(rowcnt > 0, prior, np.int32(2 ** 30)))
        return hit, hiti, prior, lprior, st

    def gather(r, hit, hiti, prior, lprior, st):
        @pl.when(lprior < ns)
        def _gather_visit():
            c = hiti
            sh = 1
            while sh < sb:
                c = c + jnp.where(lane >= sh, pltpu.roll(c, sh, axis=1), 0)
                sh *= 2
            slot = prior + c - 1
            mslot = jnp.max(jnp.where(hit, slot, -1))

            fwin = (None if pf_ref is None
                    else pf_ref[0, pl.ds(st, sb), :])
            digT = None
            if mxu_gather:
                chans = [pi_ref[0, ch:ch + 1, pl.ds(st, sb)]
                         for _, ch in gather_chs]
                if need_srow:
                    chans.append(st + jax.lax.broadcasted_iota(
                        jnp.int32, (1, sb), 1))
                iw = jnp.concatenate(chans, 0)
                digs = []
                for k in range(4):
                    digs.append(jax.lax.shift_right_logical(
                        iw, np.int32(8 * k)) & 255)
                dig = jnp.concatenate(digs, 0).astype(jnp.bfloat16)
                digT = dig.T
            for kci in range(ns // kc):
                @pl.when((mslot >= kci * kc) & (lprior < (kci + 1) * kc))
                def _(kci=kci):
                    sl_t = jnp.concatenate([slot] * kc, 0)
                    hit_t = jnp.concatenate([hit] * kc, 0)
                    jrow = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (kc * qb, sb), 0
                        ) // qb + kci * kc
                    )
                    oh = (sl_t == jrow) & hit_t
                    rows = pl.ds(kci * kc * qb, kc * qb)
                    ohf = None
                    if fwin is not None or mxu_gather:
                        ohf = oh.astype(jnp.bfloat16)
                    if fwin is not None:
                        add = jnp.dot(ohf, fwin,
                                      preferred_element_type=jnp.float32)
                        outf_ref[0, r, rows, :] += add
                    if mxu_gather:
                        nch = len(gather_chs) + (1 if need_srow else 0)
                        rr = jnp.dot(ohf, digT,
                                     preferred_element_type=jnp.float32)
                        ri = rr.astype(jnp.int32)
                        val = ri[:, 0:nch]
                        for k in range(1, 4):
                            val = val + (ri[:, k * nch:(k + 1) * nch]
                                         << np.int32(8 * k))
                        ocs = [oc for oc, _ in gather_chs]
                        if need_srow:
                            ocs.append(SROW_OC)
                        no8 = outi_ref.shape[-1]
                        cols = []
                        for oc in range(no8):
                            if oc in ocs:
                                cx = ocs.index(oc)
                                cols.append(val[:, cx:cx + 1])
                            else:
                                cols.append(
                                    jnp.zeros((kc * qb, 1), jnp.int32))
                        outi_ref[0, r, rows, :] += jnp.concatenate(cols, 1)
                    else:
                        ohi = oh.astype(jnp.int32)
                        for oc, ch in gather_chs:
                            v = pi_ref[0, ch:ch + 1, pl.ds(st, sb)]
                            outi_ref[0, r, rows, oc:oc + 1] += jnp.sum(
                                ohi * v, axis=1, keepdims=True
                            )
                        if need_srow:
                            vs = st + jax.lax.broadcasted_iota(
                                jnp.int32, (1, sb), 1)
                            outi_ref[0, r, rows,
                                     SROW_OC:SROW_OC + 1] += jnp.sum(
                                ohi * vs, axis=1, keepdims=True
                            )

    def body(st_):
        ta, tb = st_
        sa = compute(0, ta)
        sb_ = compute(1, tb)
        gather(0, *sa)
        gather(1, *sb_)
        return ta + 1, tb + 1

    jax.lax.while_loop(
        lambda st_: (st_[0] < nv[0]) | (st_[1] < nv[1]), body, (0, 0)
    )


@functools.partial(
    jax.jit,
    static_argnames=("ns", "max_r2", "min_r2", "qr", "use_window",
                     "has_coords", "sb", "interpret", "need_idx",
                     "need_srow", "blocked", "raw4d"),
)
def _fused_group(bb, q, pi, pf, ns, max_r2, min_r2, qr, use_window,
                 has_coords, sb, interpret=False, need_idx=True,
                 need_srow=True, blocked=False, raw4d=False):
    """bb (B, n_sb8, 16) f32 block bboxes (xyz rows in 1/FP units);
    q (B, Qp, 8) f32 [xyz_fp, coords, valid, pad]; pi (B, NI, Np) i32
    [xyz_fp(3), coords(3), orig_row, sorted_row, bitcast feats...]
    transposed; pf (B, Np, C) f32 (None when features ride pi).
    max_r2/min_r2 are metric^2 (scaled to fp units internally).
    Returns outf (B, Qp, ns, C) or None, outi (B, Qp, ns, NO8), cnt."""
    B, Qp, _ = q.shape
    Np = pi.shape[2]
    n_int = pi.shape[1]
    # payload rows: [xfp(3)] [+ coords(3) if has_coords] [orow] [feats...]
    orow_ch = 6 if has_coords else 3
    feat_chs = tuple(range(orow_ch + 1, n_int))
    gather_chs = ((0, 0), (1, 1), (2, 2))
    if need_idx:  # original-row channel only when the caller uses idx
        gather_chs += ((3, orow_ch),)
    gather_chs += tuple((5 + i, ch) for i, ch in enumerate(feat_chs))
    no8 = -(-(5 + len(feat_chs)) // 8) * 8
    max_r2 = max_r2 * float(FP) * float(FP)
    min_r2 = min_r2 * float(FP) * float(FP)
    n_sb = Np // sb
    nq = Qp // QB
    # largest chunk <= KC that divides ns, so any config-chosen nsample
    # (6, 10, ...) works instead of trapping on ns % KC at trace time
    kc = math.gcd(ns, KC) if ns % min(KC, ns) else min(KC, ns)

    # ---- per-query-block visit lists (XLA; the kernel only streams the
    # listed source blocks — zero in-kernel skip overhead) ----
    qb_xyz = q[:, :, :3].reshape(B, nq, QB, 3)
    qvalid = q[:, :, 6].reshape(B, nq, QB, 1) > 0
    qmin = jnp.min(jnp.where(qvalid, qb_xyz, 1e30), axis=2)   # (B, nq, 3)
    qmax = jnp.max(jnp.where(qvalid, qb_xyz, -1e30), axis=2)
    smin = bb[:, :n_sb, None, 0:3]                            # (B,n_sb,1,3)
    smax = bb[:, :n_sb, None, 3:6]
    gap = jnp.maximum(
        jnp.maximum(smin - qmax[:, None], qmin[:, None] - smax), 0.0
    )                                                         # (B,n_sb,nq,3)
    near = jnp.sum(gap * gap, -1) < max_r2
    if use_window:
        cmin = bb[:, :n_sb, None, 6:9]
        cmax = bb[:, :n_sb, None, 9:12]
        qc = q[:, :, 3:6].reshape(B, nq, QB, 3)
        qcmin = jnp.min(jnp.where(qvalid, qc, 1e30), axis=2)
        qcmax = jnp.max(jnp.where(qvalid, qc, -1e30), axis=2)
        qrj = jnp.asarray(qr, jnp.float32)
        near &= jnp.all(
            (cmin - qcmax[:, None] <= qrj) & (qcmin[:, None] - cmax <= qrj),
            -1,
        )
    near = near.transpose(0, 2, 1)                            # (B, nq, n_sb)
    vcnt = jnp.sum(near, -1).astype(jnp.int32)[..., None, None]
    vidx = jnp.argsort(~near, axis=-1).astype(jnp.int32)[:, :, None, :]

    # paired-query-block mode (r5): two adjacent query blocks share one
    # program so their per-visit scalar chains overlap (_kernel_pair).
    # Pad nq to even with an all-invalid block (its visit list is empty).
    pair = _pair_default(pf is not None)
    if pair and ns % 2 == 0:
        # halve the slot-chunk transient ((kc*qb, sb) one-hot + f32
        # accumulator) — the pair kernel's doubled outputs already raise
        # the program's footprint, and the train-graph sa1 compile sat
        # 132 KB over the 16 MB scoped-VMEM stack at kc=4. Chunking only
        # partitions slots; values are bitwise-unchanged.
        kc = math.gcd(ns, max(2, kc // 2))
    nq_pad = (nq % 2) if pair else 0
    if nq_pad:
        q = jnp.pad(q, ((0, 0), (0, QB * nq_pad), (0, 0)))
        vcnt = jnp.pad(vcnt, ((0, 0), (0, nq_pad), (0, 0), (0, 0)))
        vidx = jnp.pad(vidx, ((0, 0), (0, nq_pad), (0, 0), (0, 0)))
    nqp = nq + nq_pad
    gb = 2 if pair else 1
    grid = (B, nqp // gb)

    # SMEM visit lists are blocked per (b, i) — a singleton dim satisfies
    # the last-two-dims block rule while keeping per-block SMEM tiny
    # (a full (B, nq, n_sb) SMEM array overflows the 1 MB space at Waymo
    # scale).
    in_specs = [
        pl.BlockSpec((1, gb, 1, 1), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, gb, 1, n_sb), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, gb * QB, 8), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_int, Np), lambda b, i: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, gb, ns * QB, no8), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, gb, QB, 1), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, nqp, ns * QB, no8), jnp.int32),
        jax.ShapeDtypeStruct((B, nqp, QB, 1), jnp.int32),
    ]
    args = [vcnt, vidx, q, pi]
    if pf is not None:
        C = pf.shape[2]
        in_specs.append(
            pl.BlockSpec((1, Np, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_specs.insert(
            0, pl.BlockSpec((1, gb, ns * QB, C), lambda b, i: (b, i, 0, 0),
                            memory_space=pltpu.VMEM)
        )
        out_shape.insert(
            0, jax.ShapeDtypeStruct((B, nqp, ns * QB, C), jnp.float32)
        )
        args.append(pf.astype(jnp.bfloat16))

    res = pl.pallas_call(
        functools.partial(
            _kernel_pair if pair else _kernel, ns=ns, n_sb=n_sb,
            max_r2=max_r2, min_r2=min_r2,
            qr=qr, use_window=use_window, qb=QB, sb=sb, kc=kc,
            gather_chs=gather_chs, need_srow=need_srow,
            mxu_gather=MXU_GATHER,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if nq_pad:
        res = [a[:, :nq] for a in res]

    # rows are j-major within a block: (nq, ns, QB, .) -> (B, Q, ns, .).
    # blocked=True keeps the kernel's native (B, nq, ns, QB, .) layout —
    # the transpose is a full-array HBM copy (~2 ms per sa0-scale output)
    # that pooling consumers never needed: elementwise ops and the
    # max-over-ns reduce are layout-agnostic, so they run blocked and
    # only the pooled (B, Q, C) result is unsorted back (see
    # fused_query_group_blocked).
    def unblock(x, raw=False):
        if raw:
            # raw4d: hand back the kernel's (B, nq, ns*QB, ch) output
            # untouched. The 5-D reshape below is bitwise-free but lets
            # XLA's layout assignment relayout the WHOLE payload to
            # QB-minor for the blocked consumers (measured 4.4 ms/fwd at
            # KITTI b16, copy.1072); slicing channels on the 4-D array
            # first (lane slices + pure minor-dim row splits) removes
            # that possibility — see _run_core.
            return x
        x = x.reshape(B, nq, ns, QB, x.shape[-1])
        if blocked:
            return x
        x = x.transpose(0, 1, 3, 2, 4)
        return x.reshape(B, Qp, ns, x.shape[-1])

    def shape_cnt(c):
        return c.reshape(B, nq, QB) if blocked else c.reshape(B, Qp)

    raw = blocked and raw4d
    if pf is not None:
        outf, outi, cnt = res
        return unblock(outf), unblock(outi, raw), shape_cnt(cnt)
    outi, cnt = res
    return None, unblock(outi, raw), shape_cnt(cnt)


def prepare_sources(src_xyz, src_feat, src_valid, src_coords=None,
                    cell=1.0):
    """Morton-sort sources and build the kernel's static-layout inputs.
    Share the result across scales via fused_query_group(prepared=...).

    src_xyz (B, N, 3); src_feat (B, N, C) or None; src_valid (B, N);
    src_coords (B, N, 3) int voxel coords (voxel-query window) or None.
    """
    B, N, _ = src_xyz.shape
    xyz = jnp.where(src_valid[..., None], src_xyz, 1e30)
    origin = jnp.min(xyz, axis=1, keepdims=True)
    code = morton_code(xyz, origin, cell=cell)
    code = jnp.where(src_valid, code, np.int32(2**31 - 1))

    # Morton sort: ONE variadic lax.sort carries xyz (+coords +small-C
    # feats) + the original row index through the sort network when the
    # channel count is small — the previous argsort + per-array
    # take_along_axis lowered to serialized row gathers (part of the
    # module_list_0 copy tail, SURVEY §8d). Stable sort == stable argsort
    # order, so outputs are bitwise-identical. Large-C features keep the
    # gather (carrying 64+ operands through a sort network loses).
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    nf_small = (0 if src_feat is None
                else (src_feat.shape[-1] if src_feat.shape[-1] <= 8 else 0))
    ops = [code, xyz[..., 0], xyz[..., 1], xyz[..., 2], iota]
    if src_coords is not None:
        ops += [src_coords[..., a].astype(jnp.int32) for a in range(3)]
    if nf_small:
        ops += [src_feat[..., a].astype(jnp.float32)
                for a in range(nf_small)]
    sorted_ops = jax.lax.sort(tuple(ops), dimension=1, num_keys=1)
    sxyz = jnp.stack(sorted_ops[1:4], -1)                 # invalid -> 1e30
    order = sorted_ops[4]
    pos = 5
    s_coords_sorted = None
    if src_coords is not None:
        s_coords_sorted = jnp.stack(sorted_ops[pos:pos + 3], -1)
        pos += 3
    s_feat_sorted = (jnp.stack(sorted_ops[pos:pos + nf_small], -1)
                     if nf_small else None)

    def take(x, o):
        return jnp.take_along_axis(x, o.reshape(B, N, *([1] * (x.ndim - 2))),
                                   axis=1)
    n_feat0 = 0 if src_feat is None else src_feat.shape[-1]
    sb_env = int(__import__("os").environ.get("TSM_GROUP_SB", "0"))
    # r4 model-level A/B: 384-wide source blocks win at <=16k sources
    # (KITTI b16: 157.1 -> 159.0 scans/s; the finer Morton blocks tighten
    # the per-visit bboxes) while the dense 122,880-point Waymo layer-0
    # prefers 512 (17.91 vs 17.66 with 384 everywhere) — split on N.
    sb_auto = SB if src_xyz.shape[1] >= 65536 else 384
    sb = (sb_env or sb_auto) if n_feat0 <= 3 else min(sb_env or SB_LARGE_C, 256)
    pad_n = (-N) % sb
    if pad_n:
        sxyz = jnp.pad(sxyz, ((0, 0), (0, pad_n), (0, 0)),
                       constant_values=1e30)
    Np = N + pad_n

    # ONE int payload: xyz fixed-point (clipped so sentinels don't
    # overflow; they are never selected), voxel coords, original row,
    # sorted row[, bitcast small-C features]. A separate f32 xyz array
    # would double the resident VMEM at Waymo scale.
    xyz_fp = jnp.round(jnp.clip(sxyz, -2e6, 2e6) * FP).astype(jnp.int32)
    if src_coords is not None:
        scoords = s_coords_sorted
        if pad_n:
            scoords = jnp.pad(scoords, ((0, 0), (0, pad_n), (0, 0)),
                              constant_values=2**20)
    else:
        scoords = None
    orow = jnp.pad(order.astype(jnp.int32)[..., None],
                   ((0, 0), (0, pad_n), (0, 0)))
    int_cols = [xyz_fp] + ([scoords] if scoords is not None else []) + [orow]

    n_feat = 0 if src_feat is None else src_feat.shape[-1]
    pf = None
    if n_feat:
        sfeat = (s_feat_sorted if s_feat_sorted is not None
                 else take(src_feat.astype(jnp.float32), order))
        if pad_n:
            sfeat = jnp.pad(sfeat, ((0, 0), (0, pad_n), (0, 0)))
        if n_feat <= 3:
            # small-C: features ride the int payload bitcast (exact f32,
            # no bf16 rounding, no (Np, 128)-padded VMEM block). The
            # bitcast is on stop_gradient values — the differentiable
            # `feats` copy below carries the grad path.
            int_cols.append(jax.lax.bitcast_convert_type(
                jax.lax.stop_gradient(sfeat), jnp.int32))
        pf = sfeat
    pi = jnp.concatenate(int_cols, -1).transpose(0, 2, 1)  # (B, NI, Np)

    # per-block bboxes, block-major (B, n_sb, 16): cols [xyzmin(3),
    # xyzmax(3), cmin(3), cmax(3), pad] — xyz rows in 1/FP units to match
    # the query payload. Invalid rows are huge-positive so all-pad blocks
    # never test near any query.
    n_sb = Np // sb
    sx = xyz_fp.astype(jnp.float32).reshape(B, n_sb, sb, 3)
    cols = [sx.min(2), sx.max(2)]
    if scoords is not None:
        sc = scoords.astype(jnp.float32).reshape(B, n_sb, sb, 3)
        cols += [sc.min(2), sc.max(2)]
    else:
        cols += [jnp.zeros((B, n_sb, 3), jnp.float32)] * 2
    bb = jnp.concatenate(
        cols + [jnp.zeros((B, n_sb, 4), jnp.float32)], -1
    )                                                     # (B, n_sb, 16)
    pad_b = (-n_sb) % 8
    if pad_b:
        bb = jnp.pad(bb, ((0, 0), (0, pad_b), (0, 0)), constant_values=1e30)
    return dict(bb=bb, pi=pi, pf=pf, n_feat=n_feat,
                has_coords=src_coords is not None, sb=sb)


def _prepare_queries(q_xyz, q_valid, q_coords=None):
    B, Q, _ = q_xyz.shape
    v = (jnp.ones((B, Q), bool) if q_valid is None else q_valid)
    # fixed-point query positions (must match the source payload units)
    cols = [jnp.round(jnp.clip(q_xyz, -2e6, 2e6) * FP)]
    cols.append(jnp.zeros((B, Q, 3), jnp.float32) if q_coords is None
                else q_coords.astype(jnp.float32))
    cols.append(v[..., None].astype(jnp.float32))
    cols.append(jnp.zeros((B, Q, 1), jnp.float32))
    q = jnp.concatenate(cols, -1)                         # (B, Q, 8)
    pad_q = (-Q) % QB
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    return q, pad_q


def fused_query_group(prepared, q_xyz, ns, max_radius, min_radius=0.0,
                      q_valid=None, q_coords=None, query_range=None,
                      sort_queries=True, interpret=False, need_idx=True):
    """Query `prepared` sources (see prepare_sources) from q_xyz (B, Q, 3).

    Returns:
      grouped (B, Q, ns, 3 + C) f32 — absolute source xyz (1/1024 m fixed
        point) + features (bf16-rounded) of the first-in-scan-order `ns`
        in-range sources; slots >= cnt are zero and MUST be masked by
        callers before use (grad contract).
      idx (B, Q, ns) int32 — original source rows of the filled slots
        (all-zero when need_idx=False: callers that never read idx save
        one exact-int lane-reduce per slot chunk in the kernel).
      cnt (B, Q) int32 — exact in-range counts (uncapped).
    In-range = min_radius <= dist < max_radius, and when query_range /
    q_coords are given, |q_coord - src_coord| <= query_range per axis.
    """
    qr = (0, 0, 0) if query_range is None else tuple(int(x) for x in
                                                     query_range)
    B, Q, _ = q_xyz.shape
    qord = None
    if sort_queries:
        # Morton-sort queries so each QB-block covers a compact region —
        # this is what makes the XLA visit lists short. Outputs are
        # unsorted back at the end.
        v = jnp.ones((B, Q), bool) if q_valid is None else q_valid
        xyzm = jnp.where(v[..., None], q_xyz, 1e30)
        origin = jnp.min(xyzm, axis=1, keepdims=True)
        qcode = jnp.where(v, morton_code(xyzm, origin),
                          np.int32(2**31 - 1))
        # one variadic sort carries xyz/coords/valid/row — argsort +
        # per-array take_along_axis lowers to serialized row gathers
        # (same fix as prepare_sources / sort_queries_shared, r5)
        iota = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None],
                                (B, Q))
        ops = [qcode, q_xyz[..., 0], q_xyz[..., 1], q_xyz[..., 2],
               v.astype(jnp.int32), iota]
        nc = 0 if q_coords is None else q_coords.shape[-1]
        if nc:
            ops += [q_coords[..., a] for a in range(nc)]
        out = jax.lax.sort(tuple(ops), dimension=1, num_keys=1)
        q_xyz = jnp.stack(out[1:4], -1)
        q_valid = out[4].astype(bool)
        qord = out[5]
        q_coords = jnp.stack(out[6:6 + nc], -1) if nc else None
    q, pad_q = _prepare_queries(q_xyz, q_valid, q_coords)
    grouped, idx, cnt = _fused_core(
        prepared["bb"], q, prepared["pi"], prepared["pf"],
        int(ns), float(max_radius) ** 2, float(min_radius) ** 2, qr,
        query_range is not None, prepared["has_coords"], interpret,
        prepared["n_feat"], prepared["sb"], need_idx,
    )
    if pad_q:
        grouped, idx, cnt = grouped[:, :Q], idx[:, :Q], cnt[:, :Q]
    if qord is not None:
        inv = jnp.argsort(qord, axis=1)
        grouped = jnp.take_along_axis(grouped, inv[..., None, None], axis=1)
        idx = jnp.take_along_axis(idx, inv[..., None], axis=1)
        cnt = jnp.take_along_axis(cnt, inv, axis=1)
    return grouped, idx, cnt

def sort_queries_shared(q_xyz, q_valid=None, q_coords=None):
    """Morton-sort a query set ONCE for sharing across scales (the
    blocked API). One variadic lax.sort carries xyz/coords/valid/row
    through the sort network (argsort + per-array take_along_axis lowers
    to serialized row gathers on TPU). Returns the dict consumed by
    fused_query_group_blocked."""
    B, Q, _ = q_xyz.shape
    v = jnp.ones((B, Q), bool) if q_valid is None else q_valid
    xyzm = jnp.where(v[..., None], q_xyz, 1e30)
    origin = jnp.min(xyzm, axis=1, keepdims=True)
    qcode = jnp.where(v, morton_code(xyzm, origin), np.int32(2**31 - 1))
    iota = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[None], (B, Q))
    ops = [qcode, q_xyz[..., 0], q_xyz[..., 1], q_xyz[..., 2],
           v.astype(jnp.int32), iota]
    nc = 0
    if q_coords is not None:
        nc = q_coords.shape[-1]
        ops += [q_coords[..., a] for a in range(nc)]
    out = jax.lax.sort(tuple(ops), dimension=1, num_keys=1)
    s_xyz = jnp.stack(out[1:4], -1)
    s_valid = out[4].astype(bool)
    qord = out[5]
    s_coords = jnp.stack(out[6:6 + nc], -1) if nc else None
    # inverse permutation via a second (cheap, 2-operand) carried sort
    _, inv = jax.lax.sort((qord, iota), dimension=1, num_keys=1)
    q, pad_q = _prepare_queries(s_xyz, s_valid, s_coords)
    nq = q.shape[1] // QB
    xyz_p = (s_xyz if pad_q == 0
             else jnp.pad(s_xyz, ((0, 0), (0, pad_q), (0, 0))))
    valid_p = (s_valid if pad_q == 0
               else jnp.pad(s_valid, ((0, 0), (0, pad_q))))
    return dict(q=q, Q=Q, pad_q=pad_q, inv=inv,
                xyz_b=xyz_p.reshape(B, nq, QB, 3),
                valid_b=valid_p.reshape(B, nq, QB),
                coords=s_coords)


def fused_query_group_blocked(prepared, qs, ns, max_radius,
                              min_radius=0.0, query_range=None,
                              need_idx=False, interpret=False):
    """Blocked-layout variant of fused_query_group for POOLING consumers.

    qs = sort_queries_shared(...); sharing it across scales runs the
    query Morton sort once instead of per scale. Outputs stay in the
    kernel's native blocked layout — no (ns, QB) transpose copies, no
    per-scale unsort gathers; consumers run their (layout-agnostic)
    elementwise ops + max-over-ns pool blocked, then unsort only the
    pooled (B, Q, C) result:

        h = pool(...)                        # (B, nq, QB, C)
        h = h.reshape(B, -1, C)[:, :qs["Q"]]
        h = jnp.take_along_axis(h, qs["inv"][..., None], axis=1)

    Returns grouped (B, nq, ns, QB, 3 + C), idx (B, nq, ns, QB) (zeros
    unless need_idx), cnt (B, nq, QB) — all in sorted-query order;
    qs["xyz_b"] (B, nq, QB, 3) and qs["valid_b"] (B, nq*QB) match it.
    """
    qr = (0, 0, 0) if query_range is None else tuple(int(x) for x in
                                                     query_range)
    return _fused_core(
        prepared["bb"], qs["q"], prepared["pi"], prepared["pf"],
        int(ns), float(max_radius) ** 2, float(min_radius) ** 2, qr,
        query_range is not None, prepared["has_coords"], interpret,
        prepared["n_feat"], prepared["sb"], need_idx, True,
    )



# Slice the int payload's channels on the KERNEL's 4-D output, then split
# the row dim per channel (pure minor-dim splits, relayout-proof) instead
# of reshaping the full payload to 5-D first (XLA relayouts that to
# QB-minor: 4.4 ms/fwd at KITTI b16). A/B via env; numerics identical.
# r5 on-chip outcome: NEGATIVE, keep OFF. KITTI model bench 146.4 vs
# 166.8 scans/s (-12%: five strided lane-slice extractions cost more
# than the one 64 MB relayout copy) and the Waymo graph OOMs HBM
# (16.17 G vs 15.75: the per-channel splits materialize). The copy's
# real fix is a transposed-store kernel (channels on sublanes, QB on
# lanes, i.e. the layout XLA wants) — round-6 lever, not an XLA-side
# reshuffle.
def _split4d():
    return bool(__import__("os").environ.get("TSM_GROUP_SPLIT4D", ""))


def _run_core(bb, q, pi, feats, ns, max_r2, min_r2, qr, use_window,
              has_coords, interpret, nf, sb, need_idx=True,
              need_srow=True, blocked=False):
    pf = feats if nf > 3 else None
    raw4d = blocked and _split4d()
    outf, outi, cnt = _fused_group(bb, q, pi, pf, ns, max_r2, min_r2,
                                   qr, use_window, has_coords, sb,
                                   interpret=interpret, need_idx=need_idx,
                                   need_srow=need_srow, blocked=blocked,
                                   raw4d=raw4d)
    if raw4d:
        B_, nq_, RQ, _ = outi.shape

        def ch(c):
            return outi[..., c].reshape(B_, nq_, RQ // QB, QB)

        g_xyz = jnp.stack([ch(0), ch(1), ch(2)],
                          -1).astype(jnp.float32) / FP
        idx = ch(3)
        srow = ch(4)
        if nf == 0:
            grouped = g_xyz
        elif outf is not None:
            grouped = jnp.concatenate([g_xyz, outf], -1)
        else:
            fb = jax.lax.bitcast_convert_type(
                jnp.stack([ch(5 + i) for i in range(nf)], -1), jnp.float32)
            grouped = jnp.concatenate([g_xyz, fb], -1)
        return grouped, idx, cnt, srow
    g_xyz = outi[..., :3].astype(jnp.float32) / FP
    idx = outi[..., 3]
    if nf == 0:
        grouped = g_xyz
    elif outf is not None:
        grouped = jnp.concatenate([g_xyz, outf], -1)
    else:
        fb = jax.lax.bitcast_convert_type(outi[..., 5:5 + nf], jnp.float32)
        grouped = jnp.concatenate([g_xyz, fb], -1)
    return grouped, idx, cnt, outi[..., 4]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14))
def _fused_core(bb, q, pi, feats, ns, max_r2, min_r2, qr, use_window,
                has_coords, interpret, nf, sb, need_idx=True,
                blocked=False):
    # primal (eval / no-grad) path: the sorted-row channel exists only
    # for the VJP's backward scatter — skip its per-chunk reduce.
    g, idx, cnt, _ = _run_core(bb, q, pi, feats, ns, max_r2, min_r2,
                               qr, use_window, has_coords, interpret, nf,
                               sb, need_idx=need_idx, need_srow=False,
                               blocked=blocked)
    return g, idx, cnt


def _fused_core_fwd(bb, q, pi, feats, ns, max_r2, min_r2, qr,
                    use_window, has_coords, interpret, nf, sb,
                    need_idx=True, blocked=False):
    g, idx, cnt, srow = _run_core(bb, q, pi, feats, ns, max_r2, min_r2,
                                  qr, use_window, has_coords, interpret,
                                  nf, sb, need_idx=need_idx,
                                  need_srow=True, blocked=blocked)
    return (g, idx, cnt), (srow, None if feats is None else feats.shape)


def _fused_core_bwd(ns, max_r2, min_r2, qr, use_window, has_coords,
                    interpret, nf, sb, need_idx, blocked, res, ct):
    """Scatter the feature cotangent back to the SORTED payload rows (the
    autodiff through prepare_sources' take_along_axis maps them to the
    original rows). xyz/selection are treated as non-differentiable.
    Unfilled slots alias row 0 — callers mask them so their ct is zero."""
    srow, feats_shape = res
    dg, _, _ = ct
    if feats_shape is None:
        return None, None, None, None
    B = dg.shape[0]
    rows = int(np.prod(dg.shape[1:-1]))  # (Q, ns) or (nq, ns, QB)
    flat_idx = srow.reshape(B, rows)
    dfeat = dg[..., 3:].reshape(B, rows, feats_shape[-1])

    def scat(d, i):
        z = jnp.zeros(feats_shape[1:], d.dtype)
        return z.at[i].add(d)

    dfeats = jax.vmap(scat)(dfeat, flat_idx)
    return None, None, None, dfeats


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def enabled():
    """Fused query+group on TPU. Kill switch: TSM_NO_PALLAS_GROUP=1."""
    import os

    if os.environ.get("TSM_NO_PALLAS_GROUP", ""):
        return False
    return jax.devices()[0].platform == "tpu"
