"""Fused query+group Pallas kernel (ops/group_pallas.py) — interpret-mode
correctness against order-free oracles.

The kernel returns the first `ns` in-range sources in Morton scan order
(a member of the same equivalence class as the CUDA reference's
order-dependent first-k, ball_query_gpu.cu:75); the oracle therefore checks
set equality + exact counts rather than a specific order.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tsm_det_pointcloud_tpu.ops import group_pallas as gp


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    B, N, Q, C = 2, 600, 200, 5
    sxyz = rng.uniform([0, -20, -2], [40, 20, 1], (B, N, 3)).astype(np.float32)
    sfeat = rng.standard_normal((B, N, C)).astype(np.float32)
    svalid = np.ones((B, N), bool)
    svalid[:, N - 17:] = False
    qxyz = rng.uniform([0, -20, -2], [40, 20, 1], (B, Q, 3)).astype(np.float32)
    qvalid = np.ones((B, Q), bool)
    qvalid[:, Q - 5:] = False
    return B, N, Q, C, sxyz, sfeat, svalid, qxyz, qvalid


def _check(data, grouped, idx, cnt, ns, min_r, max_r, qcoords=None,
           scoords=None, qr=None, feat_exact=False):
    B, N, Q, C, sxyz, sfeat, svalid, qxyz, qvalid = data
    for b in range(B):
        for qi in range(Q):
            if not qvalid[b, qi]:
                continue
            # kernel distances are on 1/1024-m fixed-point coords
            sfp = np.round(sxyz[b] * 1024.0)
            qfp = np.round(qxyz[b, qi] * 1024.0)
            d2 = ((sfp - qfp) ** 2).sum(-1)
            m = ((d2 < (max_r * 1024.0) ** 2)
                 & (d2 >= (min_r * 1024.0) ** 2) & svalid[b])
            if qr is not None:
                m &= (np.abs(qcoords[b, qi] - scoords[b])
                      <= np.asarray(qr)).all(-1)
            true_rows = set(np.where(m)[0])
            k = min(cnt[b, qi], ns)
            got = idx[b, qi, :k]
            assert cnt[b, qi] == len(true_rows)
            assert len(set(got.tolist())) == k
            assert set(got.tolist()) <= true_rows
            if cnt[b, qi] <= ns:
                assert set(got.tolist()) == true_rows
            # xyz is 1/1024-m fixed point; features bf16 (large-C) or
            # bit-exact (small-C)
            assert np.allclose(grouped[b, qi, :k, :3], sxyz[b][got],
                               atol=6e-4)
            if feat_exact:
                assert (grouped[b, qi, :k, 3:]
                        == sfeat[b][got][..., : grouped.shape[-1] - 3]).all()
            else:
                assert np.allclose(grouped[b, qi, :k, 3:], sfeat[b][got],
                                   rtol=8e-3, atol=1e-2)
            assert (grouped[b, qi, k:] == 0).all()


def test_ball_and_annulus(data):
    B, N, Q, C, sxyz, sfeat, svalid, qxyz, qvalid = data
    prep = gp.prepare_sources(jnp.asarray(sxyz), jnp.asarray(sfeat),
                              jnp.asarray(svalid))
    for min_r, max_r in [(0.0, 2.4), (1.2, 2.4)]:
        g, i, c = gp.fused_query_group(
            prep, jnp.asarray(qxyz), 16, max_r, min_r,
            q_valid=jnp.asarray(qvalid), interpret=True)
        _check(data, np.asarray(g), np.asarray(i), np.asarray(c), 16,
               min_r, max_r)


def test_voxel_window(data):
    B, N, Q, C, sxyz, sfeat, svalid, qxyz, qvalid = data
    scoords = np.floor(sxyz / 0.8).astype(np.int32)
    qcoords = np.floor(qxyz / 0.8).astype(np.int32)
    prep = gp.prepare_sources(jnp.asarray(sxyz), jnp.asarray(sfeat),
                              jnp.asarray(svalid),
                              src_coords=jnp.asarray(scoords))
    g, i, c = gp.fused_query_group(
        prep, jnp.asarray(qxyz), 16, 2.4, 0.0,
        q_valid=jnp.asarray(qvalid), q_coords=jnp.asarray(qcoords),
        query_range=(2, 2, 2), interpret=True)
    _check(data, np.asarray(g), np.asarray(i), np.asarray(c), 16, 0.0, 2.4,
           qcoords=qcoords, scoords=scoords, qr=(2, 2, 2))


def test_small_c_bitexact_and_grad(data):
    B, N, Q, _, sxyz, _, svalid, qxyz, qvalid = data
    rng = np.random.default_rng(1)
    sfeat1 = rng.standard_normal((B, N, 1)).astype(np.float32)
    R, NS = 1.1, 16
    d = (B, N, Q, 1, sxyz, sfeat1, svalid, qxyz, qvalid)
    prep = gp.prepare_sources(jnp.asarray(sxyz), jnp.asarray(sfeat1),
                              jnp.asarray(svalid))
    g, i, c = gp.fused_query_group(prep, jnp.asarray(qxyz), NS, R,
                                   q_valid=jnp.asarray(qvalid),
                                   interpret=True)
    _check(d, np.asarray(g), np.asarray(i), np.asarray(c), NS, 0.0, R,
           feat_exact=True)

    def loss(sf):
        p = gp.prepare_sources(jnp.asarray(sxyz), sf, jnp.asarray(svalid))
        gg, _, cc = gp.fused_query_group(p, jnp.asarray(qxyz), NS, R,
                                         q_valid=jnp.asarray(qvalid),
                                         interpret=True)
        m = ((jnp.arange(NS)[None, None, :]
              < jnp.minimum(cc, NS)[:, :, None])
             & jnp.asarray(qvalid)[:, :, None])[..., None]
        return jnp.sum(jnp.where(m, gg[..., 3:], 0.0) * 2.0)

    gr = np.asarray(jax.grad(loss)(jnp.asarray(sfeat1)))
    cpr = np.zeros((B, N))
    for b in range(B):
        for qi in range(Q):
            if not qvalid[b, qi]:
                continue
            d2 = ((sxyz[b] - qxyz[b, qi]) ** 2).sum(-1)
            rows = np.where((d2 < R * R) & svalid[b])[0]
            assert len(rows) <= NS  # keep the oracle order-free
            for r in rows:
                cpr[b, r] += 1
    assert np.allclose(gr, cpr[..., None] * 2.0, atol=1e-3)


def test_nsample_not_multiple_of_chunk(data):
    """nsample=6 (not divisible by the KC=4 slot-chunk) must work via the
    gcd chunk split instead of trapping at trace time (advisor finding)."""
    B, N, Q, C, sxyz, sfeat, svalid, qxyz, qvalid = data
    prep = gp.prepare_sources(jnp.asarray(sxyz), jnp.asarray(sfeat),
                              jnp.asarray(svalid))
    g, i, c = gp.fused_query_group(
        prep, jnp.asarray(qxyz), 6, 2.4, 0.0,
        q_valid=jnp.asarray(qvalid), interpret=True)
    _check(data, np.asarray(g), np.asarray(i), np.asarray(c), 6, 0.0, 2.4)


def test_blocked_layout_matches_unblocked(data):
    """sort_queries_shared + fused_query_group_blocked must equal the
    plain fused_query_group after manual unblock + unsort (the blocked
    API only changes layout, never selection or values)."""
    B, N, Q, C, sxyz, sfeat, svalid, qxyz, qvalid = data
    ns, min_r, max_r = 8, 0.0, 2.0
    prep = gp.prepare_sources(jnp.asarray(sxyz), jnp.asarray(sfeat),
                              jnp.asarray(svalid))
    ref_g, _, ref_cnt = gp.fused_query_group(
        prep, jnp.asarray(qxyz), ns, max_r, min_r,
        q_valid=jnp.asarray(qvalid), interpret=True, need_idx=False)

    qs = gp.sort_queries_shared(jnp.asarray(qxyz), jnp.asarray(qvalid))
    gb, _, cnt_b = gp.fused_query_group_blocked(
        prep, qs, ns, max_r, min_r, interpret=True)
    # manual unblock: (B, nq, ns, QB, C) -> (B, Qp, ns, C); then unsort
    nq = gb.shape[1]
    g = jnp.transpose(gb, (0, 1, 3, 2, 4)).reshape(
        B, nq * gp.QB, ns, gb.shape[-1])[:, :Q]
    cnt = cnt_b.reshape(B, nq * gp.QB)[:, :Q]
    inv = qs["inv"]
    g = jnp.take_along_axis(g, inv[..., None, None], axis=1)
    cnt = jnp.take_along_axis(cnt, inv, axis=1)

    assert np.array_equal(np.asarray(cnt), np.asarray(ref_cnt))
    vm = np.asarray(qvalid)[:, :, None, None]
    slot = np.arange(ns)[None, None, :, None] < np.asarray(
        np.minimum(cnt, ns))[:, :, None, None]
    m = vm & slot
    assert np.allclose(np.where(m, np.asarray(g), 0),
                       np.where(m, np.asarray(ref_g), 0), atol=1e-6)

    # valid_b unsorts back to the caller's q_valid
    vb = jnp.take_along_axis(
        qs["valid_b"].reshape(B, -1)[:, :Q], inv, axis=1)
    assert np.array_equal(np.asarray(vb), qvalid)


def test_saturated_neighborhoods_exact_cnt_and_first_k():
    """Counts far above nsample across several Morton source blocks: the
    saturation gate (skip cumsum/chunks once every hit query's prior >=
    ns) must not change the exact uncapped cnt, the first-k selection, or
    zero-padding. Mixed blocks (one saturated query, one sparse) keep
    gathering for the sparse one."""
    rng = np.random.default_rng(7)
    B, C, ns = 1, 3, 8
    # dense cluster: ~1800 points inside a 2 m ball -> cnt >> ns, spread
    # over 3+ source blocks of 512
    dense = rng.uniform(-1, 1, (1800, 3)).astype(np.float32)
    # sparse far-away region with a handful of points
    sparse = (rng.uniform(-1, 1, (40, 3)) + 60.0).astype(np.float32)
    sxyz = np.concatenate([dense, sparse])[None]          # (1, 1840, 3)
    N = sxyz.shape[1]
    sfeat = rng.standard_normal((B, N, C)).astype(np.float32)
    svalid = np.ones((B, N), bool)
    qxyz = np.asarray([[[0.0, 0.0, 0.0],                  # saturated
                        [60.0, 60.0, 60.0],               # sparse
                        [30.0, -30.0, 0.0]]], np.float32)  # empty
    qvalid = np.ones((B, 3), bool)

    prep = gp.prepare_sources(jnp.asarray(sxyz), jnp.asarray(sfeat),
                              jnp.asarray(svalid))
    g, i, c = gp.fused_query_group(
        prep, jnp.asarray(qxyz), ns, 2.0, 0.0,
        q_valid=jnp.asarray(qvalid), interpret=True)
    g, i, c = map(np.asarray, (g, i, c))

    sfp = np.round(sxyz[0] * 1024.0)
    for qi in range(3):
        qfp = np.round(qxyz[0, qi] * 1024.0)
        d2 = ((sfp - qfp) ** 2).sum(-1)
        true_rows = set(np.where(d2 < (2.0 * 1024.0) ** 2)[0])
        assert c[0, qi] == len(true_rows)
        k = min(c[0, qi], ns)
        got = i[0, qi, :k]
        assert len(set(got.tolist())) == k
        assert set(got.tolist()) <= true_rows
        assert np.allclose(g[0, qi, :k, :3], sxyz[0][got], atol=6e-4)
        assert (g[0, qi, k:] == 0).all()
    assert c[0, 0] > 40 * ns   # the saturated case really saturates
    assert c[0, 2] == 0


def test_pair_kernel_bitwise_vs_single(data, monkeypatch):
    """The paired-query-block kernel (_kernel_pair, r5) is bitwise-equal
    to the single-block kernel on every output (grouped/idx/cnt), for
    both the large-C (pf) and small-C (bitcast) payload paths, including
    the odd-nq pad path."""
    B, N, Q, C, sxyz, sfeat, svalid, qxyz, qvalid = data

    # Q=300 -> nq=3 query blocks: exercises the odd-nq pad block
    qxyz3 = np.concatenate([qxyz, qxyz[:, :100]], axis=1)
    qvalid3 = np.concatenate([qvalid, qvalid[:, :100]], axis=1)

    for nfeat, ns in ((C, 16), (1, 8)):
        feat = sfeat[..., :nfeat]
        prep = gp.prepare_sources(jnp.asarray(sxyz), jnp.asarray(feat),
                                  jnp.asarray(svalid))

        def run():
            gp._fused_group._clear_cache()
            return gp.fused_query_group(
                prep, jnp.asarray(qxyz3), ns, 2.4, 0.6,
                q_valid=jnp.asarray(qvalid3), interpret=True)

        monkeypatch.setattr(gp, "_PAIR_ENV", "0")
        g0, i0, c0 = map(np.asarray, run())
        monkeypatch.setattr(gp, "_PAIR_ENV", "1")
        g1, i1, c1 = map(np.asarray, run())
        gp._fused_group._clear_cache()

        np.testing.assert_array_equal(c1, c0)
        np.testing.assert_array_equal(i1, i0)
        np.testing.assert_array_equal(g1, g0)


def test_split4d_bitwise_vs_5d(data, monkeypatch):
    """TSM_GROUP_SPLIT4D (r5: slice payload channels on the kernel's 4-D
    output, then split rows per channel) is bitwise-equal to the 5-D
    reshape path on grouped/idx/cnt AND on the feature gradient (the
    custom-VJP srow channel flows through both modes)."""
    B, N, Q, C, sxyz, sfeat, svalid, qxyz, qvalid = data
    feat = sfeat[..., :1]
    qs = gp.sort_queries_shared(jnp.asarray(qxyz), jnp.asarray(qvalid))

    def run(flag):
        monkeypatch.setenv("TSM_GROUP_SPLIT4D", flag)
        prep = gp.prepare_sources(jnp.asarray(sxyz), jnp.asarray(feat),
                                  jnp.asarray(svalid))
        return gp.fused_query_group_blocked(
            prep, qs, 8, 2.4, 0.0, need_idx=True, interpret=True)

    g0, i0, c0 = map(np.asarray, run(""))
    g1, i1, c1 = map(np.asarray, run("1"))
    np.testing.assert_array_equal(c1, c0)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_array_equal(g1, g0)

    def loss(f, flag):
        monkeypatch.setenv("TSM_GROUP_SPLIT4D", flag)
        p = gp.prepare_sources(jnp.asarray(sxyz), f, jnp.asarray(svalid))
        gb, _, cnt = gp.fused_query_group_blocked(
            p, qs, 8, 2.4, 0.0, need_idx=True, interpret=True)
        ok = (jnp.arange(8)[None, None, :, None] < cnt[:, :, None, :])
        return jnp.sum(jnp.where(ok[..., None], gb, 0.0) ** 2)

    ga = np.asarray(jax.grad(lambda f: loss(f, ""))(jnp.asarray(feat)))
    gb_ = np.asarray(jax.grad(lambda f: loss(f, "1"))(jnp.asarray(feat)))
    np.testing.assert_array_equal(gb_, ga)
