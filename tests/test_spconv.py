"""Sparse conv correctness vs dense jax.lax conv oracles on small grids."""
import numpy as np
import jax
import jax.numpy as jnp

from tsm_det_pointcloud_tpu.ops.spconv import (
    subm_conv3d,
    sparse_conv3d,
    inverse_conv3d,
    sparse_to_dense,
    kernel_offsets,
    linearize,
)

GRID = (6, 8, 8)  # (gz, gy, gx)


def make_sparse(rng, n_active, cin, capacity=64, grid=GRID):
    gz, gy, gx = grid
    # unique random active sites
    all_sites = np.array(
        [(z, y, x) for z in range(gz) for y in range(gy) for x in range(gx)]
    )
    pick = rng.choice(len(all_sites), n_active, replace=False)
    coords = all_sites[pick].astype(np.int32)
    # sort by linearized key (the invariant)
    keys = (coords[:, 0] * gy + coords[:, 1]) * gx + coords[:, 2]
    order = np.argsort(keys)
    coords = coords[order]
    feats = rng.randn(n_active, cin).astype(np.float32)
    # pad to capacity
    coords_p = np.full((capacity, 3), -1, np.int32)
    feats_p = np.zeros((capacity, cin), np.float32)
    coords_p[:n_active] = coords
    feats_p[:n_active] = feats
    valid = np.zeros(capacity, bool)
    valid[:n_active] = True
    return feats_p[None], coords_p[None], valid[None]


def dense_from_sparse(feats, coords, valid, grid):
    return np.asarray(sparse_to_dense(jnp.array(feats), jnp.array(coords),
                                      jnp.array(valid), grid))


def dense_conv(dense, weight_k333, stride=1, padding=1):
    """Oracle: jax.lax.conv_general_dilated in (N, Z, Y, X, C) layout.
    weight (K, Cin, Cout) with taps in kernel_offsets(3) order (z, y, x)."""
    K, cin, cout = weight_k333.shape
    k = round(K ** (1 / 3))
    w = jnp.asarray(weight_k333).reshape(k, k, k, cin, cout)
    out = jax.lax.conv_general_dilated(
        jnp.asarray(dense), w,
        window_strides=(stride,) * 3,
        padding=[(padding, padding)] * 3,
        dimension_numbers=("NZYXC", "ZYXIO", "NZYXC"),
    )
    return np.asarray(out)


def test_subm_conv_matches_dense_at_active_sites():
    rng = np.random.RandomState(0)
    feats, coords, valid = make_sparse(rng, 20, cin=4)
    weight = rng.randn(27, 4, 5).astype(np.float32) * 0.1

    out = np.asarray(
        subm_conv3d(jnp.array(feats), jnp.array(coords), jnp.array(valid),
                    jnp.array(weight), GRID)
    )
    dense = dense_from_sparse(feats, coords, valid, GRID)
    ref = dense_conv(dense, weight, stride=1, padding=1)
    # submanifold: output only at active sites; compare there
    for i in range(20):
        z, y, x = coords[0, i]
        np.testing.assert_allclose(out[0, i], ref[0, z, y, x], rtol=1e-4, atol=1e-5)
    # padded rows zero
    assert np.abs(out[0, 20:]).max() == 0


def test_sparse_conv3d_downsample_matches_dense():
    rng = np.random.RandomState(1)
    feats, coords, valid = make_sparse(rng, 25, cin=3)
    weight = rng.randn(27, 3, 4).astype(np.float32) * 0.1
    out_grid = (3, 4, 4)

    of, oc, ov = sparse_conv3d(
        jnp.array(feats), jnp.array(coords), jnp.array(valid),
        jnp.array(weight), GRID, out_grid,
        kernel_size=3, stride=2, padding=1, out_capacity=64,
    )
    of, oc, ov = np.asarray(of), np.asarray(oc), np.asarray(ov)

    dense = dense_from_sparse(feats, coords, valid, GRID)
    ref = dense_conv(dense, weight, stride=2, padding=1)

    n_out = int(ov[0].sum())
    assert n_out > 0
    for i in range(n_out):
        z, y, x = oc[0, i]
        np.testing.assert_allclose(of[0, i], ref[0, z, y, x], rtol=1e-4, atol=1e-5)
    # every dense-nonzero output position is in our sparse set (exactness):
    # positions whose receptive field touches an input
    nz = np.argwhere(np.abs(ref[0]).sum(-1) > 1e-6)
    ours = {tuple(oc[0, i]) for i in range(n_out)}
    for pos in nz:
        assert tuple(pos) in ours


def test_inverse_conv_matches_dense_transpose():
    rng = np.random.RandomState(2)
    out_grid = (3, 4, 4)
    # coarse tensor lives on out_grid
    cfeats, ccoords, cvalid = make_sparse(rng, 10, cin=4, capacity=32, grid=out_grid)
    weight = rng.randn(27, 4, 3).astype(np.float32) * 0.1
    # fine positions: some subset of GRID
    ffeats, fcoords, fvalid = make_sparse(rng, 30, cin=1, capacity=64, grid=GRID)

    out = np.asarray(
        inverse_conv3d(
            jnp.array(cfeats), jnp.array(ccoords), jnp.array(cvalid),
            jnp.array(weight), jnp.array(fcoords), jnp.array(fvalid),
            out_grid, kernel_size=3, stride=2, padding=1,
        )
    )
    # oracle: brute-force scatter — fine position o = c*s - p + tap receives
    # coarse[c] @ weight[tap], tap in [0, k)^3 in kernel_offsets order
    dense_c = dense_from_sparse(cfeats, ccoords, cvalid, out_grid)
    offs = kernel_offsets(3) + 1  # taps in [0, 3)
    ref = np.zeros(GRID + (3,), np.float32)[None]
    s, p = 2, 1
    for ci in range(10):
        c = ccoords[0, ci]
        for t in range(27):
            o = c * s - p + offs[t]
            if np.all(o >= 0) and np.all(o < np.asarray(GRID)):
                ref[0, o[0], o[1], o[2]] += cfeats[0, ci] @ weight[t]
    for i in range(30):
        z, y, x = fcoords[0, i]
        np.testing.assert_allclose(out[0, i], ref[0, z, y, x], rtol=1e-4, atol=1e-5)


def test_kernel_offsets_order():
    off = kernel_offsets(3)
    assert off.shape == (27, 3)
    np.testing.assert_array_equal(off[0], [-1, -1, -1])
    np.testing.assert_array_equal(off[13], [0, 0, 0])
    np.testing.assert_array_equal(off[26], [1, 1, 1])


def test_nonuniform_kernel():
    # (3,1,1) kernel stride (2,1,1) — the VoxelBackBone8x conv_out shape
    rng = np.random.RandomState(3)
    feats, coords, valid = make_sparse(rng, 15, cin=2)
    weight = rng.randn(3, 2, 2).astype(np.float32) * 0.1
    out_grid = (3, 8, 8)
    of, oc, ov = sparse_conv3d(
        jnp.array(feats), jnp.array(coords), jnp.array(valid),
        jnp.array(weight), GRID, out_grid,
        kernel_size=(3, 1, 1), stride=(2, 1, 1), padding=(1, 0, 0),
        out_capacity=64,
    )
    dense = dense_from_sparse(feats, coords, valid, GRID)
    w = jnp.asarray(weight).reshape(3, 1, 1, 2, 2)
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(dense), w, window_strides=(2, 1, 1),
        padding=[(1, 1), (0, 0), (0, 0)],
        dimension_numbers=("NZYXC", "ZYXIO", "NZYXC"),
    ))
    of, oc, ov = np.asarray(of), np.asarray(oc), np.asarray(ov)
    for i in range(int(ov[0].sum())):
        z, y, x = oc[0, i]
        np.testing.assert_allclose(of[0, i], ref[0, z, y, x], rtol=1e-4, atol=1e-5)


def test_binary_fallback_matches_dense_table(monkeypatch):
    """Both rulebook lookup paths (dense hash table / binary search) must
    agree; large grids fall back to binary search."""
    import tsm_det_pointcloud_tpu.ops.spconv as spmod

    rng = np.random.RandomState(7)
    feats, coords, valid = make_sparse(rng, 30, cin=4)
    weight = rng.randn(27, 4, 5).astype(np.float32) * 0.1
    args = (jnp.array(feats), jnp.array(coords), jnp.array(valid),
            jnp.array(weight), GRID)
    out_dense = np.asarray(subm_conv3d(*args))
    monkeypatch.setattr(spmod, "DENSE_TABLE_MAX_CELLS", 0)
    out_binary = np.asarray(spmod.subm_conv3d(*args))
    np.testing.assert_allclose(out_dense, out_binary, rtol=1e-5, atol=1e-6)


def test_shared_plan_matches_unshared():
    """build_conv_plan / build_inverse_rulebook reuse must be numerically
    identical to the self-computing paths (the TSM mini U-Nets share one
    plan across teacher layers 1..2 + the student layer)."""
    from tsm_det_pointcloud_tpu.ops.spconv import (
        build_conv_plan,
        build_inverse_rulebook,
    )

    rng = np.random.RandomState(11)
    feats, coords, valid = make_sparse(rng, 20, cin=3)
    w_down = rng.randn(27, 3, 4).astype(np.float32) * 0.1
    out_grid = (3, 4, 4)
    plan = build_conv_plan(
        jnp.array(coords), jnp.array(valid), GRID, out_grid,
        kernel_size=3, stride=2, padding=1, out_capacity=64,
    )
    args = (jnp.array(feats), jnp.array(coords), jnp.array(valid),
            jnp.array(w_down), GRID, out_grid)
    kw = dict(kernel_size=3, stride=2, padding=1, out_capacity=64)
    of_a, oc_a, ov_a = sparse_conv3d(*args, **kw)
    of_b, oc_b, ov_b = sparse_conv3d(*args, **kw, plan=plan)
    np.testing.assert_array_equal(np.asarray(oc_a), np.asarray(oc_b))
    np.testing.assert_array_equal(np.asarray(ov_a), np.asarray(ov_b))
    np.testing.assert_allclose(np.asarray(of_a), np.asarray(of_b))

    # a second conv with different weights reuses the same plan
    w2 = rng.randn(27, 3, 4).astype(np.float32) * 0.1
    of_c = sparse_conv3d(*args[:3], jnp.array(w2), GRID, out_grid, **kw)[0]
    of_d = sparse_conv3d(*args[:3], jnp.array(w2), GRID, out_grid, **kw,
                         plan=plan)[0]
    np.testing.assert_allclose(np.asarray(of_c), np.asarray(of_d))

    # inverse conv back onto the fine set with/without a shared rulebook
    w_up = rng.randn(27, 4, 3).astype(np.float32) * 0.1
    rb = build_inverse_rulebook(
        oc_a, ov_a, jnp.array(coords), jnp.array(valid), out_grid,
        kernel_size=3, stride=2, padding=1,
    )
    iv_a = inverse_conv3d(
        of_a, oc_a, ov_a, jnp.array(w_up), jnp.array(coords),
        jnp.array(valid), out_grid, kernel_size=3, stride=2, padding=1,
    )
    iv_b = inverse_conv3d(
        of_a, oc_a, ov_a, jnp.array(w_up), jnp.array(coords),
        jnp.array(valid), out_grid, kernel_size=3, stride=2, padding=1,
        rulebook=rb,
    )
    np.testing.assert_allclose(np.asarray(iv_a), np.asarray(iv_b))
