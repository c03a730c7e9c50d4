"""Point sampling ops (FPS family) — XLA-native, static shapes.

TPU replacement for pointnet2_batch_cuda sampling kernels
(ops/pointnet2/pointnet2_batch/src/sampling_gpu.cu):
  furthest_point_sample          <- farthest_point_sampling_kernel (:101-180)
  furthest_point_sample_weights  <- furthest_point_sampling_weights_kernel (:902)  [s-fps]
  furthest_point_sample_matrix   <- furthest_point_sampling_matrix_kernel (:751)   [f-fps]

FPS is inherently sequential in the sample index: each step picks the point
maximizing the running min-distance to the selected set. The CUDA kernel does
a shared-memory tree reduction per step; under XLA the whole loop compiles to
one fused `lax.fori_loop` whose body is a vectorized distance update + argmax
over N lanes — the (B, N) state stays on-chip between steps.

All variants accept a `valid_mask` so padded points are never selected
(padding replaces the reference's exact-size tensors).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _fps_loop(npoint, init_key, update_key_fn):
    """Generic FPS: greedily argmax a running key. Returns (B, npoint) idx.

    init_key: (B, N) initial selection keys (inf-like for unvisited).
    update_key_fn(key, last_idx) -> new key after selecting `last_idx` (B,).
    """
    B, N = init_key.shape

    def body(i, carry):
        key, idxs, last = carry
        key = update_key_fn(key, last)
        nxt = jnp.argmax(key, axis=-1).astype(jnp.int32)  # (B,)
        idxs = idxs.at[:, i].set(nxt)
        return key, idxs, nxt

    idxs = jnp.zeros((B, npoint), jnp.int32)
    idxs = idxs.at[:, 0].set(0)  # reference seeds FPS with index 0
    last = jnp.zeros((B,), jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (init_key, idxs, last))
    return idxs


def furthest_point_sample(xyz, npoint, valid_mask=None):
    """(B, N, 3) -> (B, npoint) int32 indices (d-fps).
    On TPU dispatches to the VMEM-resident Pallas kernel (fps_pallas.py);
    the XLA fori_loop below is the CPU/test oracle (identical numerics)."""
    if jax.default_backend() == "tpu":
        N = xyz.shape[1]
        if N >= 65536:
            # at Waymo scale the lockstep kernel's full (B, N) sweeps
            # dominate (61% of the eval forward, SURVEY.md §8b); the
            # Morton-block-pruned kernel is exact and ~4.5x faster there
            from .fps_pallas import furthest_point_sample_block_pruned

            # rows per program: R batch rows share one instruction stream
            # so the per-step SREG sync latencies (find scans + winner
            # extraction) overlap. r4 measured 2 rows 1.73x (195.1 ->
            # 112.6 ms); r5 measured 4 rows 3.65x on the kernel bench
            # (122.9 -> 33.7 ms) and 21.84 -> 25.9 scans/s on the Waymo
            # model bench — 4 is the default (VMEM ~12 MB at Waymo shape).
            # TSM_FPS_ROWS overrides for A/B probes.
            import os

            rows = int(os.environ.get("TSM_FPS_ROWS", "4"))
            return furthest_point_sample_block_pruned(
                xyz, npoint, valid_mask, rows=rows
            )
        from .fps_pallas import furthest_point_sample_pallas

        return furthest_point_sample_pallas(xyz, npoint, valid_mask)
    return _furthest_point_sample_xla(xyz, npoint, valid_mask)


@functools.partial(jax.jit, static_argnames=("npoint",))
def _furthest_point_sample_xla(xyz, npoint, valid_mask=None):
    B, N, _ = xyz.shape
    big = jnp.asarray(1e10, xyz.dtype)
    mindist = jnp.full((B, N), big, xyz.dtype)
    if valid_mask is not None:
        mindist = jnp.where(valid_mask, mindist, -1.0)

    def update(key, last):
        sel = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d2 = jnp.sum((xyz - sel) ** 2, axis=-1)  # (B, N)
        return jnp.minimum(key, d2) if valid_mask is None else jnp.where(
            valid_mask, jnp.minimum(key, d2), -1.0
        )

    return _fps_loop(npoint, mindist, update)


def furthest_point_sample_weights(xyz, weights, npoint, valid_mask=None):
    """s-fps: running min-distance scaled by per-point weights.
    xyz (B, N, 3), weights (B, N) -> (B, npoint).
    Parity: sampling_gpu.cu furthest_point_sampling_weights_kernel — the
    selection key is weights * min_dist. TPU dispatches to Pallas."""
    if jax.default_backend() == "tpu":
        from .fps_pallas import furthest_point_sample_pallas

        return furthest_point_sample_pallas(
            xyz, npoint, valid_mask, weights=weights
        )
    return _furthest_point_sample_weights_xla(xyz, weights, npoint, valid_mask)


@functools.partial(jax.jit, static_argnames=("npoint",))
def _furthest_point_sample_weights_xla(xyz, weights, npoint, valid_mask=None):
    B, N, _ = xyz.shape
    big = jnp.asarray(1e10, xyz.dtype)
    mindist = jnp.full((B, N), big, xyz.dtype)

    def masked(key):
        return key if valid_mask is None else jnp.where(valid_mask, key, -1.0)

    def update(mind, last):
        sel = jnp.take_along_axis(xyz, last[:, None, None], axis=1)
        d2 = jnp.sum((xyz - sel) ** 2, axis=-1)
        return jnp.minimum(mind, d2)

    # key = weights * mindist, but mindist itself is the carried state:
    # carry the raw min-dist and apply the weight at argmax time.
    def body(i, carry):
        mind, idxs, last = carry
        mind = update(mind, last)
        key = masked(weights * mind)
        nxt = jnp.argmax(key, axis=-1).astype(jnp.int32)
        idxs = idxs.at[:, i].set(nxt)
        return mind, idxs, nxt

    idxs = jnp.zeros((B, npoint), jnp.int32).at[:, 0].set(0)
    last = jnp.zeros((B,), jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(
        1, npoint, body, (masked(mindist), idxs, last)
    )
    return idxs


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample_matrix(matrix, npoint, valid_mask=None):
    """f-fps over a precomputed (B, N, N) pairwise distance matrix.
    Parity: sampling_gpu.cu furthest_point_sampling_matrix_kernel (:751)."""
    B, N, _ = matrix.shape
    big = jnp.asarray(1e10, matrix.dtype)
    mindist = jnp.full((B, N), big, matrix.dtype)
    if valid_mask is not None:
        mindist = jnp.where(valid_mask, mindist, -1.0)

    def update(key, last):
        row = jnp.take_along_axis(
            matrix, last[:, None, None], axis=1
        )[:, 0]  # (B, N)
        new = jnp.minimum(key, row)
        return new if valid_mask is None else jnp.where(valid_mask, new, -1.0)

    return _fps_loop(npoint, mindist, update)


def gather_points(points, idx):
    """points (B, N, C), idx (B, M) -> (B, M, C).
    Parity: pointnet2 gather_operation (channels-last here by design)."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)
