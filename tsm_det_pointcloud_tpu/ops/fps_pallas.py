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


def tpu_available():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
