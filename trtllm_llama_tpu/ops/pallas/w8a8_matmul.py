"""Pallas W8A8 (int8 x int8) matmul with fused dequant epilogue.

Replaces the reference's smoothQuantGemmPlugin + CutlassInt8GemmRunner
(smoothQuantGemmPlugin.cpp:193-218, cutlass_kernels/int8_gemm): int8
activations x int8 weights accumulate in int32 on the MXU (2x bf16 MXU
throughput — the compute-bound prefill win), with the per-token x
per-channel rescale fused into the output tile
(alpha_row * alpha_col * acc — the reference's epilogue semantics).

Stacked variant takes [L, K, N] weights + a scalar-prefetch layer index for
use inside the model's layer scan (same rationale as woq_matmul_stacked).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .woq_matmul import _grid_order


def _pick_tile(dim, candidates):
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def _kernel(x_ref, sx_ref, w_ref, sw_ref, o_ref, *, ck, n_chunks, lead):
    W = ((lambda a, b: w_ref[0, a:b, :]) if lead
         else (lambda a, b: w_ref[a:b, :]))
    SW = (lambda: sw_ref[0, 0:1, :]) if lead else (lambda: sw_ref[0:1, :])
    acc = None
    for c in range(n_chunks):
        part = jax.lax.dot_general(
            x_ref[:, c * ck:(c + 1) * ck], W(c * ck, (c + 1) * ck),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = part if acc is None else acc + part
    o_ref[:] = (acc.astype(jnp.float32) * sx_ref[:, 0:1] * SW())


def _tiles(m_p, k, n, w_bytes=1):
    bm = next((c for c in (256, 128, 64, 32, 16, 8)
               if m_p % c == 0 and 2 * c * k <= 4 * 1024 * 1024), min(8, m_p))
    budget = 6 * 1024 * 1024
    bn = next((c for c in (2048, 1024, 512, 256, 128)
               if n % c == 0 and 2 * k * c * w_bytes <= budget),
              _pick_tile(n, (256, 128)))
    ck = _pick_tile(k, (512, 256, 128, 64, 32))
    return bm, bn, ck


def w8a8_matmul_2d(x_q, w_q, s_x, s_w, interpret=False):
    """x_q: int8 [M, K]; w_q: int8 [K, N]; s_x: f32 [M, 1] per-token;
    s_w: f32 [N] or [1] per-channel/tensor. Returns f32 [M, N]."""
    m, k = x_q.shape
    n = w_q.shape[-1]
    # static-scale SQ passes a scalar/[1,1] s_x — broadcast to per-row before
    # padding (a [1,1] input would pad to [1+pad_m,1] and fail the later
    # broadcast_to((m_p, 128)))
    s_x = jnp.broadcast_to(jnp.asarray(s_x, jnp.float32).reshape(-1, 1), (m, 1))
    pad_m = (-m) % 32                    # int8 sublane tile
    if pad_m:
        x_q = jnp.pad(x_q, ((0, pad_m), (0, 0)))
        s_x = jnp.pad(s_x, ((0, pad_m), (0, 0)))
    m_p = m + pad_m
    bm, bn, ck = _tiles(m_p, k, n)
    s_w2 = jnp.broadcast_to(s_w.reshape(1, -1), (1, n))
    # grid-order choice (woq_matmul._n_outer): inner-axis operand re-streams
    # per outer step; int8 activations -> x_bytes=1
    n_m, n_n = m_p // bm, n // bn
    grid, mi, ni = _grid_order(n_m, n_n, m_p, k, n, 1, x_bytes=1)

    out = pl.pallas_call(
        functools.partial(_kernel, ck=ck, n_chunks=k // ck, lead=False),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda a, b: (mi(a, b), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 128), lambda a, b: (mi(a, b), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda a, b: (0, ni(a, b)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda a, b: (0, ni(a, b)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda a, b: (mi(a, b), ni(a, b)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_p, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n * k, bytes_accessed=int(k * n + m_p * k),
            transcendentals=0),
        interpret=interpret,
    )(x_q, jnp.broadcast_to(s_x, (m_p, 128)).astype(jnp.float32), w_q, s_w2)
    return out[:m] if pad_m else out


def w8a8_matmul(x_q, w_q, s_x, s_w, interpret=False):
    """Batched: x_q [..., K] int8, s_x [..., 1] -> [..., N] f32."""
    lead = x_q.shape[:-1]
    k = x_q.shape[-1]
    out = w8a8_matmul_2d(x_q.reshape(-1, k), w_q,
                         jnp.asarray(s_x, jnp.float32).reshape(-1, 1),
                         s_w, interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


def w8a8_matmul_stacked_2d(x_q, w_q, s_x, s_w, layer, interpret=False,
                           n_window=None):
    """Stacked weights [L, K, N] + scalar-prefetch layer index (used inside
    the model's layer scan — no per-layer weight materialization).

    n_window=(start, length): compute only output columns
    [start, start+length) without slicing the weight (static BlockSpec
    offset) — see woq_matmul_stacked_2d."""
    m, k = x_q.shape
    l, _, n_full = w_q.shape
    n_start, n = (0, n_full) if n_window is None else n_window
    assert n_start + n <= n_full and n_start >= 0, (n_window, n_full)
    s_x = jnp.broadcast_to(jnp.asarray(s_x, jnp.float32).reshape(-1, 1), (m, 1))
    pad_m = (-m) % 32
    if pad_m:
        x_q = jnp.pad(x_q, ((0, pad_m), (0, 0)))
        s_x = jnp.pad(s_x, ((0, pad_m), (0, 0)))
    m_p = m + pad_m
    bm, bn, ck = _tiles(m_p, k, n)
    assert n_start % bn == 0, (n_start, bn)
    off = n_start // bn
    s_w2 = jnp.broadcast_to(s_w.reshape(l, 1, -1), (l, 1, n_full))

    def _sel(s):
        return s[0] if getattr(s, "ndim", 0) else s

    # grid-order choice (woq_matmul._n_outer); int8 activations -> x_bytes=1
    n_m, n_n = m_p // bm, n // bn
    grid, mi, ni = _grid_order(n_m, n_n, m_p, k, n, 1, x_bytes=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda a, b, s: (mi(a, b), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 128), lambda a, b, s: (mi(a, b), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bn),
                         lambda a, b, s: (_sel(s), 0, ni(a, b) + off),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn),
                         lambda a, b, s: (_sel(s), 0, ni(a, b) + off),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn),
                               lambda a, b, s: (mi(a, b), ni(a, b)),
                               memory_space=pltpu.VMEM),
    )

    def kernel(lyr_ref, x_ref, sx_ref, w_ref, sw_ref, o_ref):
        del lyr_ref
        _kernel(x_ref, sx_ref, w_ref, sw_ref, o_ref,
                ck=ck, n_chunks=k // ck, lead=True)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_p, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n * k, bytes_accessed=int(k * n + m_p * k),
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x_q,
      jnp.broadcast_to(s_x, (m_p, 128)).astype(jnp.float32), w_q, s_w2)
    return out[:m] if pad_m else out


def w8a8_matmul_stacked(x_q, w_q, s_x, s_w, layer, interpret=False,
                        n_window=None):
    lead = x_q.shape[:-1]
    k = x_q.shape[-1]
    out = w8a8_matmul_stacked_2d(x_q.reshape(-1, k), w_q,
                                 jnp.asarray(s_x, jnp.float32).reshape(-1, 1),
                                 s_w, layer, interpret=interpret,
                                 n_window=n_window)
    return out.reshape(*lead, out.shape[-1])
