"""Pallas weight-only dequant-inside-matmul kernel (INT8 / INT4 weights).

TPU-native replacement for the reference's weightOnlyQuantMatmulPlugin +
CutlassFpAIntBGemmRunner + weight_only_gemv_launcher
(weightOnlyQuantMatmulPlugin.cpp:47-223, cutlass_kernels/fpA_intB_gemm):
activations stay bf16/f32, weights stream from HBM as int8 (or block-planar
packed int4 — see quantization.tensors.pack_int4) and are expanded to
bf16 *in VMEM*, feeding the MXU. HBM traffic is the quantized bytes — the
entire point of weight-only quantization at decode time, where the matmul is
memory-bound.

Kernel shape: grid (m_tiles, n_tiles); each program owns a full-K weight
column panel (streamed/double-buffered by the Pallas pipeline across n
steps) and accumulates over K in a *statically unrolled* chunk loop — static
slices keep every sublane offset provably aligned (grouped scales included)
and keep the accumulator in registers instead of revisiting the output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...quantization.tensors import WOQWeight


def _pick_tile(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def _n_outer(n_m, n_n, m_p, k, n, w_bytes_per_el, x_bytes=2) -> bool:
    """Grid-order choice by exact re-fetch traffic. The TPU grid is
    sequential and the Pallas pipeline only skips an operand re-fetch when
    its block index is unchanged between consecutive steps, so whichever
    operand is indexed by the INNER axis is re-streamed from HBM once per
    outer step (minus the first pass, which both orders pay):

      m-outer (i, j): extra weight traffic = (n_m - 1) * K*N*wB
      n-outer (j, i): extra x traffic      = (n_n - 1) * M*K*xB

    Decode (n_m == 1) is order-indifferent (zero extra traffic either way;
    both orders visit the same block sequence) and resolves to m-outer;
    large-m prefill against a wide fused projection prefers n-outer (e.g.
    m=4096, int8 QKV 4096x12288: 15 weight re-reads of 50 MB vs 23 x
    re-reads of 34 MB)."""
    return (n_m - 1) * k * n * w_bytes_per_el > (n_n - 1) * m_p * k * x_bytes


def _grid_order(n_m, n_n, m_p, k, n, w_bytes_per_el, x_bytes=2):
    """Pick the grid order via _n_outer and return (grid, mi, ni): the grid
    tuple plus index maps from grid ids (a, b) to the (m_tile, n_tile) ids —
    one convention shared by all four matmul-kernel entry points."""
    swap = _n_outer(n_m, n_n, m_p, k, n, w_bytes_per_el, x_bytes=x_bytes)
    mi = (lambda a, b: b) if swap else (lambda a, b: a)   # m-tile id
    ni = (lambda a, b: a) if swap else (lambda a, b: b)   # n-tile id
    grid = (n_n, n_m) if swap else (n_m, n_n)
    return grid, mi, ni


def _unpack_block_planes(packed_block, compute_dtype):
    """[pb//2, bn] quartered-packed *biased* int4 block -> four bf16 planes
    [pb//4, bn] holding 128 + u, one per logical K-quarter (A, B, C, D),
    via pure SWAR **bf16 bit-plant** — no int8->bf16 converts at all.

    0x4300 | u is exactly bf16(128 + u) for u in [0, 15] (exponent 134,
    u lands in the top 4 of the 7 mantissa bits). The uint32 view of the
    packed tile holds packed rows 4s+j at byte j of word s, and the
    uint32->bf16 bitcast sends lo16 -> sublane 2s / hi16 -> 2s+1 (both
    probed on v5e, scripts/probe_int4_kernel.py), so with pack_int4's
    quartered interleave the four (shift, mask|plant) extractions below
    land quarters A, B, C, D in logical row order. Cost: ~11 VPU u32-ops
    per 8 weights, vs 3 SWAR ops + two full int8->bf16 tile converts for
    the previous planar layout — the converts were the measured bottleneck
    (int4 ran at 52.1 us vs int8's 47.7 us at decode shapes despite half
    the HBM bytes). The caller subtracts the planted 128+8 bias post-dot
    as -136 * rowsum(x)."""
    w32 = pltpu.bitcast(packed_block, jnp.uint32)
    planes = []
    for sh in (0, 8, 4, 12):       # -> quarters A, B, C, D
        t = w32 if sh == 0 else (w32 >> sh)
        p = pltpu.bitcast((t & 0x000F000F) | 0x43004300, jnp.bfloat16)
        planes.append(p if compute_dtype == jnp.bfloat16
                      else p.astype(compute_dtype))
    return planes


def _fuse_prologue(x_ref, nw_ref, xs_ref, *, k, eps, swiglu,
                   compute_dtype):
    """Decode-fusion prologue: materialize the kernel's ACTUAL input row
    panel into VMEM scratch once (first n-step of the grid), from the raw
    residual-stream rows the caller handed over.

    - norm mode (nw_ref given): xs = rms_norm(x, nw) — the f32 moment /
      rsqrt / weight order matches ops.norm.rms_norm exactly, cast to the
      compute dtype the matmul would have received.
    - swiglu mode: x_ref is [bm, 2K] = [gate | up] columns of the fused
      gate_up projection; xs = silu(g) * u with silu in f32 and the
      product in compute dtype (the ops order of models/llama._mlp_block).

    This replaces one XLA op dispatch between pallas calls per projection —
    the r4 gap analysis measured ~2.2 ms/token (int4) of HBM idle across
    those boundaries (docs/kernels.md) — and overlaps the elementwise work
    with the first weight panel's DMA instead of serializing before it."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if swiglu:
            g, u = xf[:, :k], xf[:, k:]
            h = (jax.nn.silu(g).astype(compute_dtype)
                 * u.astype(compute_dtype))
        else:
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            h = (xf * jax.lax.rsqrt(var + eps)
                 * nw_ref[0].astype(jnp.float32)).astype(compute_dtype)
        xs_ref[:] = h


def _fuse_epilogue(o_ref, r_ref, acc):
    """Residual-add epilogue: out = resid + bf16(acc), the exact rounding
    order of the unfused path (dense casts its f32 accumulator to the
    activation dtype BEFORE the residual add in models/llama)."""
    o_ref[:] = (r_ref[:] + acc.astype(r_ref.dtype)).astype(o_ref.dtype)


def _kernel_int4(x_ref, w_ref, s_ref, o_ref, *, pack_block, group_size,
                 k, compute_dtype, lead=False, sink=None):
    """INT4: statically unrolled loop over pack blocks; each block bit-plants
    four bf16 quarter planes on the VPU and dots them against contiguous x
    quarter columns — grouped scales are applied to the [bm, bn] dot
    *output* (scale is constant within a group, and the output tile is
    ~group_size times smaller than the weight tile, so the epilogue costs
    1/group_size of the in-tile dequant the naive kernel does). At prefill
    m the planes are concatenated once into a [pb, bn] tile for a single
    full-depth MXU pass (the copy amortizes over m rows; at decode m the
    MXU is idle and the concat would be pure VPU traffic, so quarter dots
    win). `lead`: refs carry a leading unit (layer) dim (stacked variant) —
    indexed in one combined op, which Mosaic legalizes where chained
    sub-ref views do not."""
    W = ((lambda a, b: w_ref[0, a:b, :]) if lead
         else (lambda a, b: w_ref[a:b, :]))
    S = ((lambda a, b: s_ref[0, a:b, :]) if lead
         else (lambda a, b: s_ref[a:b, :]))
    from ...quantization.tensors import INT4_BIAS

    pb = pack_block
    q4 = pb // 4
    bm = x_ref.shape[0]
    n_blk = k // pb
    # decode-m grouped epilogue: collect raw per-block dots and apply ALL
    # grouped scales in one stacked multiply-reduce at the end ([nb, bm,
    # bn] f32 scratch, ~1 MB at bm=8) instead of nb separate [bm, bn] x
    # [1, bn]-broadcast multiplies — the per-block multiply chain measured
    # ~19% of the whole kernel (int4g 39.8 us vs 32.3 us with the scale
    # stripped, probe r4). Prefill keeps the per-block multiply: stacking
    # [nb, 256, bn] would blow VMEM and the multiply amortizes over m.
    stack_epilogue = bool(group_size) and bm <= 16
    parts = []
    acc = None
    for i in range(n_blk):
        planes = _unpack_block_planes(
            W(i * pb // 2, (i + 1) * pb // 2), compute_dtype)
        x_c = x_ref[:, i * pb:(i + 1) * pb].astype(compute_dtype)
        if bm > 64:
            # prefill: one full-depth K=pb MXU pass per block
            part = jnp.dot(x_c, jnp.concatenate(planes, axis=0),
                           preferred_element_type=jnp.float32)
        else:
            part = None
            for j, p in enumerate(planes):
                pj = jnp.dot(x_c[:, j * q4:(j + 1) * q4], p,
                             preferred_element_type=jnp.float32)
                part = pj if part is None else part + pj
        # fold the planted 128 + u = 136 + q value out:
        # dot(x, 136 + q) = dot(x, q) + 136 * rowsum(x)
        part = part - (128.0 + INT4_BIAS) * jnp.sum(
            x_c.astype(jnp.float32), axis=1, keepdims=True)
        if stack_epilogue:
            parts.append(part)
            continue
        if group_size:
            part = part * S(i, i + 1)      # post-dot grouped scale
        acc = part if acc is None else acc + part
    if stack_epilogue:
        scales = S(0, n_blk)                        # [nb, bn]
        acc = jnp.sum(jnp.stack(parts) * scales[:, None, :], axis=0)
    if not group_size:
        acc = acc * S(0, 1).astype(jnp.float32)
    if sink is None:
        o_ref[:] = acc
    else:
        sink(acc)


def _decode_fp8_block(q, compute_dtype):
    """e4m3fn uint8 codes -> compute_dtype in 7 branchless vector ops:
    plant sign/exp/mantissa straight into their f32 bit positions
    (sign->31, e4->23..26, m3->20..22), bitcast, multiply by 2^120 to move
    the exponent bias from 7 to 127. Exact for +-0 and every normal code —
    i.e. for the engine's ENTIRE encodable code set: quantize_fp8_weight
    flushes the 14 subnormal codes at encode time (quantization/tensors.py
    — error <= 7*2^-9 of the channel scale grid) and never emits the two
    NaN codes, precisely so this hot-path decode needs no subnormal select
    (i16/i32 vector compares and the extra where/sub cost ~2x decode ops;
    the decode of each [ck, bn] weight panel is the VPU bottleneck while
    the dot rides the MXU). Behavior on codes outside the encodable set is
    unspecified (subnormals flush to zero wherever f32 DAZ/FTZ holds —
    XLA:CPU and the TPU VPU both flush; NaN codes decode to +-480).
    ops/fp8.py::fp8_decode remains the exact full-codec oracle."""
    from jax import lax
    u = q.astype(jnp.int32)
    bits = ((u & 0x80) << 24) | ((u & 0x7F) << 20)
    f = lax.bitcast_convert_type(bits, jnp.float32)
    return (f * jnp.float32(2.0 ** 120)).astype(compute_dtype)


def _decode_fp8_planes(packed_block, compute_dtype):
    """Interleaved e4m3fn byte block [fb, bn] -> two bf16 half planes
    [fb/2, bn] (first / second logical K-half of the block), by SWAR
    **bf16 double-plant** on the uint32 view — 2 bytes decoded per vector
    op lane vs the 1-element-per-lane f32 plant of _decode_fp8_block.

    Per 16-bit half: exp+mantissa bits 0-6 shift to bf16 positions 4-10
    (e4 -> exponent bits 7-10, m3 -> top-3 mantissa), the sign bit shifts
    7->15; even bytes (packed rows 4s, 4s+2 -> bf16 sublanes 2s, 2s+1 = the
    block's FIRST logical half under interleave_fp8_rows) come from the
    unshifted word, odd bytes from word >> 8. The planted exponent still
    carries e4m3's bias-7, so multiply by 2^120 (exact in bf16; max code
    448 = 1.75*2^8 stays finite) — same rebias trick as _decode_fp8_block.
    ~11 VPU ops + 2 scalar muls per 4 bytes vs ~8 widened-lane ops per
    byte. Exactness contract unchanged: encoder flushes subnormal codes
    and never emits NaNs (quantize_fp8_weight)."""
    v = pltpu.bitcast(packed_block, jnp.uint32)
    planes = []
    for t in (v, v >> 8):
        b = (((t & 0x007F007F) << 4) | ((t & 0x00800080) << 8))
        p = pltpu.bitcast(b, jnp.bfloat16) * jnp.bfloat16(2.0 ** 120)
        planes.append(p if compute_dtype == jnp.bfloat16
                      else p.astype(compute_dtype))
    return planes


def _kernel_int8(x_ref, w_ref, s_ref, o_ref, *, group_size, ck, n_chunks,
                 compute_dtype, lead=False, fp8=False, fp8_fb=0, sink=None):
    W = ((lambda a, b: w_ref[0, a:b, :]) if lead
         else (lambda a, b: w_ref[a:b, :]))
    S = ((lambda a, b: s_ref[0, a:b, :]) if lead
         else (lambda a, b: s_ref[a:b, :]))
    bm = x_ref.shape[0]
    acc = None
    for c in range(n_chunks):
        if fp8 and fp8_fb:
            # interleaved fp8 layout: double-plant the WHOLE chunk into
            # its even/odd planes in two large SWAR passes (per-block
            # [fb/4, bn] ops measured 13% slower than chunk-wide ones),
            # then dot per fb block — plane rows [b*fb/2, (b+1)*fb/2) are
            # block b's contiguous logical K-halves
            fb = fp8_fb
            assert ck % fb == 0, (
                f"fp8 K-chunk {ck} must be whole interleave blocks of "
                f"{fb} (a K shard smaller than the block scrambles the "
                "row permutation — see linear._fp8_shard_aligned)")
            pe, po = _decode_fp8_planes(W(c * ck, (c + 1) * ck),
                                        compute_dtype)
            part = None
            h = fb // 2
            for b in range(ck // fb):
                r0 = c * ck + b * fb
                s0 = b * h
                if bm > 64:
                    pj = jnp.dot(
                        x_ref[:, r0:r0 + fb].astype(compute_dtype),
                        jnp.concatenate([pe[s0:s0 + h, :],
                                         po[s0:s0 + h, :]], axis=0),
                        preferred_element_type=jnp.float32)
                else:
                    pj = (jnp.dot(x_ref[:, r0:r0 + h].astype(compute_dtype),
                                  pe[s0:s0 + h, :],
                                  preferred_element_type=jnp.float32)
                          + jnp.dot(
                              x_ref[:, r0 + h:r0 + fb].astype(compute_dtype),
                              po[s0:s0 + h, :],
                              preferred_element_type=jnp.float32))
                part = pj if part is None else part + pj
            acc = part if acc is None else acc + part
            continue
        qc = W(c * ck, (c + 1) * ck)
        if fp8:
            qc = _decode_fp8_block(qc, compute_dtype)
        x_c = x_ref[:, c * ck:(c + 1) * ck].astype(compute_dtype)
        if group_size:
            rows = ck // group_size
            sc = S(c * rows, (c + 1) * rows)                # static slice
            qf = qc.reshape(rows, group_size, -1).astype(jnp.float32)
            w_c = (qf * sc[:, None, :]).reshape(ck, -1).astype(compute_dtype)
        else:
            w_c = qc.astype(compute_dtype)
        part = jnp.dot(x_c, w_c, preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    if not group_size:
        acc = acc * S(0, 1).astype(jnp.float32)
    if sink is None:
        o_ref[:] = acc
    else:
        sink(acc)


def _default_compute_dtype():
    # bf16 feeds the MXU on TPU; XLA-CPU's interpret-mode DotThunk cannot
    # execute bf16 x bf16 -> f32, so tests/CPU meshes compute in f32
    import jax
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def woq_matmul_2d(x, w: WOQWeight, *, bm=None, bn=None,
                  compute_dtype=None, interpret=False, fp8=False):
    """x: [M, K] -> [M, N] f32. w.qweight: [K(/2), N].
    fp8=True: w.qweight holds e4m3fn byte codes (decoded in VMEM by
    _decode_fp8_block); requires w_bits == 8 and no grouping."""
    compute_dtype = compute_dtype or _default_compute_dtype()
    m, k_x = x.shape
    k = w.k_dim
    n = w.qweight.shape[-1]
    assert k_x == k, (k_x, k)
    w_bytes_per_el = 0.5 if w.w_bits == 4 else 1

    pad_m = (-m) % 8
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    m_p = m + pad_m

    if bm is None:
        # x panels are double-buffered across m tiles: keep 2*bm*K*2B under
        # ~4 MB (large-K prefill shapes would otherwise blow VMEM)
        bm = next((c for c in (256, 128, 64, 32, 16, 8)
                   if m_p % c == 0 and 2 * c * k * 2 <= 4 * 1024 * 1024),
                  min(8, m_p))
    if m_p % bm:
        bm = _pick_tile(m_p, (128, 64, 32, 16, 8))
    if bn is None:
        # keep the double-buffered weight panel under ~6 MB of VMEM
        budget = 6 * 1024 * 1024
        for cand in (2048, 1024, 512, 256, 128):
            if n % cand == 0 and 2 * k * cand * w_bytes_per_el <= budget:
                bn = cand
                break
        else:
            bn = _pick_tile(n, (256, 128))
    ck = _pick_tile(k, (512, 256, 128, 64, 32, 16, 8))
    gs = w.group_size
    if w.w_bits == 4 and gs:
        assert gs == w.pack_block, (
            "int4 grouped mode requires group_size == pack_block "
            f"(got {gs} vs {w.pack_block})")
    if gs:
        assert ck % gs == 0, (ck, gs)

    n_m, n_n, n_chunks = m_p // bm, n // bn, k // ck
    pack_div = 2 if w.w_bits == 4 else 1

    # grid-order choice: the inner-axis operand is re-streamed per outer
    # step (see _n_outer); map grid ids (a, b) -> (m_tile, n_tile)
    grid, mi, ni = _grid_order(n_m, n_n, m_p, k, n, w_bytes_per_el)

    if gs:
        s_spec = pl.BlockSpec((k // gs, bn), lambda a, b: (0, ni(a, b)),
                              memory_space=pltpu.VMEM)
        scale = w.scale
    else:
        s_spec = pl.BlockSpec((1, bn), lambda a, b: (0, ni(a, b)),
                              memory_space=pltpu.VMEM)
        scale = w.scale.reshape(1, n)

    if w.w_bits == 4:
        kernel = functools.partial(
            _kernel_int4, pack_block=w.pack_block, group_size=gs, k=k,
            compute_dtype=compute_dtype)
    else:
        assert not (fp8 and gs), "fp8 weights are per-channel scaled"
        kernel = functools.partial(
            _kernel_int8, group_size=gs, ck=ck, n_chunks=n_chunks,
            compute_dtype=compute_dtype, fp8=fp8,
            fp8_fb=(w.pack_block if fp8 else 0))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda a, b: (mi(a, b), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // pack_div, bn), lambda a, b: (0, ni(a, b)),
                         memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda a, b: (mi(a, b), ni(a, b)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_p, n), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n * k,
            bytes_accessed=int(k * n * w_bytes_per_el
                               + m_p * k * 2 + m_p * n * 4),
            transcendentals=0),
        interpret=interpret,
    )(x, w.qweight, scale)
    return out[:m] if pad_m else out


def woq_matmul(x, w: WOQWeight, interpret=False):
    """Batched entry: x [..., K] -> [..., N] f32."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = woq_matmul_2d(x2, w, interpret=interpret)
    return out.reshape(*lead, out.shape[-1])


# ---------------------------------------------------------------------------
# Stacked variant: weights [L, K(/2), N], layer chosen by a scalar-prefetch
# index. Used inside the model's lax.scan over layers — the kernel DMAs its
# panels straight out of the stacked HBM array, so the per-layer slice is
# never materialized (a plain pallas operand would force an HBM round-trip
# copy of the whole layer weight per scan step).
# ---------------------------------------------------------------------------

def _kernel_stacked(idx_ref, x_ref, w_ref, s_ref, *rest, w_bits,
                    pack_block, group_size, k, ck, n_chunks, compute_dtype,
                    fp8=False, fuse_norm=False, fuse_swiglu=False,
                    fuse_resid=False, eps=1e-6):
    del idx_ref  # consumed by the index_maps
    refs = list(rest)
    nw_ref = refs.pop(0) if fuse_norm else None
    r_ref = refs.pop(0) if fuse_resid else None
    o_ref = refs.pop(0)
    if fuse_norm or fuse_swiglu:
        xs_ref = refs.pop(0)            # VMEM scratch, persists across grid
        _fuse_prologue(x_ref, nw_ref, xs_ref, k=k, eps=eps,
                       swiglu=fuse_swiglu, compute_dtype=compute_dtype)
        x_src = xs_ref
    else:
        x_src = x_ref
    sink = ((lambda acc: _fuse_epilogue(o_ref, r_ref, acc))
            if fuse_resid else None)
    if w_bits == 4:
        _kernel_int4(x_src, w_ref, s_ref, o_ref,
                     pack_block=pack_block, group_size=group_size, k=k,
                     compute_dtype=compute_dtype, lead=True, sink=sink)
    else:
        _kernel_int8(x_src, w_ref, s_ref, o_ref,
                     group_size=group_size, ck=ck, n_chunks=n_chunks,
                     compute_dtype=compute_dtype, lead=True, fp8=fp8,
                     fp8_fb=(pack_block if fp8 else 0), sink=sink)


def woq_matmul_stacked_2d(x, w: WOQWeight, layer, *, bm=None, bn=None,
                          compute_dtype=None, interpret=False,
                          n_window=None, fp8=False, norm_w=None,
                          eps=1e-6, swiglu=False, resid=None):
    """x: [M, K]; w.qweight: [L, K(/2), N]; layer: int32 scalar -> [M, N].

    n_window=(start, length): compute only output columns
    [start, start+length) — the full stacked weight stays in place (the
    window is a static offset folded into the BlockSpec index maps, no
    weight slice/copy). Used by the sharded row-parallel path to interleave
    column-chunk matmuls with their psums (collective/compute overlap).

    Decode fusion (r5 — closing the inter-kernel HBM-idle gap,
    docs/kernels.md):
      norm_w ([L, K] stacked): RMS-norm the rows in a VMEM prologue
        (computed once per m-tile, reused across n-steps via scratch);
      swiglu: x is [M, 2K] = [gate | up]; prologue computes silu(g)*u;
      resid ([M, N]): residual-add epilogue with the unfused rounding
        order (bf16 cast before the add).
    Mutually exclusive with n_window; norm_w and swiglu are mutually
    exclusive. The elementwise work rides the weight pipeline instead of
    costing an XLA op dispatch (and its activation HBM round-trip) between
    pallas calls. Reference analogue: the m==1 whole-path decode tuning of
    weightOnlyMatrixVectorMultiplication.h:37-46."""
    compute_dtype = compute_dtype or _default_compute_dtype()
    fuse_pro = norm_w is not None or swiglu
    assert not (norm_w is not None and swiglu)
    assert n_window is None or (not fuse_pro and resid is None)
    m, k_x = x.shape
    l = w.qweight.shape[0]
    k = w.k_dim
    n_full = w.qweight.shape[-1]
    n_start, n = (0, n_full) if n_window is None else n_window
    assert n_start + n <= n_full and n_start >= 0, (n_window, n_full)
    assert k_x == (2 * k if swiglu else k), (k_x, k, swiglu)
    w_bytes_per_el = 0.5 if w.w_bits == 4 else 1
    kx = k_x                       # x panel width (2k when swiglu)

    pad_m = (-m) % 8
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
        if resid is not None:
            resid = jnp.pad(resid, ((0, pad_m), (0, 0)))
    m_p = m + pad_m

    if bm is None:
        # x panels are double-buffered across m tiles: keep 2*bm*K*2B under
        # ~4 MB (large-K prefill shapes would otherwise blow VMEM)
        bm = next((c for c in (256, 128, 64, 32, 16, 8)
                   if m_p % c == 0 and 2 * c * kx * 2 <= 4 * 1024 * 1024),
                  min(8, m_p))
    if m_p % bm:
        bm = _pick_tile(m_p, (128, 64, 32, 16, 8))
    if bn is None:
        budget = 6 * 1024 * 1024
        for cand in (2048, 1024, 512, 256, 128):
            if n % cand == 0 and 2 * k * cand * w_bytes_per_el <= budget:
                bn = cand
                break
        else:
            bn = _pick_tile(n, (256, 128))
    ck = _pick_tile(k, (512, 256, 128, 64, 32, 16, 8))
    gs = w.group_size
    if w.w_bits == 4 and gs:
        assert gs == w.pack_block, (gs, w.pack_block)

    n_m, n_n, n_chunks = m_p // bm, n // bn, k // ck
    pack_div = 2 if w.w_bits == 4 else 1

    def _sel(s):
        # scalar-prefetch operand arrives as shape-(1,) ref when compiled,
        # 0-d scalar in interpret mode
        return s[0] if getattr(s, "ndim", 0) else s

    assert n_start % bn == 0, (n_start, bn)
    off = n_start // bn           # static column-tile offset into the weight
    # grid-order choice (see _n_outer): grid ids (a, b) -> (m_tile, n_tile)
    if fuse_pro:
        # the prologue keys off program_id(1) == 0 (first n-step of each
        # m-tile), which requires the m-outer order; decode/extend shapes
        # (small m) resolve there anyway
        grid, mi, ni = (n_m, n_n), (lambda a, b: a), (lambda a, b: b)
    else:
        grid, mi, ni = _grid_order(n_m, n_n, m_p, k, n, w_bytes_per_el)
    if gs:
        scale = w.scale                                 # [L, K//gs, N]
        s_spec = pl.BlockSpec((1, k // gs, bn),
                              lambda a, b, s: (_sel(s), 0, ni(a, b) + off),
                              memory_space=pltpu.VMEM)
    else:
        scale = w.scale.reshape(l, 1, n_full)           # [L, 1, N]
        s_spec = pl.BlockSpec((1, 1, bn),
                              lambda a, b, s: (_sel(s), 0, ni(a, b) + off),
                              memory_space=pltpu.VMEM)

    assert not (fp8 and gs), "fp8 weights are per-channel scaled"
    kernel = functools.partial(
        _kernel_stacked, w_bits=w.w_bits, pack_block=w.pack_block,
        group_size=gs, k=k, ck=ck, n_chunks=n_chunks,
        compute_dtype=compute_dtype, fp8=fp8,
        fuse_norm=norm_w is not None, fuse_swiglu=swiglu,
        fuse_resid=resid is not None, eps=eps)

    in_specs = [
        pl.BlockSpec((bm, kx), lambda a, b, s: (mi(a, b), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k // pack_div, bn),
                     lambda a, b, s: (_sel(s), 0, ni(a, b) + off),
                     memory_space=pltpu.VMEM),
        s_spec,
    ]
    operands = [jnp.asarray(layer, jnp.int32).reshape(1), x, w.qweight,
                scale]
    if norm_w is not None:
        # [L, 1, K] + (1, 1, k) blocks: the leading-1 middle dim satisfies
        # Mosaic's last-two-dims blocking rule (same shape trick as the
        # per-channel scale operand)
        in_specs.append(pl.BlockSpec((1, 1, k),
                                     lambda a, b, s: (_sel(s), 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(norm_w.reshape(l, 1, norm_w.shape[-1]))
    if resid is not None:
        in_specs.append(pl.BlockSpec((bm, bn),
                                     lambda a, b, s: (mi(a, b), ni(a, b)),
                                     memory_space=pltpu.VMEM))
        operands.append(resid)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn),
                               lambda a, b, s: (mi(a, b), ni(a, b)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=([pltpu.VMEM((bm, k), compute_dtype)]
                        if fuse_pro else []),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_p, n), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "arbitrary") if fuse_pro
                else ("parallel", "parallel"))),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n * k,
            bytes_accessed=int(k * n * w_bytes_per_el
                               + m_p * kx * 2 + m_p * n * 4),
            transcendentals=0),
        interpret=interpret,
    )(*operands)
    return out[:m] if pad_m else out


def woq_matmul_stacked(x, w: WOQWeight, layer, interpret=False,
                       n_window=None, norm_w=None, eps=1e-6, swiglu=False,
                       resid=None):
    """Batched entry: x [..., K], stacked w [L, ...] -> [..., N] f32."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    r2 = None if resid is None else resid.reshape(-1, resid.shape[-1])
    out = woq_matmul_stacked_2d(x2, w, layer, interpret=interpret,
                                n_window=n_window, norm_w=norm_w, eps=eps,
                                swiglu=swiglu, resid=r2)
    return out.reshape(*lead, out.shape[-1])


# ---------------------------------------------------------------------------
# FP8 (e4m3fn) weight matmul: byte codes share the int8 kernel's exact
# layout and tiling (1 byte/element, per-channel scale), only the in-VMEM
# expand differs (_decode_fp8_block instead of an integer convert). The
# reference never shipped a runnable FP8 GEMM (its fp8_gemm plugin is
# absent and quantization/layer.py's FP8 classes are stubs).
# ---------------------------------------------------------------------------

def _fp8_shim(w):
    """Zero-copy adapter: an FP8Weight's (qweight, scale) already match the
    int8 per-channel WOQWeight layout ([L?, K, N] bytes + [L?, N] scale).
    The fp8 interleave block rides in pack_block (consumed as fp8_fb by
    _kernel_int8's double-plant branch)."""
    return WOQWeight(w.qweight, w.scale, 8, 0, w.interleave_block)


def fp8_matmul(x, w, interpret=False):
    """Batched entry: x [..., K], FP8Weight [K, N] -> [..., N]."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = woq_matmul_2d(x2, _fp8_shim(w), interpret=interpret, fp8=True)
    return out.reshape(*lead, out.shape[-1])


def fp8_matmul_stacked(x, w, layer, interpret=False, n_window=None,
                       norm_w=None, eps=1e-6, swiglu=False, resid=None):
    """Batched entry: x [..., K], stacked FP8Weight [L, K, N] -> [..., N]."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    r2 = None if resid is None else resid.reshape(-1, resid.shape[-1])
    out = woq_matmul_stacked_2d(x2, _fp8_shim(w), layer, interpret=interpret,
                                n_window=n_window, fp8=True, norm_w=norm_w,
                                eps=eps, swiglu=swiglu, resid=r2)
    return out.reshape(*lead, out.shape[-1])
