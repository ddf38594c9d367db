"""Pallas attention kernels: decode (generation) and prefill (context).

TPU-native replacement for the reference's attention stack:
- decode kernel <- decoderMaskedMultiheadAttention (one CTA per head/batch,
  inline INT8-KV dequant, decoderMaskedMultiheadAttentionTemplate.h:1336-1650)
- prefill kernel <- contextFusedMultiHeadAttention FMHA cubins +
  unfusedAttentionKernels fallback (BMM + invokeMaskedSoftmax)

Design notes (v5e):
- Decode: grid (B, H_kv); each program owns one kv head's [S, D] K/V panels
  (int8 or bf16, streamed HBM->VMEM by the pipeline) and this head's GQA
  group of q rows. Scores/softmax accumulate in fp32 (the reference forces
  fp32 softmax too, layers/attention.py:331-343). INT8 KV dequantizes
  in-VMEM with the per-layer calibrated scale — HBM traffic stays int8,
  which is the whole point (reference mmha does the same in registers).
- Prefill: grid (B, H_q, ceil(S/bq)); K/V for the head are VMEM-resident
  (S <= ~2k: 512 KB bf16), each program computes one q-row block against
  the full K/V with the causal+length mask. Simpler than streaming flash
  and already removes the [S,S] HBM materialization XLA would do; a
  streaming variant is the long-context extension.
- Stacked layer variants take the whole [L, ...] cache + a scalar-prefetch
  layer index, so the model's scan never slices the cache into a copy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def _decode_kernel(lyr_ref, lens_ref, scale_ref, q_ref, k_ref, v_ref, o_ref,
                   *, sm_scale, kv_int8):
    b = pl.program_id(0)
    lens = lens_ref[b]
    q = q_ref[0, 0].astype(jnp.float32)                 # [r, D]
    k = k_ref[0, 0, 0]                                  # [S, D] int8|bf16
    v = v_ref[0, 0, 0]
    if kv_int8:
        kv_scale = scale_ref[lyr_ref[0]]
        k = k.astype(jnp.float32) * kv_scale
        v = v.astype(jnp.float32) * kv_scale
    else:
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
    s = k.shape[0]
    # scores [S, r] = K @ q^T
    scores = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    mask = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0) < lens
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=0, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=0, keepdims=True)
    # out [r, D] = P^T @ V  (contract S)
    out = jax.lax.dot_general(
        p, v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = (out / denom.reshape(-1, 1)).astype(o_ref.dtype)


def decode_attention_kernel(q, k_cache, v_cache, kv_scale, layer, cache_lens,
                            sm_scale=None, interpret=False):
    """q: [B, H_q, D]; k/v_cache: [L, B, H_kv, S, D]; layer: int32 scalar;
    cache_lens: [B] int32. Returns [B, H_q, D] in q.dtype."""
    b, hq, d = q.shape
    l, _, hkv, s, _ = k_cache.shape
    r = hq // hkv
    sm_scale = sm_scale if sm_scale is not None else d ** -0.5
    kv_int8 = k_cache.dtype == jnp.int8

    qg = q.reshape(b, hkv, r, d)
    scale_arr = jnp.asarray(kv_scale, jnp.float32).reshape(l)

    def _sel(sref):
        return sref[0] if getattr(sref, "ndim", 0) else sref

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # layer idx, cache_lens, kv scales
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, r, d),
                         lambda i, h, lyr, lens, sc: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, d),
                         lambda i, h, lyr, lens, sc: (_sel(lyr), i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, s, d),
                         lambda i, h, lyr, lens, sc: (_sel(lyr), i, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, r, d),
                               lambda i, h, lyr, lens, sc: (i, h, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_decode_kernel, sm_scale=sm_scale,
                               kv_int8=kv_int8)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, r, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * d,
            bytes_accessed=int(2 * b * hkv * s * d
                               * (1 if kv_int8 else 2)),
            transcendentals=b * hq * s),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(cache_lens, jnp.int32), scale_arr, qg, k_cache, v_cache)
    return out.reshape(b, hq, d)


# ---------------------------------------------------------------------------
# Fused decode: KV write + attention in one kernel, cache aliased in place.
#
# This is the exact structure of the reference's generation path — mmha
# writes the new token's K/V into the cache and attends in the same kernel
# (decoderMaskedMultiheadAttentionTemplate.h:1503: *reinterpret_cast store
# then the dot loop). Fusing matters on TPU for a different reason: if the
# cache were scatter-updated by XLA and *then* passed to a pallas call
# inside the layer scan, XLA materializes a copy of the whole stacked cache
# per layer (~GBs/token). With input_output_aliases the kernel updates the
# carry buffer in place.
# ---------------------------------------------------------------------------

def _fused_decode_kernel(lyr_ref, lens_ref, scale_ref, q_ref, kn_ref, vn_ref,
                         k_ref, v_ref, o_ref, *, sm_scale, kv_int8, s_max):
    b = pl.program_id(0)
    pos = lens_ref[b]                                  # write position
    if kv_int8:
        kv_scale = scale_ref[lyr_ref[0]]
        inv = 1.0 / kv_scale
        k_new = jnp.clip(jnp.round(kn_ref[0, 0].astype(jnp.float32) * inv),
                         -127, 127).astype(jnp.int8)   # [1(r?), D] rows
        v_new = jnp.clip(jnp.round(vn_ref[0, 0].astype(jnp.float32) * inv),
                         -127, 127).astype(jnp.int8)
    else:
        k_new = kn_ref[0, 0].astype(k_ref.dtype)
        v_new = vn_ref[0, 0].astype(v_ref.dtype)
    # Write the token's K/V row at pos. Mosaic cannot prove alignment of a
    # single dynamic row, so read-modify-write the aligned 8-row window
    # (the sublane tile) around pos with a select mask.
    base = pl.multiple_of((pos // 8) * 8, 8)
    off = pos - base
    sel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == off
    kw = jnp.where(sel, k_new, k_ref[0, 0, 0, pl.ds(base, 8), :])
    vw = jnp.where(sel, v_new, v_ref[0, 0, 0, pl.ds(base, 8), :])
    k_ref[0, 0, 0, pl.ds(base, 8), :] = kw
    v_ref[0, 0, 0, pl.ds(base, 8), :] = vw

    q = q_ref[0, 0].astype(jnp.float32)                # [r, D]
    k = k_ref[0, 0, 0]
    v = v_ref[0, 0, 0]
    if kv_int8:
        k = k.astype(jnp.float32) * kv_scale
        v = v.astype(jnp.float32) * kv_scale
    else:
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
    scores = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale  # [S, r]
    mask = jax.lax.broadcasted_iota(jnp.int32, (s_max, 1), 0) <= pos
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=0, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=0, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = (out / denom.reshape(-1, 1)).astype(o_ref.dtype)


def fused_decode_attention(q, k_new, v_new, k_cache, v_cache, kv_scale,
                           layer, positions, sm_scale=None, interpret=False):
    """One-token decode attention fused with the KV-cache write.

    q, k_new, v_new: [B, H_q|H_kv, D]; k/v_cache: [L, B, H_kv, S, D]
    (ALIASED — donated and updated in place); positions: [B] write index.
    Returns (out [B, H_q, D], k_cache, v_cache).
    """
    b, hq, d = q.shape
    l, _, hkv, s, _ = k_cache.shape
    r = hq // hkv
    sm_scale = sm_scale if sm_scale is not None else d ** -0.5
    kv_int8 = k_cache.dtype == jnp.int8

    qg = q.reshape(b, hkv, r, d)
    kn = k_new.reshape(b, hkv, 1, d)
    vn = v_new.reshape(b, hkv, 1, d)
    scale_arr = jnp.asarray(kv_scale, jnp.float32).reshape(l)

    def _sel(sref):
        return sref[0] if getattr(sref, "ndim", 0) else sref

    cache_spec = pl.BlockSpec(
        (1, 1, 1, s, d), lambda i, h, lyr, lens, sc: (_sel(lyr), i, h, 0, 0),
        memory_space=pltpu.VMEM)
    small = lambda: pl.BlockSpec(
        (1, 1, 1, d), lambda i, h, lyr, lens, sc: (i, h, 0, 0),
        memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, r, d),
                         lambda i, h, lyr, lens, sc: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            small(), small(),
            cache_spec, cache_spec,
        ],
        out_specs=[
            cache_spec, cache_spec,
            pl.BlockSpec((1, 1, r, d),
                         lambda i, h, lyr, lens, sc: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_fused_decode_kernel, sm_scale=sm_scale,
                               kv_int8=kv_int8, s_max=s)

    def wrapped(lyr_ref, lens_ref, scale_ref, q_ref, kn_ref, vn_ref,
                kc_in, vc_in, kc_out, vc_out, o_ref):
        # aliased: kc_in IS kc_out's buffer; write/read through the out refs
        kernel(lyr_ref, lens_ref, scale_ref, q_ref, kn_ref, vn_ref,
               kc_out, vc_out, o_ref)

    kc, vc, out = pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((b, hkv, r, d), q.dtype),
        ],
        input_output_aliases={6: 0, 7: 1},   # cache operands -> outputs
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * d,
            bytes_accessed=int(2 * b * hkv * s * d * (1 if kv_int8 else 2)),
            transcendentals=b * hq * s),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(positions, jnp.int32), scale_arr, qg, kn, vn,
      k_cache, v_cache)
    return out.reshape(b, hq, d), kc, vc


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------

def _prefill_kernel(lens_ref, alibi_ref, q_ref, k_ref, v_ref, o_ref,
                    *, sm_scale, bq):
    b = pl.program_id(0)
    h = pl.program_id(1)
    iq = pl.program_id(2)
    lens = lens_ref[b]
    q = q_ref[0, 0].astype(jnp.float32)                 # [bq, D]
    k = k_ref[0, 0].astype(jnp.float32)                 # [S, D]
    v = v_ref[0, 0].astype(jnp.float32)
    s = k.shape[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale   # [bq, S]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 0) + iq * bq
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 1)
    # ALiBi: slope * key_pos (row-constant shift vs the (j-i) form cancels
    # in softmax); slope is 0 for non-ALiBi models.
    scores = scores + alibi_ref[h] * cols.astype(jnp.float32)
    mask = (cols <= rows) & (cols < lens)
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (out / denom).astype(o_ref.dtype)


def _packed_prefill_kernel(q_ref, k_ref, v_ref, segr_ref, segc_ref, o_ref,
                           *, sm_scale, bq, t):
    iq = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)                    # [bq, D]
    k = k_ref[0].astype(jnp.float32)                    # [T, D]
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale   # [bq, T]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 0) + iq * bq
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1)
    # segment ids arrive as two VMEM views ([bq,1] row block / [1,t] full):
    # Mosaic cannot vector-load from SMEM, so scalar-prefetch is out
    seg_rows = segr_ref[...]                            # [bq, 1]
    seg_cols = segc_ref[...]                            # [1, t]
    mask = (cols <= rows) & (seg_rows == seg_cols)
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-20)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = (out / denom).astype(o_ref.dtype)


def packed_prefill_attention_kernel(q, k, v, seg_ids, sm_scale=None,
                                    bq=256, interpret=False):
    """Packed causal attention (remove-padding). q: [T, H_q, D];
    k, v: [T, H_kv, D]; seg_ids: [T] int32 (-1 pad). Returns [T, H_q, D].

    Same VMEM-resident panel layout as the prefill kernel, with the
    sequence-boundary mask from scalar-prefetched segment ids instead of
    per-batch lengths (reference packed gpt_attention mode)."""
    t_in, hq, d = q.shape
    hkv = k.shape[1]
    r = hq // hkv
    sm_scale = sm_scale if sm_scale is not None else d ** -0.5
    pad_t = (-t_in) % 128 if t_in > 64 else (-t_in) % 8
    if pad_t:
        pad = ((0, pad_t), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        seg_ids = jnp.pad(seg_ids, (0, pad_t), constant_values=-1)
    t = t_in + pad_t
    bq = min(bq, t)
    if t % bq:
        bq = next(c for c in (128, 64, 32, 16, 8, 1) if t % c == 0)

    qt = jnp.swapaxes(q, 0, 1)                  # [Hq, T, D]
    kt = jnp.swapaxes(k, 0, 1)                  # [Hkv, T, D]
    vt = jnp.swapaxes(v, 0, 1)
    seg = jnp.asarray(seg_ids, jnp.int32)
    seg_rows = seg.reshape(t, 1)                # column vector: [bq,1] blocks
    seg_cols = seg.reshape(1, t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(hq, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, j: (h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda h, j: (h // r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda h, j: (h // r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda h, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda h, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, j: (h, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_packed_prefill_kernel, sm_scale=sm_scale,
                          bq=bq, t=t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((hq, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * hq * t * t * d,
            bytes_accessed=int(t * d * (hq + 2 * hkv) * 2),
            transcendentals=hq * t * t),
        interpret=interpret,
    )(qt, kt, vt, seg_rows, seg_cols)
    out = jnp.swapaxes(out, 0, 1)
    return out[:t_in] if pad_t else out


def _streaming_prefill_kernel(lens_ref, alibi_ref, q_ref, k_ref, v_ref,
                              o_ref, acc_ref, m_ref, l_ref,
                              *, sm_scale, bq, bk, nk):
    b = pl.program_id(0)
    h = pl.program_id(1)
    iq = pl.program_id(2)
    jk = pl.program_id(3)
    lens = lens_ref[b]

    @pl.when(jk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Causal + length skip: a KV block whose first column is past this q
    # block's last row (or past the sequence length) contributes nothing.
    # The pipeline still streams the block through VMEM; only compute is
    # skipped (same trade the reference FMHA makes for its masked tiles).
    row_end = (iq + 1) * bq - 1
    col0 = jk * bk

    @pl.when((col0 <= row_end) & (col0 < lens))
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)              # [bq, D]
        k = k_ref[0, 0].astype(jnp.float32)              # [bk, D]
        v = v_ref[0, 0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale   # [bq, bk]
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + iq * bq
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + col0
        scores = scores + alibi_ref[h] * cols.astype(jnp.float32)
        mask = (cols <= rows) & (cols < lens)
        scores = jnp.where(mask, scores, NEG_INF)

        m_prev = m_ref[:, :1]                             # [bq, 1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[...] = jnp.broadcast_to(alpha * l_prev
                                      + jnp.sum(p, axis=1, keepdims=True),
                                      l_ref.shape)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(jk == nk - 1)
    def _finish():
        denom = jnp.maximum(l_ref[:, :1], 1e-20)          # all-masked pad rows
        o_ref[0, 0] = (acc_ref[...] / denom).astype(o_ref.dtype)


def streaming_prefill_attention_kernel(q, k, v, seq_lens=None, sm_scale=None,
                                       bq=256, bk=512, interpret=False,
                                       alibi=None):
    """Flash-style causal attention streaming K/V blocks through VMEM.

    Same contract as `prefill_attention_kernel` (q: [B, S, H_q, D]; k, v:
    [B, S, H_kv, D]) but VMEM use is O(bq·bk), independent of S — this is
    the long-context prefill path (the VMEM-resident kernel caps at S≈2k on
    v5e). Online-softmax accumulation in fp32 scratch across the innermost
    KV-block grid axis; fully-masked blocks skip compute (causal + length).
    Reference analogue: the S-tiled FMHA cubins (contextFusedMultiHead
    Attention) vs their unfused BMM fallback."""
    b, s_in, hq, d = q.shape
    hkv = k.shape[2]
    r = hq // hkv
    sm_scale = sm_scale if sm_scale is not None else d ** -0.5
    if seq_lens is None:
        seq_lens = jnp.full((b,), s_in, jnp.int32)
    if alibi is None:
        alibi = jnp.zeros((hq,), jnp.float32)
    pad_s = (-s_in) % bk
    if pad_s:
        pad = ((0, 0), (0, pad_s), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    s = s_in + pad_s
    bq = min(bq, s)

    qt = jnp.swapaxes(q, 1, 2)                  # [B, Hq, S, D]
    kt = jnp.swapaxes(k, 1, 2)                  # [B, Hkv, S, D]
    vt = jnp.swapaxes(v, 1, 2)
    nk = s // bk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                  # seq_lens, alibi slopes
        grid=(b, hq, s // bq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d),
                         lambda i, h, j, kk, *_: (i, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d),
                         lambda i, h, j, kk, *_: (i, h // r, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d),
                         lambda i, h, j, kk, *_: (i, h // r, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda i, h, j, kk, *_: (i, h, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),    # output accumulator
            pltpu.VMEM((bq, 128), jnp.float32),  # running max
            pltpu.VMEM((bq, 128), jnp.float32),  # running denom
        ],
    )
    out = pl.pallas_call(
        functools.partial(_streaming_prefill_kernel, sm_scale=sm_scale,
                          bq=bq, bk=bk, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * s * d,
            bytes_accessed=int(b * s * d * (hq + 2 * hkv * (s // bq)) * 2),
            transcendentals=b * hq * s * s),
        interpret=interpret,
    )(jnp.asarray(seq_lens, jnp.int32), jnp.asarray(alibi, jnp.float32),
      qt, kt, vt)
    out = jnp.swapaxes(out, 1, 2)
    return out[:, :s_in] if pad_s else out


def prefill_attention_kernel(q, k, v, seq_lens=None, sm_scale=None,
                             bq=256, interpret=False, alibi=None):
    """Causal self-attention. q: [B, S, H_q, D]; k, v: [B, S, H_kv, D];
    seq_lens: [B] (None => all S); alibi: optional [H_q] slopes.
    Returns [B, S, H_q, D]."""
    b, s_in, hq, d = q.shape
    hkv = k.shape[2]
    r = hq // hkv
    sm_scale = sm_scale if sm_scale is not None else d ** -0.5
    if seq_lens is None:
        seq_lens = jnp.full((b,), s_in, jnp.int32)
    if alibi is None:
        alibi = jnp.zeros((hq,), jnp.float32)
    # pad S to a tileable multiple; padded keys are masked by the length
    # mask (cols < lens), padded query rows are sliced off below
    pad_s = (-s_in) % 128 if s_in > 64 else (-s_in) % 8
    if pad_s:
        pad = ((0, 0), (0, pad_s), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    s = s_in + pad_s
    bq = min(bq, s)
    if s % bq:
        bq = next(c for c in (128, 64, 32, 16, 8, 1) if s % c == 0)

    qt = jnp.swapaxes(q, 1, 2)                  # [B, Hq, S, D]
    kt = jnp.swapaxes(k, 1, 2)                  # [B, Hkv, S, D]
    vt = jnp.swapaxes(v, 1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                  # seq_lens, alibi slopes
        grid=(b, hq, s // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d),
                         lambda i, h, j, *_: (i, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d),
                         lambda i, h, j, *_: (i, h // r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, d),
                         lambda i, h, j, *_: (i, h // r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda i, h, j, *_: (i, h, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_prefill_kernel, sm_scale=sm_scale, bq=bq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s * s * d,
            bytes_accessed=int(b * s * d * (hq + 2 * hkv) * 2),
            transcendentals=b * hq * s * s),
        interpret=interpret,
    )(jnp.asarray(seq_lens, jnp.int32), jnp.asarray(alibi, jnp.float32),
      qt, kt, vt)
    out = jnp.swapaxes(out, 1, 2)
    return out[:, :s_in] if pad_s else out
