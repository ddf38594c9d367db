"""Attention ops: prefill (context) and decode (generation) phases.

TPU-native replacement for the reference's gptAttentionPlugin stack:
- context phase: FMHA cubins / BMM+masked-softmax (gptAttentionCommon.cpp:500-575)
- generation phase: fused masked-MHA kernel with inline INT8 KV dequant
  (decoderMaskedMultiheadAttentionTemplate.h:1336-1650)
- KV-cache write with INT8 quantization (invokeTranspose4dBatchMajor,
  gptAttentionCommon.cpp:488-494)

This module holds the jnp reference implementations (used on CPU, in tests,
and as the autodiff-able fallback); `ops/pallas/attention.py` provides the
fused TPU kernels that replace them on the hot path. Softmax accumulates in
fp32 as the reference does (layers/attention.py:331-343).

KV cache layout: [B, H_kv, S_max, D] per layer (stacked [L, ...] in the
model), chosen so the decode kernel's KV reads are contiguous (S, D) tiles.
INT8 KV mode stores int8 values plus one static calibrated scale per layer
(reference int8_kv_cache per-tensor scaling, gptAttentionCommon enqueue).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # mask value; fp32 softmax makes this safe


class KVCache(NamedTuple):
    """Single-layer KV cache. k/v: [B, H_kv, S_max, D] (int8 or compute dtype).

    scale: f32 scalar — static dequant scale when dtype is int8, 1.0 otherwise.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    scale: jnp.ndarray


def make_kv_cache(batch: int, n_kv: int, max_len: int, head_dim: int,
                  dtype=jnp.bfloat16, kv_scale: Optional[jnp.ndarray] = None
                  ) -> KVCache:
    shape = (batch, n_kv, max_len, head_dim)
    scale = jnp.asarray(kv_scale if kv_scale is not None else 1.0, jnp.float32)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), scale)


def _quant_kv(x, cache: KVCache):
    if cache.k.dtype == jnp.int8:
        q = jnp.round(x.astype(jnp.float32) / cache.scale)
        return jnp.clip(q, -127, 127).astype(jnp.int8)
    if cache.k.dtype == jnp.uint8:        # fp8 (e4m3 bit-codes, ops/fp8.py)
        from .fp8 import fp8_encode
        return fp8_encode(x.astype(jnp.float32) / cache.scale)
    return x.astype(cache.k.dtype)


def _dequant_kv(x, cache: KVCache, dtype):
    if cache.k.dtype == jnp.int8:
        return (x.astype(jnp.float32) * cache.scale).astype(dtype)
    if cache.k.dtype == jnp.uint8:
        from .fp8 import fp8_decode
        return (fp8_decode(x) * cache.scale).astype(dtype)
    return x.astype(dtype)


def write_kv_prefill(cache: KVCache, k, v) -> KVCache:
    """Write [B, S, H_kv, D] k/v at positions [0, S) (context phase)."""
    k = jnp.swapaxes(k, 1, 2)       # -> [B, H, S, D]
    v = jnp.swapaxes(v, 1, 2)
    kc = jax.lax.dynamic_update_slice(cache.k, _quant_kv(k, cache), (0, 0, 0, 0))
    vc = jax.lax.dynamic_update_slice(cache.v, _quant_kv(v, cache), (0, 0, 0, 0))
    return KVCache(kc, vc, cache.scale)


def write_kv_decode(cache: KVCache, k, v, positions) -> KVCache:
    """Write one token per sequence: k/v [B, H_kv, D] at positions [B]."""
    b = k.shape[0]
    bidx = jnp.arange(b)
    kc = cache.k.at[bidx, :, positions, :].set(_quant_kv(k, cache))
    vc = cache.v.at[bidx, :, positions, :].set(_quant_kv(v, cache))
    return KVCache(kc, vc, cache.scale)


# ---------------------------------------------------------------------------
# Stacked-cache (all layers, [L, B, H_kv, S, D]) variants. Used by the
# index-scan model loop: the cache lives in the scan *carry* and each layer
# updates its slice in place (XLA keeps dynamic-update-slice of a loop carry
# buffer in place — no per-layer copy, unlike scanning the cache as xs/ys).
# ---------------------------------------------------------------------------

def _layer_cache(cache: KVCache, layer) -> KVCache:
    return KVCache(
        jax.lax.dynamic_index_in_dim(cache.k, layer, 0, keepdims=False),
        jax.lax.dynamic_index_in_dim(cache.v, layer, 0, keepdims=False),
        jax.lax.dynamic_index_in_dim(cache.scale, layer, 0, keepdims=False)
        if cache.scale.ndim else cache.scale)


def write_kv_prefill_at(cache: KVCache, layer, k, v) -> KVCache:
    """Stacked cache: write [B, S, H_kv, D] into layer `layer` at [0, S)."""
    lc = _layer_cache(cache, layer)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    zero = (layer, 0, 0, 0, 0)
    kc = jax.lax.dynamic_update_slice(cache.k, _quant_kv(k, lc)[None], zero)
    vc = jax.lax.dynamic_update_slice(cache.v, _quant_kv(v, lc)[None], zero)
    return KVCache(kc, vc, cache.scale)


def write_kv_decode_at(cache: KVCache, layer, k, v, positions) -> KVCache:
    """Stacked cache: write one token per sequence into layer `layer`."""
    lc = _layer_cache(cache, layer)
    b = k.shape[0]
    bidx = jnp.arange(b)
    kc = cache.k.at[layer, bidx, :, positions, :].set(_quant_kv(k, lc))
    vc = cache.v.at[layer, bidx, :, positions, :].set(_quant_kv(v, lc))
    return KVCache(kc, vc, cache.scale)


class PackedMeta(NamedTuple):
    """Remove-padding prefill metadata (reference RaggedTensor /
    remove_input_padding). All [T]: seg_ids (-1 pad), slot_tok (cache row
    per token; pads -> trash slot), pos_tok (position within own seq)."""

    seg_ids: jnp.ndarray
    slot_tok: jnp.ndarray
    pos_tok: jnp.ndarray


def write_kv_packed_at(cache: KVCache, layer, k, v, slot_tok,
                       pos_tok) -> KVCache:
    """Stacked cache: scatter packed rows. k/v: [T, H_kv, D]; token t goes
    to (layer, slot_tok[t], :, pos_tok[t]). Pad tokens must point at a
    trash slot row."""
    lc = _layer_cache(cache, layer)
    kc = cache.k.at[layer, slot_tok, :, pos_tok, :].set(_quant_kv(k, lc))
    vc = cache.v.at[layer, slot_tok, :, pos_tok, :].set(_quant_kv(v, lc))
    return KVCache(kc, vc, cache.scale)


def write_kv_extend_at(cache: KVCache, layer, k, v, start) -> KVCache:
    """Stacked cache: write a T-token slab per sequence at offset positions.

    k/v: [B, T, H_kv, D]; row (b, i) lands at position start[b] + i. The
    multi-token generalization of write_kv_decode_at, used by speculative
    verification (process γ+1 tokens in one target forward)."""
    lc = _layer_cache(cache, layer)
    b, t = k.shape[:2]
    pos = (start[:, None] + jnp.arange(t)[None]).astype(jnp.int32)   # [B, T]
    bidx = jnp.arange(b)[:, None]
    kc = cache.k.at[layer, bidx, :, pos, :].set(_quant_kv(k, lc))
    vc = cache.v.at[layer, bidx, :, pos, :].set(_quant_kv(v, lc))
    return KVCache(kc, vc, cache.scale)


def extend_attention_at(q, cache: KVCache, layer, start, k_new=None,
                        v_new=None, scale: Optional[float] = None,
                        alibi: Optional[jnp.ndarray] = None):
    """Causal attention for a T-token slab against layer `layer`.

    q: [B, T, H_q, D]; row (b, i) sits at position start[b] + i and may
    attend cache positions <= start[b] + i. alibi: optional [H_q] slopes
    (key-position bias form — row-constant shifts cancel in softmax).
    Returns [B, T, H_q, D].

    With k_new/v_new ([B, T, H_kv, D], rope applied) the cache is the
    PRE-write buffer: rows strictly below start[b] come from the cache and
    the T in-flight tokens attend each other from registers; the caller
    scatters the slab with write_kv_extend_at AFTER this call. Attending
    before writing breaks the read-after-traced-write hazard on the
    scan-carried cache that otherwise forces XLA to copy it every layer
    (measured: +2.6 ms per 32-layer 7B extend, scripts/probe_extend_parts
    .py). Without k_new the slab must already be written (legacy order).

    This is the target-model verification step of speculative decoding: one
    forward over [last_committed, draft_1..draft_γ] replaces γ+1 sequential
    decode dispatches. XLA path (T is tiny — γ+1 rows; the einsum lands on
    the MXU like the decode path)."""
    lc = _layer_cache(cache, layer)
    b, t, hq, d = q.shape
    hkv = lc.k.shape[1]
    s_max = lc.k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    kt = _gqa_repeat(_dequant_kv(lc.k, lc, q.dtype), hq // hkv)  # [B,Hq,S,D]
    vt = _gqa_repeat(_dequant_kv(lc.v, lc, q.dtype), hq // hkv)
    logits = jnp.einsum("bthd,bhsd->bhts", q, kt,
                        preferred_element_type=jnp.float32) * scale
    rows = start[:, None] + jnp.arange(t)[None]                  # [B, T]
    cols = jnp.arange(s_max)
    if alibi is not None:
        logits = logits + (alibi.reshape(1, hq, 1, 1)
                           * cols.reshape(1, 1, 1, s_max))
    if k_new is None:
        mask = cols[None, None] <= rows[:, :, None]              # [B, T, S]
        logits = jnp.where(mask[:, None], logits, NEG_INF)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhts,bhsd->bthd", probs.astype(q.dtype), vt,
                         preferred_element_type=jnp.float32)
        return out.astype(q.dtype)
    # combined pre-write path: cache columns valid strictly below start[b].
    # The in-flight slab is round-tripped through the cache codec
    # (_quant_kv/_dequant_kv) so verify-step logits are BIT-consistent with
    # the decode logits that will read the same positions post-commit —
    # attending the slab at full precision could flip greedy acceptance at
    # rare argmax-tie boundaries under int8/fp8 KV.
    mask_old = cols[None, None, None] < start[:, None, None, None]
    logits = jnp.where(mask_old, logits, NEG_INF)
    kn = _gqa_repeat(_dequant_kv(_quant_kv(jnp.swapaxes(k_new, 1, 2), lc),
                                 lc, q.dtype), hq // hkv)
    vn = _gqa_repeat(_dequant_kv(_quant_kv(jnp.swapaxes(v_new, 1, 2), lc),
                                 lc, q.dtype), hq // hkv)
    logits_n = jnp.einsum("bthd,bhud->bhtu", q, kn,
                          preferred_element_type=jnp.float32) * scale
    if alibi is not None:
        # in-flight token u sits at key position start[b] + u
        pos_n = start[:, None] + jnp.arange(t)[None]             # [B, T]
        logits_n = logits_n + (alibi.reshape(1, hq, 1, 1)
                               * pos_n[:, None, None, :])
    causal = jnp.arange(t)[:, None] >= jnp.arange(t)[None]      # [T, T]
    logits_n = jnp.where(causal[None, None], logits_n, NEG_INF)
    joint = jnp.concatenate([logits, logits_n], axis=-1)        # [B,H,T,S+T]
    probs = jax.nn.softmax(joint.astype(jnp.float32), axis=-1)
    p_old, p_new = probs[..., :s_max], probs[..., s_max:]
    out = (jnp.einsum("bhts,bhsd->bthd", p_old.astype(q.dtype), vt,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhtu,bhud->bthd", p_new.astype(q.dtype), vn,
                        preferred_element_type=jnp.float32))
    return out.astype(q.dtype)


def fused_decode_attention_at(q, k_new, v_new, cache: KVCache, layer,
                              positions, scale: Optional[float] = None,
                              alibi: Optional[jnp.ndarray] = None):
    """Decode step for layer `layer`: write k/v_new [B, H_kv, D] at
    `positions` and attend. Returns (attn_out [B, H_q, D], cache).

    Dispatches to the fused Pallas kernel (in-place aliased cache update —
    reference mmha semantics); jnp fallback = scatter write + attention.
    `alibi` ([H_q] slopes) forces the XLA path — the decode kernels don't
    carry the bias (reference mmha takes linear_bias_slopes the same way,
    decoderMaskedMultiheadAttention.h).
    """
    from .registry import KERNELS, kernel
    mode = KERNELS.get("decode_attn_mode", "auto")
    if mode == "auto":
        # length-based dispatch (the decode twin of prefill_streaming_min_s):
        # XLA's fused decode loop reads the full compiled S_max every step;
        # the DMA kernel streams only pos//chunk+1 live chunks, so past the
        # measured crossover it wins however short the live sequence is.
        smax = cache.k.shape[3]
        mode = ("dma" if smax >= KERNELS.get("decode_dma_min_s", 4096)
                else "xla")
    if cache.k.dtype == jnp.uint8:
        # fp8-KV: the pallas decode kernels only speak bf16/int8 caches;
        # the XLA path dequantizes via the fp8 codec.
        mode = "xla"
    if alibi is not None:
        cache = write_kv_decode_at(cache, layer, k_new, v_new, positions)
        out = decode_attention(q, _layer_cache(cache, layer), positions + 1,
                               scale, alibi=alibi)
        return out, cache
    if mode == "dma" and kernel("dma_decode_attention") is not None:
        k_fn = kernel("dma_decode_attention")
        out, kc, vc = k_fn(q, k_new, v_new, cache.k, cache.v, cache.scale,
                           layer, positions, sm_scale=scale)
        return out, KVCache(kc, vc, cache.scale)
    if mode == "fused" and kernel("fused_decode_attention") is not None:
        k_fn = kernel("fused_decode_attention")
        out, kc, vc = k_fn(q, k_new, v_new, cache.k, cache.v, cache.scale,
                           layer, positions, sm_scale=scale)
        return out, KVCache(kc, vc, cache.scale)
    cache = write_kv_decode_at(cache, layer, k_new, v_new, positions)
    if mode == "split" and kernel("decode_attention") is not None:
        out = kernel("decode_attention")(
            q, cache.k, cache.v, cache.scale, layer, positions + 1,
            sm_scale=scale)
        return out, cache
    out = decode_attention(q, _layer_cache(cache, layer), positions + 1,
                           scale)
    return out, cache


def decode_attention_at(q, cache: KVCache, layer, cache_lens,
                        scale: Optional[float] = None):
    """Single-token attention against layer `layer` of a stacked cache.

    Dispatches to the Pallas decode kernel (MMHA equivalent, inline int8-KV
    dequant, no cache-slice materialization) when kernels are enabled.
    """
    from .registry import KERNELS, kernel
    k_fn = kernel("decode_attention")
    if (k_fn is not None and cache.k.dtype != jnp.uint8
            and KERNELS.get("decode_attn_mode", "xla") in ("split", "fused",
                                                           "dma")):
        # honor the registry's measured default ('xla') like the fused
        # dispatch does — the read-only kernel only runs when a Pallas
        # decode mode is explicitly selected
        return k_fn(q, cache.k, cache.v, cache.scale, layer, cache_lens,
                    sm_scale=scale)
    return decode_attention(q, _layer_cache(cache, layer), cache_lens, scale)


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """Per-head ALiBi slopes (reference generate_alibi_slopes,
    functional.py:3222-3256; Press et al.): m_i = 2^(-8(i+1)/n) for
    power-of-two head counts, with the standard closest-power-of-two
    interpolation otherwise. Returns [n_heads] f32."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        out = pow2_slopes(n_heads)
    else:
        base = 2 ** math.floor(math.log2(n_heads))
        out = pow2_slopes(base)
        extra = pow2_slopes(2 * base)
        out += extra[0::2][: n_heads - base]
    return jnp.asarray(out, jnp.float32)


def _gqa_repeat(x, n_rep: int):
    """[B, H_kv, ...] -> [B, H_kv * n_rep, ...] by head repetition."""
    if n_rep == 1:
        return x
    b, h = x.shape[:2]
    x = jnp.broadcast_to(x[:, :, None], (b, h, n_rep) + x.shape[2:])
    return x.reshape(b, h * n_rep, *x.shape[3:])


def prefill_attention(q, k, v, seq_lens=None, scale: Optional[float] = None,
                      alibi: Optional[jnp.ndarray] = None,
                      causal: bool = True):
    """Causal self-attention over a full prompt.

    q: [B, S, H_q, D]; k, v: [B, S, H_kv, D]; seq_lens: optional [B] true
    lengths (positions >= len are masked out as keys). `alibi`: optional
    [H_q] slopes — adds slope*key_pos to the scores (row-constant shifts
    cancel in softmax, so key-position-only bias == the (j-i) formulation;
    reference ALiBi branch layers/attention.py:325-328). `causal=False`
    gives the encoder (BERT, reference bertAttentionPlugin) variant:
    bidirectional with only the length mask. Returns [B, S, H_q, D].
    Dispatches to the Pallas prefill kernel (FMHA-cubin equivalent) when
    kernels are enabled and shapes are TPU-tileable.
    """
    from .registry import KERNELS, kernel
    # Long prompts stream K/V blocks (flash-style online softmax) — the
    # VMEM-resident kernel's full [S, D] panels + [bq, S] scores stop
    # fitting VMEM past S≈2k.
    min_s = KERNELS.get("prefill_streaming_min_s")
    min_s = 2048 if min_s is None else min_s   # 0 legitimately forces it
    name = ("streaming_prefill_attention" if q.shape[1] > min_s
            else "prefill_attention")
    k_fn = kernel(name)
    if k_fn is not None and q.shape[-1] % 128 == 0 and causal:
        return k_fn(q, k, v, seq_lens, sm_scale=scale, alibi=alibi)
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    qt = jnp.swapaxes(q, 1, 2)                                   # [B,Hq,S,D]
    kt = _gqa_repeat(jnp.swapaxes(k, 1, 2), hq // hkv)           # [B,Hq,S,D]
    vt = _gqa_repeat(jnp.swapaxes(v, 1, 2), hq // hkv)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qt, kt,
                        preferred_element_type=jnp.float32) * scale
    rows = jnp.arange(s)[:, None]
    cols = jnp.arange(s)[None, :]
    if alibi is not None:
        logits = logits + (alibi.reshape(1, hq, 1, 1)
                           * cols.reshape(1, 1, 1, s))
    mask = (cols <= rows if causal
            else jnp.ones((s, s), bool))                         # causal/enc
    if seq_lens is not None:
        mask = mask & (cols[None] < seq_lens[:, None, None])
        mask = mask[:, None]                                     # [B,1,S,S]
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), vt,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return jnp.swapaxes(out, 1, 2)                               # [B,S,Hq,D]


def packed_prefill_attention(q, k, v, seg_ids, scale: Optional[float] = None):
    """Packed (remove-padding) causal attention over concatenated sequences.

    The reference's RaggedTensor / remove_input_padding path
    (functional.py:351, plugin/plugin.py:75, docs/gpt_attention.md packed
    mode): mixed-length prompts are flattened to one [T] token stream; a
    position may attend position j iff both share a segment id and j <= i
    (sequences are contiguous, so global causal == within-sequence causal).

    q: [T, H_q, D]; k, v: [T, H_kv, D]; seg_ids: [T] int32 (pad rows -1).
    Returns [T, H_q, D] (pad rows undefined). Dispatches to the Pallas
    packed kernel when enabled.
    """
    from .registry import kernel
    k_fn = kernel("packed_prefill_attention")
    if k_fn is not None and q.shape[-1] % 128 == 0:
        return k_fn(q, k, v, seg_ids, sm_scale=scale)
    t, hq, d = q.shape
    hkv = k.shape[1]
    scale = scale if scale is not None else d ** -0.5
    kt = _gqa_repeat(jnp.swapaxes(k, 0, 1)[None], hq // hkv)[0]   # [Hq,T,D]
    vt = _gqa_repeat(jnp.swapaxes(v, 0, 1)[None], hq // hkv)[0]
    qt = jnp.swapaxes(q, 0, 1)                                    # [Hq,T,D]
    logits = jnp.einsum("htd,hsd->hts", qt, kt,
                        preferred_element_type=jnp.float32) * scale
    rows = jnp.arange(t)[:, None]
    cols = jnp.arange(t)[None, :]
    mask = (cols <= rows) & (seg_ids[:, None] == seg_ids[None, :])
    logits = jnp.where(mask[None], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("hts,hsd->htd", probs.astype(q.dtype), vt,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return jnp.swapaxes(out, 0, 1)                                # [T,Hq,D]


def decode_attention(q, cache: KVCache, cache_lens,
                     scale: Optional[float] = None,
                     alibi: Optional[jnp.ndarray] = None):
    """Single-token attention against the KV cache.

    q: [B, H_q, D]; cache_lens: [B] number of valid cache positions (the new
    token's K/V must already be written, so valid = positions < cache_lens).
    alibi: optional [H_q] slopes (slope * key_pos bias). Returns [B, H_q, D].
    """
    b, hq, d = q.shape
    hkv = cache.k.shape[1]
    s_max = cache.k.shape[2]
    scale = scale if scale is not None else d ** -0.5
    kt = _gqa_repeat(_dequant_kv(cache.k, cache, q.dtype), hq // hkv)
    vt = _gqa_repeat(_dequant_kv(cache.v, cache, q.dtype), hq // hkv)
    logits = jnp.einsum("bhd,bhkd->bhk", q, kt,
                        preferred_element_type=jnp.float32) * scale
    if alibi is not None:
        logits = logits + (alibi.reshape(1, hq, 1)
                           * jnp.arange(s_max).reshape(1, 1, s_max))
    mask = jnp.arange(s_max)[None, :] < cache_lens[:, None]      # [B, S]
    logits = jnp.where(mask[:, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhk,bhkd->bhd", probs.astype(q.dtype), vt,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
