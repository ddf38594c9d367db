"""Paged KV cache on device: block pool + block-table addressed attention.

Device half of the paged-KV design (host half: runtime/kv_cache_manager.py).
The reference's equivalent is KVBlockArray + the paged branches of its
attention kernels (kvCacheUtils.h:114, gptAttentionCommon paged enqueue):
per-block device pointers chased inside the kernel. TPU kernels address by
index, so the cache is one pool array per layer stack

    pool_k/pool_v: [L, n_blocks, H_kv, block_size, D]

and each sequence owns rows of a block-index table [B, max_blocks] (emitted
by KVCacheManager.block_table()). Correctness-first XLA implementation:
gathers/scatters on the pool (a fused-gather Pallas kernel is the follow-up,
pending the decode-kernel integration findings — see docs/kernels.md).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


class PagedKVCache(NamedTuple):
    """pool_k/pool_v: [L, NB, H, BS, D]; tables: [B, MB] int32 block indices
    (-1 pad); scale: [L] f32 (int8-KV dequant scales, ones otherwise)."""

    pool_k: jnp.ndarray
    pool_v: jnp.ndarray
    tables: jnp.ndarray
    scale: jnp.ndarray


def init_paged_caches(cfg, n_blocks: int, block_size: int, batch: int,
                      max_blocks_per_seq: int, kv_scales=None) -> PagedKVCache:
    # same dtype contract as the dense cache (cfg.kv_dtype): int8 and fp8
    # (e4m3 codes in uint8) pools are half/quarter the bf16 footprint
    from ..config import str_dtype_to_jnp
    kv_dtype = str_dtype_to_jnp(cfg.kv_dtype)
    shape = (cfg.num_layers, n_blocks, cfg.num_kv_heads, block_size,
             cfg.head_dim)
    if kv_scales is None:
        kv_scales = jnp.ones((cfg.num_layers,), jnp.float32)
    return PagedKVCache(
        jnp.zeros(shape, kv_dtype), jnp.zeros(shape, kv_dtype),
        jnp.full((batch, max_blocks_per_seq), -1, jnp.int32),
        jnp.asarray(kv_scales, jnp.float32))


def _quant(x, cache: PagedKVCache, layer):
    if cache.pool_k.dtype == jnp.int8:
        s = cache.scale[layer]
        return jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                        -127, 127).astype(jnp.int8)
    if cache.pool_k.dtype == jnp.uint8:     # fp8 e4m3 codes (ops/fp8.py)
        from .fp8 import fp8_encode
        return fp8_encode(x.astype(jnp.float32) / cache.scale[layer])
    return x.astype(cache.pool_k.dtype)


def _dequant(x, cache: PagedKVCache, layer, dtype):
    if cache.pool_k.dtype == jnp.int8:
        return (x.astype(jnp.float32) * cache.scale[layer]).astype(dtype)
    if cache.pool_k.dtype == jnp.uint8:
        from .fp8 import fp8_decode
        return (fp8_decode(x) * cache.scale[layer]).astype(dtype)
    return x.astype(dtype)


def paged_write_prefill_at(cache: PagedKVCache, layer, k, v) -> PagedKVCache:
    """Scatter a prompt's K/V ([B, S, H, D], S <= MB*BS) into each
    sequence's blocks. Invalid table entries (-1) are redirected to the
    pool's LAST block, which is reserved as a trash block by convention
    (allocators hand out [0, nb-1); ServingEngine sizes the pool +1).
    A read-modify-write mask into a live block would race under XLA's
    undefined scatter ordering when duplicate indices appear."""
    l, nb, h, bs, d = cache.pool_k.shape
    b, s, _, _ = k.shape
    n_full = -(-s // bs)
    pad_s = n_full * bs - s
    if pad_s:
        k = jnp.pad(k, ((0, 0), (0, pad_s), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_s), (0, 0), (0, 0)))
    # [B, n_full, BS, H, D] -> [B, n_full, H, BS, D]
    kb = jnp.swapaxes(k.reshape(b, n_full, bs, h, d), 2, 3)
    vb = jnp.swapaxes(v.reshape(b, n_full, bs, h, d), 2, 3)
    tables = cache.tables[:, :n_full]                     # [B, n_full]
    valid = tables >= 0
    flat_idx = jnp.where(valid, tables, nb - 1).reshape(-1)  # [B*n_full]
    kb = _quant(kb.reshape(b * n_full, h, bs, d), cache, layer)
    vb = _quant(vb.reshape(b * n_full, h, bs, d), cache, layer)
    pk = cache.pool_k.at[layer, flat_idx].set(kb)
    pv = cache.pool_v.at[layer, flat_idx].set(vb)
    return cache._replace(pool_k=pk, pool_v=pv)


def paged_write_decode_at(cache: PagedKVCache, layer, k, v,
                          positions) -> PagedKVCache:
    """Write one token per sequence: k/v [B, H, D] at positions [B]."""
    nb, bs = cache.pool_k.shape[1], cache.pool_k.shape[3]
    mb = cache.tables.shape[1]
    blk_i = positions // bs
    # positions past the table (or unallocated -1 entries) go to the
    # reserved trash block — take_along_axis would otherwise CLAMP an
    # overflow onto the sequence's last live block and corrupt it (the
    # dense twin's OOB scatter writes are dropped; match that safety)
    in_range = blk_i < mb
    blk = jnp.take_along_axis(cache.tables,
                              jnp.clip(blk_i, 0, mb - 1)[:, None],
                              axis=1)[:, 0]
    blk = jnp.where((blk < 0) | ~in_range, nb - 1, blk)
    off = positions % bs
    pk = cache.pool_k.at[layer, blk, :, off, :].set(_quant(k, cache, layer))
    pv = cache.pool_v.at[layer, blk, :, off, :].set(_quant(v, cache, layer))
    return cache._replace(pool_k=pk, pool_v=pv)


def paged_fused_decode_attention_at(q, k_new, v_new, cache: PagedKVCache,
                                    layer, positions,
                                    scale: Optional[float] = None):
    """Decode step over the paged cache: write k/v_new [B, H_kv, D] at
    `positions` and attend over positions+1 tokens. Returns (out, cache).

    Dispatches to the fused Pallas kernel (in-kernel block-table chasing —
    only the valid blocks are touched, pools aliased in place); the XLA
    fallback scatters the write and materializes a dense gathered view
    (paged_decode_attention_at below).
    """
    from .registry import KERNELS, kernel
    k_fn = kernel("paged_decode_attention")
    nb, bs = cache.pool_k.shape[1], cache.pool_k.shape[3]
    w = 32 if cache.pool_k.dtype == jnp.int8 else 8
    if (k_fn is not None and bs % w == 0 and q.shape[-1] % 128 == 0
            and KERNELS.get("paged_attn_mode", "fused") == "fused"):
        tables = jnp.where(cache.tables < 0, nb - 1, cache.tables)
        out, pk, pv = k_fn(q, k_new, v_new, cache.pool_k, cache.pool_v,
                           cache.scale, tables, layer, positions,
                           sm_scale=scale)
        return out, cache._replace(pool_k=pk, pool_v=pv)
    cache = paged_write_decode_at(cache, layer, k_new, v_new, positions)
    return paged_decode_attention_at(q, cache, layer, positions + 1,
                                     scale), cache


def paged_decode_attention_at(q, cache: PagedKVCache, layer, cache_lens,
                              scale: Optional[float] = None):
    """Single-token attention over paged KV. q: [B, H_q, D]; cache_lens: [B]
    valid positions. Returns [B, H_q, D]."""
    l, nb, hkv, bs, d = cache.pool_k.shape
    b, hq, _ = q.shape
    mb = cache.tables.shape[1]
    sm = scale if scale is not None else d ** -0.5

    tables = jnp.maximum(cache.tables, 0)                 # [B, MB]
    # gather the sequence's blocks: [B, MB, H, BS, D]
    kg = cache.pool_k[layer][tables]
    vg = cache.pool_v[layer][tables]
    # -> [B, H, MB*BS, D]
    kg = jnp.swapaxes(kg, 2, 3).reshape(b, mb * bs, hkv, d)
    vg = jnp.swapaxes(vg, 2, 3).reshape(b, mb * bs, hkv, d)
    from .attention import _gqa_repeat
    kg = _gqa_repeat(jnp.swapaxes(_dequant(kg, cache, layer, q.dtype), 1, 2),
                     hq // hkv)
    vg = _gqa_repeat(jnp.swapaxes(_dequant(vg, cache, layer, q.dtype), 1, 2),
                     hq // hkv)
    logits = jnp.einsum("bhd,bhkd->bhk", q, kg,
                        preferred_element_type=jnp.float32) * sm
    mask = jnp.arange(mb * bs)[None, :] < cache_lens[:, None]
    logits = jnp.where(mask[:, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhk,bhkd->bhd", probs.astype(q.dtype), vg,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
