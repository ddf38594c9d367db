"""Fused paged decode attention: block-table addressing inside the kernel.

The Pallas half of the paged-KV design (reference KVBlockArray,
kvCacheUtils.h:114 + the paged branches of the mmha kernel): the XLA paged
path (ops/paged_attention.py) must materialize a dense gathered copy of
every sequence's blocks each step — O(pool) HBM traffic per layer per
token. This kernel chases the block table itself, so per step it touches
exactly

  - one W-row window of the write block (the new token's K/V, RMW), and
  - ceil((pos+1)/BS) valid blocks, streamed HBM->VMEM double-buffered
    with online softmax (flash-decoding over blocks).

DMA granularity is one whole block across ALL kv heads ([H_kv, BS, D] —
512 KB at 7B geometry), not per-head panels: decode attention at serving
batch sizes is DMA-latency-bound, so the kernel amortizes each transfer
over the full head loop (statically unrolled; per-head online-softmax
state lives in VMEM scratch with the head index on an untiled leading
axis). Pools stay in HBM (`pl.ANY`) with layout [L, NB, H_kv, BS, D]; the
layer index, block tables, positions, and int8-KV scales are
scalar-prefetched (SMEM) so the model's lax.scan over layers never slices
the pool into a copy, and table entries become DMA source addresses.
Pools are aliased in/out (in-place update, donated by the runtime).
INT8-KV dequantizes in VMEM; HBM traffic stays int8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _paged_decode_kernel(lyr_ref, pos_ref, scale_ref, tbl_ref,
                         q_ref, kn_ref, vn_ref, pk_in, pv_in,
                         pk, pv, o_ref,
                         win_k, win_v, kbuf, vbuf, m_scr, l_scr, acc_scr,
                         wsem, ksem, vsem,
                         *, sm_scale, kv_int8, W, BS, hkv, r, d):
    del pk_in, pv_in     # aliased with pk/pv; all access via the out refs
    b = pl.program_id(0)
    lyr = lyr_ref[0]
    pos = pos_ref[b]
    kv_scale = scale_ref[lyr] if kv_int8 else None

    # ---- 1. KV write: W-row window RMW inside the write block. The HBM
    # write-back is NOT on the attention critical path: the streamed copy of
    # the write block is patched with the new token's row in VMEM, so the
    # only ordering is wr.wait() before kernel exit (next layer/step reads
    # the updated pool).
    blk_w = tbl_ref[b, pos // BS]
    row = pos % BS
    base = pl.multiple_of((row // W) * W, W)
    rd_k = pltpu.make_async_copy(
        pk.at[lyr, blk_w, :, pl.ds(base, W), :], win_k, wsem.at[0])
    rd_v = pltpu.make_async_copy(
        pv.at[lyr, blk_w, :, pl.ds(base, W), :], win_v, wsem.at[1])
    rd_k.start()
    rd_v.start()

    # ---- 2. stream whole blocks (all heads per DMA), online softmax ----
    nv = pos // BS + 1                  # valid blocks for this sequence

    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    def start(j, slot):
        blk = tbl_ref[b, j]
        pltpu.make_async_copy(
            pk.at[lyr, blk], kbuf.at[slot], ksem.at[slot]).start()
        pltpu.make_async_copy(
            pv.at[lyr, blk], vbuf.at[slot], vsem.at[slot]).start()

    start(0, 0)

    if kv_int8:
        inv = 1.0 / kv_scale
        k_new = jnp.clip(jnp.round(kn_ref[0].astype(jnp.float32) * inv),
                         -127, 127).astype(jnp.int8)        # [hkv, d]
        v_new = jnp.clip(jnp.round(vn_ref[0].astype(jnp.float32) * inv),
                         -127, 127).astype(jnp.int8)
    else:
        k_new = kn_ref[0].astype(win_k.dtype)
        v_new = vn_ref[0].astype(win_v.dtype)
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1) == (row - base)
    rd_k.wait()
    rd_v.wait()
    win_k[:] = jnp.where(sel, k_new[:, None, :], win_k[:])
    win_v[:] = jnp.where(sel, v_new[:, None, :], win_v[:])
    wr_k = pltpu.make_async_copy(
        win_k, pk.at[lyr, blk_w, :, pl.ds(base, W), :], wsem.at[0])
    wr_v = pltpu.make_async_copy(
        win_v, pv.at[lyr, blk_w, :, pl.ds(base, W), :], wsem.at[1])
    wr_k.start()
    wr_v.start()

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < nv)
        def _():
            start(j + 1, (j + 1) % 2)

        blk = tbl_ref[b, j]
        pltpu.make_async_copy(pk.at[lyr, blk],
                              kbuf.at[slot], ksem.at[slot]).wait()
        pltpu.make_async_copy(pv.at[lyr, blk],
                              vbuf.at[slot], vsem.at[slot]).wait()
        rows = jax.lax.broadcasted_iota(jnp.int32, (BS, 1), 0) + j * BS
        keep = rows <= pos
        # patch the new token's row in VMEM — the streamed copy may predate
        # (or race with) the async window write-back
        is_pos = rows == pos
        for h in range(hkv):            # static unroll: one DMA, all heads
            kh = jnp.where(is_pos, k_new[h][None, :], kbuf[slot, h])
            vh = jnp.where(is_pos, v_new[h][None, :], vbuf[slot, h])
            if kv_int8:
                k = kh.astype(jnp.float32) * kv_scale
                v = vh.astype(jnp.float32) * kv_scale
            else:
                k = kh.astype(jnp.float32)
                v = vh.astype(jnp.float32)
            qh = q_ref[0, h].astype(jnp.float32)            # [r, d]
            scores = jax.lax.dot_general(
                k, qh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale  # [BS, r]
            scores = jnp.where(keep, scores, NEG_INF)
            m = m_scr[h]                                    # [1, r]
            l = l_scr[h]
            m_new = jnp.maximum(m, jnp.max(scores, axis=0, keepdims=True))
            p = jnp.exp(scores - m_new)                     # [BS, r]
            alpha = jnp.exp(m - m_new)                      # [1, r]
            l_scr[h] = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            m_scr[h] = m_new
            pv_acc = jax.lax.dot_general(
                p, v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [r, d]
            acc_scr[h] = acc_scr[h] * alpha.reshape(r, 1) + pv_acc
        return 0

    jax.lax.fori_loop(0, nv, body, 0)

    for h in range(hkv):
        o_ref[0, h] = (acc_scr[h]
                       / l_scr[h].reshape(r, 1)).astype(o_ref.dtype)

    wr_k.wait()          # pool update must land before the kernel returns
    wr_v.wait()


def paged_decode_attention(q, k_new, v_new, pool_k, pool_v, kv_scale,
                           tables, layer, positions, sm_scale=None,
                           interpret=False):
    """One-token paged attention fused with the KV write, manual DMA.

    q: [B, H_q, D]; k_new/v_new: [B, H_kv, D];
    pool_k/pool_v: [L, NB, H_kv, BS, D] (ALIASED — updated in place);
    tables: [B, MB] int32 VALID pool indices (caller remaps -1 to the trash
    block); positions: [B] write index (attends over positions+1 tokens).
    Returns (out [B, H_q, D], pool_k, pool_v).
    """
    b, hq, d = q.shape
    l, nb, hkv, bs, _ = pool_k.shape
    r = hq // hkv
    sm_scale = sm_scale if sm_scale is not None else d ** -0.5
    kv_int8 = pool_k.dtype == jnp.int8
    W = 32 if kv_int8 else 8            # sublane tile => provably aligned
    assert bs % W == 0, (bs, W)

    qg = q.reshape(b, hkv, r, d)
    scale_arr = jnp.asarray(kv_scale, jnp.float32).reshape(l)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,          # layer idx, positions, scales, tables
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, r, d),
                         lambda i, lyr, pos, sc, tb: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, d), lambda i, lyr, pos, sc, tb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, d), lambda i, lyr, pos, sc, tb: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            any_spec, any_spec,
        ],
        out_specs=[
            any_spec, any_spec,
            pl.BlockSpec((1, hkv, r, d),
                         lambda i, lyr, pos, sc, tb: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((hkv, W, d), pool_k.dtype),      # win_k
            pltpu.VMEM((hkv, W, d), pool_k.dtype),      # win_v
            pltpu.VMEM((2, hkv, bs, d), pool_k.dtype),  # kbuf (double)
            pltpu.VMEM((2, hkv, bs, d), pool_k.dtype),  # vbuf
            pltpu.VMEM((hkv, 1, r), jnp.float32),       # running max
            pltpu.VMEM((hkv, 1, r), jnp.float32),       # running denom
            pltpu.VMEM((hkv, r, d), jnp.float32),       # running numerator
            pltpu.SemaphoreType.DMA((2,)),              # window sems
            pltpu.SemaphoreType.DMA((2,)),              # k stream sems
            pltpu.SemaphoreType.DMA((2,)),              # v stream sems
        ],
    )
    kernel = functools.partial(
        _paged_decode_kernel, sm_scale=sm_scale, kv_int8=kv_int8, W=W,
        BS=bs, hkv=hkv, r=r, d=d)

    mb = tables.shape[1]
    s_eff = mb * bs
    pk, pv, out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool_k.shape, pool_k.dtype),
            jax.ShapeDtypeStruct(pool_v.shape, pool_v.dtype),
            jax.ShapeDtypeStruct((b, hkv, r, d), q.dtype),
        ],
        input_output_aliases={7: 0, 8: 1},   # pool operands -> outputs
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s_eff * d,
            bytes_accessed=int(2 * b * hkv * s_eff * d
                               * (1 if kv_int8 else 2)),
            transcendentals=b * hq * s_eff),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(positions, jnp.int32), scale_arr,
      jnp.asarray(tables, jnp.int32),
      qg, k_new, v_new, pool_k, pool_v)
    return out.reshape(b, hq, d), pk, pv
