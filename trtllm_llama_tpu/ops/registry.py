"""Kernel dispatch registry.

One switchboard for all Pallas kernels (the analogue of the reference's
PluginConfig, plugin/plugin.py:33-140 — which graph nodes become custom
kernels vs stock ops). Kernels register lazily on first enable; every hot
op checks `KERNELS` at trace time, so a jitted function bakes in whichever
path was active when it was compiled.
"""

from __future__ import annotations

KERNELS = {
    "enabled": False,
    "woq_matmul": None,
    "woq_matmul_stacked": None,
    "fp8_matmul": None,
    "fp8_matmul_stacked": None,
    "w8a8_matmul": None,
    "w8a8_matmul_stacked": None,
    "decode_attention": None,
    "fused_decode_attention": None,
    "dma_decode_attention": None,
    "paged_decode_attention": None,
    "prefill_attention": None,
    "streaming_prefill_attention": None,
    "packed_prefill_attention": None,
    # Prompt length above which prefill dispatches to the streaming
    # (flash-style, KV-block-tiled) kernel instead of the VMEM-resident one.
    # The VMEM kernel holds each head's full K/V panel plus a [bq, S] score
    # block: past S≈2k that stops fitting v5e's 16 MB VMEM.
    "prefill_streaming_min_s": 2048,
    "rmsnorm_quant": None,
    # Decode attention path: 'auto' (length dispatch, below), 'xla'
    # (scatter + einsum), 'split' (scatter + read-only pallas kernel),
    # 'fused' (write+attend aliased kernel; writes full cache panels back —
    # r1 experiment, loses), 'dma' (HBM-resident cache, manual
    # double-buffered DMA streaming + windowed writes, flash-decoding split
    # over KV chunks; r3 rewrite: all-KV-heads-per-chunk DMAs + DYNAMIC
    # trip count = work O(pos), not O(S_max)).
    # Measured r3 (scripts/probe_dma_decode.py, 7B shapes L-cycled int8-KV,
    # µs/layer-step, xla vs dma): S_max 2048: 481/479 (pos 128), 473/454
    # (1k), 593/627 (1.9k); S_max 4096: 557/464 (1k), 557/504 (3.9k);
    # S_max 8192: 675/474 (1k), 609/498 (4k), 604/550 (8k).
    # In-range (<=2048) it's a wash; past 4096 the dma kernel wins 9-30%
    # (most at short live pos — the dynamic trip count). 'auto' switches
    # at decode_dma_min_s.
    "decode_attn_mode": "auto",
    "decode_dma_min_s": 4096,
    # Paged decode attention: 'fused' (block-table-chasing Pallas kernel,
    # windowed write + whole-block streaming, online softmax) or 'xla'
    # (scatter write + dense gathered view per step). Measured 7B int8-wo
    # serving (8 slots, in128/out64, tok/s, r2): fused 345.9-346.6 vs
    # xla 309.9 vs dense-cache 361.2-365.7 — the kernel closes the paged
    # gap to <5% of dense (per-(head,block) DMA variant measured 189;
    # whole-block DMAs + VMEM write patching are what close it).
    "paged_attn_mode": "fused",
    # Collective/compute overlap in the sharded row-parallel paths
    # (ops/linear.py::_row_overlap): the output columns are split into
    # `overlap_chunks` windows; each window's matmul kernel (n_window
    # BlockSpec offset — no weight copy) and its psum are independent, so
    # the latency-hiding scheduler overlaps chunk c's all-reduce with chunk
    # c+1's compute. Bit-identical to unchunked (no K reassociation).
    # Skipped for inputs with fewer than overlap_min_rows rows (decode:
    # psum is latency-bound; chunking multiplies the latency).
    "overlap_chunks": 4,
    "overlap_min_rows": 64,
    # Decode fusion (ops/linear.py::dense_fused): fold the rms_norm
    # prologue / swiglu prologue / residual epilogue INTO the stacked
    # WOQ/FP8 matmul kernels at decode/extend shapes (rows <=
    # fuse_decode_max_rows), deleting the XLA op boundaries between pallas
    # calls where the weight stream has no outstanding prefetch (r4 gap
    # analysis: ~2.2 ms/token int4, ~3.7 ms int8 of inter-kernel HBM idle,
    # docs/kernels.md). Larger rows keep the unfused composition: the
    # prologue recompute rides the m-outer grid but prefill is
    # compute-bound and XLA's own fusion already covers it.
    "fuse_decode": True,
    "fuse_decode_max_rows": 16,
    # Active mesh for sharded execution. When set, only the shard_map-wrapped
    # dense paths (ops/linear.py) run Pallas kernels — GSPMD cannot partition
    # a bare pallas_call, so every other kernel falls back to XLA (which GSPMD
    # *can* partition). Sessions set this before tracing.
    "mesh": None,
}


def enable_pallas_kernels(enabled: bool = True):
    import os
    if os.environ.get("TLLM_DISABLE_KERNELS"):   # experiment/bisect knob
        enabled = False
    if enabled:
        from . import pallas as _p
        _p.register(KERNELS)
    KERNELS["enabled"] = enabled


def kernel(name: str):
    """The registered kernel fn, or None if disabled/missing.

    Returns None for all kernels while a mesh is active: un-shard_map'd
    pallas calls are not GSPMD-partitionable (the sharded dense paths check
    the registry directly and wrap their kernels in shard_map)."""
    if not KERNELS["enabled"] or KERNELS.get("mesh") is not None:
        return None
    return KERNELS.get(name)
