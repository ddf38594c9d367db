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
    "w8a8_matmul": None,
    "w8a8_matmul_stacked": None,
    "decode_attention": None,
    "fused_decode_attention": None,
    "prefill_attention": None,
    "rmsnorm_quant": None,
    # Decode attention path: 'xla' (scatter + einsum, default — best at
    # short/medium context), 'split' (scatter + read-only pallas kernel),
    # 'fused' (write+attend aliased kernel; writes full cache blocks back,
    # so it loses unless the loop-state copy behavior changes). Measured 7B
    # bs1 int8-wo: xla 89.8/81.0 (TaskB/TaskA), fused 68.9-77.4.
    "decode_attn_mode": "xla",
}


def enable_pallas_kernels(enabled: bool = True):
    if enabled:
        from . import pallas as _p
        _p.register(KERNELS)
    KERNELS["enabled"] = enabled


def kernel(name: str):
    """The registered kernel fn, or None if disabled/missing."""
    if not KERNELS["enabled"]:
        return None
    return KERNELS.get(name)
