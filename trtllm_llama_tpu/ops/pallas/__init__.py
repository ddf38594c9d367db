"""Pallas TPU kernels — the performance core of the engine.

Each kernel has a jnp reference implementation in ops/ and interpret-mode
tests in tests/. Registration is via ops.registry.enable_pallas_kernels().
"""

from .attention import (
    decode_attention_kernel, fused_decode_attention,
    packed_prefill_attention_kernel, prefill_attention_kernel,
    streaming_prefill_attention_kernel,
)
from .dma_decode_attention import dma_decode_attention
from .paged_decode_attention import paged_decode_attention
from .rmsnorm_quant import rmsnorm_quant_kernel
from .w8a8_matmul import w8a8_matmul, w8a8_matmul_stacked
from .woq_matmul import (fp8_matmul, fp8_matmul_stacked, woq_matmul,
                         woq_matmul_stacked)


def register(registry: dict):
    registry["woq_matmul"] = woq_matmul
    registry["woq_matmul_stacked"] = woq_matmul_stacked
    registry["fp8_matmul"] = fp8_matmul
    registry["fp8_matmul_stacked"] = fp8_matmul_stacked
    registry["w8a8_matmul"] = w8a8_matmul
    registry["w8a8_matmul_stacked"] = w8a8_matmul_stacked
    registry["decode_attention"] = decode_attention_kernel
    registry["fused_decode_attention"] = fused_decode_attention
    registry["dma_decode_attention"] = dma_decode_attention
    registry["paged_decode_attention"] = paged_decode_attention
    registry["prefill_attention"] = prefill_attention_kernel
    registry["streaming_prefill_attention"] = streaming_prefill_attention_kernel
    registry["packed_prefill_attention"] = packed_prefill_attention_kernel
    registry["rmsnorm_quant"] = rmsnorm_quant_kernel
