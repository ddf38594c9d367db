"""Pallas TPU kernels — the performance core of the engine.

Each kernel has a jnp reference implementation in ops/ and interpret-mode
tests in tests/. Registration is via ops.linear.enable_pallas_kernels().
"""

from .woq_matmul import woq_matmul, woq_matmul_stacked


def register(registry: dict):
    registry["woq_matmul"] = woq_matmul
    registry["woq_matmul_stacked"] = woq_matmul_stacked
