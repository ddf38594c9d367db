"""Probe: fp8 Pallas matmul vs int8-wo kernel vs XLA fp8 dense, 7B shapes.

Run on the chip:  python scripts/probe_fp8_kernel.py
Times a decode-shaped matvec panel [m, 4096] x [4096, 11008] and a stacked
layer-cycled variant (the shape the model's lax.scan actually hits).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from trtllm_llama_tpu.ops.registry import KERNELS, enable_pallas_kernels
from trtllm_llama_tpu.quantization.tensors import (quantize_fp8_weight,
                                                   quantize_weight_only)

enable_pallas_kernels(True)

K, N, L = 4096, 11008, 4
rng = np.random.default_rng(0)
w = rng.standard_normal((L, K, N)).astype(np.float32) * 0.02
print("quantizing fp8...", flush=True)
f8 = quantize_fp8_weight(jnp.asarray(w))
print("quantizing i8...", flush=True)
i8 = quantize_weight_only(jnp.asarray(w), 8, 0)
del w


def timeit(fn, *args, iters=30):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e6  # us


for m in (1, 8):
    x = jnp.asarray(rng.standard_normal((m, K)).astype(np.float32))

    from trtllm_llama_tpu.ops.pallas.woq_matmul import (fp8_matmul_stacked,
                                                        woq_matmul_stacked)

    @jax.jit
    def run_fp8(x, f8=f8):
        return sum(fp8_matmul_stacked(x, f8, i) for i in range(L))

    @jax.jit
    def run_i8(x, i8=i8):
        return sum(woq_matmul_stacked(x, i8, i) for i in range(L))

    @jax.jit
    def run_fp8_xla(x, f8=f8):
        from trtllm_llama_tpu.ops.fp8 import fp8_decode
        acc = 0
        for i in range(L):
            wf = fp8_decode(f8.qweight[i], x.dtype)
            acc += jnp.dot(x, wf,
                           preferred_element_type=jnp.float32) * f8.scale[i]
        return acc

    print(f"m={m} timing fp8...", flush=True)
    us_f8 = timeit(run_fp8, x) / L
    print("timing i8...", flush=True)
    us_i8 = timeit(run_i8, x) / L
    print("timing xla...", flush=True)
    us_xla = timeit(run_fp8_xla, x) / L
    bw = K * N / 1e9 / (us_f8 / 1e6)
    print(f"m={m}: fp8-kernel {us_f8:.0f}us/layer ({bw:.0f} GB/s eff), "
          f"int8-kernel {us_i8:.0f}us, fp8-xla {us_xla:.0f}us")
