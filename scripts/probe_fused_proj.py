"""Probe: is per-pallas-launch overhead the in-model int4/int8 gap?

Compare 3 separate stacked WOQ matmuls (q,k,v: 4096->4096 each) vs one
fused 4096->12288, and gate+up separate vs fused, at decode shape m=8.
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.utils.benchmark import bench_op
from trtllm_llama_tpu.quantization import tensors as qt
from trtllm_llama_tpu.ops.pallas.woq_matmul import woq_matmul_stacked_2d

L, D, F = 2, 4096, 11008
m = 8


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def make_w(k, n, bits, gs=None):
    q = np.random.default_rng(k + n + bits).integers(
        -7, 8, (L, k, n)).astype(np.int8)
    q = jnp.asarray(q)
    if bits == 4:
        gs = gs or 128
        qw = jax.jit(lambda a: qt.pack_int4(a, gs))(q)
        scale = jnp.ones((L, k // gs, n), jnp.float32) * 0.01
        w = qt.WOQWeight(qweight=qw, scale=scale, w_bits=4,
                         group_size=gs, pack_block=gs)
    else:
        scale = jnp.ones((L, n), jnp.float32) * 0.01
        w = qt.WOQWeight(qweight=q, scale=scale, w_bits=8,
                         group_size=None, pack_block=None)
    jax.block_until_ready(w.qweight)
    log(f"  made w int{bits} [{L},{k},{n}]")
    return w


def bench(bits):
    log(f"int{bits}: building weights")
    wq = make_w(D, D, bits)
    wqkv = make_w(D, 3 * D, bits)
    wg = make_w(D, F, bits)
    wgu = make_w(D, 2 * F, bits)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((m, D)),
                    jnp.bfloat16)

    def sep(x):
        a = woq_matmul_stacked_2d(x, wq, 1)
        b = woq_matmul_stacked_2d(x, wq, 1)
        c = woq_matmul_stacked_2d(x, wq, 1)
        return (a + b + c).astype(jnp.bfloat16)

    def fused(x):
        return woq_matmul_stacked_2d(x, wqkv, 1)[:, :D].astype(jnp.bfloat16)

    def sep_mlp(x):
        g = woq_matmul_stacked_2d(x, wg, 1)
        u = woq_matmul_stacked_2d(x, wg, 1)
        return (g[:, :D] + u[:, :D]).astype(jnp.bfloat16)

    def fused_mlp(x):
        return woq_matmul_stacked_2d(x, wgu, 1)[:, :D].astype(jnp.bfloat16)

    per = 0.5 if bits == 4 else 1
    gb = lambda k, n, t: (k * n * per) / t / 1e9
    for name, fn, k, n in [("qkv sep 3x(4096->4096) ", sep, D, 3 * D),
                           ("qkv fused (4096->12288)", fused, D, 3 * D),
                           ("g/u sep 2x(4096->11008)", sep_mlp, D, 2 * F),
                           ("g/u fused (4096->22016)", fused_mlp, D, 2 * F)]:
        t = bench_op(fn, x, n_iters=30)
        log(f"  {name}: {t*1e6:7.1f} us  {gb(k, n, t):4.0f} GB/s")


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    for b in (8, 4):
        bench(b)
