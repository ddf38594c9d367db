"""Probe: stacked WOQ kernel tile-size sweep at decode shapes (m=8)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.utils.benchmark import bench_op
from trtllm_llama_tpu.quantization import tensors as qt
from trtllm_llama_tpu.ops.pallas.woq_matmul import woq_matmul_stacked_2d

L = 2
m = 8


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def make_w(k, n, bits):
    q = np.random.default_rng(k + n + bits).integers(
        -7, 8, (L, k, n)).astype(np.int8)
    q = jnp.asarray(q)
    if bits == 4:
        gs = 128
        qw = jax.jit(lambda a: qt.pack_int4(a, gs))(q)
        scale = jnp.ones((L, k // gs, n), jnp.float32) * 0.01
        w = qt.WOQWeight(qweight=qw, scale=scale, w_bits=4,
                         group_size=gs, pack_block=gs)
    else:
        scale = jnp.ones((L, n), jnp.float32) * 0.01
        w = qt.WOQWeight(qweight=q, scale=scale, w_bits=8,
                         group_size=None, pack_block=None)
    jax.block_until_ready(w.qweight)
    return w


def sweep(bits, k, n, bns, cks=(None,)):
    w = make_w(k, n, bits)
    per = 0.5 if bits == 4 else 1
    x = jnp.asarray(np.random.default_rng(0).standard_normal((m, k)),
                    jnp.bfloat16)
    for bn in bns:
        if bn is not None and n % bn:
            continue
        try:
            f = lambda x: woq_matmul_stacked_2d(x, w, 1, bn=bn).astype(jnp.bfloat16)
            t = bench_op(f, x, n_iters=30)
            log(f"int{bits} {k}x{n} bn={bn}: {t*1e6:6.1f} us "
                f"{k*n*per/t/1e9:5.0f} GB/s")
        except Exception as e:
            log(f"int{bits} {k}x{n} bn={bn}: FAIL {type(e).__name__} {str(e)[:80]}")


if __name__ == "__main__":
    log("devices:", jax.devices())
    for bits in (8, 4):
        sweep(bits, 4096, 12288, (None, 768, 1024, 1536, 2048))
        sweep(bits, 4096, 4096, (None, 1024, 2048))
        sweep(bits, 11008, 4096, (None, 1024))
        sweep(bits, 4096, 11008, (None, 688, 1376))
