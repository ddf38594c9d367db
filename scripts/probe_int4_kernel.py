"""Probe: int4 WOQ kernel bottleneck analysis on the real chip.

1. bitcast semantics: uint32 -> bf16 sublane mapping (needed to design a
   bitwise nibble->bf16 construction that skips the int8->bf16 convert).
2. Mosaic support for 16-bit lane shifts.
3. GB/s of the current int4 kernel vs the int8 kernel at decode shapes.

Run on TPU: python scripts_probe_int4.py
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trtllm_llama_tpu.utils.benchmark import bench_op
from trtllm_llama_tpu.quantization import tensors as qt
from trtllm_llama_tpu.ops.pallas.woq_matmul import woq_matmul_2d


def probe_bitcast_u32_bf16():
    """Feed a known uint32 pattern through pltpu.bitcast(. , bfloat16)."""
    def kern(x_ref, o_ref):
        o_ref[:] = pltpu.bitcast(x_ref[:], jnp.bfloat16)

    # uint32 rows 0..3, lanes 0..7; value = row*16 + lane encoded in both
    # halves so we can see which half lands where:
    # low 16 bits = 0x4000 | idx (bf16 2.0 + mantissa), high = 0x3F80 | idx (1.0ish)
    rows, lanes = 8, 128
    idx = (np.arange(rows)[:, None] * 16 + np.arange(lanes)[None, :] % 16)
    x = ((0x3F80 + idx).astype(np.uint32) << 16) | (0x4000 + idx).astype(np.uint32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows * 2, lanes), jnp.bfloat16),
    )(jnp.asarray(x))
    out = np.asarray(out).view(np.uint16)
    print("bitcast u32->bf16:")
    print("  in[0,0] = %08x" % x[0, 0])
    print("  out[0,0]=%04x out[1,0]=%04x out[8,0]=%04x" %
          (out[0, 0], out[1, 0], out[8, 0]))
    print("  out[0,1]=%04x out[1,1]=%04x" % (out[0, 1], out[1, 1]))
    # figure out mapping for uint32 row r: which bf16 rows hold lo/hi?
    for r in (0, 1, 2):
        found_lo = found_hi = None
        for rr in range(rows * 2):
            if out[rr, 0] == 0x4000 + r * 16:
                found_lo = rr
            if out[rr, 0] == 0x3F80 + r * 16:
                found_hi = rr
        print(f"  u32 row {r}: lo16 -> bf16 row {found_lo}, hi16 -> bf16 row {found_hi}")


def probe_u16_ops():
    """Can Mosaic do shifts/and/or in uint16 lanes?"""
    def kern(x_ref, o_ref):
        v = pltpu.bitcast(x_ref[:], jnp.uint16)
        v = ((v >> 2) & 0x78) | 0x4300
        o_ref[:] = pltpu.bitcast(v, jnp.bfloat16)
    x = jnp.arange(16 * 128, dtype=jnp.uint32).reshape(16, 128)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.bfloat16),
        )(x)
        jax.block_until_ready(out)
        print("u16 lane shift/and/or: OK")
        return True
    except Exception as e:
        print("u16 lane ops FAILED:", str(e)[:200])
        return False


def probe_u32_bf16_construct():
    """Construct two bf16 per uint32 with int32-lane ops + bitcast."""
    def kern(x_ref, o_ref):
        w32 = pltpu.bitcast(x_ref[:], jnp.uint32)
        # nibbles at bits 0-3 and 16-19 -> bf16 mantissa bits 3-6 of each half
        v = ((w32 << 3) & 0x00780078) | 0x43004300
        o_ref[:] = pltpu.bitcast(v.astype(jnp.uint32), jnp.bfloat16)
    x = jnp.zeros((8, 128), jnp.uint32).at[0, 0].set((5 << 16) | 9)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
    )(x)
    out = np.asarray(out, np.float32)
    nz = [(int(r), int(c), float(out[r, c]))
          for r, c in zip(*np.nonzero(out)) ]
    print("u32 construct probe (expect 128+8*9=200 and 128+8*5=168):", nz[:4])


def bench_kernels():
    key = jax.random.PRNGKey(0)
    m, k, n = 8, 4096, 11008
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    for bits, gs in ((8, None), (4, 128)):
        q = np.random.randint(-7, 8, (k, n)).astype(np.int8)
        if bits == 4:
            qw = qt.pack_int4(jnp.asarray(q), 128)
            scale = jnp.ones((k // gs, n), jnp.float32) * 0.01
            w = qt.WOQWeight(qweight=qw, scale=scale, w_bits=4,
                             group_size=gs, pack_block=128)
            wbytes = k * n // 2 + scale.size * 4
        else:
            scale = jnp.ones((n,), jnp.float32) * 0.01
            w = qt.WOQWeight(qweight=jnp.asarray(q), scale=scale, w_bits=8,
                             group_size=None, pack_block=None)
            wbytes = k * n + scale.size * 4
        f = lambda xx: woq_matmul_2d(xx, w).astype(jnp.bfloat16)
        t = bench_op(f, x, n_iters=50)
        print(f"int{bits} woq kernel m={m} k={k} n={n}: {t*1e6:.1f} us, "
              f"{wbytes/t/1e9:.0f} GB/s (weights-only traffic)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe_bitcast_u32_bf16()
    probe_u16_ops()
    probe_u32_bf16_construct()
    bench_kernels()
