"""Linear/matmul ops with quantized-weight dispatch.

TPU-native replacement for the reference's GEMM plugin zoo
(gemmPlugin, weightOnlyQuantMatmulPlugin, smoothQuantGemmPlugin): one
`dense()` entry point that dispatches on the weight container type.

Numeric strategy per mode:
- fp16/bf16: plain `jnp.dot` — XLA tiles it onto the MXU (the reference's
  gemmPlugin exists only because TRT's matmul tactic selection was unstable;
  XLA has no such problem).
- weight-only INT8, per-channel scales: `x @ int8_w` with the int8->bf16
  convert *inside* the dot (XLA fuses it tile-wise, so HBM traffic is the
  int8 bytes — the same win the CUTLASS fpA_intB kernel buys on GPU), then a
  per-column scale epilogue. Exact, since scale is constant along K.
- weight-only INT4 / grouped scales: unpack + grouped contraction; the fused
  Pallas kernel (ops/pallas/woq_matmul.py) replaces this on TPU.
- SmoothQuant W8A8: int8 x int8 -> int32 on the MXU, fused
  per-token x per-channel rescale epilogue (reference smoothQuantGemmPlugin
  semantics: per_token_scale * per_channel_scale * acc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..quantization.tensors import (
    FP8Weight, SQWeight, WOQWeight, quantize_per_token, quantize_static,
    unpack_int4,
)

from .registry import KERNELS as _PALLAS
from .registry import enable_pallas_kernels  # noqa: F401 (re-export)

try:                                    # jax>=0.4.35 moved shard_map
    from jax import shard_map as _shard_map
except ImportError:                     # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _kern(name: str):
    """Kernel fn for the UNSHARDED fast paths (None while a mesh is active)."""
    if not _PALLAS["enabled"] or _PALLAS.get("mesh") is not None:
        return None
    return _PALLAS.get(name)


def _active_mesh():
    """Mesh for the shard_map'd dense paths (None => single-device)."""
    m = _PALLAS.get("mesh")
    if m is None or not _PALLAS["enabled"]:
        return None
    return m if "tp" in m.axis_names else None


def _index_layer(w, layer):
    """Select layer `layer` from a stacked ([L, ...]) weight container."""
    idx = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)
    if isinstance(w, WOQWeight):
        return WOQWeight(idx(w.qweight), idx(w.scale), w.w_bits,
                         w.group_size, w.pack_block)
    if isinstance(w, SQWeight):
        return SQWeight(idx(w.qweight), idx(w.scale_w), idx(w.scale_x),
                        idx(w.scale_y), w.per_channel, w.per_token)
    if isinstance(w, FP8Weight):
        return FP8Weight(idx(w.qweight), idx(w.scale), w.interleave_block)
    return idx(w)


def dense(x, w, out_dtype=None, layer=None, part=None):
    """y = x @ w for any supported weight container.

    x: [..., K]; w: jnp array [K, N] | WOQWeight | SQWeight; returns [..., N].
    With `layer` given, w is stacked [L, ...] and layer selects the slice —
    XLA fuses the dynamic-slice into its matmul read, and the Pallas kernels
    take the stacked array + index directly (scalar prefetch) so the sliced
    weight is never materialized.

    `part` declares the weight's TP role ('col' output-sharded / 'row'
    input-sharded, the reference's ColumnLinear/RowLinear): under an active
    mesh the quantized kernels are wrapped in shard_map with the matching
    PartitionSpecs (GSPMD cannot partition a bare pallas_call) and the row
    psum happens inside (reference linear.py:131-137 ncclAllReduce).
    """
    mesh = _active_mesh()
    if (mesh is not None and part in ("col", "row") and layer is not None
            and isinstance(w, WOQWeight) and _PALLAS["woq_matmul_stacked"]):
        return _sharded_woq(x, w, layer, part, mesh, out_dtype or x.dtype)
    if (mesh is not None and part in ("col", "row") and layer is not None
            and isinstance(w, FP8Weight) and _PALLAS["fp8_matmul_stacked"]
            and _fp8_shard_aligned(w, part, mesh)):
        return _sharded_fp8(x, w, layer, part, mesh, out_dtype or x.dtype)
    if (mesh is not None and part in ("col", "row") and layer is not None
            and isinstance(w, SQWeight) and w.per_token
            and _PALLAS["w8a8_matmul_stacked"]):
        x_q, s_x = quantize_per_token(x)   # global per-token amax (pre-shard)
        return _sharded_sq(x_q, s_x, w, layer, part, mesh,
                           out_dtype or x.dtype)
    if layer is not None:
        if isinstance(w, WOQWeight) and _kern("woq_matmul_stacked"):
            out_dtype = out_dtype or x.dtype
            return _PALLAS["woq_matmul_stacked"](x, w, layer).astype(out_dtype)
        if (isinstance(w, SQWeight) and w.per_token
                and _kern("w8a8_matmul_stacked")):
            out_dtype = out_dtype or x.dtype
            x_q, s_x = quantize_per_token(x)
            return _PALLAS["w8a8_matmul_stacked"](
                x_q, w.qweight, s_x, w.scale_w, layer).astype(out_dtype)
        if isinstance(w, FP8Weight) and _kern("fp8_matmul_stacked"):
            out_dtype = out_dtype or x.dtype
            return _PALLAS["fp8_matmul_stacked"](x, w, layer).astype(out_dtype)
        w = _index_layer(w, layer)
    if isinstance(w, WOQWeight):
        return _dense_woq(x, w, out_dtype)
    if isinstance(w, SQWeight):
        return _dense_sq(x, w, out_dtype)
    if isinstance(w, FP8Weight):
        return _dense_fp8(x, w, out_dtype)
    out_dtype = out_dtype or x.dtype
    return jnp.dot(x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(out_dtype)


def _dense_woq(x, w: WOQWeight, out_dtype=None):
    out_dtype = out_dtype or x.dtype
    # INT4 must go through the Pallas kernel (the XLA unpack path is ~16x
    # slower). INT8 currently keeps the XLA convert-inside-dot path: inside
    # lax.scan a pallas operand forces materializing the sliced layer weight
    # (an extra HBM round trip), which costs more than the kernel saves —
    # until the stacked scalar-prefetch kernel variant lands.
    if _kern("woq_matmul") is not None and w.w_bits == 4:
        y = _PALLAS["woq_matmul"](x, w)
        return y.astype(out_dtype)
    q = (unpack_int4(w.qweight, w.pack_block) if w.w_bits == 4
         else w.qweight)
    if w.group_size:
        g = w.group_size
        k, n = q.shape[-2], q.shape[-1]
        xg = x.reshape(*x.shape[:-1], k // g, g)
        qg = q.reshape(k // g, g, n).astype(x.dtype)
        # y = sum_g (x_g @ q_g) * scale_g — scale constant within a group
        yg = jnp.einsum("...gk,gkn->...gn", xg, qg,
                        preferred_element_type=jnp.float32)
        y = jnp.sum(yg * w.scale, axis=-2)
    else:
        acc = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
        y = acc * w.scale
    return y.astype(out_dtype)


def _fp8_shard_aligned(w: "FP8Weight", part, mesh) -> bool:
    """Row-parallel TP slices the fp8 weight's K dim into contiguous
    K/tp shards; the interleave_block row permutation is block-local, so a
    shard boundary inside a block would scramble which logical rows the
    kernel's even/odd byte planes decode. Only take the sharded kernel
    path when every shard is whole blocks (true for all real model shapes:
    K >= 4096, blocks of 128); otherwise fall back to the XLA decode path,
    which deinterleaves explicitly and lets GSPMD shard the dot."""
    ib = w.interleave_block
    if not ib or part != "row":
        return True
    tp = dict(getattr(mesh, "shape", {})).get("tp", 1)
    return (w.k_dim // max(tp, 1)) % ib == 0


def _dense_fp8(x, w: FP8Weight, out_dtype=None):
    """FP8 weight matmul: per-channel scale as the epilogue (scale constant
    along K, exact). Pallas kernel path decodes e4m3 bytes in VMEM
    (pallas/woq_matmul.py::_decode_fp8_block — the int8-wo kernel's tiling
    with a 7-op bit-plant decode); XLA fallback uses the exact arithmetic
    decode (ops/fp8.py) feeding the dot, which is VPU-bound (~10 ops/elem
    over the whole weight per decode token). The reference never shipped a
    runnable FP8 GEMM (fp8_gemm plugin absent; layer.py FP8 classes are
    stubs)."""
    out_dtype = out_dtype or x.dtype
    if _kern("fp8_matmul") is not None:
        return _PALLAS["fp8_matmul"](x, w).astype(out_dtype)
    from .fp8 import fp8_decode
    from ..quantization.tensors import deinterleave_fp8_rows
    q = w.qweight
    if w.interleave_block:
        q = deinterleave_fp8_rows(q, w.interleave_block)
    wf = fp8_decode(q, x.dtype)
    acc = jnp.dot(x, wf, preferred_element_type=jnp.float32)
    return (acc * w.scale).astype(out_dtype)


def _lead_specs(x, mesh):
    """Leading-dim specs for an activation: batch over 'dp' when divisible."""
    b_ax = ("dp" if ("dp" in mesh.axis_names
                     and x.shape[0] % mesh.shape["dp"] == 0) else None)
    return (b_ax,) + (None,) * (x.ndim - 2)


def _row_overlap(mm, xl, n: int, out_dtype):
    """Row-parallel matmul + psum with collective/compute overlap.

    Instead of one matmul followed by one all-reduce (the reference's
    serialized ncclAllReduce boundary, allreducePlugin.cpp:93), split the
    OUTPUT columns into `overlap_chunks` windows: each window's kernel and
    its psum are independent of every other window, so XLA's latency-hiding
    scheduler can run psum(chunk c) on the ICI while the MXU computes chunk
    c+1 (async all-reduce start/done pairs on TPU). Column-chunking never
    reassociates any K reduction, so outputs are BIT-identical to the
    unchunked path (tested). Decode-size inputs (few rows) skip chunking:
    their psums are latency-bound and chunking would only multiply the
    per-collective latency."""
    chunks = int(_PALLAS.get("overlap_chunks", 0) or 0)
    min_rows = int(_PALLAS.get("overlap_min_rows", 64))
    rows = 1
    for d in xl.shape[:-1]:
        rows *= d
    # window length must keep full 128-lane tiles
    if (chunks > 1 and rows >= min_rows and n % chunks == 0
            and (n // chunks) % 128 == 0):
        nc = n // chunks
        ys = [jax.lax.psum(mm(n_window=(c * nc, nc)), "tp")
              for c in range(chunks)]
        return jnp.concatenate(ys, axis=-1).astype(out_dtype)
    return jax.lax.psum(mm(), "tp").astype(out_dtype)


def _sharded_woq(x, w: WOQWeight, layer, part, mesh, out_dtype):
    lead = _lead_specs(x, mesh)
    if part == "col":
        x_spec = P(*lead, None)
        q_spec = P(None, None, "tp")
        s_spec = P(*([None] * (w.scale.ndim - 1)), "tp")
        o_spec = P(*lead, "tp")
    else:
        x_spec = P(*lead, "tp")
        q_spec = P(None, "tp", None)
        s_spec = (P(None, "tp", None) if w.scale.ndim >= 3   # grouped [L,K/g,N]
                  else P(None, None))                        # per-chan: replic.
        o_spec = P(*lead, None)
    w_specs = WOQWeight(q_spec, s_spec, w.w_bits, w.group_size, w.pack_block)

    def f(xl, wl, lyr):
        def mm(n_window=None):
            return _PALLAS["woq_matmul_stacked"](xl, wl, lyr,
                                                 n_window=n_window)
        if part == "row":
            return _row_overlap(mm, xl, wl.qweight.shape[-1], out_dtype)
        return mm().astype(out_dtype)

    return _shard_map(f, mesh=mesh, in_specs=(x_spec, w_specs, P()),
                      out_specs=o_spec, check_vma=False)(
        x, w, jnp.asarray(layer, jnp.int32))


def _sharded_fp8(x, w: FP8Weight, layer, part, mesh, out_dtype):
    """TP fp8 matmul: same sharding shape as _sharded_woq per-channel
    (codes [L, K, N], scale [L, N]); row-parallel gets the overlapped
    chunked psum."""
    lead = _lead_specs(x, mesh)
    if part == "col":
        x_spec, q_spec = P(*lead, None), P(None, None, "tp")
        s_spec, o_spec = P(None, "tp"), P(*lead, "tp")
    else:
        x_spec, q_spec = P(*lead, "tp"), P(None, "tp", None)
        s_spec, o_spec = P(None, None), P(*lead, None)

    def f(xl, qw, sc, lyr):
        wl = FP8Weight(qw, sc, w.interleave_block)

        def mm(n_window=None):
            return _PALLAS["fp8_matmul_stacked"](xl, wl, lyr,
                                                 n_window=n_window)
        if part == "row":
            return _row_overlap(mm, xl, qw.shape[-1], out_dtype)
        return mm().astype(out_dtype)

    return _shard_map(f, mesh=mesh,
                      in_specs=(x_spec, q_spec, s_spec, P()),
                      out_specs=o_spec, check_vma=False)(
        x, w.qweight, w.scale, jnp.asarray(layer, jnp.int32))


def _sharded_sq(x_q, s_x, w: SQWeight, layer, part, mesh, out_dtype):
    lead = _lead_specs(x_q, mesh)
    if part == "col":
        xq_spec, sw_spec, o_spec = (P(*lead, None), P(None, "tp"),
                                    P(*lead, "tp"))
    else:
        xq_spec, sw_spec, o_spec = (P(*lead, "tp"), P(None, None),
                                    P(*lead, None))
    qw_spec = P(None, "tp", None) if part == "row" else P(None, None, "tp")
    sx_spec = P(*lead, None)

    def f(xl, sl, qw, sw, lyr):
        def mm(n_window=None):
            return _PALLAS["w8a8_matmul_stacked"](xl, qw, sl, sw, lyr,
                                                  n_window=n_window)
        if part == "row":
            return _row_overlap(mm, xl, qw.shape[-1], out_dtype)
        return mm().astype(out_dtype)

    return _shard_map(
        f, mesh=mesh,
        in_specs=(xq_spec, sx_spec, qw_spec, sw_spec, P()),
        out_specs=o_spec, check_vma=False,
    )(x_q, s_x, w.qweight, w.scale_w, jnp.asarray(layer, jnp.int32))


def dense_fused(x, w, layer=None, part=None, out_dtype=None, *,
                norm_w=None, eps: float = 1e-6, swiglu: bool = False,
                resid=None):
    """Fused elementwise-prologue/epilogue matmul for the decode path.

    Semantics (always, on every backend):
        h   = rms_norm(x, norm_w[layer], eps)        if norm_w given
        h   = silu(x[..., :K]) * x[..., K:]          if swiglu
        y   = dense(h, w, layer=layer, part=part)
        out = resid + y                              if resid given

    At decode/extend shapes (rows <= fuse_decode_max_rows) on a single
    device with a stacked WOQ/FP8 weight, the whole composition runs INSIDE
    the Pallas matmul kernel: the norm/swiglu lands in a VMEM prologue that
    overlaps the first weight panel's DMA, and the residual add in the
    output-tile epilogue — deleting the XLA op dispatches (and their
    activation HBM round-trips) between pallas calls that the r4 gap
    analysis priced at ~30% of e2e decode (docs/kernels.md "Where the rest
    of end-to-end int4 decode goes"). Everywhere else it composes the
    plain ops with identical rounding order. Reference analogue: the m==1
    whole-path tuning of weightOnlyMatrixVectorMultiplication.h:37-46 and
    layernormQuantizationPlugin's norm->GEMM fusion.
    """
    if norm_w is not None and swiglu:
        raise ValueError("dense_fused: norm_w and swiglu are mutually "
                         "exclusive (one input-prologue per matmul)")
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    fusible = (layer is not None
               and _PALLAS.get("fuse_decode", True)
               and rows <= int(_PALLAS.get("fuse_decode_max_rows", 16))
               and (norm_w is not None or swiglu or resid is not None))
    if fusible and isinstance(w, WOQWeight) and _kern("woq_matmul_stacked"):
        out_dtype = out_dtype or x.dtype
        y = _PALLAS["woq_matmul_stacked"](x, w, layer, norm_w=norm_w,
                                          eps=eps, swiglu=swiglu,
                                          resid=resid)
        return y.astype(out_dtype)
    if fusible and isinstance(w, FP8Weight) and _kern("fp8_matmul_stacked"):
        out_dtype = out_dtype or x.dtype
        y = _PALLAS["fp8_matmul_stacked"](x, w, layer, norm_w=norm_w,
                                          eps=eps, swiglu=swiglu,
                                          resid=resid)
        return y.astype(out_dtype)
    # unfused composition (identical math/rounding order)
    from .norm import rms_norm
    if norm_w is not None:
        nw = (jax.lax.dynamic_index_in_dim(norm_w, layer, 0, keepdims=False)
              if layer is not None and norm_w.ndim > 1 else norm_w)
        h = rms_norm(x, nw, eps)
    elif swiglu:
        kk = x.shape[-1] // 2
        g, u = x[..., :kk], x[..., kk:]
        h = jax.nn.silu(g.astype(jnp.float32)).astype(u.dtype) * u
    else:
        h = x
    y = dense(h, w, out_dtype, layer, part)
    return (resid + y).astype(y.dtype) if resid is not None else y


def dense_prequant(x_q, s_x, w, out_dtype=None, layer=None, part=None):
    """y = dequant(x_q) @ w for an already-quantized activation.

    Entry point for the fused rmsnorm_quant -> W8A8 path (the reference's
    SmoothQuantRmsNorm feeding smoothQuantGemmPlugin): the caller quantized
    once (inside the norm kernel) and fans the int8 activation out to the
    projection group (qkv / gate+up), skipping per-dense re-quantization.
    Only valid for per-token SQWeight.
    """
    assert isinstance(w, SQWeight) and w.per_token
    mesh = _active_mesh()
    if (mesh is not None and part in ("col", "row") and layer is not None
            and _PALLAS["w8a8_matmul_stacked"]):
        return _sharded_sq(x_q, s_x, w, layer, part, mesh,
                           out_dtype or jnp.bfloat16)
    if layer is not None:
        if _kern("w8a8_matmul_stacked"):
            out_dtype = out_dtype or jnp.bfloat16
            return _PALLAS["w8a8_matmul_stacked"](
                x_q, w.qweight, s_x, w.scale_w, layer).astype(out_dtype)
        w = _index_layer(w, layer)
    out_dtype = out_dtype or jnp.bfloat16
    if _kern("w8a8_matmul"):
        return _PALLAS["w8a8_matmul"](x_q, w.qweight, s_x,
                                      w.scale_w).astype(out_dtype)
    acc = jax.lax.dot_general(
        x_q, w.qweight,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_x * w.scale_w
    return y.astype(out_dtype)


def _dense_sq(x, w: SQWeight, out_dtype=None):
    out_dtype = out_dtype or x.dtype
    if w.per_token:
        x_q, s_x = quantize_per_token(x)
    else:
        x_q, s_x = quantize_static(x, w.scale_x), w.scale_x
    if _kern("w8a8_matmul"):
        return _PALLAS["w8a8_matmul"](x_q, w.qweight, s_x, w.scale_w).astype(out_dtype)
    acc = jax.lax.dot_general(
        x_q, w.qweight,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s_x * w.scale_w
    return y.astype(out_dtype)


def embedding_lookup(table, ids, out_dtype=None):
    """Embedding gather (reference lookupPlugin -> sharded jnp.take)."""
    out = jnp.take(table, ids, axis=0)
    return out.astype(out_dtype) if out_dtype else out


def prompt_tuning_lookup(table, prompt_table, ids, tasks, task_vocab_size,
                         vocab_size, out_dtype=None):
    """Prompt-tuning embedding (reference PromptTuningEmbedding.forward,
    layers/embedding.py:38-81): ids < vocab_size gather from the normal
    table; ids >= vocab_size are virtual tokens indexing the per-task
    block of the concatenated prompt table.

    table:        [V, D] vocab embeddings
    prompt_table: [num_tasks * task_vocab_size, D] virtual-token embeddings
    ids:          [B, S] token ids, virtual ids live in [V, V + tvs)
    tasks:        [B] task index per sequence
    """
    is_prompt = ids >= vocab_size
    normal = embedding_lookup(table, jnp.where(is_prompt, 0, ids), out_dtype)
    vids = (jnp.where(is_prompt, ids - vocab_size, 0)
            + (tasks * task_vocab_size)[:, None])
    virtual = embedding_lookup(prompt_table, vids, out_dtype)
    return jnp.where(is_prompt[..., None], virtual, normal)
