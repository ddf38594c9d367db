"""Generic single-shot inference session (encoder / non-autoregressive
models).

The analogue of the reference's generic `Session` (runtime/session.py:35-180):
a thin engine runner that the BERT / UNet examples use instead of
GenerationSession — deserialize, bind I/O, run once per input. On TPU that
maps to: hold params on device, jit the model's pure forward, and optionally
pad the token axis to a bucket ladder so a workload with varying sequence
lengths hits a handful of compiled programs instead of one per length (the
reference gets the same effect from TRT optimization profiles).

    sess = InferenceSession(bert.forward, cfg, params,
                            pad_axis=1, buckets=(32, 64, 128))
    logits = sess.run(input_ids, seq_lens)    # positional, like the model fn

Any callable with signature fn(params, cfg, *arrays, **static_kwargs) works;
positional args are traced arrays, keyword args are static (part of the
compile cache key).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


class InferenceSession:
    def __init__(self, forward, cfg, params, pad_axis: Optional[int] = None,
                 buckets: Sequence[int] = (), pad_value: int = 0):
        """forward: pure fn(params, cfg, *arrays, **kwargs) -> pytree.

        pad_axis: axis of run()'s FIRST array argument to pad up to the
        bucket ladder (None = compile per exact shape, the reference's
        fixed-profile mode). Padding is only sound for models that mask by
        an explicit length argument — BERT here does.
        """
        if not os.environ.get("TLLM_NO_COMPILE_CACHE"):
            from ..utils.compile_cache import enable_compile_cache
            enable_compile_cache()
        if jax.default_backend() != "cpu":
            from ..ops.linear import enable_pallas_kernels
            enable_pallas_kernels(True)
        self.forward = forward
        self.cfg = cfg
        self.params = params
        self.pad_axis = pad_axis
        self.buckets = tuple(sorted(buckets))
        self.pad_value = pad_value
        self._fn_cache = {}   # static kwargs -> jitted fn (jit re-traces
                              # per array shape on its own)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return n

    def _pad(self, a):
        n = a.shape[self.pad_axis]
        b = self._bucket(n)
        if b == n:
            return a
        widths = [(0, 0)] * a.ndim
        widths[self.pad_axis] = (0, b - n)
        return jnp.pad(a, widths, constant_values=self.pad_value)

    def run(self, *args, **static_kwargs):
        """Execute one inference. Positional args are traced arrays (the
        first is bucket-padded when configured); kwargs are static."""
        arrays = [jnp.asarray(a) for a in args]
        if arrays and self.pad_axis is not None and self.buckets:
            arrays[0] = self._pad(arrays[0])
        key = tuple(sorted(static_kwargs.items()))
        if key not in self._fn_cache:
            cfg, forward = self.cfg, self.forward
            kwargs = dict(static_kwargs)

            def fn(params, *xs):
                return forward(params, cfg, *xs, **kwargs)

            self._fn_cache[key] = jax.jit(fn)
        return self._fn_cache[key](self.params, *arrays)

    def warmup(self, *args, **static_kwargs):
        """Pre-compile for the given example inputs (reference
        Session._prepare_execution analogue)."""
        out = self.run(*args, **static_kwargs)
        jax.block_until_ready(out)
        return out
