"""GenerationSession: the engine's runtime.

Replaces the reference's Python GenerationSession (runtime/generation.py) and
C++ GptSession (runtime/gptSession.cpp) with ONE runtime. Key design deltas,
all TPU-motivated:

- The reference re-binds shapes/buffers and syncs with the host every token
  (generation.py:852-996, should_stop.item() per step). Here the entire
  generation loop — embed -> layers -> logits -> penalties -> sample -> KV
  write -> stop check — runs on device inside a single jitted function using
  `lax.while_loop`, with donated KV buffers. One host call per request batch.
- TRT optimization profiles become prefill length buckets: inputs are padded
  to the nearest bucket and each (bucket, batch, max_new, sampling) tuple is
  compiled once and cached (AOT-compile-on-first-use; `warmup()` precompiles).
- No engine serialization step: XLA's compilation cache plays the role of the
  TRT engine file; "engine build" is weight conversion (convert/).

Sharded execution: pass a Mesh + Mapping and the session lays params/caches
out with NamedSharding; the same jitted functions then run SPMD over the mesh
with XLA inserting the TP collectives (psum after wo/w_down — the exact
collective pattern of reference linear.py:131-137, but compiler-inserted).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..models import llama
from ..ops.attention import KVCache
from ..parallel.mapping import Mapping
from .sampling import (
    SamplingConfig, apply_bad_words, init_token_counts, sample_step,
    stop_words_matched, update_tail, update_token_counts,
)


@dataclasses.dataclass
class GenerationOutput:
    """output_ids: [B, max_new] (pad_id-filled after EOS); lengths: [B].

    With beam_width > 1, beam_ids/beam_lengths/beam_scores hold all beams
    [B, W, T]/[B, W] best-first and output_ids/lengths are the best beam."""

    output_ids: np.ndarray
    lengths: np.ndarray
    beam_ids: np.ndarray = None
    beam_lengths: np.ndarray = None
    beam_scores: np.ndarray = None
    # generate(return_logprobs=True): [B, max_new] f32 — the MODEL's
    # log-softmax probability of each emitted token (pre-penalty/-truncation,
    # 0.0 past EOS). The reference's DynamicDecodeLayer cum_log_probs
    # equivalent is cum_logprobs.
    logprobs: np.ndarray = None

    @property
    def cum_logprobs(self):
        if self.logprobs is None:
            return None
        return self.logprobs.sum(axis=-1)


class GenerationSession:
    def __init__(self, cfg: ModelConfig, params, engine_cfg: EngineConfig,
                 mapping: Optional[Mapping] = None, mesh=None,
                 kv_scales=None, model=None,
                 beam_paged_block: int = 0):
        # beam_paged_block > 0: beam search carries a block-table
        # indirection (runtime/beam.py::_reorder_paged — the reference's
        # cache_indirection) instead of physically gathering the generated
        # KV window each step; per-step reorder traffic becomes
        # O(block_size), constant in generation length.
        self.beam_paged_block = int(beam_paged_block)
        if not os.environ.get("TLLM_NO_COMPILE_CACHE"):
            from ..utils.compile_cache import enable_compile_cache
            enable_compile_cache()   # TRT-engine-file analogue (VERDICT #7)
        self.cfg = cfg
        if model is not None:
            self.model = model
        else:
            from ..models import by_architecture
            self.model = by_architecture(getattr(cfg, "architecture",
                                                 "llama"))
        self.engine_cfg = engine_cfg
        self.mapping = mapping or Mapping()
        self.mesh = mesh
        self.kv_scales = kv_scales
        self.params = params
        if mesh is not None:
            self.params = self._shard_params(params, mesh)
            if hasattr(self.model, "bind_mesh"):   # pipeline shim
                self.model.bind_mesh(mesh)
        elif not os.environ.get("TLLM_NO_FUSE_QKV"):
            # single-device: fuse q/k/v into one matmul (HBM-peak launch vs
            # three half-rate ones; models/llama.fuse_qkv_params). Under TP
            # the per-projection column shards stay separate so head
            # boundaries align with the tp axis.
            fuse = getattr(self.model, "fuse_qkv_params", None)
            if fuse is not None:
                self.params = fuse(self.params)
            # gate/up fusion is opt-in: measured neutral for int8/SQ and a
            # 2.4% regression for grouped int4 at 7B (the fused 22016-col
            # int4 kernel runs slower than 2x11008 despite one less launch)
            fuse_gu = getattr(self.model, "fuse_gate_up_params", None)
            if fuse_gu is not None and os.environ.get("TLLM_FUSE_GU"):
                self.params = fuse_gu(self.params)
        self._use_kernels = (jax.default_backend() != "cpu"
                             or bool(os.environ.get("TLLM_SHARDED_KERNELS")))
        if self._use_kernels and jax.default_backend() != "cpu":
            from ..ops.linear import enable_pallas_kernels
            enable_pallas_kernels(True)
        self._fn_cache = {}

    def _set_kernel_mesh(self):
        """Publish this session's mesh to the kernel registry before any call
        that may trace: under a mesh the dense kernels run inside shard_map
        (ops/linear.py) and everything else falls back to GSPMD-partitionable
        XLA. Set per-call because the registry is process-global and several
        sessions (sharded + single-device) can coexist."""
        from ..ops.registry import KERNELS
        KERNELS["mesh"] = self.mesh if self._use_kernels else None

    # ------------------------------------------------------------------
    def _shard_params(self, params, mesh):
        from ..parallel.sharding import param_shardings
        shardings = param_shardings(self.cfg, mesh, params)
        return jax.device_put(params, shardings)

    def _cache_sharding(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P
        if mesh is None:
            return None
        # heads over tp; optionally S over sp (context-parallel decode);
        # layers over pp (each pipeline stage owns its layers' cache)
        sp_ax = ("sp" if (getattr(self.mapping, "sp", 1) > 1
                          and getattr(self.mapping, "shard_kv_seq", False)
                          and "sp" in mesh.axis_names) else None)
        pp_ax = ("pp" if (getattr(self.mapping, "pp", 1) > 1
                          and "pp" in mesh.axis_names) else None)
        spec = P(pp_ax, None, "tp", sp_ax, None)
        return KVCache(NamedSharding(mesh, spec), NamedSharding(mesh, spec),
                       NamedSharding(mesh, P(pp_ax)))

    def make_caches(self, batch: int, max_len: int) -> KVCache:
        caches = self.model.init_caches(self.cfg, batch, max_len,
                                        self.kv_scales)
        sh = self._cache_sharding(self.mesh)
        if sh is not None:
            caches = jax.device_put(caches, sh)
        return caches

    # ------------------------------------------------------------------
    def _generate_fn(self, bucket: int, max_len: int, max_new: int,
                     scfg: SamplingConfig, use_penalties: bool,
                     use_prompt: bool = False, want_logprobs: bool = False):
        """Build the single jitted end-to-end generate function."""
        cfg = self.cfg

        model = self.model
        tail_len = scfg.tail_len

        def init_tail(input_ids, seq_lens):
            # last tail_len prompt tokens per sequence (left-aligned input);
            # positions before the prompt start read as pad (never match)
            b, s = input_ids.shape
            idx = seq_lens[:, None] - tail_len + jnp.arange(tail_len)[None]
            valid = idx >= 0
            gathered = jnp.take_along_axis(
                input_ids, jnp.clip(idx, 0, s - 1).astype(jnp.int32), axis=1)
            return jnp.where(valid, gathered, scfg.pad_id).astype(jnp.int32)

        inline_caches = self.mesh is None
        kv_scales = self.kv_scales
        max_len_cache = max_len
        # Sequence parallelism: pin the prompt tokens to P(dp?, 'sp') so
        # GSPMD spreads the whole prefill (embed/norm/MLP shard freely over
        # seq; attention K/V get gathered over sp) across the sp axis.
        mesh = self.mesh
        mapping = self.mapping
        sp_on = (mesh is not None and getattr(mapping, "sp", 1) > 1
                 and "sp" in mesh.axis_names and bucket % mapping.sp == 0)

        def fn(params, input_ids, seq_lens, *rest):
            b = input_ids.shape[0]
            if sp_on:
                from jax.sharding import NamedSharding, PartitionSpec as P
                dp_ax = ("dp" if (mapping.dp > 1 and b % mapping.dp == 0)
                         else None)
                input_ids = jax.lax.with_sharding_constraint(
                    input_ids, NamedSharding(mesh, P(dp_ax, "sp")))
            if inline_caches:
                # allocate the KV cache inside the jitted program: saves one
                # host->device dispatch per request (~23 ms through the
                # remote tunnel) and lets XLA own the buffer outright
                caches = model.init_caches(cfg, b, max_len_cache, kv_scales)
                key, extra = rest[0], rest[1:]
            else:
                caches, key, extra = rest[0], rest[1], rest[2:]
            if use_prompt:
                # prompt-tuning table/tasks ride as traced args (GPT family;
                # decode never sees virtual ids — sampled tokens are vocab)
                logits, caches = model.forward_prefill(
                    params, cfg, input_ids, seq_lens, caches,
                    prompt=extra[0])
            else:
                logits, caches = model.forward_prefill(
                    params, cfg, input_ids, seq_lens, caches)
            if use_penalties:
                counts = init_token_counts(input_ids, seq_lens, cfg.vocab_size)
            else:
                counts = None
            tail = (init_tail(input_ids, seq_lens) if tail_len
                    else jnp.zeros((b, 0), jnp.int32))
            key, sub = jax.random.split(key)
            raw_logits = logits
            if scfg.bad_words:
                logits = apply_bad_words(logits, tail, scfg.bad_words)
            tokens = sample_step(logits, scfg, sub, counts,
                                 jnp.zeros((b,), jnp.int32))
            lp = jnp.zeros((b, max_new), jnp.float32)
            if want_logprobs:
                lsm = jax.nn.log_softmax(raw_logits.astype(jnp.float32), -1)
                lp = lp.at[:, 0].set(
                    jnp.take_along_axis(lsm, tokens[:, None], 1)[:, 0])
            if use_penalties:
                counts = update_token_counts(counts, tokens)
            if tail_len:
                tail = update_tail(tail, tokens)
            out = jnp.full((b, max_new), scfg.pad_id, jnp.int32)
            out = out.at[:, 0].set(tokens)
            done = tokens == scfg.end_id
            if scfg.stop_words:
                done = done | stop_words_matched(tail, scfg.stop_words)
            lengths = jnp.ones((b,), jnp.int32)

            def cond(state):
                step, _, _, _, done, *_ = state
                return (step < max_new) & ~jnp.all(done)

            def body(state):
                (step, tokens, positions, caches, done, out, lengths, key,
                 counts, tail, lp) = state
                logits, caches = model.forward_decode(
                    params, cfg, tokens, positions, caches)
                key, sub = jax.random.split(key)
                gen_lens = jnp.full((b,), 0, jnp.int32) + step
                raw_logits = logits
                if scfg.bad_words:
                    logits = apply_bad_words(logits, tail, scfg.bad_words)
                nxt = sample_step(logits, scfg, sub, counts, gen_lens)
                nxt = jnp.where(done, scfg.pad_id, nxt)
                if want_logprobs:
                    lsm = jax.nn.log_softmax(
                        raw_logits.astype(jnp.float32), -1)
                    step_lp = jnp.take_along_axis(
                        lsm, jnp.clip(nxt, 0, None)[:, None], 1)[:, 0]
                    lp = lp.at[:, step].set(jnp.where(done, 0.0, step_lp))
                if counts is not None:
                    counts = update_token_counts(
                        counts, jnp.where(done, 0, nxt))
                if tail_len:
                    tail = update_tail(tail, nxt)
                out = out.at[:, step].set(nxt)
                new_done = done | (nxt == scfg.end_id)
                if scfg.stop_words:
                    new_done = new_done | (
                        ~done & stop_words_matched(tail, scfg.stop_words))
                lengths = lengths + (~done).astype(jnp.int32)
                positions = positions + (~done).astype(jnp.int32)
                return (step + 1, nxt, positions, caches, new_done, out,
                        lengths, key, counts, tail, lp)

            state = (jnp.int32(1), tokens, seq_lens, caches, done, out,
                     lengths, key, counts, tail, lp)
            state = jax.lax.while_loop(cond, body, state)
            (_, _, _, caches, _, out, lengths, _, _, _, lp) = state
            if inline_caches:
                return out, lengths, lp
            return out, lengths, lp, caches

        if inline_caches:
            return jax.jit(fn)
        return jax.jit(fn, donate_argnums=(3,))  # caches: in-place KV update

    def _get_fn(self, bucket, max_len, max_new, scfg, use_prompt=False,
                want_logprobs=False):
        use_penalties = (scfg.repetition_penalty != 1.0
                         or scfg.presence_penalty != 0.0
                         or scfg.frequency_penalty != 0.0)
        key = (bucket, max_len, max_new, scfg, use_penalties, use_prompt,
               want_logprobs)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._generate_fn(
                bucket, max_len, max_new, scfg, use_penalties, use_prompt,
                want_logprobs)
        return self._fn_cache[key]

    # ------------------------------------------------------------------
    def generate(self, input_ids, seq_lens=None,
                 sampling: Optional[SamplingConfig] = None,
                 max_new_tokens: int = 32, seed: int = 0,
                 prompt=None, return_logprobs: bool = False
                 ) -> GenerationOutput:
        """input_ids: [B, S] numpy (right-padded with pad_id) or list of lists.

        prompt: optional models.gpt.PromptTuning — virtual-token ids
        (>= vocab_size) in input_ids select rows of prompt.table (the
        reference's prompt_embedding_table/tasks inputs).
        return_logprobs: also return the model's log-softmax probability of
        every emitted token (GenerationOutput.logprobs / .cum_logprobs —
        the reference's DynamicDecodeLayer output_log_probs contract)."""
        scfg = sampling or SamplingConfig()
        if isinstance(input_ids, (list, tuple)):
            if seq_lens is None:
                seq_lens = np.array([len(x) for x in input_ids], np.int32)
            s = int(max(len(x) for x in input_ids))
            arr = np.full((len(input_ids), s), scfg.pad_id, np.int32)
            for i, x in enumerate(input_ids):
                arr[i, :len(x)] = x
            input_ids = arr
        input_ids = np.asarray(input_ids)
        b, s = input_ids.shape
        if seq_lens is None:
            seq_lens = np.full((b,), s, np.int32)
        if int(np.max(seq_lens)) + max_new_tokens > self.engine_cfg.max_seq_len:
            # decode steps past the cache end would be silently dropped by
            # the scatter (garbage tokens); reject like the reference does
            raise ValueError(
                f"prompt ({int(np.max(seq_lens))}) + max_new_tokens "
                f"({max_new_tokens}) exceeds max_seq_len "
                f"{self.engine_cfg.max_seq_len}")
        bucket = self.engine_cfg.bucket_for(s)
        padded = np.full((b, bucket), scfg.pad_id, np.int32)
        padded[:, :s] = input_ids
        max_len = min(self.engine_cfg.max_seq_len, bucket + max_new_tokens)

        self._set_kernel_mesh()
        if scfg.beam_width > 1:
            if prompt is not None or return_logprobs:
                raise NotImplementedError(
                    "beam search does not support prompt tuning or "
                    "return_logprobs (beam scores are returned instead)")
            return self._generate_beam(padded, seq_lens, scfg,
                                       max_new_tokens, max_len)

        fn = self._get_fn(bucket, max_len, max_new_tokens, scfg,
                          use_prompt=prompt is not None,
                          want_logprobs=return_logprobs)
        extra = (prompt,) if prompt is not None else ()
        if self.mesh is None:
            out, lengths, lp = fn(self.params, jnp.asarray(padded),
                                  jnp.asarray(seq_lens, jnp.int32),
                                  jax.random.PRNGKey(seed), *extra)
        else:
            caches = self.make_caches(b, max_len)
            out, lengths, lp, _ = fn(self.params, jnp.asarray(padded),
                                     jnp.asarray(seq_lens, jnp.int32),
                                     caches, jax.random.PRNGKey(seed),
                                     *extra)
        # ONE batched d2h round trip: through the axon tunnel each
        # synchronous readback costs ~27 ms regardless of size, while
        # jax.device_get of a tuple fetches everything in a single trip
        # (measured 111.7 ms for 4 sequential np.asarray vs 26.8 ms
        # batched) — per-call fixed cost dominates short generations.
        out, lengths, lp = jax.device_get(
            (out, lengths, lp if return_logprobs else None))
        return GenerationOutput(out, lengths,
                                logprobs=lp if return_logprobs else None)

    def _generate_beam(self, padded, seq_lens, scfg: SamplingConfig,
                       max_new: int, max_len: int) -> GenerationOutput:
        from .beam import beam_search_decode

        b = padded.shape[0]
        key = ("beam", padded.shape[1], max_len, max_new, scfg)
        if key not in self._fn_cache:
            cfg = self.cfg

            model = self.model

            paged_blk = self.beam_paged_block
            kv_scales = self.kv_scales

            def fn(params, input_ids, seq_lens, caches):
                return beam_search_decode(
                    params, cfg, input_ids, seq_lens, caches, model=model,
                    beam_width=scfg.beam_width, max_new_tokens=max_new,
                    end_id=scfg.end_id, pad_id=scfg.pad_id,
                    length_penalty=scfg.length_penalty,
                    paged_block=paged_blk, kv_scales=kv_scales)

            # no donation: beam_search_decode returns only (ids, lens,
            # scores) — the cache is scan-carried (aliased in place inside
            # the loop) but is not an output, so donating its argument
            # cannot alias anything and only triggers XLA's
            # donated-buffers-not-usable warning.
            self._fn_cache[key] = jax.jit(fn)
        caches = (0 if self.beam_paged_block       # built in-graph (paged)
                  else self.make_caches(b * scfg.beam_width, max_len))
        out, lens, scores = self._fn_cache[key](
            self.params, jnp.asarray(padded),
            jnp.asarray(seq_lens, jnp.int32), caches)
        # one batched d2h trip (see generate: ~27 ms per sync readback)
        out, lens, scores = jax.device_get((out, lens, scores))
        return GenerationOutput(out[:, 0], lens[:, 0], out, lens, scores)

    def warmup(self, batch: int, bucket: int, max_new: int,
               sampling: Optional[SamplingConfig] = None):
        """Precompile a shape combination (the 'engine build' step)."""
        scfg = sampling or SamplingConfig()
        ids = np.full((batch, bucket), scfg.pad_id, np.int32)
        self.generate(ids, np.full((batch,), bucket, np.int32), scfg,
                      max_new_tokens=max_new)
