"""ServingEngine: continuous batching over a fixed slot pool.

The execution half of the batch manager (reference GptManager::step +
gptSessionWithDecoderBatch): requests stream in, each is prefilled into a
free slot of the shared stacked KV cache, and every engine step advances
ALL active slots by up to `decode_chunk` tokens in one jitted device call.
Done and out-of-budget slots self-freeze on device via masking, so the host
only intervenes at chunk boundaries — amortizing dispatch latency the same
way the reference amortizes per-step enqueues with in-flight batching.

In-flight batching semantics (reference GptManager.h:48-89 +
ibGptAttentionPlugin):
- per-request SamplingConfig (`submit(..., sampling=...)` with
  `per_request_sampling=True`): the decode step is vectorized over slots
  (sampling.sample_step_slots) so one compiled step serves any mix of
  greedy / top-k / top-p / penalized requests;
- admission prefills are grouped: same-bucket admits run as one batched
  prefill call (group sizes padded to powers of two; pad rows land in a
  reserved trash slot so no recompilation per group size);
- per-slot decode budgets are enforced on device — one nearly-done request
  no longer throttles every other slot to 1-token chunks.

Device layout: one cache [L, max_slots + 1, H, max_seq_len, D]; slot i owns
row i; row max_slots is the prefill-padding trash slot (never decoded,
always inactive).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..models import llama
from .sampling import (
    SamplingConfig, SlotSamplingParams, init_token_counts, sample_step,
    sample_step_slots, update_tail,
)
from .scheduler import Request, Scheduler


@dataclasses.dataclass
class FinishedRequest:
    request_id: int
    output_ids: List[int]
    finished_reason: str
    logprobs: Optional[List[float]] = None   # set when return_logprobs


def _chosen_lp(logits, tokens, enabled: bool):
    """Model log-softmax prob of the sampled token ([B] f32; zeros when
    logprob reporting is off, keeping every fn's return arity fixed)."""
    if not enabled:
        return jnp.zeros(tokens.shape, jnp.float32)
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lsm, tokens[:, None], 1)[:, 0]


def _pow2_groups(n: int, cap: int):
    """Split n into descending power-of-two group sizes <= cap."""
    out = []
    g = 1
    while g * 2 <= cap:
        g *= 2
    while n > 0:
        while g > n:
            g //= 2
        out.append(g)
        n -= g
    return out


class ServingEngine:
    def __init__(self, cfg: ModelConfig, params, engine_cfg: EngineConfig,
                 sampling: Optional[SamplingConfig] = None,
                 kv_scales=None, decode_chunk: int = 8, model=None,
                 paged: bool = False, block_size: int = 64,
                 num_blocks: Optional[int] = None,
                 per_request_sampling: bool = False,
                 packed_prefill: bool = False,
                 prefill_chunk: Optional[int] = None,
                 return_logprobs: bool = False,
                 cache_headroom: int = 0,
                 max_bad_words: int = 0,
                 max_bad_word_len: int = 4,
                 mixed_step: bool = False,
                 pipelined: bool = False,
                 mapping=None, mesh=None):
        if not os.environ.get("TLLM_NO_COMPILE_CACHE"):
            from ..utils.compile_cache import enable_compile_cache
            enable_compile_cache()
        self.cfg = cfg
        if model is not None:
            self.model = model
        else:
            from ..models import by_architecture
            self.model = by_architecture(getattr(cfg, "architecture",
                                                 "llama"))
        # sharded serving: a tp (or ep×tp for MoE) mesh — params/caches get
        # NamedShardings and GSPMD partitions the same jitted step fns.
        # The batch axis is the slot pool (replicated; dp makes no sense
        # over one shared request queue), so dp/sp/pp are rejected here.
        from ..parallel.mapping import Mapping
        self.mapping = mapping or Mapping()
        self.mesh = mesh
        if mesh is not None and (self.mapping.dp * self.mapping.pp != 1
                                 or getattr(self.mapping, "shard_kv_seq",
                                            False)):
            raise ValueError(
                "sharded serving supports tp (and ep) axes, plus sp for "
                "prefill compute — the slot pool is the batch, so dp/pp "
                "(and sp-sharded KV) are rejected")
        # sp composes as PREFILL sharding only: long-prompt admission FLOPs
        # spread over the sp axis (with_sharding_constraint on the token
        # grid, same mechanism as GenerationSession); decode and the KV
        # cache stay sharded over tp heads only.
        self._sp_on = (mesh is not None and "sp" in mesh.axis_names
                       and getattr(self.mapping, "sp", 1) > 1)
        # Multi-host continuous batching (reference GptManager.h:48-89 runs
        # request/response callbacks on the driving rank): every process
        # executes the identical SPMD step() program over a global mesh;
        # process 0 is the sole request entry point and broadcasts queued
        # submit/cancel ops at each step boundary (_sync_ops). Because the
        # Scheduler is a deterministic function of those ops plus tokens
        # read from fully-replicated device arrays, all hosts' schedulers
        # stay in lockstep without any further coordination.
        self.multihost = jax.process_count() > 1
        self._stopped = False
        self._pending_ops: List[tuple] = []
        # pipelined decode (see step()): the previous chunk's un-read
        # device outputs; its readback overlaps the next chunk's compute
        self._pending_chunk = None
        if self.multihost:
            if mesh is None or mesh.devices.size != jax.device_count():
                raise ValueError(
                    "multi-host serving needs a mesh spanning every device "
                    "of every process (parallel.multihost.pod_mesh)")
            self._is_sched = jax.process_index() == 0
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._repl = NamedSharding(mesh, P())
        else:
            self._is_sched = True
            self._repl = None
        self.params = params
        if mesh is not None:
            from ..parallel.sharding import param_shardings
            # under multi-host the source arrays are process-local; go
            # through numpy so device_put can place each process's
            # addressable shards of the global array
            put = ((lambda a, s: jax.device_put(np.asarray(a), s))
                   if self.multihost else jax.device_put)
            self.params = jax.tree.map(
                put, params, param_shardings(cfg, mesh, params))
            if hasattr(self.model, "bind_mesh"):
                self.model.bind_mesh(mesh)
        elif not os.environ.get("TLLM_NO_FUSE_QKV"):
            fuse = getattr(self.model, "fuse_qkv_params", None)
            if fuse is not None:   # single-host serving: same fusion as
                self.params = fuse(self.params)   # GenerationSession
        self.engine_cfg = engine_cfg
        self.scfg = sampling or SamplingConfig()
        self.decode_chunk = decode_chunk
        self.max_slots = engine_cfg.max_batch_size
        self.n_rows = self.max_slots + 1      # +1 = prefill-padding trash slot
        self.trash_slot = self.max_slots
        self.paged = paged
        self.per_request = per_request_sampling
        # packed (remove-padding) admission: all admits of a step prefill as
        # ONE flattened token stream regardless of length mix. Capability
        # checks are against the RESOLVED model (architecture registry),
        # not the llama default.
        self.packed = (packed_prefill and not paged
                       and hasattr(self.model, "forward_prefill_packed"))
        if packed_prefill and not self.packed and not paged:
            raise ValueError(
                f"model family {getattr(cfg, 'architecture', 'llama')!r} "
                "has no packed-prefill path")
        # chunked-context admission: prompts longer than prefill_chunk are
        # prefilled C tokens per engine step (via forward_extend at cache
        # offsets), interleaved with decode chunks for the other slots — so
        # one long prompt no longer stalls every in-flight request for a
        # whole monolithic prefill. The final chunk overlaps backward to
        # stay exactly C tokens (rewriting identical K/V), keeping one
        # compiled shape and no pad-token cache writes. Dense cache only.
        self.prefill_chunk = (int(prefill_chunk) if prefill_chunk
                              and not paged and not self.packed else None)
        if self.prefill_chunk is not None and self.prefill_chunk < 16:
            raise ValueError("prefill_chunk must be >= 16")
        if (self.prefill_chunk is not None
                and not hasattr(self.model, "forward_extend")):
            raise ValueError(
                f"model family {getattr(cfg, 'architecture', 'llama')!r} "
                "has no forward_extend — chunked prefill unavailable")
        # mixed step (reference ibGptAttention's per-request mixed
        # context/generation dispatch, by a different decomposition): fold
        # the admission prefill and the decode chunk into ONE jitted call —
        # fresh slots are activated in-graph and join the same chunk's
        # decode loop, saving one dispatch per step under churn at the cost
        # of a (bucket, nb, chunk)-product compile space. Dense cache only;
        # measured comparison in docs/serving.md.
        self.mixed = (bool(mixed_step) and not paged and not self.packed
                      and prefill_chunk is None)
        if mixed_step and not self.mixed:
            raise ValueError("mixed_step needs the dense non-packed, "
                             "non-chunked-prefill configuration")
        # pipelined decode: dispatch chunk N before reading chunk N-1, so
        # the ~27 ms tunnel readback + host bookkeeping + admission
        # prefills all overlap chunk N's compute (see step()). Composes
        # with paged since r5: block tables are rebuilt from the host
        # mirror (no device read, so nothing synchronizes on the in-flight
        # chunk; stale writes from slots frozen in the unprocessed chunk
        # land in blocks that stream-order guarantees are overwritten by
        # any later prefill). Mutually exclusive with mixed_step (which
        # fuses the phases instead) and multi-host (lockstep op sync per
        # step).
        self.pipelined = bool(pipelined)
        if self.pipelined and (mixed_step or self.multihost):
            raise ValueError("pipelined serving needs the non-mixed, "
                             "single-host configuration")
        self._partial: Dict[int, int] = {}    # request_id -> next chunk start
        # per-request model logprobs of emitted tokens (engine-side so the
        # host scheduler - and its C++ twin - stay token-only)
        self.return_logprobs = return_logprobs
        self._req_logprobs: Dict[int, List[float]] = {}
        if jax.default_backend() != "cpu":
            # mirror GenerationSession: hot matmuls through Pallas kernels
            from ..ops.linear import enable_pallas_kernels
            enable_pallas_kernels(True)

        self._capacity_precheck(cfg, engine_cfg, cache_headroom, paged,
                                block_size, num_blocks)

        if paged:
            from ..ops.paged_attention import init_paged_caches
            from .kv_cache_manager import KVCacheManager

            self.block_size = block_size
            self.max_blocks = -(-engine_cfg.max_seq_len // block_size)
            self.num_blocks = (num_blocks if num_blocks is not None
                               else self.max_slots * self.max_blocks)
            self.kv_mgr = KVCacheManager(self.num_blocks, block_size,
                                         self.max_blocks)
            self.scheduler = Scheduler(
                self.max_slots, engine_cfg.max_seq_len,
                kv_token_capacity=self.num_blocks * block_size)
            # pool gets one extra "trash" block: inactive slots' writes land
            # there instead of corrupting live blocks
            self.trash_block = self.num_blocks
            self.caches = init_paged_caches(
                cfg, self.num_blocks + 1, block_size, self.n_rows,
                self.max_blocks, kv_scales)
            self.caches = self.caches._replace(
                tables=jnp.full((self.n_rows, self.max_blocks),
                                self.trash_block, jnp.int32))
            # Host MIRROR of the block tables. The device never writes
            # tables (allocation is host-side in kv_mgr; kernels only read
            # them), so the decode dispatch can rebuild rows from this
            # mirror and upload — r4 instead did a device->host table READ
            # each chunk (measured: paged dispatch 38.2 ms/step vs dense
            # 0.9, scripts/measure_r4.jsonl), which both taxed every step
            # by a tunnel round and forced paged serving to stay
            # un-pipelined (the read synchronizes on the in-flight chunk).
            self._tables_np = np.full((self.n_rows, self.max_blocks),
                                      self.trash_block, np.int32)
        else:
            self.scheduler = Scheduler(self.max_slots, engine_cfg.max_seq_len)
            # cache_headroom: extra positions past max_seq_len (speculative
            # serving's verify slab writes up to gamma past the budget)
            self.caches = self.model.init_caches(
                cfg, self.n_rows, engine_cfg.max_seq_len + cache_headroom,
                kv_scales)
        self._kv_scales = kv_scales
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            kv_spec = P(None, None, "tp", None, None)   # heads over tp
            put = ((lambda a, s: jax.device_put(np.asarray(a), s))
                   if self.multihost else jax.device_put)
            self.caches = jax.tree.map(
                put, self.caches,
                jax.tree.map(
                    lambda a: NamedSharding(
                        mesh, kv_spec if a.ndim == 5
                        else P(*([None] * a.ndim))),
                    self.caches))
        # per-slot device state ([n_rows]; the trash row is never active)
        self.slot_lens = self._dev(np.zeros((self.n_rows,), np.int32))
        self.slot_tokens = self._dev(np.zeros((self.n_rows,), np.int32))
        self.slot_active = self._dev(np.zeros((self.n_rows,), bool))
        self.slot_budget = self._dev(np.zeros((self.n_rows,), np.int32))
        self.slot_gen = self._dev(np.zeros((self.n_rows,), np.int32))
        # bad-word banning is in-graph (the decode chunk runs whole on
        # device); it rides the per-slot vectorized sampler, so it needs
        # per_request_sampling. stop_words need nothing here: they are
        # matched host-side at chunk boundaries in any mode.
        self.max_bad_words = max_bad_words
        self.max_bad_word_len = max_bad_word_len if max_bad_words else 0
        if max_bad_words and not self.per_request:
            raise ValueError("max_bad_words needs per_request_sampling=True")
        if self.scfg.bad_words and not max_bad_words:
            raise ValueError(
                "engine-default bad_words need max_bad_words > 0 (and "
                "per_request_sampling=True)")
        if self.scfg.bad_words and any(
                t < 0 or t >= cfg.vocab_size
                for w in self.scfg.bad_words for t in w):
            raise ValueError(
                f"bad_words token ids must be in [0, {cfg.vocab_size})")
        if self.per_request:
            self.slot_params = jax.tree.map(
                self._dev, SlotSamplingParams.neutral(
                    self.n_rows, max_bad_words, self.max_bad_word_len))
            self.slot_counts = self._dev(
                np.zeros((self.n_rows, cfg.vocab_size), np.int32))
        if max_bad_words:
            # last L-1 generated tokens per slot; -2 = "before generation
            # start" (never equals a real token id, so words longer than
            # the generated history cannot match)
            self.slot_tail = self._dev(np.full(
                (self.n_rows, max(self.max_bad_word_len - 1, 1)), -2,
                np.int32))
        self._req_sampling: Dict[int, SamplingConfig] = {}
        # --- observability (reference gpt_benchmark.py:330-347 reports
        # percentile latencies; GptManager exposes per-step stats) --------
        # per-phase wall time accumulators: admission (prefill dispatch +
        # its blocking readbacks), decode dispatch (host enqueue of the
        # chunk), readback (blocks until device compute + d2h finish), and
        # host bookkeeping (token recording / stop criteria / slot frees)
        self.phase_times = {"admit": 0.0, "dispatch": 0.0,
                            "readback": 0.0, "host": 0.0, "steps": 0}
        # TLLM_SPLIT_READBACK=1: split 'readback' into 'compute' (a 1-row
        # completion-marker fetch that drains the device queue) and
        # 'transfer' (the real output arrays, transfer-only once compute
        # is drained). Answers whether the binding resource is the TPU or
        # the tunnel (VERDICT r4 weak #6: the blocking device_get absorbed
        # the chunk's compute, so "readback dominates" could not say
        # which). Costs one extra ~27 ms tunnel round per chunk — a
        # measurement mode, not a production default.
        self._split_readback = bool(os.environ.get("TLLM_SPLIT_READBACK"))
        if self._split_readback:
            self.phase_times["compute"] = 0.0
            self.phase_times["transfer"] = 0.0
        # rid -> [t_submit, t_first_token, t_done, n_tokens_recorded]
        self._req_times: Dict[int, list] = {}
        self._fn_cache = {}
        self._key = self._dev(jax.random.PRNGKey(0))

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------
    def _capacity_precheck(self, cfg, engine_cfg, cache_headroom, paged,
                           block_size, num_blocks):
        """Fail fast (with remedies) instead of a mid-run RESOURCE_EXHAUSTED.

        The engine knows every device shape at construction; r4's serving
        matrix instead died deep inside a decode dispatch / admission
        readback (scripts/measure_r4.err, 16/32-slot dense int8 7B). The
        estimate: weights + 2x the KV pool (the scan-carried cache costs an
        XLA loop-carry copy alongside the donated buffer in the worst
        phase) + prefill transients, against the device budget.

        Budget source: `TLLM_HBM_BYTES` env when set; else 16 GiB on TPU
        backends (v5e); CPU runs are unchecked (tests). Sharded engines
        (mesh) are skipped — per-device footprints divide by the axis
        sizes and the multihost path has its own placement. Escape hatch:
        TLLM_SKIP_CAPACITY_CHECK=1.
        """
        if self.mesh is not None or os.environ.get(
                "TLLM_SKIP_CAPACITY_CHECK"):
            return
        budget = os.environ.get("TLLM_HBM_BYTES")
        if budget is None:
            if jax.default_backend() == "cpu":
                return
            budget = 16 * 1024 ** 3
        budget = int(budget)
        est = self._capacity_estimate(cfg, engine_cfg, cache_headroom,
                                      paged, block_size, num_blocks)
        weights, kv = est["weights"], est["kv"]
        act, scratch, logits = est["act"], est["scratch"], est["logits"]
        need = est["need"]
        if need > budget:
            gib = 1024 ** 3
            raise ValueError(
                f"serving configuration needs ~{need / gib:.1f} GiB "
                f"(weights {weights / gib:.1f} + 2x KV pool "
                f"{2 * kv / gib:.1f} + transients "
                f"{(act + scratch + logits) / gib:.1f}) but the device "
                f"budget is {budget / gib:.1f} GiB. Remedies: int8 KV "
                "(QuantMode.INT8_KV_CACHE) halves the KV pool; "
                "paged=True sizes the pool by blocks instead of "
                "max_batch_size*max_seq_len; or lower max_batch_size/"
                "max_seq_len. Override: TLLM_HBM_BYTES / "
                "TLLM_SKIP_CAPACITY_CHECK=1.")

    def _capacity_estimate(self, cfg, engine_cfg, cache_headroom, paged,
                           block_size, num_blocks) -> dict:
        """Byte estimate behind _capacity_precheck (own method so tests can
        assert the model: weights + 2x KV pool + admission transients)."""
        def tree_bytes(t):
            return sum(int(np.prod(a.shape)) * jnp.dtype(a.dtype).itemsize
                       for a in jax.tree.leaves(t))

        weights = tree_bytes(self.params)
        smax = engine_cfg.max_seq_len + cache_headroom
        if paged:
            nb = (num_blocks if num_blocks is not None
                  else self.max_slots * (-(-engine_cfg.max_seq_len
                                           // block_size)))
            kv_rows = (nb + 1) * block_size
        else:
            kv_rows = self.n_rows * (-(-smax // 128) * 128)
        from ..config import str_dtype_to_jnp
        kv_item = jnp.dtype(str_dtype_to_jnp(cfg.kv_dtype)).itemsize
        kv = (2 * cfg.num_layers * cfg.num_kv_heads * cfg.head_dim
              * kv_rows * kv_item)
        # admission transient: the largest prefill group's activations
        # (~6 residual-width + 4 intermediate-width live tensors per token)
        # plus its scratch cache, plus decode logits
        bucket = max(getattr(engine_cfg, "prefill_buckets", None)
                     or (engine_cfg.max_input_len,))
        nb_adm = 1
        while nb_adm * 2 <= self.max_slots:
            nb_adm *= 2
        act = nb_adm * bucket * (6 * cfg.hidden_size
                                 + 4 * cfg.intermediate_size) * 2
        scratch = (2 * cfg.num_layers * cfg.num_kv_heads * cfg.head_dim
                   * nb_adm * bucket * kv_item)
        logits = self.n_rows * cfg.vocab_size * 4 * 2
        return {"weights": weights, "kv": kv, "act": act,
                "scratch": scratch, "logits": logits,
                "need": weights + 2 * kv + act + scratch + logits}

    # ------------------------------------------------------------------
    def _dev(self, x):
        """Host value -> device array. Under multi-host: a fully-replicated
        GLOBAL array (every process passes the identical value — guaranteed
        by the lockstep scheduler), so the same jitted SPMD step accepts it
        on every host."""
        if self._repl is not None:
            return jax.device_put(np.asarray(x), self._repl)
        return jnp.asarray(x)

    def _read(self, a):
        """Device array -> numpy, readable on every host. Replicated global
        arrays are read from a local shard; if GSPMD left an output sharded
        instead, gather it (all processes run this line together)."""
        if self._repl is not None and not a.is_fully_replicated:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(a,
                                                                tiled=True))
        return np.asarray(a)

    def _read_many(self, *arrays):
        """Batched device -> host readback: ONE round trip for all arrays.

        Through the axon tunnel every synchronous readback costs ~27 ms
        regardless of size (measured: 4 sequential np.asarray = 111.7 ms,
        jax.device_get of the 4-tuple = 26.8 ms). Serving steps read
        several small arrays per step, so sequential reads would tax every
        step by a multiple of the tunnel latency. None entries pass
        through. Multi-host falls back to per-array _read (allgather is
        its own collective round)."""
        if self._repl is not None:
            return tuple(None if a is None else self._read(a)
                         for a in arrays)
        return jax.device_get(arrays)

    # ------------------------------------------------------------------
    def _prefill_fn(self, bucket: int, nb: int):
        return jax.jit(self._prefill_body(bucket, nb), donate_argnums=(1,))

    def _prefill_body(self, bucket: int, nb: int):
        """Batched prefill: nb requests into their slots, one device call."""
        cfg, scfg, model = self.cfg, self.scfg, self.model
        per_request = self.per_request
        want_lp = self.return_logprobs

        sp_on = self._sp_on and bucket % self.mapping.sp == 0
        mesh = self.mesh

        def fn(params, caches, ids, lengths, slots, key, slot_params):
            if sp_on:
                from jax.sharding import NamedSharding, PartitionSpec as P
                ids = jax.lax.with_sharding_constraint(
                    ids, NamedSharding(mesh, P(None, "sp")))
            scratch = model.init_caches(cfg, nb, bucket, self._kv_scales)
            logits, scratch = model.forward_prefill(
                params, cfg, ids, lengths, scratch)
            if per_request:
                counts = init_token_counts(ids, lengths, cfg.vocab_size)
                gp = jax.tree.map(lambda a: a[slots], slot_params)
                tokens = sample_step_slots(logits, gp, key, counts,
                                           jnp.zeros((nb,), jnp.int32),
                                           scfg.end_id)
                counts = counts.at[jnp.arange(nb), tokens].add(1)
            else:
                tokens = sample_step(logits, scfg, key)
                counts = None
            lp = _chosen_lp(logits, tokens, want_lp)
            # insert each request's KV rows at its slot (trash slot absorbs
            # the power-of-two padding rows)
            k, v = caches.k, caches.v
            for i in range(nb):
                sl = (0, slots[i], 0, 0, 0)
                k = jax.lax.dynamic_update_slice(k, scratch.k[:, i:i + 1], sl)
                v = jax.lax.dynamic_update_slice(v, scratch.v[:, i:i + 1], sl)
            return caches._replace(k=k, v=v), tokens, counts, lp

        return fn

    def _paged_prefill_fn(self, bucket: int, nb: int):
        cfg, scfg = self.cfg, self.scfg
        model = self.model
        per_request = self.per_request
        want_lp = self.return_logprobs

        def fn(params, caches, ids, lengths, table_rows, slots, key,
               slot_params):
            # nb-row view sharing the pools; scatters go to these requests'
            # blocks (pad rows' tables are all trash-block)
            view = caches._replace(tables=table_rows)
            logits, view = model.forward_prefill(params, cfg, ids, lengths,
                                                 view)
            if per_request:
                counts = init_token_counts(ids, lengths, cfg.vocab_size)
                gp = jax.tree.map(lambda a: a[slots], slot_params)
                tokens = sample_step_slots(logits, gp, key, counts,
                                           jnp.zeros((nb,), jnp.int32),
                                           scfg.end_id)
                counts = counts.at[jnp.arange(nb), tokens].add(1)
            else:
                tokens = sample_step(logits, scfg, key)
                counts = None
            lp = _chosen_lp(logits, tokens, want_lp)
            return (caches._replace(pool_k=view.pool_k, pool_v=view.pool_v),
                    tokens, counts, lp)

        return jax.jit(fn, donate_argnums=(1,))

    def _t_bucket(self, t: int) -> int:
        """Pow2 ladder for the packed stream length."""
        b = 16
        cap = self.max_slots * self.engine_cfg.max_input_len
        while b < t and b < cap:
            b *= 2
        return min(b, max(cap, 16))

    def _packed_prefill_fn(self, t_bucket: int):
        """All admitted requests as ONE packed token stream (remove-padding,
        reference RaggedTensor/remove_input_padding): no bucket-pad FLOPs
        for mixed-length admissions. Compiles per T bucket only — sequence
        count is fixed at max_slots (trash-slot padding)."""
        from ..ops.attention import PackedMeta

        cfg, scfg, model = self.cfg, self.scfg, self.model
        per_request = self.per_request
        ms = self.max_slots
        want_lp = self.return_logprobs

        def fn(params, caches, token_ids, seg_ids, slot_tok, pos_tok,
               last_idx, slots, key, slot_params):
            packed = PackedMeta(seg_ids, slot_tok, pos_tok)
            logits, caches = model.forward_prefill_packed(
                params, cfg, token_ids, packed, last_idx, caches)
            if per_request:
                seg_safe = jnp.where(seg_ids >= 0, seg_ids, ms)
                counts = jnp.zeros((ms + 1, cfg.vocab_size), jnp.int32)
                counts = counts.at[seg_safe, token_ids].add(1)[:ms]
                gp = jax.tree.map(lambda a: a[slots], slot_params)
                tokens = sample_step_slots(logits, gp, key, counts,
                                           jnp.zeros((ms,), jnp.int32),
                                           scfg.end_id)
                counts = counts.at[jnp.arange(ms), tokens].add(1)
            else:
                tokens = sample_step(logits, scfg, key)
                counts = None
            return caches, tokens, counts, _chosen_lp(logits, tokens,
                                                      want_lp)

        return jax.jit(fn, donate_argnums=(1,))

    def _admit_packed(self, reqs: List[Request]) -> List[FinishedRequest]:
        """Prefill every admitted request in one packed device call."""
        finished = []
        total = sum(len(r.input_ids) for r in reqs)
        tb = self._t_bucket(total)
        # split if the stream exceeds the largest bucket
        if total > tb:
            cut, acc = 0, 0
            for i, r in enumerate(reqs):
                if acc + len(r.input_ids) > tb:
                    cut = i
                    break
                acc += len(r.input_ids)
            return (self._admit_packed(reqs[:max(cut, 1)])
                    + self._admit_packed(reqs[max(cut, 1):]))
        ms = self.max_slots
        token_ids = np.zeros((tb,), np.int32)
        seg_ids = np.full((tb,), -1, np.int32)
        slot_tok = np.full((tb,), self.trash_slot, np.int32)
        pos_tok = np.zeros((tb,), np.int32)
        last_idx = np.full((ms,), tb - 1, np.int32)
        slots = np.full((ms,), self.trash_slot, np.int32)
        off = 0
        for i, req in enumerate(reqs):
            n = len(req.input_ids)
            token_ids[off:off + n] = req.input_ids
            seg_ids[off:off + n] = i
            slot_tok[off:off + n] = req.slot
            pos_tok[off:off + n] = np.arange(n)
            last_idx[i] = off + n - 1
            slots[i] = req.slot
            off += n
            if self.per_request:
                scfg_i = self._req_sampling.get(req.request_id, self.scfg)
                self.slot_params = self.slot_params.set_slot(req.slot, scfg_i)
        slot_params = self.slot_params if self.per_request else 0
        fn = self._get(("packed_prefill", tb), self._packed_prefill_fn, tb)
        self.caches, tokens, counts, lps = fn(
            self.params, self.caches, self._dev(token_ids),
            self._dev(seg_ids), self._dev(slot_tok),
            self._dev(pos_tok), self._dev(last_idx), self._dev(slots),
            self._next_key(), slot_params)
        tokens, lps = self._read_many(tokens, lps)
        if self.per_request and counts is not None:
            self.slot_counts = self.slot_counts.at[self._dev(slots)].set(
                counts)
        finished.extend(self._register_prefilled(reqs, tokens, lps))
        return finished

    def _chunk_prefill_fn(self, nb: int):
        """One C-token prefill chunk for nb partially-prefilled requests.

        Chunked context (the reference leaves all prefill monolithic): each
        call runs model.forward_extend over [nb, C] prompt slabs at per-row
        cache offsets. The last row of a request's FINAL chunk is its last
        prompt token, so its logits seed generation exactly like a full
        prefill."""
        cfg, scfg, model = self.cfg, self.scfg, self.model
        per_request = self.per_request
        want_lp = self.return_logprobs
        nbi = jnp.arange(nb)

        def fn(params, caches, ids, starts, slots, key, slot_params, counts):
            view = type(caches)(caches.k[:, slots], caches.v[:, slots],
                                caches.scale)
            logits, view = model.forward_extend(params, cfg, ids, starts,
                                                view)
            k = caches.k.at[:, slots].set(view.k)
            v = caches.v.at[:, slots].set(view.v)
            last = logits[:, -1]
            if per_request:
                gp = jax.tree.map(lambda a: a[slots], slot_params)
                tokens = sample_step_slots(last, gp, key, counts,
                                           jnp.zeros((nb,), jnp.int32),
                                           scfg.end_id)
                counts = counts.at[nbi, tokens].add(1)
            else:
                tokens = sample_step(last, scfg, key)
            return (caches._replace(k=k, v=v), tokens, counts,
                    _chosen_lp(last, tokens, want_lp))

        return jax.jit(fn, donate_argnums=(1,))

    def _advance_partials(self) -> List[FinishedRequest]:
        """Advance every partially-prefilled request by one chunk (pow2
        groups, one device call each). Final chunks overlap backward to stay
        exactly C tokens — identical K/V is rewritten, no pad-position cache
        writes — and their sampled token activates the slot."""
        C = self.prefill_chunk
        finished: List[FinishedRequest] = []
        parts = sorted(self._partial.items())
        while parts:
            nb = _pow2_groups(len(parts), self.max_slots)[0]
            batch, parts = parts[:nb], parts[nb:]
            ids = np.full((nb, C), self.scfg.pad_id, np.int32)
            starts = np.zeros((nb,), np.int32)
            slots = np.full((nb,), self.trash_slot, np.int32)
            counts = (np.zeros((nb, self.cfg.vocab_size), np.int32)
                      if self.per_request else 0)
            rows = []   # (i, req, is_last, start)
            for i, (rid, st) in enumerate(batch):
                req = self.scheduler.get(rid)
                prompt = req.input_ids
                st = min(st, len(prompt) - C)
                ids[i] = prompt[st:st + C]
                starts[i] = st
                slots[i] = req.slot
                is_last = st + C >= len(prompt)
                if is_last and self.per_request:
                    # penalty state needs full-prompt token counts
                    np.add.at(counts[i], np.asarray(prompt, np.int64), 1)
                rows.append((i, req, is_last, st))
            fn = self._get(("chunk_prefill", nb), self._chunk_prefill_fn, nb)
            slot_params = self.slot_params if self.per_request else 0
            self.caches, tokens, counts, lps = fn(
                self.params, self.caches, self._dev(ids),
                self._dev(starts), self._dev(slots), self._next_key(),
                slot_params,
                self._dev(counts) if self.per_request else 0)
            tokens, lps = self._read_many(tokens, lps)
            done_rows = [(i, req) for i, req, is_last, _ in rows if is_last]
            if done_rows:
                reqs = [r for _, r in done_rows]
                toks = tokens[[i for i, _ in done_rows]]
                row_lps = lps[[i for i, _ in done_rows]]
                if self.per_request:
                    idx = self._dev(
                        np.array([i for i, _ in done_rows], np.int32))
                    sl = self._dev(
                        np.array([r.slot for r in reqs], np.int32))
                    self.slot_counts = self.slot_counts.at[sl].set(
                        counts[idx])
                finished.extend(self._register_prefilled(reqs, toks,
                                                         row_lps))
                for _, req in done_rows:
                    self._partial.pop(req.request_id, None)
            for i, req, is_last, st in rows:
                if not is_last:
                    self._partial[req.request_id] = st + C
        return finished

    def _decode_fn(self, n_steps: int):
        return jax.jit(self._decode_body(n_steps), donate_argnums=(1,))

    def _decode_body(self, n_steps: int):
        cfg, scfg, model = self.cfg, self.scfg, self.model
        per_request = self.per_request
        n_rows = self.n_rows
        # Under chunked prefill, a slot can hold real (partial) prompt K/V
        # while still inactive — the decode step must not stomp it. Inactive
        # rows' write positions are pushed out of bounds; JAX scatters drop
        # OOB updates (without chunking the stomp is harmless: inactive rows
        # are fully rewritten by their next prefill insert).
        guard_inactive = self.prefill_chunk is not None
        smax = self.engine_cfg.max_seq_len

        want_lp = self.return_logprobs
        use_tail = self.max_bad_words > 0

        def fn(params, caches, tokens, lens, active, gen, budget, key,
               slot_params, counts, tail):
            out = jnp.zeros((n_rows, n_steps), jnp.int32)
            out_lp = jnp.zeros((n_rows, n_steps), jnp.float32)

            def body(i, state):
                (tokens, lens, caches, active, gen, out, counts, out_lp,
                 tail) = state
                pos = (jnp.where(active, lens, smax) if guard_inactive
                       else lens)
                logits, caches = model.forward_decode(
                    params, cfg, tokens, pos, caches)
                sub = jax.random.fold_in(key, i)
                if per_request:
                    nxt = sample_step_slots(logits, slot_params, sub,
                                            counts, gen, scfg.end_id,
                                            tail=tail if use_tail else None)
                    counts = counts.at[jnp.arange(n_rows), nxt].add(
                        active.astype(jnp.int32))
                else:
                    nxt = sample_step(logits, scfg, sub)
                nxt = jnp.where(active, nxt, scfg.pad_id)
                out = out.at[:, i].set(nxt)
                if use_tail:
                    # frozen slots roll pad ids in — harmless, they never
                    # sample again before their tail is reseeded at the
                    # next activation
                    tail = update_tail(tail, nxt)
                if want_lp:
                    lp_i = _chosen_lp(logits, jnp.clip(nxt, 0, None), True)
                    out_lp = out_lp.at[:, i].set(
                        jnp.where(active, lp_i, 0.0))
                gen = gen + active.astype(jnp.int32)
                # freeze on EOS or when the slot's own budget is spent —
                # other slots keep decoding full chunks
                still = active & (nxt != scfg.end_id) & (gen < budget)
                lens = lens + active.astype(jnp.int32)
                return (jnp.where(still, nxt, scfg.pad_id), lens, caches,
                        still, gen, out, counts, out_lp, tail)

            (tokens, lens, caches, active, gen, out, counts,
             out_lp, tail) = jax.lax.fori_loop(
                0, n_steps, body,
                (tokens, lens, caches, active, gen, out, counts, out_lp,
                 tail))
            return (caches, tokens, lens, active, gen, out, counts, out_lp,
                    tail)

        return fn

    def _get(self, key, builder, *args):
        if key not in self._fn_cache:
            self._fn_cache[key] = builder(*args)
        return self._fn_cache[key]

    def _mixed_fn(self, bucket: int, nb: int, n_steps: int):
        """Fused admission-prefill + decode chunk: one device dispatch.

        The prefill body runs first; the fresh slots' per-slot state is
        activated IN-GRAPH (the scatters _register_prefilled would issue
        from the host), including the same EOS/budget freeze the host
        applies between the calls; then the decode body advances every
        active slot — fresh ones included, exactly like the separate-call
        path. `real` masks the power-of-two padding rows (their slot id is
        the trash slot, which must stay inactive)."""
        scfg = self.scfg
        per_request = self.per_request
        use_tail = self.max_bad_words > 0
        pbody = self._prefill_body(bucket, nb)
        dbody = self._decode_body(n_steps)

        def fn(params, caches, ids, lengths, slots, real, new_budgets, key,
               slot_params, tokens, lens, active, gen, budget, counts, tail):
            kp, kd = jax.random.split(key)
            caches, ptoks, pcounts, plp = pbody(params, caches, ids,
                                                lengths, slots, kp,
                                                slot_params)
            tokens = tokens.at[slots].set(ptoks)
            lens = lens.at[slots].set(lengths)
            active = active.at[slots].set(real)
            gen = gen.at[slots].set(1)
            budget = budget.at[slots].set(new_budgets)
            if per_request:
                counts = counts.at[slots].set(pcounts)
            if use_tail:
                t_len = tail.shape[1]
                fresh = jnp.full((nb, t_len), -2, jnp.int32)
                fresh = fresh.at[:, -1].set(ptoks)
                tail = tail.at[slots].set(fresh)
            # the host applies this freeze via record_token between the
            # separate calls; replicate it so an EOS/1-token-budget fresh
            # slot does not decode (existing rows already satisfy it)
            active = active & (tokens != scfg.end_id) & (gen < budget)
            (caches, tokens, lens, active, gen, out, counts, out_lp,
             tail) = dbody(params, caches, tokens, lens, active, gen,
                           budget, kd, slot_params, counts, tail)
            return (caches, tokens, lens, active, gen, budget, out, counts,
                    out_lp, tail, ptoks, plp)

        return jax.jit(fn, donate_argnums=(1,))

    def _mixed_phase(self, reqs: List[Request], bucket: int
                     ) -> Optional[List[FinishedRequest]]:
        """One fused prefill+decode dispatch for this step, or None when
        the step has no decode budget (caller falls back to the separate
        calls)."""
        existing = [r for r in self.scheduler.active_requests()
                    if r not in reqs]
        budgets = ([r.max_new_tokens - len(r.output_ids) for r in existing]
                   + [r.max_new_tokens - 1 for r in reqs])
        chunk = min(self.decode_chunk, max(budgets)) if budgets else 0
        if chunk <= 0:
            return None
        nb = len(reqs)
        ids = np.full((nb, bucket), self.scfg.pad_id, np.int32)
        lengths = np.ones((nb,), np.int32)
        slots = np.full((nb,), self.trash_slot, np.int32)
        real = np.zeros((nb,), bool)
        new_budgets = np.zeros((nb,), np.int32)
        for i, req in enumerate(reqs):
            ids[i, :len(req.input_ids)] = req.input_ids
            lengths[i] = len(req.input_ids)
            slots[i] = req.slot
            real[i] = True
            new_budgets[i] = req.max_new_tokens
            if self.per_request:
                scfg_i = self._req_sampling.get(req.request_id, self.scfg)
                self.slot_params = self.slot_params.set_slot(req.slot,
                                                             scfg_i)
        fn = self._get(("mixed", bucket, nb, chunk), self._mixed_fn,
                       bucket, nb, chunk)
        slot_params = self.slot_params if self.per_request else 0
        counts = self.slot_counts if self.per_request else 0
        tail = self.slot_tail if self.max_bad_words else 0
        (self.caches, self.slot_tokens, self.slot_lens, self.slot_active,
         self.slot_gen, self.slot_budget, out, counts, out_lp, tail, ptoks,
         plps) = fn(
            self.params, self.caches, self._dev(ids), self._dev(lengths),
            self._dev(slots), self._dev(real), self._dev(new_budgets),
            self._next_key(), slot_params, self.slot_tokens, self.slot_lens,
            self.slot_active, self.slot_gen, self.slot_budget, counts, tail)
        if self.per_request:
            self.slot_counts = counts
        if self.max_bad_words:
            self.slot_tail = tail
        ptoks, plps, out, out_lp = self._read_many(
            ptoks, plps, out, out_lp if self.return_logprobs else None)
        finished = self._register_prefilled(reqs, ptoks, plps,
                                            device_updated=True)
        # decode bookkeeping over whoever is still in flight
        decoding = [r for r in self.scheduler.active_requests()
                    if r.request_id not in self._partial]
        for req in decoding:
            slot = req.slot
            for j, t in enumerate(out[slot]):
                if self.return_logprobs:
                    self._req_logprobs.setdefault(
                        req.request_id, []).append(float(out_lp[slot, j]))
                if self._record_token(req, int(t)):
                    self._release_slot(slot)
                    self._req_sampling.pop(req.request_id, None)
                    finished.append(self._finish_recorded(req))
                    break
                if self._stop_matched(req):
                    finished.append(self._finish_stopped(req))
                    break
        return finished

    def _register_prefilled(self, reqs: List[Request], tokens: np.ndarray,
                            lps: Optional[np.ndarray] = None,
                            device_updated: bool = False
                            ) -> List[FinishedRequest]:
        """Activate freshly prefilled slots with BATCHED device updates (one
        scatter per state array instead of a 5-dispatch chain per request —
        dispatch latency through the tunnel dominated admission).
        device_updated=True (mixed step) skips the scatters: the fused call
        already activated the slots in-graph; only the host scheduler
        bookkeeping below runs."""
        import numpy as _np
        if not device_updated:
            slots = self._dev(_np.array([r.slot for r in reqs], _np.int32))
            self.slot_lens = self.slot_lens.at[slots].set(self._dev(
                _np.array([len(r.input_ids) for r in reqs], _np.int32)))
            self.slot_tokens = self.slot_tokens.at[slots].set(
                self._dev(tokens[:len(reqs)].astype(_np.int32)))
            self.slot_active = self.slot_active.at[slots].set(True)
            self.slot_budget = self.slot_budget.at[slots].set(self._dev(
                _np.array([r.max_new_tokens for r in reqs], _np.int32)))
            self.slot_gen = self.slot_gen.at[slots].set(1)
            if self.max_bad_words:
                # reseed tails: -2 sentinel (pre-generation), then the first
                # sampled token (bad/stop matching is over generated ids
                # only)
                t_len = self.slot_tail.shape[1]
                rows = _np.full((len(reqs), t_len), -2, _np.int32)
                rows[:, -1] = tokens[:len(reqs)].astype(_np.int32)
                self.slot_tail = self.slot_tail.at[slots].set(
                    self._dev(rows))
        finished = []
        for i, req in enumerate(reqs):
            if self.return_logprobs and lps is not None:
                self._req_logprobs.setdefault(req.request_id, []).append(
                    float(lps[i]))
            if self._record_token(req, int(tokens[i])):
                self._release_slot(req.slot)
                self._req_sampling.pop(req.request_id, None)
                finished.append(self._finish_recorded(req))
            elif self._stop_matched(req):
                finished.append(self._finish_stopped(req))
        return finished

    def _stop_matched(self, req: Request) -> bool:
        """Host-side per-request stop-sequence check (reference
        stopCriteriaKernels.cu / InferenceRequest stop_words_list), run at
        chunk boundaries on the recorded output ids. The stop sequence
        stays in the output (reference semantics); tokens the device
        decoded past the match are discarded."""
        cfg = self._req_sampling.get(req.request_id, self.scfg)
        out = req.output_ids
        for w in cfg.stop_words:
            lw = len(w)
            if lw and len(out) >= lw and tuple(out[-lw:]) == tuple(w):
                return True
        return False

    def _record_token(self, req: Request, token: int) -> bool:
        """scheduler.record_token + latency stamps (TTFT on the first
        recorded token, completion time when the request closes)."""
        done = self.scheduler.record_token(req.request_id, token,
                                           self.scfg.end_id)
        t = self._req_times.get(req.request_id)
        if t is not None:
            now = time.perf_counter()
            if t[1] is None:
                t[1] = now
            t[3] += 1
            if done:
                t[2] = now
        return done

    def latency_stats(self) -> dict:
        """TTFT / TPOT / end-to-end percentiles over completed requests
        (what the reference's benchmark harness reports,
        benchmarks/gpt_benchmark.py:330-347). TTFT includes queue wait —
        the serving-level metric. Times are chunk-granular: tokens become
        visible to pollers at chunk readback, which is what TPOT measures
        honestly here."""
        done = [t for t in self._req_times.values()
                if t[1] is not None and t[2] is not None]
        if not done:
            return {}

        def pct(a):
            a = np.asarray(a, np.float64)
            return {"p50": round(float(np.percentile(a, 50)), 4),
                    "p90": round(float(np.percentile(a, 90)), 4),
                    "p99": round(float(np.percentile(a, 99)), 4),
                    "mean": round(float(a.mean()), 4)}

        tpot = [(t[2] - t[1]) / (t[3] - 1) for t in done if t[3] > 1]
        return {"n_done": len(done),
                "ttft_s": pct([t[1] - t[0] for t in done]),
                "e2e_s": pct([t[2] - t[0] for t in done]),
                "tpot_s": pct(tpot) if tpot else None}

    def phase_stats(self) -> dict:
        """Per-phase mean milliseconds per engine step (admission /
        decode dispatch / chunk readback / host bookkeeping) — the serving
        roofline breakdown. Phases are wall-clock disjoint within step():
        'readback' blocks on device compute, so it absorbs the decode
        chunk's device time; a dispatch-bound engine shows 'admit'+'host'
        rivaling 'readback'."""
        n = max(self.phase_times["steps"], 1)
        out = {k: round(1e3 * v / n, 3)
               for k, v in self.phase_times.items() if k != "steps"}
        out["steps"] = self.phase_times["steps"]
        return out

    def _finish_stopped(self, req: Request) -> FinishedRequest:
        t = self._req_times.get(req.request_id)
        if t is not None and t[2] is None:
            t[2] = time.perf_counter()
        self.scheduler.finish(req.request_id, "stop_words")
        self._release_slot(req.slot)
        self._req_sampling.pop(req.request_id, None)
        return self._finished(req)

    def _finished(self, req: Request) -> FinishedRequest:
        return FinishedRequest(
            req.request_id, req.output_ids, req.finished_reason,
            logprobs=self._req_logprobs.pop(req.request_id, None)
            if self.return_logprobs else None)

    def _finish_recorded(self, req: Request) -> FinishedRequest:
        """Finish a request record_token just closed. The reference runs
        the stop-words criterion for the final step too: if a stop
        sequence completed on the very token that exhausted
        max_new_tokens, report 'stop_words', not 'length'."""
        if req.finished_reason == "length" and self._stop_matched(req):
            req.finished_reason = "stop_words"
        return self._finished(req)

    def _release_slot(self, slot: int):
        self.slot_active = self.slot_active.at[slot].set(False)
        if self.paged:
            self.kv_mgr.remove_sequence(slot)
            self._tables_np[slot] = self.trash_block
            self.caches = self.caches._replace(
                tables=self.caches.tables.at[slot].set(self.trash_block))

    def _host_table_row(self, slot: int) -> np.ndarray:
        """Block table row for a slot, -1 pads remapped to the trash block."""
        row = self.kv_mgr.block_table([slot])[0]
        row = np.where(row < 0, self.trash_block, row).astype(np.int32)
        return row

    # ------------------------------------------------------------------
    def submit(self, input_ids: List[int], max_new_tokens: int,
               sampling: Optional[SamplingConfig] = None) -> int:
        """Queue a request. `sampling` (requires per_request_sampling=True)
        overrides the engine default for this request — the reference's
        per-InferenceRequest SamplingConfig."""
        if sampling is not None and not self.per_request:
            raise ValueError(
                "per-request sampling configs need per_request_sampling=True")
        if sampling is not None and sampling.bad_words:
            if not self.max_bad_words:
                raise ValueError("per-request bad_words need the engine "
                                 "built with max_bad_words > 0")
            if (len(sampling.bad_words) > self.max_bad_words or any(
                    not w or len(w) > self.max_bad_word_len
                    for w in sampling.bad_words)):
                raise ValueError(
                    f"bad_words exceed engine capacity (max "
                    f"{self.max_bad_words} words of length <= "
                    f"{self.max_bad_word_len}; empty words not allowed)")
            # id-range guard: an out-of-range id would wrap in the JAX
            # scatter and silently ban a different token (the reference
            # kernel guards with 0 < id < vocab_size, banBadWords.cu:86)
            if any(t < 0 or t >= self.cfg.vocab_size
                   for w in sampling.bad_words for t in w):
                raise ValueError(
                    f"bad_words token ids must be in [0, "
                    f"{self.cfg.vocab_size})")
        if self.multihost:
            if not self._is_sched:
                raise RuntimeError(
                    "submit() only on the scheduler host (process 0); "
                    "other hosts mirror it via the step-boundary broadcast")
            # applied here AND queued so follower schedulers replay the
            # identical op stream (-> identical request ids) at next step
            self._pending_ops.append(
                ("submit", list(input_ids), max_new_tokens, sampling))
        rid = self.scheduler.submit(input_ids, max_new_tokens)
        self._req_times[rid] = [time.perf_counter(), None, None, 0]
        if sampling is not None:
            self._req_sampling[rid] = sampling
        return rid

    def poll(self, request_id: int) -> List[int]:
        """Tokens generated so far (streaming consumers read between steps;
        the reference's GptManager streams via SendResponseCallback)."""
        req = self.scheduler.get(request_id)
        if req is None:
            raise KeyError(request_id)
        return list(req.output_ids)

    def poll_logprobs(self, request_id: int) -> List[float]:
        """Model logprobs of the tokens poll() returns (requires
        return_logprobs=True)."""
        if not self.return_logprobs:
            raise ValueError("engine built without return_logprobs")
        return list(self._req_logprobs.get(request_id, []))

    def cancel(self, request_id: int):
        """Cancel a queued or in-flight request, releasing its slot/blocks.
        Under multi-host the cancel takes effect at the next step boundary
        (releasing a slot touches replicated device state, which every
        process must mutate together)."""
        if self.multihost:
            if not self._is_sched:
                raise RuntimeError(
                    "cancel() only on the scheduler host (process 0)")
            self._pending_ops.append(("cancel", request_id))
            return
        self._cancel_now(request_id)

    def _cancel_now(self, request_id: int):
        req = self.scheduler.get(request_id)
        slot = getattr(req, "slot", None) if req is not None else None
        in_flight = req is not None and req.state.name in ("PREFILL", "DECODE")
        self.scheduler.cancel(request_id)
        self._req_sampling.pop(request_id, None)
        self._partial.pop(request_id, None)
        self._req_logprobs.pop(request_id, None)
        if in_flight and slot is not None:
            self._release_slot(slot)

    # ------------------------------------------------------------------
    def _sync_ops(self):
        """Multi-host step-boundary sync: process 0 broadcasts the ops
        queued since the last step; every process applies them so all
        schedulers make identical decisions this step. Two tiny device
        collectives (a fixed-shape length, then a pow2-padded payload —
        padding bounds the number of compiled broadcast shapes)."""
        import pickle
        from jax.experimental import multihost_utils as mhu

        buf = pickle.dumps(self._pending_ops) if self._is_sched else b""
        self._pending_ops = []
        size = int(mhu.broadcast_one_to_all(
            np.array([len(buf)], np.int64))[0])
        if size == 0:
            return
        cap = max(256, 1 << (size - 1).bit_length())
        pad = np.zeros((cap,), np.uint8)
        if self._is_sched:
            pad[:size] = np.frombuffer(buf, np.uint8)
        ops = pickle.loads(mhu.broadcast_one_to_all(pad)[:size].tobytes())
        for op in ops:
            kind = op[0]
            if kind == "submit":
                if not self._is_sched:        # process 0 applied at submit()
                    _, input_ids, max_new, sampling = op
                    rid = self.scheduler.submit(input_ids, max_new)
                    if sampling is not None:
                        self._req_sampling[rid] = sampling
            elif kind == "cancel":
                self._cancel_now(op[1])
            elif kind == "stop":
                self._stopped = True

    def follow(self):
        """Follower loop for non-scheduler hosts: step() in lockstep with
        process 0 (each step blocks in the sync collective until process 0
        steps) until it broadcasts shutdown()."""
        while not self._stopped:
            self.step()

    def shutdown(self):
        """(multi-host) Release the follower hosts' follow() loops."""
        if self.multihost and self._is_sched:
            self._pending_ops.append(("stop",))
            self.step()
        self._stopped = True

    # ------------------------------------------------------------------
    def _admit_group(self, group: List[Request], bucket: int
                     ) -> List[FinishedRequest]:
        """Prefill a same-bucket group in one batched device call."""
        finished = []
        nb = _pow2_groups(len(group), self.max_slots)[0]
        reqs, rest = group[:nb], group[nb:]
        ids = np.full((nb, bucket), self.scfg.pad_id, np.int32)
        lengths = np.ones((nb,), np.int32)
        slots = np.full((nb,), self.trash_slot, np.int32)
        for i, req in enumerate(reqs):
            ids[i, :len(req.input_ids)] = req.input_ids
            lengths[i] = len(req.input_ids)
            slots[i] = req.slot
            if self.per_request:
                scfg_i = self._req_sampling.get(req.request_id, self.scfg)
                self.slot_params = self.slot_params.set_slot(req.slot, scfg_i)
        slot_params = self.slot_params if self.per_request else 0
        if self.paged:
            table_rows = np.full((nb, self.max_blocks), self.trash_block,
                                 np.int32)
            for i, req in enumerate(reqs):
                self.kv_mgr.add_sequence(req.slot, len(req.input_ids))
                table_rows[i] = self._host_table_row(req.slot)
                self._tables_np[req.slot] = table_rows[i]
                self.caches = self.caches._replace(
                    tables=self.caches.tables.at[req.slot].set(table_rows[i]))
            fn = self._get(("pprefill", bucket, nb),
                           self._paged_prefill_fn, bucket, nb)
            self.caches, tokens, counts, lps = fn(
                self.params, self.caches, self._dev(ids),
                self._dev(lengths), self._dev(table_rows),
                self._dev(slots), self._next_key(), slot_params)
        else:
            fn = self._get(("prefill", bucket, nb),
                           self._prefill_fn, bucket, nb)
            self.caches, tokens, counts, lps = fn(
                self.params, self.caches, self._dev(ids),
                self._dev(lengths), self._dev(slots), self._next_key(),
                slot_params)
        tokens, lps = self._read_many(tokens, lps)
        if self.per_request and counts is not None:
            self.slot_counts = self.slot_counts.at[self._dev(slots)].set(
                counts)
        finished.extend(self._register_prefilled(reqs, tokens, lps))
        if rest:
            finished.extend(self._admit_group(rest, bucket))
        return finished

    def step(self) -> List[FinishedRequest]:
        """One engine step: admit+prefill new requests (batched per bucket),
        then decode up to decode_chunk tokens for all active slots.
        pipelined=True reorders the phases so readbacks overlap compute
        (_step_pipelined); finishes then surface one step later."""
        if self.pipelined:
            return self._step_pipelined()
        from ..ops.registry import KERNELS
        KERNELS["mesh"] = self.mesh   # sharded paths under a mesh; None =
        # single-device (bare Pallas kernels allowed)
        if self.multihost:
            self._sync_ops()
            if self._stopped:
                return []
        finished: List[FinishedRequest] = []
        _t0 = time.perf_counter()

        admitted = self.scheduler.admit()
        if self.prefill_chunk is not None:
            # long prompts go to the chunked path (one C-token slab per
            # step, interleaved with decode); short ones prefill as usual
            long = [r for r in admitted
                    if len(r.input_ids) > self.prefill_chunk]
            admitted = [r for r in admitted
                        if len(r.input_ids) <= self.prefill_chunk]
            for req in long:
                self._partial[req.request_id] = 0
                if self.per_request:
                    scfg_i = self._req_sampling.get(req.request_id, self.scfg)
                    self.slot_params = self.slot_params.set_slot(
                        req.slot, scfg_i)
        if self.mixed and admitted:
            # single fused dispatch when the whole admission is one
            # power-of-two same-bucket group and there is decode budget
            groups: Dict[int, List[Request]] = {}
            for req in admitted:
                groups.setdefault(
                    self.engine_cfg.bucket_for(len(req.input_ids)),
                    []).append(req)
            if len(groups) == 1:
                (bucket, group), = groups.items()
                if _pow2_groups(len(group), self.max_slots)[0] == len(group):
                    mixed = self._mixed_phase(group, bucket)
                    if mixed is not None:
                        return finished + mixed
        if self.packed:
            if admitted:
                finished.extend(self._admit_packed(admitted))
        else:
            by_bucket: Dict[int, List[Request]] = {}
            for req in admitted:
                b = self.engine_cfg.bucket_for(len(req.input_ids))
                by_bucket.setdefault(b, []).append(req)
            for bucket, group in sorted(by_bucket.items()):
                finished.extend(self._admit_group(group, bucket))
        if self._partial:
            finished.extend(self._advance_partials())
        self.phase_times["admit"] += time.perf_counter() - _t0
        self.phase_times["steps"] += 1

        # host-side activity check: the scheduler already knows which
        # requests are in flight — asking the device (`slot_active.any()`)
        # costs a blocking ~23 ms d2h roundtrip through the tunnel per step
        if not self.scheduler.active_requests():
            return finished

        finished.extend(self._decode_phase())
        return finished

    def _step_pipelined(self) -> List[FinishedRequest]:
        """One pipelined engine step: dispatch chunk N FIRST, then read and
        process chunk N-1 and run admissions — the ~27 ms tunnel readback,
        host bookkeeping, and admission prefill dispatch+read all overlap
        chunk N's device compute (the device stream serializes chunk N
        before the prefills, so a slot freed by chunk N-1's bookkeeping is
        safely overwritten only after chunk N retires; its stale rows are
        skipped by _decode_process's liveness guard). Requests admitted
        this step join the NEXT chunk — one chunk of extra latency per
        request, bought back many times over in step wall time."""
        from ..ops.registry import KERNELS
        KERNELS["mesh"] = self.mesh
        finished: List[FinishedRequest] = []

        _t0 = time.perf_counter()
        dispatched = self._decode_dispatch()
        self.phase_times["dispatch"] += time.perf_counter() - _t0
        if self._pending_chunk is not None:
            finished.extend(self._decode_process(self._pending_chunk))
        self._pending_chunk = dispatched

        _t0 = time.perf_counter()
        admitted = self.scheduler.admit()
        if self.prefill_chunk is not None:
            long = [r for r in admitted
                    if len(r.input_ids) > self.prefill_chunk]
            admitted = [r for r in admitted
                        if len(r.input_ids) <= self.prefill_chunk]
            for req in long:
                self._partial[req.request_id] = 0
                if self.per_request:
                    scfg_i = self._req_sampling.get(req.request_id, self.scfg)
                    self.slot_params = self.slot_params.set_slot(
                        req.slot, scfg_i)
        if self.packed:
            if admitted:
                finished.extend(self._admit_packed(admitted))
        else:
            by_bucket: Dict[int, List[Request]] = {}
            for req in admitted:
                b = self.engine_cfg.bucket_for(len(req.input_ids))
                by_bucket.setdefault(b, []).append(req)
            for bucket, group in sorted(by_bucket.items()):
                finished.extend(self._admit_group(group, bucket))
        if self._partial:
            finished.extend(self._advance_partials())
        self.phase_times["admit"] += time.perf_counter() - _t0
        self.phase_times["steps"] += 1
        return finished

    def _decode_phase(self) -> List[FinishedRequest]:
        """Advance all decoding slots by one device chunk and record the
        tokens (override point: SpeculativeServingEngine replaces this with
        draft/verify iterations)."""
        _t0 = time.perf_counter()
        pending = self._decode_dispatch()
        self.phase_times["dispatch"] += time.perf_counter() - _t0
        if pending is None:
            return []
        return self._decode_process(pending)

    def _decode_dispatch(self):
        """Dispatch one decode chunk; return (slot_of, out, out_lp) device
        handles WITHOUT reading them back (the pipelined step overlaps the
        readback with the next chunk's compute), or None when there is
        nothing to decode."""
        # chunk = enough steps for the request with the LARGEST remaining
        # budget (each slot self-freezes at its own budget on device).
        # Partially-prefilled requests are active in the scheduler but have
        # no decode state yet — they neither drive the chunk size nor get
        # tokens recorded. Under pipelining the host budgets lag one chunk
        # (optimistic chunk size); the device budget masks stay exact.
        decoding = [r for r in self.scheduler.active_requests()
                    if r.request_id not in self._partial]
        budgets = [r.max_new_tokens - len(r.output_ids) for r in decoding]
        chunk = min(self.decode_chunk, max(budgets)) if budgets else 0
        if chunk <= 0:
            return None
        slot_of = {r.slot: r for r in decoding}
        if self.paged:
            # pre-allocate blocks for this chunk's writes, then refresh the
            # device block tables FROM THE HOST MIRROR — no device read,
            # no sync on the in-flight chunk (pipelined-compatible)
            for slot, req in slot_of.items():
                n_new = min(chunk, req.max_new_tokens - len(req.output_ids))
                for _ in range(n_new):
                    self.kv_mgr.append_token(slot)
                self._tables_np[slot] = self._host_table_row(slot)
            self.caches = self.caches._replace(
                tables=self._dev(self._tables_np))
        fn = self._get(("decode", chunk), self._decode_fn, chunk)
        slot_params = self.slot_params if self.per_request else 0
        counts = self.slot_counts if self.per_request else 0
        tail = self.slot_tail if self.max_bad_words else 0
        (self.caches, self.slot_tokens, self.slot_lens, self.slot_active,
         self.slot_gen, out, counts, out_lp, tail) = fn(
            self.params, self.caches, self.slot_tokens, self.slot_lens,
            self.slot_active, self.slot_gen, self.slot_budget,
            self._next_key(), slot_params, counts, tail)
        if self.per_request:
            self.slot_counts = counts
        if self.max_bad_words:
            self.slot_tail = tail
        return (slot_of, out, out_lp)

    def _decode_process(self, pending) -> List[FinishedRequest]:
        """Read back one dispatched chunk and record its tokens."""
        slot_of, out, out_lp = pending
        finished: List[FinishedRequest] = []
        _t0 = time.perf_counter()
        if self._split_readback and self._repl is None:
            # 1-element fetch: waits for every queued device op (compute),
            # transfers ~nothing — the big fetch below is then transfer-only
            jax.device_get(out[:1, :1])
            _tc = time.perf_counter()
            self.phase_times["compute"] += _tc - _t0
        out, out_lp = self._read_many(
            out, out_lp if self.return_logprobs else None)
        _t1 = time.perf_counter()
        self.phase_times["readback"] += _t1 - _t0
        if self._split_readback and self._repl is None:
            self.phase_times["transfer"] += _t1 - _tc
        # under pipelining a snapshot request may have finished while this
        # chunk was in flight (EOS/budget froze it on device; stop-words
        # released it host-side) — its rows are stale, skip them
        live = {r.request_id for r in self.scheduler.active_requests()}
        for slot, req in slot_of.items():
            if req.request_id not in live:
                continue
            for j, t in enumerate(out[slot]):
                if self.return_logprobs:
                    # pad steps (slot froze) never reach record_token
                    self._req_logprobs.setdefault(
                        req.request_id, []).append(float(out_lp[slot, j]))
                if self._record_token(req, int(t)):
                    self._release_slot(slot)
                    self._req_sampling.pop(req.request_id, None)
                    finished.append(self._finish_recorded(req))
                    break
                if self._stop_matched(req):
                    # tokens the device decoded past the match (bounded by
                    # the chunk) are discarded with the slot
                    finished.append(self._finish_stopped(req))
                    break
        self.phase_times["host"] += time.perf_counter() - _t1
        return finished

    def run_to_completion(self, max_steps: int = 10_000
                          ) -> Dict[int, FinishedRequest]:
        """Drive until the queue drains (batch-mode convenience)."""
        done: Dict[int, FinishedRequest] = {}
        steps = 0
        while ((self.scheduler.has_work or self._pending_chunk is not None)
               and steps < max_steps):
            for fr in self.step():
                done[fr.request_id] = fr
            steps += 1
        return done
