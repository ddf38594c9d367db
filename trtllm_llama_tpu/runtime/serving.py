"""ServingEngine: continuous batching over a fixed slot pool.

The execution half of the batch manager (reference GptManager::step +
gptSessionWithDecoderBatch): requests stream in, each is prefilled into a
free slot of the shared stacked KV cache, and every engine step advances
ALL active slots by `decode_chunk` tokens in one jitted device call (done
slots self-freeze on device via EOS masking, so the host only intervenes at
chunk boundaries — amortizing dispatch latency the same way the reference
amortizes per-step enqueues with in-flight batching).

Device layout: one cache [L, max_slots, H, max_seq_len, D]; slot i owns row
i. Prefill computes the prompt's KV in a scratch cache and inserts the row
at the slot index — so admission never recompiles (prompt length buckets
only).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from ..models import llama
from .sampling import SamplingConfig, sample_step
from .scheduler import Request, Scheduler


@dataclasses.dataclass
class FinishedRequest:
    request_id: int
    output_ids: List[int]
    finished_reason: str


class ServingEngine:
    def __init__(self, cfg: ModelConfig, params, engine_cfg: EngineConfig,
                 sampling: Optional[SamplingConfig] = None,
                 kv_scales=None, decode_chunk: int = 8, model=None,
                 paged: bool = False, block_size: int = 64,
                 num_blocks: Optional[int] = None):
        import os
        if not os.environ.get("TLLM_NO_COMPILE_CACHE"):
            from ..utils.compile_cache import enable_compile_cache
            enable_compile_cache()
        self.cfg = cfg
        self.model = model if model is not None else llama
        self.params = params
        self.engine_cfg = engine_cfg
        self.scfg = sampling or SamplingConfig()
        self.decode_chunk = decode_chunk
        self.max_slots = engine_cfg.max_batch_size
        self.paged = paged
        if jax.default_backend() != "cpu":
            # mirror GenerationSession: hot matmuls through Pallas kernels
            from ..ops.linear import enable_pallas_kernels
            enable_pallas_kernels(True)

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
                cfg, self.num_blocks + 1, block_size, self.max_slots,
                self.max_blocks, kv_scales)
            self.caches = self.caches._replace(
                tables=jnp.full((self.max_slots, self.max_blocks),
                                self.trash_block, jnp.int32))
        else:
            self.scheduler = Scheduler(self.max_slots, engine_cfg.max_seq_len)
            self.caches = self.model.init_caches(
                cfg, self.max_slots, engine_cfg.max_seq_len, kv_scales)
        self._kv_scales = kv_scales
        # per-slot device state
        self.slot_lens = jnp.zeros((self.max_slots,), jnp.int32)
        self.slot_tokens = jnp.zeros((self.max_slots,), jnp.int32)
        self.slot_active = jnp.zeros((self.max_slots,), bool)
        self._fn_cache = {}
        self._key = jax.random.PRNGKey(0)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------
    def _prefill_fn(self, bucket: int):
        cfg, scfg, model = self.cfg, self.scfg, self.model

        def fn(params, caches, ids, length, slot, key):
            scratch = model.init_caches(cfg, 1, bucket,
                                        self._kv_scales)
            logits, scratch = model.forward_prefill(
                params, cfg, ids, length, scratch)
            token = sample_step(logits, scfg, key)
            # insert the slot row: [L, 1, H, bucket, D] into the big cache
            def insert(big, small):
                return jax.lax.dynamic_update_slice(
                    big, small, (0, slot, 0, 0, 0))
            caches = caches._replace(
                k=insert(caches.k, scratch.k), v=insert(caches.v, scratch.v))
            return caches, token[0]

        return jax.jit(fn, donate_argnums=(1,))

    def _paged_prefill_fn(self, bucket: int):
        cfg, scfg = self.cfg, self.scfg
        model = self.model

        def fn(params, caches, ids, length, table_row, key):
            # batch-1 view sharing the pools; scatters go to this request's
            # blocks
            view = caches._replace(tables=table_row[None, :])
            logits, view = model.forward_prefill(params, cfg, ids, length,
                                                 view)
            token = sample_step(logits, scfg, key)
            return caches._replace(pool_k=view.pool_k,
                                   pool_v=view.pool_v), token[0]

        return jax.jit(fn, donate_argnums=(1,))

    def _decode_fn(self, n_steps: int):
        cfg, scfg, model = self.cfg, self.scfg, self.model

        def fn(params, caches, tokens, lens, active, key):
            out = jnp.zeros((self.max_slots, n_steps), jnp.int32)

            def body(i, state):
                tokens, lens, caches, active, out = state
                logits, caches = model.forward_decode(
                    params, cfg, tokens, lens, caches)
                nxt = sample_step(logits, scfg, jax.random.fold_in(key, i))
                nxt = jnp.where(active, nxt, scfg.pad_id)
                out = out.at[:, i].set(nxt)
                still = active & (nxt != scfg.end_id)
                lens = lens + active.astype(jnp.int32)
                return (jnp.where(still, nxt, scfg.pad_id), lens, caches,
                        still, out)

            tokens, lens, caches, active, out = jax.lax.fori_loop(
                0, n_steps, body, (tokens, lens, caches, active, out))
            return caches, tokens, lens, active, out

        return jax.jit(fn, donate_argnums=(1,))

    def _get(self, key, builder, *args):
        if key not in self._fn_cache:
            self._fn_cache[key] = builder(*args)
        return self._fn_cache[key]

    def _release_slot(self, slot: int):
        self.slot_active = self.slot_active.at[slot].set(False)
        if self.paged:
            self.kv_mgr.remove_sequence(slot)
            self.caches = self.caches._replace(
                tables=self.caches.tables.at[slot].set(self.trash_block))

    def _host_table_row(self, slot: int) -> np.ndarray:
        """Block table row for a slot, -1 pads remapped to the trash block."""
        row = self.kv_mgr.block_table([slot])[0]
        row = np.where(row < 0, self.trash_block, row).astype(np.int32)
        return row

    # ------------------------------------------------------------------
    def submit(self, input_ids: List[int], max_new_tokens: int) -> int:
        return self.scheduler.submit(input_ids, max_new_tokens)

    def poll(self, request_id: int) -> List[int]:
        """Tokens generated so far (streaming consumers read between steps;
        the reference's GptManager streams via SendResponseCallback)."""
        req = self.scheduler._active.get(request_id)
        if req is not None:
            return list(req.output_ids)
        for r in self.scheduler._queue:
            if r.request_id == request_id:
                return []
        raise KeyError(request_id)

    def cancel(self, request_id: int):
        """Cancel a queued or in-flight request, releasing its slot/blocks."""
        req = self.scheduler._active.get(request_id)
        slot = req.slot if req is not None else None
        self.scheduler.cancel(request_id)
        if slot is not None:
            self._release_slot(slot)

    def step(self) -> List[FinishedRequest]:
        """One engine step: admit+prefill new requests, then decode_chunk
        tokens for all active slots. Returns newly finished requests."""
        from ..ops.registry import KERNELS
        KERNELS["mesh"] = None        # serving is single-device (for now)
        finished: List[FinishedRequest] = []

        for req in self.scheduler.admit():
            bucket = self.engine_cfg.bucket_for(len(req.input_ids))
            ids = np.full((1, bucket), self.scfg.pad_id, np.int32)
            ids[0, :len(req.input_ids)] = req.input_ids
            if self.paged:
                self.kv_mgr.add_sequence(req.slot, len(req.input_ids))
                row = self._host_table_row(req.slot)
                self.caches = self.caches._replace(
                    tables=self.caches.tables.at[req.slot].set(row))
                fn = self._get(("pprefill", bucket),
                               self._paged_prefill_fn, bucket)
                self.caches, token = fn(
                    self.params, self.caches, jnp.asarray(ids),
                    jnp.asarray([len(req.input_ids)], jnp.int32),
                    jnp.asarray(row), self._next_key())
            else:
                fn = self._get(("prefill", bucket), self._prefill_fn, bucket)
                self.caches, token = fn(
                    self.params, self.caches, jnp.asarray(ids),
                    jnp.asarray([len(req.input_ids)], jnp.int32), req.slot,
                    self._next_key())
            token = int(token)
            self.slot_lens = self.slot_lens.at[req.slot].set(
                len(req.input_ids))
            self.slot_tokens = self.slot_tokens.at[req.slot].set(token)
            self.slot_active = self.slot_active.at[req.slot].set(True)
            if self.scheduler.record_token(req.request_id, token,
                                           self.scfg.end_id):
                self._release_slot(req.slot)
                finished.append(FinishedRequest(
                    req.request_id, req.output_ids, req.finished_reason))

        if not bool(self.slot_active.any()):
            return finished

        # cap the chunk so no request overshoots its budget or max_seq_len
        budget = [r.max_new_tokens - len(r.output_ids)
                  for r in self.scheduler.active_requests()]
        chunk = max(1, min(self.decode_chunk, *budget)) if budget else 0
        if chunk == 0:
            return finished
        slot_of = {r.slot: r for r in self.scheduler.active_requests()}
        if self.paged:
            # pre-allocate blocks for this chunk's writes, then refresh the
            # device block tables
            tables = np.array(self.caches.tables)  # writable copy
            for slot in slot_of:
                for _ in range(chunk):
                    self.kv_mgr.append_token(slot)
                tables[slot] = self._host_table_row(slot)
            self.caches = self.caches._replace(tables=jnp.asarray(tables))
        fn = self._get(("decode", chunk), self._decode_fn, chunk)
        self.caches, self.slot_tokens, self.slot_lens, self.slot_active, out \
            = fn(self.params, self.caches, self.slot_tokens, self.slot_lens,
                 self.slot_active, self._next_key())
        out = np.asarray(out)

        for slot, req in slot_of.items():
            for t in out[slot]:
                if self.scheduler.record_token(req.request_id, int(t),
                                               self.scfg.end_id):
                    self._release_slot(slot)
                    finished.append(FinishedRequest(
                        req.request_id, req.output_ids, req.finished_reason))
                    break
        return finished

    def run_to_completion(self, max_steps: int = 10_000
                          ) -> Dict[int, FinishedRequest]:
        """Drive until the queue drains (batch-mode convenience)."""
        done: Dict[int, FinishedRequest] = {}
        steps = 0
        while self.scheduler.has_work and steps < max_steps:
            for fr in self.step():
                done[fr.request_id] = fr
            steps += 1
        return done
