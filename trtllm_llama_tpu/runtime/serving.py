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
                 kv_scales=None, decode_chunk: int = 8, model=None):
        self.cfg = cfg
        self.model = model if model is not None else llama
        self.params = params
        self.engine_cfg = engine_cfg
        self.scfg = sampling or SamplingConfig()
        self.decode_chunk = decode_chunk
        self.max_slots = engine_cfg.max_batch_size
        self.scheduler = Scheduler(self.max_slots, engine_cfg.max_seq_len)

        self.caches = self.model.init_caches(cfg, self.max_slots,
                                        engine_cfg.max_seq_len, kv_scales)
        self._kv_scales = kv_scales
        # per-slot device state
        self.slot_lens = jnp.zeros((self.max_slots,), jnp.int32)
        self.slot_tokens = jnp.zeros((self.max_slots,), jnp.int32)
        self.slot_active = jnp.zeros((self.max_slots,), bool)
        self._fn_cache = {}

    # ------------------------------------------------------------------
    def _prefill_fn(self, bucket: int):
        cfg, scfg, model = self.cfg, self.scfg, self.model

        def fn(params, caches, ids, length, slot):
            scratch = model.init_caches(cfg, 1, bucket,
                                        self._kv_scales)
            logits, scratch = model.forward_prefill(
                params, cfg, ids, length, scratch)
            token = sample_step(logits, scfg)
            # insert the slot row: [L, 1, H, bucket, D] into the big cache
            def insert(big, small):
                return jax.lax.dynamic_update_slice(
                    big, small, (0, slot, 0, 0, 0))
            caches = caches._replace(
                k=insert(caches.k, scratch.k), v=insert(caches.v, scratch.v))
            return caches, token[0]

        return jax.jit(fn, donate_argnums=(1,))

    def _decode_fn(self, n_steps: int):
        cfg, scfg, model = self.cfg, self.scfg, self.model

        def fn(params, caches, tokens, lens, active):
            out = jnp.zeros((self.max_slots, n_steps), jnp.int32)

            def body(i, state):
                tokens, lens, caches, active, out = state
                logits, caches = model.forward_decode(
                    params, cfg, tokens, lens, caches)
                nxt = sample_step(logits, scfg)
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

    # ------------------------------------------------------------------
    def submit(self, input_ids: List[int], max_new_tokens: int) -> int:
        return self.scheduler.submit(input_ids, max_new_tokens)

    def step(self) -> List[FinishedRequest]:
        """One engine step: admit+prefill new requests, then decode_chunk
        tokens for all active slots. Returns newly finished requests."""
        finished: List[FinishedRequest] = []

        for req in self.scheduler.admit():
            bucket = self.engine_cfg.bucket_for(len(req.input_ids))
            ids = np.full((1, bucket), self.scfg.pad_id, np.int32)
            ids[0, :len(req.input_ids)] = req.input_ids
            fn = self._get(("prefill", bucket), self._prefill_fn, bucket)
            self.caches, token = fn(
                self.params, self.caches, jnp.asarray(ids),
                jnp.asarray([len(req.input_ids)], jnp.int32), req.slot)
            token = int(token)
            self.slot_lens = self.slot_lens.at[req.slot].set(
                len(req.input_ids))
            self.slot_tokens = self.slot_tokens.at[req.slot].set(token)
            self.slot_active = self.slot_active.at[req.slot].set(True)
            if self.scheduler.record_token(req.request_id, token,
                                           self.scfg.end_id):
                self.slot_active = self.slot_active.at[req.slot].set(False)
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
        fn = self._get(("decode", chunk), self._decode_fn, chunk)
        slot_of = {r.slot: r for r in self.scheduler.active_requests()}
        self.caches, self.slot_tokens, self.slot_lens, self.slot_active, out \
            = fn(self.params, self.caches, self.slot_tokens, self.slot_lens,
                 self.slot_active)
        out = np.asarray(out)

        for slot, req in slot_of.items():
            for t in out[slot]:
                if self.scheduler.record_token(req.request_id, int(t),
                                               self.scfg.end_id):
                    self.slot_active = self.slot_active.at[slot].set(False)
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
