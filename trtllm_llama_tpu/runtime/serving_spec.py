"""Speculative decoding inside the continuous-batching engine.

Combines the two beyond-reference features: every decode chunk runs
draft-propose / target-verify iterations for ALL active slots at once
(runtime/speculative.py semantics, vectorized over the slot pool), so a
well-matched draft multiplies aggregate serving throughput the same way it
multiplies single-stream decode — each accepted token amortizes one read
of the target weights across the whole batch.

Greedy-only, dense-cache, global SamplingConfig (the offline speculative
session's exactness property carries over: every request's tokens are
bit-identical to the plain serving engine's greedy output, which is itself
bit-identical to the offline session — tested).

Per-slot state beyond the base engine:
  slot_draft_pos [R]      first cache position the draft model lacks
  slot_spec_tail [R, γ+2]      last γ+2 committed tokens (draft catch-up reads
                          these when it lags after rejections)
Admission prefills BOTH models' caches in one device call; the decode
chunk is n_iters speculative iterations, each committing 0..γ+1 tokens
per slot with EOS/budget truncation on device.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import EngineConfig, ModelConfig
from .sampling import SamplingConfig
from .serving import FinishedRequest, ServingEngine, _chosen_lp, _pow2_groups
from .scheduler import Request


class SpeculativeServingEngine(ServingEngine):
    def __init__(self, cfg: ModelConfig, params, draft_cfg: ModelConfig,
                 draft_params, engine_cfg: EngineConfig, gamma: int = 4,
                 sampling: Optional[SamplingConfig] = None,
                 kv_scales=None, draft_kv_scales=None,
                 decode_chunk: int = 8, model=None, draft_model=None,
                 return_logprobs: bool = False):
        scfg = sampling or SamplingConfig()
        if not scfg.is_greedy:
            raise ValueError("speculative serving is greedy-only")
        import jax as _jax
        if _jax.process_count() > 1:
            raise ValueError("speculative serving is single-host for now "
                             "(its draft-side state is process-local)")
        if cfg.vocab_size != draft_cfg.vocab_size:
            raise ValueError("draft and target must share a vocabulary")
        super().__init__(cfg, params, engine_cfg, sampling=scfg,
                         kv_scales=kv_scales, decode_chunk=decode_chunk,
                         model=model, return_logprobs=return_logprobs,
                         cache_headroom=int(gamma) + 1)
        if not hasattr(self.model, "forward_extend"):
            raise ValueError("target family lacks forward_extend")
        from ..models import by_architecture
        self.draft_cfg = draft_cfg
        self.draft_model = (draft_model if draft_model is not None
                            else by_architecture(
                                getattr(draft_cfg, "architecture", "llama")))
        self.draft_params = draft_params
        if not os.environ.get("TLLM_NO_FUSE_QKV"):
            fuse = getattr(self.draft_model, "fuse_qkv_params", None)
            if fuse is not None:
                self.draft_params = fuse(self.draft_params)
        self.gamma = int(gamma)
        self._dkv_scales = draft_kv_scales
        # target cache got its γ+1 verify-slab headroom via cache_headroom
        # (no transient double allocation); the draft cache matches
        max_len = engine_cfg.max_seq_len + self.gamma + 1
        self.draft_caches = self.draft_model.init_caches(
            draft_cfg, self.n_rows, max_len, draft_kv_scales)
        self.slot_draft_pos = jnp.zeros((self.n_rows,), jnp.int32)
        self.slot_spec_tail = jnp.full((self.n_rows, self.gamma + 2),
                                  scfg.pad_id, jnp.int32)

    # ------------------------------------------------------------------
    def _spec_prefill_fn(self, bucket: int, nb: int):
        cfg, dcfg = self.cfg, self.draft_cfg
        model, dmodel = self.model, self.draft_model
        scfg = self.scfg
        want_lp = self.return_logprobs
        kv_s, dkv_s = self._kv_scales, self._dkv_scales

        def fn(params_t, params_d, caches_t, caches_d, ids, lengths, slots,
               key):
            scratch_t = model.init_caches(cfg, nb, bucket, kv_s)
            logits, scratch_t = model.forward_prefill(
                params_t, cfg, ids, lengths, scratch_t)
            scratch_d = dmodel.init_caches(dcfg, nb, bucket, dkv_s)
            _, scratch_d = dmodel.forward_prefill(
                params_d, dcfg, ids, lengths, scratch_d)
            tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            lp = _chosen_lp(logits, tokens, want_lp)
            kt, vt = caches_t.k, caches_t.v
            kd, vd = caches_d.k, caches_d.v
            for i in range(nb):
                sl = (0, slots[i], 0, 0, 0)
                kt = jax.lax.dynamic_update_slice(
                    kt, scratch_t.k[:, i:i + 1], sl)
                vt = jax.lax.dynamic_update_slice(
                    vt, scratch_t.v[:, i:i + 1], sl)
                kd = jax.lax.dynamic_update_slice(
                    kd, scratch_d.k[:, i:i + 1], sl)
                vd = jax.lax.dynamic_update_slice(
                    vd, scratch_d.v[:, i:i + 1], sl)
            return (caches_t._replace(k=kt, v=vt),
                    caches_d._replace(k=kd, v=vd), tokens, lp)

        return jax.jit(fn, donate_argnums=(2, 3))

    def _admit_group(self, group: List[Request], bucket: int
                     ) -> List[FinishedRequest]:
        finished: List[FinishedRequest] = []
        nb = _pow2_groups(len(group), self.max_slots)[0]
        reqs, rest = group[:nb], group[nb:]
        ids = np.full((nb, bucket), self.scfg.pad_id, np.int32)
        lengths = np.ones((nb,), np.int32)
        slots = np.full((nb,), self.trash_slot, np.int32)
        for i, req in enumerate(reqs):
            ids[i, :len(req.input_ids)] = req.input_ids
            lengths[i] = len(req.input_ids)
            slots[i] = req.slot
        fn = self._get(("spec_prefill", bucket, nb),
                       self._spec_prefill_fn, bucket, nb)
        self.caches, self.draft_caches, tokens, lps = fn(
            self.params, self.draft_params, self.caches, self.draft_caches,
            jnp.asarray(ids), jnp.asarray(lengths), jnp.asarray(slots),
            self._next_key())
        tokens = np.asarray(tokens)
        sl = jnp.asarray(slots)
        # draft has processed [0, len); its next position is len.
        self.slot_draft_pos = self.slot_draft_pos.at[sl].set(
            jnp.asarray(lengths))
        tail = jnp.full((nb, self.gamma + 2), self.scfg.pad_id, jnp.int32)
        tail = tail.at[:, -1].set(jnp.asarray(tokens[:nb].astype(np.int32)))
        self.slot_spec_tail = self.slot_spec_tail.at[sl].set(tail)
        finished.extend(self._register_prefilled(reqs, tokens,
                                                 np.asarray(lps)))
        if rest:
            finished.extend(self._admit_group(rest, bucket))
        return finished

    # ------------------------------------------------------------------
    def _spec_decode_fn(self, n_iters: int):
        cfg, dcfg = self.cfg, self.draft_cfg
        model, dmodel = self.model, self.draft_model
        scfg = self.scfg
        gamma = self.gamma
        want_lp = self.return_logprobs
        n_rows = self.n_rows
        end_id, pad_id = scfg.end_id, scfg.pad_id
        t_cols = n_iters * (gamma + 1)
        smax_t = int(self.caches.k.shape[3])
        smax_d = int(self.draft_caches.k.shape[3])
        rows = jnp.arange(n_rows)

        def fn(params_t, params_d, caches_t, caches_d, tail, lens, active,
               gen, budget, draft_pos, key):
            out = jnp.full((n_rows, t_cols), pad_id, jnp.int32)
            out_lp = jnp.zeros((n_rows, t_cols), jnp.float32)
            written = jnp.zeros((n_rows,), jnp.int32)

            def body(it, st):
                (caches_t, caches_d, tail, lens, active, gen, draft_pos,
                 out, out_lp, written) = st
                p_new = lens + 1              # position after last committed

                def dbody(j, dst):
                    caches_d, prev, props = dst
                    q = draft_pos + j
                    back = p_new - 1 - q      # 0 => last committed token
                    idx_t = jnp.clip((gamma + 1) - back, 0, gamma + 1)
                    catch = jnp.take_along_axis(
                        tail, idx_t[:, None], 1)[:, 0]
                    inp = jnp.where(q < p_new, catch, prev)
                    qc = jnp.minimum(q, smax_d - 1)
                    lgd, caches_d = dmodel.forward_decode(
                        params_d, dcfg, inp, qc, caches_d)
                    samp = jnp.argmax(lgd, axis=-1).astype(jnp.int32)
                    i = q + 1 - p_new
                    ok = (i >= 0) & (i < gamma)
                    ic = jnp.clip(i, 0, gamma - 1)
                    props = props.at[rows, ic].set(
                        jnp.where(ok, samp, props[rows, ic]))
                    return caches_d, samp, props

                props0 = jnp.full((n_rows, gamma), pad_id, jnp.int32)
                caches_d, _, props = jax.lax.fori_loop(
                    0, gamma + 1, dbody,
                    (caches_d, jnp.zeros((n_rows,), jnp.int32), props0))

                last = tail[:, -1]
                ver = jnp.concatenate([last[:, None], props], axis=1)
                start = jnp.minimum(p_new - 1, smax_t - gamma - 1)
                lg, caches_t = model.forward_extend(
                    params_t, cfg, ver, start, caches_t)
                g = jnp.argmax(lg, axis=-1).astype(jnp.int32)

                match = props == g[:, :gamma]
                n = jnp.sum(jnp.cumprod(match.astype(jnp.int32), 1), 1)
                i_idx = jnp.arange(gamma + 1)[None]
                bonus = jnp.take_along_axis(g, n[:, None], 1)
                props_ext = jnp.concatenate(
                    [props, jnp.zeros((n_rows, 1), jnp.int32)], 1)
                slab = jnp.where(i_idx < n[:, None], props_ext,
                                 jnp.where(i_idx == n[:, None], bonus,
                                           pad_id))
                room = (budget - gen)[:, None]
                valid = ((i_idx <= n[:, None]) & (i_idx < room)
                         & active[:, None])
                is_eos = (slab == end_id) & valid
                valid = valid & (jnp.cumsum(is_eos, 1) - is_eos == 0)
                k = jnp.sum(valid.astype(jnp.int32), 1)

                col = jnp.where(valid, written[:, None] + i_idx, t_cols)
                out = out.at[rows[:, None], col].set(slab, mode="drop")
                if want_lp:
                    lsm = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
                    slab_lp = jnp.take_along_axis(
                        lsm, jnp.clip(slab, 0, None)[..., None], -1)[..., 0]
                    out_lp = out_lp.at[rows[:, None], col].set(
                        slab_lp, mode="drop")

                # draft-cache validity (pre-truncation n, offline semantics)
                draft_pos = jnp.where(
                    active,
                    jnp.minimum(p_new + n, draft_pos + gamma + 1),
                    draft_pos)
                # committed bookkeeping
                full = jnp.concatenate([tail, slab], axis=1)
                idxs = jnp.arange(gamma + 2)[None] + k[:, None]
                tail = jnp.take_along_axis(full, idxs, 1)
                written = written + k
                gen = gen + k
                lens = lens + k
                active = (active & ~jnp.any(is_eos & valid, 1)
                          & (gen < budget))
                return (caches_t, caches_d, tail, lens, active, gen,
                        draft_pos, out, out_lp, written)

            st = (caches_t, caches_d, tail, lens, active, gen, draft_pos,
                  out, out_lp, written)
            st = jax.lax.fori_loop(0, n_iters, body, st)
            (caches_t, caches_d, tail, lens, active, gen, draft_pos,
             out, out_lp, written) = st
            return (caches_t, caches_d, tail, lens, active, gen, draft_pos,
                    out, out_lp, written)

        return jax.jit(fn, donate_argnums=(2, 3))

    def _decode_phase(self) -> List[FinishedRequest]:
        finished: List[FinishedRequest] = []
        decoding = list(self.scheduler.active_requests())
        budgets = [r.max_new_tokens - len(r.output_ids) for r in decoding]
        remaining = max(budgets) if budgets else 0
        chunk = min(self.decode_chunk, remaining)
        if chunk <= 0:
            return finished
        n_iters = -(-chunk // (self.gamma + 1))
        slot_of = {r.slot: r for r in decoding}
        fn = self._get(("spec_decode", n_iters), self._spec_decode_fn,
                       n_iters)
        (self.caches, self.draft_caches, self.slot_spec_tail, self.slot_lens,
         self.slot_active, self.slot_gen, self.slot_draft_pos, out, out_lp,
         k_tot) = fn(
            self.params, self.draft_params, self.caches, self.draft_caches,
            self.slot_spec_tail, self.slot_lens, self.slot_active, self.slot_gen,
            self.slot_budget, self.slot_draft_pos, self._next_key())
        self.slot_tokens = self.slot_spec_tail[:, -1]
        out = np.asarray(out)
        out_lp = np.asarray(out_lp) if self.return_logprobs else None
        k_tot = np.asarray(k_tot)

        for slot, req in slot_of.items():
            for j in range(int(k_tot[slot])):
                if self.return_logprobs:
                    self._req_logprobs.setdefault(
                        req.request_id, []).append(float(out_lp[slot, j]))
                if self.scheduler.record_token(req.request_id,
                                               int(out[slot, j]),
                                               self.scfg.end_id):
                    self._release_slot(slot)
                    self._req_sampling.pop(req.request_id, None)
                    finished.append(self._finish_recorded(req))
                    break
                if self._stop_matched(req):
                    finished.append(self._finish_stopped(req))
                    break
        return finished
