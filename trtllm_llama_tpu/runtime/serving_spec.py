"""Speculative decoding inside the continuous-batching engine.

Combines the two beyond-reference features: every decode chunk runs
draft-propose / target-verify iterations for ALL active slots at once
(runtime/speculative.py semantics, vectorized over the slot pool), so a
well-matched draft multiplies aggregate serving throughput the same way it
multiplies single-stream decode — each accepted token amortizes one read
of the target weights across the whole batch.

Dense-cache. Sampling: greedy by default; with per_request_sampling=True
each request may carry its own temperature/top-k/top-p and the verify step
runs full rejection sampling (Leviathan et al. 2023 Alg. 1) vectorized
over slots — stochastic slots emit tokens distributed exactly as the plain
engine's sampler (distribution-tested), while greedy slots keep the
argmax-prefix acceptance and stay bit-identical to the plain serving
engine's greedy output (which is itself bit-identical to the offline
session — tested). p and q use transform_slots, the same per-slot
distribution shaping sample_step_slots draws from.

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
from .sampling import SamplingConfig, transform_slots
from .serving import FinishedRequest, ServingEngine, _chosen_lp, _pow2_groups
from .scheduler import Request


class SpeculativeServingEngine(ServingEngine):
    def __init__(self, cfg: ModelConfig, params, draft_cfg: ModelConfig,
                 draft_params, engine_cfg: EngineConfig, gamma: int = 4,
                 sampling: Optional[SamplingConfig] = None,
                 kv_scales=None, draft_kv_scales=None,
                 decode_chunk: int = 8, model=None, draft_model=None,
                 return_logprobs: bool = False,
                 per_request_sampling: bool = False):
        scfg = sampling or SamplingConfig()
        if not per_request_sampling and not scfg.is_greedy:
            raise ValueError(
                "speculative serving with a stochastic SamplingConfig needs "
                "per_request_sampling=True (the rejection-sampling "
                "acceptance is vectorized over slots)")
        self._check_spec_sampling(scfg)
        import jax as _jax
        if _jax.process_count() > 1:
            raise ValueError("speculative serving is single-host for now "
                             "(its draft-side state is process-local)")
        if cfg.vocab_size != draft_cfg.vocab_size:
            raise ValueError("draft and target must share a vocabulary")
        super().__init__(cfg, params, engine_cfg, sampling=scfg,
                         kv_scales=kv_scales, decode_chunk=decode_chunk,
                         model=model, return_logprobs=return_logprobs,
                         per_request_sampling=per_request_sampling,
                         cache_headroom=int(gamma) + 1)
        if not hasattr(self.model, "forward_extend"):
            raise ValueError("target family lacks forward_extend")
        from ..models import by_architecture
        self.draft_cfg = draft_cfg
        self.draft_model = (draft_model if draft_model is not None
                            else by_architecture(
                                getattr(draft_cfg, "architecture", "llama")))
        if draft_params is params:
            # self-draft: share the (already fused) target params — fusing
            # a second copy doubles 7B weight HBM and OOMs a single chip
            self.draft_params = self.params
        else:
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
        # acceptance accounting: committed tokens vs verify iterations run
        # (committed > iters  <=>  at least one multi-token commit)
        self.spec_iters = 0
        self.spec_committed = 0

    # ------------------------------------------------------------------
    @staticmethod
    def _check_spec_sampling(scfg: SamplingConfig):
        """The vectorized rejection test covers the distribution-shaping
        params (temperature/top-k/top-p); history-dependent features would
        change p/q mid-slab and are rejected (same scope as the offline
        SpeculativeSession, speculative.py)."""
        if (scfg.repetition_penalty != 1.0 or scfg.presence_penalty != 0.0
                or scfg.frequency_penalty != 0.0 or scfg.min_length > 0
                or scfg.bad_words or scfg.beam_width > 1):
            raise ValueError(
                "speculative serving supports temperature/top_k/top_p "
                "(+host-side stop_words); penalties, min_length, bad_words "
                "and beam search are not implemented for it")

    def submit(self, input_ids, max_new_tokens,
               sampling: Optional[SamplingConfig] = None) -> int:
        if sampling is not None:
            self._check_spec_sampling(sampling)
        return super().submit(input_ids, max_new_tokens, sampling)
    def _spec_prefill_fn(self, bucket: int, nb: int):
        cfg, dcfg = self.cfg, self.draft_cfg
        model, dmodel = self.model, self.draft_model
        scfg = self.scfg
        per_request = self.per_request
        want_lp = self.return_logprobs
        kv_s, dkv_s = self._kv_scales, self._dkv_scales

        def fn(params_t, params_d, caches_t, caches_d, ids, lengths, slots,
               key, slot_params):
            scratch_t = model.init_caches(cfg, nb, bucket, kv_s)
            logits, scratch_t = model.forward_prefill(
                params_t, cfg, ids, lengths, scratch_t)
            scratch_d = dmodel.init_caches(dcfg, nb, bucket, dkv_s)
            _, scratch_d = dmodel.forward_prefill(
                params_d, dcfg, ids, lengths, scratch_d)
            greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if per_request:
                gp = jax.tree.map(lambda a: a[slots], slot_params)
                tl = transform_slots(logits, gp)
                samp = jax.random.categorical(key, tl,
                                              axis=-1).astype(jnp.int32)
                tokens = jnp.where(gp.greedy, greedy_tok, samp)
            else:
                tokens = greedy_tok
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
            if self.per_request:
                scfg_i = self._req_sampling.get(req.request_id, self.scfg)
                self.slot_params = self.slot_params.set_slot(req.slot,
                                                             scfg_i)
        fn = self._get(("spec_prefill", bucket, nb),
                       self._spec_prefill_fn, bucket, nb)
        self.caches, self.draft_caches, tokens, lps = fn(
            self.params, self.draft_params, self.caches, self.draft_caches,
            jnp.asarray(ids), jnp.asarray(lengths), jnp.asarray(slots),
            self._next_key(),
            self.slot_params if self.per_request else 0)
        tokens, lps = self._read_many(tokens, lps)
        sl = jnp.asarray(slots)
        # draft has processed [0, len); its next position is len.
        self.slot_draft_pos = self.slot_draft_pos.at[sl].set(
            jnp.asarray(lengths))
        tail = jnp.full((nb, self.gamma + 2), self.scfg.pad_id, jnp.int32)
        tail = tail.at[:, -1].set(jnp.asarray(tokens[:nb].astype(np.int32)))
        self.slot_spec_tail = self.slot_spec_tail.at[sl].set(tail)
        finished.extend(self._register_prefilled(reqs, tokens, lps))
        if rest:
            finished.extend(self._admit_group(rest, bucket))
        return finished

    # ------------------------------------------------------------------
    def _spec_decode_fn(self, n_iters: int):
        cfg, dcfg = self.cfg, self.draft_cfg
        model, dmodel = self.model, self.draft_model
        scfg = self.scfg
        gamma = self.gamma
        per_request = self.per_request
        want_lp = self.return_logprobs
        n_rows = self.n_rows
        v = cfg.vocab_size
        end_id, pad_id = scfg.end_id, scfg.pad_id
        t_cols = n_iters * (gamma + 1)
        smax_t = int(self.caches.k.shape[3])
        smax_d = int(self.draft_caches.k.shape[3])
        rows = jnp.arange(n_rows)

        def fn(params_t, params_d, caches_t, caches_d, tail, lens, active,
               gen, budget, draft_pos, key, slot_params):
            out = jnp.full((n_rows, t_cols), pad_id, jnp.int32)
            out_lp = jnp.zeros((n_rows, t_cols), jnp.float32)
            written = jnp.zeros((n_rows,), jnp.int32)

            def body(it, st):
                (caches_t, caches_d, tail, lens, active, gen, draft_pos,
                 out, out_lp, written) = st
                p_new = lens + 1              # position after last committed
                if per_request:
                    kb = jax.random.fold_in(key, it)
                    k_draft, k_acc, k_res = jax.random.split(kb, 3)

                def dbody(j, dst):
                    caches_d, prev, props, qprobs = dst
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
                    if per_request:
                        # stochastic slots propose from their ACTUAL
                        # per-slot distribution q (transform_slots — same
                        # shaping the plain engine samples with)
                        tl = transform_slots(lgd, slot_params)
                        s_samp = jax.random.categorical(
                            jax.random.fold_in(k_draft, j), tl,
                            axis=-1).astype(jnp.int32)
                        samp = jnp.where(slot_params.greedy, samp, s_samp)
                        qp = jax.nn.softmax(tl, axis=-1)
                        qprobs = qprobs.at[rows, ic].set(
                            jnp.where(ok[:, None], qp, qprobs[rows, ic]))
                    props = props.at[rows, ic].set(
                        jnp.where(ok, samp, props[rows, ic]))
                    return caches_d, samp, props, qprobs

                props0 = jnp.full((n_rows, gamma), pad_id, jnp.int32)
                q0 = (jnp.zeros((n_rows, gamma, v), jnp.float32)
                      if per_request
                      else jnp.zeros((n_rows, 1, 1), jnp.float32))
                caches_d, _, props, qprobs = jax.lax.fori_loop(
                    0, gamma + 1, dbody,
                    (caches_d, jnp.zeros((n_rows,), jnp.int32), props0, q0))

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
                if per_request:
                    # rejection sampling (Leviathan Alg. 1) vectorized over
                    # slots; greedy slots keep the argmax-prefix acceptance
                    # (bit-identical to the plain greedy engine)
                    pl = jax.vmap(transform_slots, in_axes=(1, None),
                                  out_axes=1)(lg, slot_params)
                    pprobs = jax.nn.softmax(pl, axis=-1)   # [R, γ+1, V]
                    p_x = jnp.take_along_axis(
                        pprobs[:, :gamma], props[..., None], -1)[..., 0]
                    q_x = jnp.take_along_axis(
                        qprobs, props[..., None], -1)[..., 0]
                    u = jax.random.uniform(k_acc, (n_rows, gamma))
                    accept = u * jnp.maximum(q_x, 1e-20) < p_x
                    n_s = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), 1),
                                  1)
                    n = jnp.where(slot_params.greedy, n, n_s)
                    # replacement at slot n: norm(max(p_n - q_n, 0)); the
                    # full-acceptance bonus is the same formula with q=0
                    p_n = jnp.take_along_axis(
                        pprobs, n[:, None, None], 1)[:, 0]
                    q_ext = jnp.concatenate(
                        [qprobs, jnp.zeros((n_rows, 1, v), jnp.float32)], 1)
                    q_n = jnp.take_along_axis(
                        q_ext, n[:, None, None], 1)[:, 0]
                    resid = jnp.maximum(p_n - q_n, 0.0)
                    resid = jnp.where(
                        resid.sum(-1, keepdims=True) > 1e-12, resid, p_n)
                    repl = jax.random.categorical(
                        k_res, jnp.where(resid > 0, jnp.log(resid), -1e30),
                        axis=-1).astype(jnp.int32)
                    bonus_g = jnp.take_along_axis(g, n[:, None], 1)[:, 0]
                    bonus = jnp.where(slot_params.greedy, bonus_g,
                                      repl)[:, None]
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

            # weight-read budget with early exit: run at most n_iters
            # verify iterations (one target weight read each), stopping as
            # soon as every slot is done — acceptance shortens the loop
            # instead of lengthening the commit (see _decode_phase).
            def cond(carry):
                it, s = carry
                return (it < n_iters) & jnp.any(s[4])

            def wbody(carry):
                it, s = carry
                return it + 1, body(it, s)

            it_done, st = jax.lax.while_loop(
                cond, wbody, (jnp.int32(0), st))
            (caches_t, caches_d, tail, lens, active, gen, draft_pos,
             out, out_lp, written) = st
            return (caches_t, caches_d, tail, lens, active, gen, draft_pos,
                    out, out_lp, written, it_done)

        return jax.jit(fn, donate_argnums=(2, 3))

    def _decode_phase(self) -> List[FinishedRequest]:
        finished: List[FinishedRequest] = []
        decoding = list(self.scheduler.active_requests())
        budgets = [r.max_new_tokens - len(r.output_ids) for r in decoding]
        remaining = max(budgets) if budgets else 0
        chunk = min(self.decode_chunk, remaining)
        if chunk <= 0:
            return finished
        # Budget by TARGET WEIGHT READS, not by assumed-full acceptance:
        # n_iters = chunk verify iterations, each committing >=1 token per
        # active slot, with an in-graph early exit once every slot is done.
        # The r4 budget ceil(chunk/(gamma+1)) assumed every proposal lands;
        # at ~0 acceptance each engine step then committed ~n_iters tokens
        # instead of ~chunk, multiplying per-step dispatch/readback overhead
        # per token by gamma+1 (measured 111.8 vs 405.7 tok/s plain,
        # scripts/measure_r4.jsonl). With read-budgeting the zero-acceptance
        # case degrades to ~plain throughput and acceptance is pure upside.
        n_iters = chunk
        slot_of = {r.slot: r for r in decoding}
        fn = self._get(("spec_decode", n_iters), self._spec_decode_fn,
                       n_iters)
        (self.caches, self.draft_caches, self.slot_spec_tail, self.slot_lens,
         self.slot_active, self.slot_gen, self.slot_draft_pos, out, out_lp,
         k_tot, it_done) = fn(
            self.params, self.draft_params, self.caches, self.draft_caches,
            self.slot_spec_tail, self.slot_lens, self.slot_active, self.slot_gen,
            self.slot_budget, self.slot_draft_pos, self._next_key(),
            self.slot_params if self.per_request else 0)
        self.slot_tokens = self.slot_spec_tail[:, -1]
        out, out_lp, k_tot, it_done = self._read_many(
            out, out_lp if self.return_logprobs else None, k_tot, it_done)
        self.spec_iters += int(it_done)
        self.spec_committed += int(np.sum(k_tot))

        for slot, req in slot_of.items():
            for j in range(int(k_tot[slot])):
                if self.return_logprobs:
                    self._req_logprobs.setdefault(
                        req.request_id, []).append(float(out_lp[slot, j]))
                if self._record_token(req, int(out[slot, j])):
                    self._release_slot(slot)
                    self._req_sampling.pop(req.request_id, None)
                    finished.append(self._finish_recorded(req))
                    break
                if self._stop_matched(req):
                    finished.append(self._finish_stopped(req))
                    break
        return finished


class PromptLookupServingEngine(ServingEngine):
    """Draft-FREE speculative serving: per-slot prompt-lookup (n-gram)
    proposals verified by the target's vectorized slab — no draft model, no
    second KV cache, no extra weight traffic (runtime/speculative.py::
    PromptLookupSession semantics, lifted into the continuous-batching slot
    pool).

    Each decode iteration proposes, for every active slot, the γ tokens
    that followed the most recent earlier occurrence of the slot's last
    `ngram` committed tokens in its own prompt+output history, then runs
    ONE target forward_extend over all slots and commits the longest
    matching prefix + bonus token. The history slab is rebuilt host-side
    from the scheduler (the source of truth) at each chunk dispatch and
    updated in-graph within the chunk. Greedy-only (an n-gram proposal has
    no q distribution); output is bit-identical to the plain engine's
    greedy stream.

    Cost model (r5): the decode chunk is budgeted by TARGET WEIGHT READS —
    n_iters = chunk verify iterations with an in-graph early exit — so at
    zero acceptance each chunk commits >= chunk tokens per active slot at
    ~the plain engine's read count, and acceptance only shortens the loop.
    (The r4 budget ceil(chunk/(gamma+1)) assumed full acceptance and lost
    2-4x wall-clock on non-copying workloads: 111.8 vs 405.7 tok/s plain,
    scripts/measure_r4.jsonl.) Per weight-read, tokens committed never
    drop below vanilla decode; per wall-clock second a verify extend costs
    slightly more than a plain decode dispatch, so expect ~parity on
    non-repetitive text and a win only when the model actually copies
    (acceptance > 0) — measured rows in docs/serving.md.
    """

    def __init__(self, cfg: ModelConfig, params, engine_cfg: EngineConfig,
                 gamma: int = 4, ngram: int = 3,
                 sampling: Optional[SamplingConfig] = None,
                 kv_scales=None, decode_chunk: int = 8, model=None,
                 return_logprobs: bool = False):
        scfg = sampling or SamplingConfig()
        if not scfg.is_greedy:
            raise ValueError("prompt-lookup serving is greedy-only "
                             "(an n-gram proposal has no q distribution)")
        super().__init__(cfg, params, engine_cfg, sampling=scfg,
                         kv_scales=kv_scales, decode_chunk=decode_chunk,
                         model=model, return_logprobs=return_logprobs,
                         cache_headroom=int(gamma) + 1)
        if not hasattr(self.model, "forward_extend"):
            raise ValueError("prompt-lookup serving needs the model "
                             "family to provide forward_extend")
        self.gamma = int(gamma)
        self.ngram = int(ngram)
        self.t_hist = int(engine_cfg.max_seq_len)
        # acceptance accounting: committed tokens vs verify iterations run
        self.spec_iters = 0
        self.spec_committed = 0

    # ------------------------------------------------------------------
    def _pl_decode_fn(self, n_iters: int):
        cfg, model, scfg = self.cfg, self.model, self.scfg
        gamma, ngram = self.gamma, self.ngram
        n_rows, t_hist = self.n_rows, self.t_hist
        end_id, pad_id = scfg.end_id, scfg.pad_id
        t_cols = n_iters * (gamma + 1)
        smax = int(self.caches.k.shape[3])
        rows = jnp.arange(n_rows)
        want_lp = self.return_logprobs
        n_win = t_hist - ngram + 1
        w_pos = jnp.arange(n_win)

        def fn(params, caches, hist, lens, active, gen, budget):
            out = jnp.full((n_rows, t_cols), pad_id, jnp.int32)
            out_lp = jnp.zeros((n_rows, t_cols), jnp.float32)
            written = jnp.zeros((n_rows,), jnp.int32)

            def body(it, st):
                caches, hist, lens, active, gen, out, out_lp, written = st
                p_new = lens + 1        # hist length (cache holds p_new-1)

                # ---- propose: most recent earlier occurrence of the last
                # `ngram` committed tokens, per slot ----------------------
                gram_idx = (p_new[:, None] - ngram
                            + jnp.arange(ngram)[None])
                gram = jnp.take_along_axis(
                    hist, jnp.clip(gram_idx, 0, t_hist - 1), 1)
                match = jnp.ones((n_rows, n_win), bool)
                for j in range(ngram):
                    match &= hist[:, j:n_win + j] == gram[:, j:j + 1]
                match &= w_pos[None] < (p_new - ngram)[:, None]
                t_star = jnp.max(jnp.where(match, w_pos[None], -1), 1)
                found = t_star >= 0
                src = (t_star + ngram)[:, None] + jnp.arange(gamma)[None]
                props = jnp.take_along_axis(
                    hist, jnp.clip(src, 0, t_hist - 1), 1)
                last = jnp.take_along_axis(
                    hist, jnp.clip(p_new - 1, 0, t_hist - 1)[:, None], 1)
                props = jnp.where(found[:, None], props,
                                  jnp.broadcast_to(last, (n_rows, gamma)))

                # ---- verify: one target extend over all slots ----------
                ver = jnp.concatenate([last, props], axis=1)
                start = jnp.minimum(p_new - 1, smax - gamma - 1)
                lg, caches = model.forward_extend(
                    params, cfg, ver, start, caches)
                g = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                match_t = props == g[:, :gamma]
                n = jnp.sum(jnp.cumprod(match_t.astype(jnp.int32), 1), 1)
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
                col_h = jnp.where(valid, p_new[:, None] + i_idx, t_hist)
                hist = hist.at[rows[:, None], col_h].set(slab, mode="drop")
                written = written + k
                gen = gen + k
                lens = lens + k
                active = (active & ~jnp.any(is_eos & valid, 1)
                          & (gen < budget))
                return (caches, hist, lens, active, gen, out, out_lp,
                        written)

            st = (caches, hist, lens, active, gen, out, out_lp, written)

            # weight-read budget + early exit (see _decode_phase): at most
            # n_iters target reads, stop when every slot is finished.
            def cond(carry):
                it, s = carry
                return (it < n_iters) & jnp.any(s[3])

            def wbody(carry):
                it, s = carry
                return it + 1, body(it, s)

            it_done, st = jax.lax.while_loop(
                cond, wbody, (jnp.int32(0), st))
            caches, hist, lens, active, gen, out, out_lp, written = st
            last_tok = jnp.take_along_axis(
                hist, jnp.clip(lens, 0, t_hist - 1)[:, None], 1)[:, 0]
            return (caches, lens, active, gen, out, out_lp, written,
                    last_tok, it_done)

        return jax.jit(fn, donate_argnums=(1,))

    def _decode_phase(self) -> List[FinishedRequest]:
        finished: List[FinishedRequest] = []
        decoding = list(self.scheduler.active_requests())
        budgets = [r.max_new_tokens - len(r.output_ids) for r in decoding]
        remaining = max(budgets) if budgets else 0
        chunk = min(self.decode_chunk, remaining)
        if chunk <= 0:
            return finished
        # Budget by target weight reads (n_iters = chunk, early exit), NOT
        # by assumed-full acceptance — see SpeculativeServingEngine.
        # _decode_phase for the full rationale and the r4 measured loss the
        # old ceil(chunk/(gamma+1)) budget caused.
        n_iters = chunk
        slot_of = {r.slot: r for r in decoding}
        import time as _time
        _t0 = _time.perf_counter()
        # history slab: prompt + committed output per slot, -1 elsewhere
        # (-1 never equals a real token id, so unwritten positions cannot
        # fake an n-gram match); rebuilt from the scheduler each chunk so
        # the in-graph copy can never drift from the host's token record
        hist = np.full((self.n_rows, self.t_hist), -1, np.int32)
        for slot, req in slot_of.items():
            toks = list(req.input_ids) + list(req.output_ids)
            hist[slot, :len(toks)] = toks[:self.t_hist]
        fn = self._get(("pl_decode", n_iters), self._pl_decode_fn, n_iters)
        (self.caches, self.slot_lens, self.slot_active, self.slot_gen,
         out, out_lp, k_tot, last_tok, it_done) = fn(
            self.params, self.caches, self._dev(hist), self.slot_lens,
            self.slot_active, self.slot_gen, self.slot_budget)
        self.slot_tokens = last_tok
        _t1 = _time.perf_counter()
        self.phase_times["dispatch"] += _t1 - _t0
        out, out_lp, k_tot, it_done = self._read_many(
            out, out_lp if self.return_logprobs else None, k_tot, it_done)
        self.spec_iters += int(it_done)
        self.spec_committed += int(np.sum(k_tot))
        _t2 = _time.perf_counter()
        self.phase_times["readback"] += _t2 - _t1

        for slot, req in slot_of.items():
            for j in range(int(k_tot[slot])):
                if self.return_logprobs:
                    self._req_logprobs.setdefault(
                        req.request_id, []).append(float(out_lp[slot, j]))
                if self._record_token(req, int(out[slot, j])):
                    self._release_slot(slot)
                    self._req_sampling.pop(req.request_id, None)
                    finished.append(self._finish_recorded(req))
                    break
                if self._stop_matched(req):
                    finished.append(self._finish_stopped(req))
                    break
        self.phase_times["host"] += _time.perf_counter() - _t2
        return finished
