"""Speculative decoding: draft-model propose, target-model verify.

No reference analogue — the reference decodes strictly one token per step
(runtime/generation.py:852-996); this is a beyond-parity latency feature.
Greedy two-model speculative decoding (Leviathan et al. 2023, greedy case):

  per iteration (whole loop ON DEVICE, one dispatch per request batch):
    1. the draft model runs γ+1 sequential decode steps, proposing up to γ
       tokens past the committed prefix (its own K/V bookkeeping folded into
       the same loop: steps whose position is already committed re-feed the
       committed token instead of a proposal — that is how the draft model
       catches up on the bonus token it never processed);
    2. the target model runs ONE forward_extend over
       [last_committed, draft_1..draft_γ] — γ+1 positions verified for the
       price (in dispatches, and nearly in HBM traffic: weights are read
       once for the whole slab) of a single decode step;
    3. accept the longest prefix where draft greedy == target greedy, then
       commit one extra token from the target's own distribution (the
       "bonus": on full acceptance γ+1 tokens per iteration). Acceptance,
       EOS truncation, and budget capping are all in-graph — the host sees
       only the final (output_ids, lengths).

Two acceptance modes, resolved at trace time from the SamplingConfig:
- greedy: acceptance compares argmaxes — output bit-identical to
  GenerationSession's greedy decode (whenever argmax ties don't flip);
- stochastic (temperature / top-k / top-p): full rejection sampling
  (Leviathan et al. 2023 Alg. 1): proposal x_i ~ q_i accepted with
  probability min(1, p_i(x_i)/q_i(x_i)); the first rejected slot
  resamples from norm(max(p_i - q_i, 0)); full acceptance samples the
  bonus from p_{γ+1} (the same code path — the bonus slot has q = 0, so
  the clipped residual IS p). The emitted sequence is distributed
  EXACTLY as vanilla sampling from the target (the speculative
  guarantee), which tests/test_speculative.py checks empirically.

Why this matters on TPU: single-stream decode is HBM-bound on target
weights. Each accepted token amortizes one full weight read across
1 + E[accepted] tokens — with a well-matched draft (e.g. LLaMA-160M
drafting for 7B) that is a 2-3× single-stream speedup.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..models import llama  # noqa: F401  (default family fallback)
from .sampling import SamplingConfig, apply_top_k, apply_top_p
from .session import GenerationOutput


def _transform(logits, scfg: SamplingConfig):
    """The same logits shaping sample_step applies (temperature/top-k/top-p)
    — p and q in the rejection test must be the ACTUAL sampling
    distributions, not the raw model softmaxes."""
    logits = logits.astype(jnp.float32)
    if scfg.temperature != 1.0:
        logits = logits / scfg.temperature
    if scfg.top_k > 1:
        logits = apply_top_k(logits, scfg.top_k)
    if scfg.top_p > 0.0:
        logits = apply_top_p(logits, scfg.top_p)
    return logits


class SpeculativeSession:
    """Two-model speculative generation session.

    cfg/params: the target model; draft_cfg/draft_params: the (small) draft
    model — same vocabulary required. gamma: proposals per iteration.
    """

    def __init__(self, cfg: ModelConfig, params, draft_cfg: ModelConfig,
                 draft_params, engine_cfg: EngineConfig, gamma: int = 4,
                 kv_scales=None, draft_kv_scales=None,
                 model=None, draft_model=None):
        if cfg.vocab_size != draft_cfg.vocab_size:
            raise ValueError("draft and target must share a vocabulary")
        if not os.environ.get("TLLM_NO_COMPILE_CACHE"):
            from ..utils.compile_cache import enable_compile_cache
            enable_compile_cache()
        self.cfg = cfg
        self.draft_cfg = draft_cfg
        self.engine_cfg = engine_cfg
        self.gamma = int(gamma)
        from ..models import by_architecture
        self.model = (model if model is not None
                      else by_architecture(getattr(cfg, "architecture",
                                                   "llama")))
        self.draft_model = (draft_model if draft_model is not None
                            else by_architecture(
                                getattr(draft_cfg, "architecture",
                                        "llama")))
        if not hasattr(self.model, "forward_extend"):
            raise ValueError(
                "speculative verification needs the target model family to "
                "provide forward_extend (llama/gpt/gptj/gptneox/bloom/opt "
                "do; this one does not)")
        self.kv_scales = kv_scales
        self.draft_kv_scales = draft_kv_scales
        self.params = params
        self.draft_params = draft_params
        if not os.environ.get("TLLM_NO_FUSE_QKV"):
            fuse_t = getattr(self.model, "fuse_qkv_params", None)
            if fuse_t is not None:
                self.params = fuse_t(self.params)
            if draft_params is params:
                # self-draft: share the fused target params (a second fused
                # copy would double 7B weight HBM)
                self.draft_params = self.params
            else:
                fuse_d = getattr(self.draft_model, "fuse_qkv_params", None)
                if fuse_d is not None:
                    self.draft_params = fuse_d(self.draft_params)
        if jax.default_backend() != "cpu":
            from ..ops.registry import enable_pallas_kernels
            enable_pallas_kernels(True)
        self._fn_cache = {}

    # ------------------------------------------------------------------
    def _spec_fn(self, bucket: int, max_new: int, scfg: SamplingConfig):
        cfg, dcfg = self.cfg, self.draft_cfg
        model, dmodel = self.model, self.draft_model
        gamma = self.gamma
        kv_s, dkv_s = self.kv_scales, self.draft_kv_scales
        end_id, pad_id = scfg.end_id, scfg.pad_id
        # the verify slab reaches position (prompt + generated - 1) + γ
        max_len = bucket + max_new + gamma + 1

        stochastic = not scfg.is_greedy
        v = cfg.vocab_size

        def fn(params_t, params_d, input_ids, seq_lens, key):
            b = input_ids.shape[0]
            bidx = jnp.arange(b)
            caches_t = model.init_caches(cfg, b, max_len, kv_s)
            caches_d = dmodel.init_caches(dcfg, b, max_len, dkv_s)

            logits, caches_t = model.forward_prefill(
                params_t, cfg, input_ids, seq_lens, caches_t)
            _, caches_d = dmodel.forward_prefill(
                params_d, dcfg, input_ids, seq_lens, caches_d)
            if stochastic:
                key, k0 = jax.random.split(key)
                g1 = jax.random.categorical(
                    k0, _transform(logits, scfg), axis=-1).astype(jnp.int32)
            else:
                g1 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out = jnp.full((b, max_new), pad_id, jnp.int32).at[:, 0].set(g1)
            lengths = jnp.ones((b,), jnp.int32)
            done = (g1 == end_id) | (max_new <= 1)
            draft_pos = seq_lens.astype(jnp.int32)  # 1st position draft lacks

            def committed_at(out, q):
                """Token at absolute position q[b] (q >= seq_lens always —
                prompt positions never re-enter the loops)."""
                col = jnp.clip(q - seq_lens, 0, max_new - 1)
                return jnp.take_along_axis(out, col[:, None], 1)[:, 0]

            def cond(st):
                it, _, _, done, *_ = st
                return (it < max_new) & ~jnp.all(done)

            def body(st):
                (it, out, lengths, done, draft_pos, caches_t, caches_d,
                 key) = st
                p_new = seq_lens + lengths       # position after committed
                key, k_draft, k_acc, k_res = jax.random.split(key, 4)

                # -- 1. draft: γ+1 sequential steps from draft_pos ---------
                def dbody(j, dst):
                    caches_d, prev, props, qprobs = dst
                    q = draft_pos + j
                    inp = jnp.where(q < p_new, committed_at(out, q), prev)
                    qc = jnp.minimum(q, max_len - 1)   # frozen rows stay put
                    lgd, caches_d = dmodel.forward_decode(
                        params_d, dcfg, inp, qc, caches_d)
                    if stochastic:
                        tl = _transform(lgd, scfg)
                        samp = jax.random.categorical(
                            jax.random.fold_in(k_draft, j), tl,
                            axis=-1).astype(jnp.int32)
                        qp = jax.nn.softmax(tl, axis=-1)       # [B, V]
                    else:
                        samp = jnp.argmax(lgd, axis=-1).astype(jnp.int32)
                        qp = None
                    # this step predicts position q+1 -> proposal slot i
                    i = q + 1 - p_new
                    ok = (i >= 0) & (i < gamma)
                    ic = jnp.clip(i, 0, gamma - 1)
                    props = props.at[bidx, ic].set(
                        jnp.where(ok, samp, props[bidx, ic]))
                    if stochastic:
                        qprobs = qprobs.at[bidx, ic].set(
                            jnp.where(ok[:, None], qp, qprobs[bidx, ic]))
                    return caches_d, samp, props, qprobs

                props0 = jnp.full((b, gamma), pad_id, jnp.int32)
                q0 = (jnp.zeros((b, gamma, v), jnp.float32) if stochastic
                      else jnp.zeros((b, 1, 1), jnp.float32))
                caches_d, _, props, qprobs = jax.lax.fori_loop(
                    0, gamma + 1, dbody,
                    (caches_d, jnp.zeros((b,), jnp.int32), props0, q0))

                # -- 2. target verify: one extend over [last, props] -------
                last = committed_at(out, p_new - 1)
                ver = jnp.concatenate([last[:, None], props], axis=1)
                start = jnp.minimum(p_new - 1, max_len - gamma - 1)
                lg, caches_t = model.forward_extend(
                    params_t, cfg, ver, start, caches_t)

                i_idx = jnp.arange(gamma + 1)[None]
                if stochastic:
                    # -- 3a. rejection sampling (Leviathan Alg. 1) ---------
                    pprobs = jax.nn.softmax(_transform(lg, scfg), -1)
                    p_x = jnp.take_along_axis(
                        pprobs[:, :gamma], props[..., None], -1)[..., 0]
                    q_x = jnp.take_along_axis(
                        qprobs, props[..., None], -1)[..., 0]
                    u = jax.random.uniform(k_acc, (b, gamma))
                    accept = u * jnp.maximum(q_x, 1e-20) < p_x  # [B, γ]
                    n = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), 1), 1)
                    # replacement at slot n: norm(max(p_n - q_n, 0)); the
                    # full-acceptance bonus is the same formula with q=0
                    p_n = jnp.take_along_axis(
                        pprobs, n[:, None, None], 1)[:, 0]        # [B, V]
                    q_ext = jnp.concatenate(
                        [qprobs, jnp.zeros((b, 1, v), jnp.float32)], 1)
                    q_n = jnp.take_along_axis(
                        q_ext, n[:, None, None], 1)[:, 0]
                    resid = jnp.maximum(p_n - q_n, 0.0)
                    # numerical guard: if p <= q everywhere (p == q), any
                    # sample from p is correct
                    resid = jnp.where(
                        resid.sum(-1, keepdims=True) > 1e-12, resid, p_n)
                    repl = jax.random.categorical(
                        k_res, jnp.where(resid > 0, jnp.log(resid), -1e30),
                        axis=-1).astype(jnp.int32)
                    slot_n = repl[:, None]
                else:
                    # -- 3b. greedy: longest argmax-matching prefix --------
                    g = jnp.argmax(lg, axis=-1).astype(jnp.int32)  # [B,γ+1]
                    match = props == g[:, :gamma]
                    n = jnp.sum(jnp.cumprod(match.astype(jnp.int32), 1), 1)
                    slot_n = jnp.take_along_axis(g, n[:, None], 1)
                props_ext = jnp.concatenate(
                    [props, jnp.zeros((b, 1), jnp.int32)], 1)
                slab = jnp.where(i_idx < n[:, None], props_ext,
                                 jnp.where(i_idx == n[:, None], slot_n,
                                           pad_id))
                room = (max_new - lengths)[:, None]
                valid = ((i_idx <= n[:, None]) & (i_idx < room)
                         & ~done[:, None])
                is_eos = (slab == end_id) & valid
                valid = valid & (jnp.cumsum(is_eos, 1) - is_eos == 0)
                k_commit = jnp.sum(valid.astype(jnp.int32), 1)

                # invalid entries get an out-of-range column and are dropped
                # — clipping them instead would duplicate the last column
                # and race the valid write there (undefined scatter order)
                col = jnp.where(valid, lengths[:, None] + i_idx, max_new)
                out = out.at[bidx[:, None], col].set(slab, mode="drop")
                new_lengths = lengths + k_commit
                new_done = (done | jnp.any(is_eos & valid, 1)
                            | (new_lengths >= max_new))
                # draft cache valid through p_new+n-1, capped by what the
                # γ+1 steps actually wrote (q_max+1 = draft_pos+γ+1)
                draft_pos = jnp.where(
                    done, draft_pos,
                    jnp.minimum(p_new + n, draft_pos + gamma + 1))
                return (it + 1, out, new_lengths, new_done, draft_pos,
                        caches_t, caches_d, key)

            st = (jnp.int32(1), out, lengths, done, draft_pos,
                  caches_t, caches_d, key)
            st = jax.lax.while_loop(cond, body, st)
            return st[1], st[2]

        return jax.jit(fn)

    # ------------------------------------------------------------------
    def generate(self, input_ids, seq_lens=None,
                 sampling: Optional[SamplingConfig] = None,
                 max_new_tokens: int = 32, seed: int = 0) -> GenerationOutput:
        """Speculative generation; same contract as
        GenerationSession.generate (list-of-lists or padded [B, S]).
        Greedy configs are bit-exact vs vanilla greedy decode; stochastic
        configs (temperature/top-k/top-p) use rejection sampling and emit
        tokens distributed exactly as vanilla sampling from the target."""
        scfg = sampling or SamplingConfig()
        if scfg.bad_words or scfg.stop_words or (
                scfg.repetition_penalty != 1.0 or scfg.presence_penalty
                or scfg.frequency_penalty):
            raise ValueError("penalties/word constraints are not supported "
                             "in the speculative path yet")
        if isinstance(input_ids, (list, tuple)):
            seq_lens = np.array([len(x) for x in input_ids], np.int32)
            s = int(seq_lens.max())
            arr = np.full((len(input_ids), s), scfg.pad_id, np.int32)
            for i, x in enumerate(input_ids):
                arr[i, :len(x)] = x
            input_ids = arr
        input_ids = np.asarray(input_ids)
        b, s = input_ids.shape
        if seq_lens is None:
            seq_lens = np.full((b,), s, np.int32)
        bucket = self.engine_cfg.bucket_for(s)
        padded = np.full((b, bucket), scfg.pad_id, np.int32)
        padded[:, :s] = input_ids

        fkey = (bucket, b, max_new_tokens, scfg)
        if fkey not in self._fn_cache:
            self._fn_cache[fkey] = self._spec_fn(bucket, max_new_tokens,
                                                 scfg)
        res = self._fn_cache[fkey](
            self.params, self.draft_params, jnp.asarray(padded),
            jnp.asarray(seq_lens, jnp.int32), jax.random.PRNGKey(seed))
        out, lengths = res[0], res[1]
        if len(res) > 2:     # diagnostic: device-loop iteration count
            self.last_iters = int(res[2])
        out, lengths = jax.device_get((out, lengths))  # one d2h trip
        return GenerationOutput(out, lengths)


class PromptLookupSession(SpeculativeSession):
    """Speculative decoding with NO draft model: proposals come from
    prompt-lookup (n-gram) matching over the request's own token history
    (Saxena 2023 'prompt lookup decoding'; Leviathan-style verification).

    Each iteration finds the most recent earlier occurrence of the last
    `ngram` committed tokens in [prompt + generated so far] and proposes
    the γ tokens that followed it; the target verifies the slab in ONE
    forward_extend, committing the longest matching prefix + one bonus
    token. When no n-gram match exists the proposal is garbage and
    verification commits exactly the bonus token — i.e. the session
    gracefully degrades to vanilla decode speed, never below it in
    tokens-per-target-read. Greedy-only (the proposal has no sampling
    distribution q); output is bit-identical to vanilla greedy decode.

    Where it wins: extractive workloads — summarize.py's CNN/DailyMail
    task (the reference's north-star benchmark, README.md:919-921) copies
    long spans from the article, so drafts hit at high rates with ZERO
    extra weight traffic (the lookup is O(B·T·n) integer compares per
    γ+1 tokens, vs a full draft-model decode chain).
    """

    def __init__(self, cfg: ModelConfig, params, engine_cfg: EngineConfig,
                 gamma: int = 4, ngram: int = 3, kv_scales=None, model=None):
        # deliberately NOT super().__init__: there is no draft model to
        # fuse/validate (the parent would fuse the target params twice)
        if not os.environ.get("TLLM_NO_COMPILE_CACHE"):
            from ..utils.compile_cache import enable_compile_cache
            enable_compile_cache()
        self.cfg = self.draft_cfg = cfg
        self.engine_cfg = engine_cfg
        self.gamma = int(gamma)
        self.ngram = int(ngram)
        from ..models import by_architecture
        self.model = (model if model is not None
                      else by_architecture(getattr(cfg, "architecture",
                                                   "llama")))
        if not hasattr(self.model, "forward_extend"):
            raise ValueError("prompt-lookup speculation needs the model "
                             "family to provide forward_extend")
        self.kv_scales = kv_scales
        self.params = params
        if not os.environ.get("TLLM_NO_FUSE_QKV"):
            fuse = getattr(self.model, "fuse_qkv_params", None)
            if fuse is not None:
                self.params = fuse(self.params)
        self.draft_params = 0          # generate() threads it; fn ignores it
        if jax.default_backend() != "cpu":
            from ..ops.registry import enable_pallas_kernels
            enable_pallas_kernels(True)
        self._fn_cache = {}

    def _spec_fn(self, bucket: int, max_new: int, scfg: SamplingConfig):
        cfg, model = self.cfg, self.model
        gamma, ngram = self.gamma, self.ngram
        kv_s = self.kv_scales
        end_id, pad_id = scfg.end_id, scfg.pad_id
        max_len = bucket + max_new + gamma + 1
        if not scfg.is_greedy:
            raise ValueError("prompt-lookup speculation is greedy-only "
                             "(an n-gram proposal has no q distribution)")
        t_hist = bucket + max_new      # history buffer width (static)

        def fn(params_t, _unused_draft, input_ids, seq_lens, key):
            b = input_ids.shape[0]
            bidx = jnp.arange(b)
            caches_t = model.init_caches(cfg, b, max_len, kv_s)
            logits, caches_t = model.forward_prefill(
                params_t, cfg, input_ids, seq_lens, caches_t)
            g1 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out = jnp.full((b, max_new), pad_id, jnp.int32).at[:, 0].set(g1)
            # hist[b]: prompt [0, seq_len) then committed output, -1 beyond
            # (-1 never equals a real token, so unwritten positions can't
            # fake an n-gram match)
            hist = jnp.full((b, t_hist), -1, jnp.int32)
            hist = jnp.where(jnp.arange(t_hist)[None] < seq_lens[:, None],
                             jnp.pad(input_ids,
                                     ((0, 0), (0, t_hist - bucket)),
                                     constant_values=pad_id), hist)
            hist = hist.at[bidx, seq_lens].set(g1)
            lengths = jnp.ones((b,), jnp.int32)
            done = (g1 == end_id) | (max_new <= 1)

            n_win = t_hist - ngram + 1
            w_pos = jnp.arange(n_win)

            def propose(hist, p_new):
                """Most-recent earlier occurrence of the last `ngram`
                committed tokens; propose the γ tokens after it."""
                gram_idx = p_new[:, None] - ngram + jnp.arange(ngram)[None]
                gram = jnp.take_along_axis(
                    hist, jnp.clip(gram_idx, 0, t_hist - 1), 1)  # [B, n]
                match = jnp.ones((b, n_win), bool)
                for j in range(ngram):
                    match &= hist[:, j:n_win + j] == gram[:, j:j + 1]
                # only windows STARTING before the current gram's own
                # occurrence (overlap with it is fine — periodic sequences);
                # this also guarantees the window is fully committed
                match &= w_pos[None] < (p_new - ngram)[:, None]
                t_star = jnp.max(jnp.where(match, w_pos[None], -1), 1)
                found = t_star >= 0
                src = (t_star + ngram)[:, None] + jnp.arange(gamma)[None]
                props = jnp.take_along_axis(
                    hist, jnp.clip(src, 0, t_hist - 1), 1)
                # no match: propose the last token repeated (verification
                # makes any proposal safe; this one is free)
                last = jnp.take_along_axis(
                    hist, jnp.clip(p_new - 1, 0, t_hist - 1)[:, None], 1)
                return jnp.where(found[:, None], props,
                                 jnp.broadcast_to(last, (b, gamma)))

            def committed_at(out, q):
                col = jnp.clip(q - seq_lens, 0, max_new - 1)
                return jnp.take_along_axis(out, col[:, None], 1)[:, 0]

            def cond(st):
                it, _, _, _, done, _ = st
                return (it < max_new) & ~jnp.all(done)

            def body(st):
                it, out, hist, lengths, done, caches_t = st
                p_new = seq_lens + lengths

                props = propose(hist, p_new)

                last = committed_at(out, p_new - 1)
                ver = jnp.concatenate([last[:, None], props], axis=1)
                start = jnp.minimum(p_new - 1, max_len - gamma - 1)
                lg, caches_t = model.forward_extend(
                    params_t, cfg, ver, start, caches_t)

                i_idx = jnp.arange(gamma + 1)[None]
                g = jnp.argmax(lg, axis=-1).astype(jnp.int32)   # [B, γ+1]
                match = props == g[:, :gamma]
                n = jnp.sum(jnp.cumprod(match.astype(jnp.int32), 1), 1)
                slot_n = jnp.take_along_axis(g, n[:, None], 1)
                props_ext = jnp.concatenate(
                    [props, jnp.zeros((b, 1), jnp.int32)], 1)
                slab = jnp.where(i_idx < n[:, None], props_ext,
                                 jnp.where(i_idx == n[:, None], slot_n,
                                           pad_id))
                room = (max_new - lengths)[:, None]
                valid = ((i_idx <= n[:, None]) & (i_idx < room)
                         & ~done[:, None])
                is_eos = (slab == end_id) & valid
                valid = valid & (jnp.cumsum(is_eos, 1) - is_eos == 0)
                k_commit = jnp.sum(valid.astype(jnp.int32), 1)

                col = jnp.where(valid, lengths[:, None] + i_idx, max_new)
                out = out.at[bidx[:, None], col].set(slab, mode="drop")
                col_h = jnp.where(valid, p_new[:, None] + i_idx, t_hist)
                hist = hist.at[bidx[:, None], col_h].set(slab, mode="drop")
                new_lengths = lengths + k_commit
                new_done = (done | jnp.any(is_eos & valid, 1)
                            | (new_lengths >= max_new))
                return (it + 1, out, hist, new_lengths, new_done, caches_t)

            st = (jnp.int32(1), out, hist, lengths, done, caches_t)
            st = jax.lax.while_loop(cond, body, st)
            # iters (st[0]) = target-weight reads: the speedup diagnostic
            return st[1], st[3], st[0]

        return jax.jit(fn)
