"""Sampling: penalties, top-k/top-p, temperature, greedy, stop criteria.

TPU-native replacement for the reference's decode post-processing stack —
DynamicDecodeLayer + sampling kernels (layers/dynamicDecodeLayer.cpp:154,
kernels/samplingTopKKernels.cu, samplingTopPKernels.cu,
samplingPenaltyKernels.cu, stopCriteriaKernels.cu). Instead of a chain of
CUDA kernels orchestrated per step from the host, the whole thing is one
jit-able `sample_step` folded into the decode step function, so sampling
never leaves the device.

Order of operations matches the reference DynamicDecodeLayer::forward:
repetition/presence penalties -> temperature -> top-k -> top-p -> sample.
Beam search is a separate module (runtime/beam.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Mirror of the reference SamplingConfig (runtime/generation.py)."""

    temperature: float = 1.0
    top_k: int = 0                   # 0 => disabled (greedy if top_p also 0)
    top_p: float = 0.0               # 0 => disabled
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    min_length: int = 0
    end_id: int = 2                  # LLaMA </s>
    pad_id: int = 0
    beam_width: int = 1              # >1 => beam search (runtime/beam.py)
    length_penalty: float = 0.0      # beam-search length normalization alpha
    # static token-sequence lists, e.g. ((12,), (7, 9)) — compiled into the
    # decode step (reference banBadWords.cu / stopCriteriaKernels.cu scope)
    bad_words: tuple = ()
    stop_words: tuple = ()

    @property
    def tail_len(self) -> int:
        """History window needed for bad/stop word matching."""
        lens = [len(w) for w in self.bad_words + self.stop_words]
        return max(lens, default=0)

    @property
    def is_greedy(self) -> bool:
        return (self.top_k in (0, 1)) and self.top_p == 0.0


def apply_repetition_penalty(logits, token_counts, repetition_penalty,
                             presence_penalty=0.0, frequency_penalty=0.0):
    """CTRL-style repetition penalty + presence/frequency penalties.

    logits: [B, V] f32; token_counts: [B, V] int32 occurrence counts of each
    vocab token in the sequence so far (cheap to maintain on-device: one
    scatter-add per step). Semantics follow samplingPenaltyKernels.cu:
    seen tokens' logits are divided (if >0) / multiplied (if <0) by the
    repetition penalty; presence subtracts a constant for seen tokens;
    frequency subtracts count-proportional.
    """
    seen = token_counts > 0
    if repetition_penalty != 1.0:
        penalized = jnp.where(logits > 0, logits / repetition_penalty,
                              logits * repetition_penalty)
        logits = jnp.where(seen, penalized, logits)
    if presence_penalty != 0.0:
        logits = logits - presence_penalty * seen.astype(logits.dtype)
    if frequency_penalty != 0.0:
        logits = logits - frequency_penalty * token_counts.astype(logits.dtype)
    return logits


def apply_min_length(logits, cur_lens, min_length: int, end_id: int):
    """Ban end_id until min_length tokens were generated (banBadWords-style
    masking; reference invokeMinLengthPenalty)."""
    ban = cur_lens < min_length
    penalty = jnp.where(ban, -1e9, 0.0).astype(logits.dtype)
    return logits.at[:, end_id].add(penalty)


def apply_top_k(logits, k: int):
    """Mask everything below the k-th largest logit (samplingTopKKernels.cu)."""
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -1e9, logits)


def apply_top_p(logits, p: float):
    """Nucleus filtering: keep the smallest prefix of the sorted distribution
    with cumulative probability >= p (samplingTopPKernels.cu semantics)."""
    if p <= 0.0 or p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob of *previous* tokens < p
    keep_sorted = (cum - probs) < p
    # threshold logit = smallest kept logit
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                     axis=-1, keepdims=True)
    return jnp.where(logits < thresh, -1e9, logits)


def sample_step(logits, cfg: SamplingConfig, key=None, token_counts=None,
                cur_lens=None):
    """One sampling step. logits [B, V] f32 -> tokens [B] int32.

    All branches resolve at trace time (cfg is static), so the jitted decode
    step contains only the ops the config needs.
    """
    logits = logits.astype(jnp.float32)
    if token_counts is not None and (cfg.repetition_penalty != 1.0
                                     or cfg.presence_penalty != 0.0
                                     or cfg.frequency_penalty != 0.0):
        logits = apply_repetition_penalty(
            logits, token_counts, cfg.repetition_penalty,
            cfg.presence_penalty, cfg.frequency_penalty)
    if cfg.min_length > 0 and cur_lens is not None:
        logits = apply_min_length(logits, cur_lens, cfg.min_length, cfg.end_id)
    if cfg.is_greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if cfg.temperature != 1.0:
        logits = logits / cfg.temperature
    if cfg.top_k >= 1:
        # k == 1 matters too: with top_p set, is_greedy is False but the
        # caller still asked for the single best token
        logits = apply_top_k(logits, cfg.top_k)
    if cfg.top_p > 0.0:
        logits = apply_top_p(logits, cfg.top_p)
    assert key is not None, "stochastic sampling needs a PRNG key"
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


class SlotSamplingParams(NamedTuple):
    """Per-slot sampling parameters for in-flight batching.

    The reference's GptManager takes a SamplingConfig per InferenceRequest
    (batch_manager/GptManager.h:48-89) and DynamicDecodeLayer reads
    per-sequence runtime tensors. Here the whole pipeline is vectorized over
    the slot axis so ONE compiled decode step serves any mix of greedy /
    top-k / top-p / penalized requests — no per-config recompilation.
    All arrays are [max_slots]."""

    temperature: jnp.ndarray     # f32 (<= 0 treated as 1.0)
    top_k: jnp.ndarray           # i32 (0 => disabled)
    top_p: jnp.ndarray           # f32 (0 or >= 1 => disabled)
    rep_pen: jnp.ndarray         # f32 (1.0 => disabled)
    pres_pen: jnp.ndarray        # f32
    freq_pen: jnp.ndarray        # f32
    min_len: jnp.ndarray         # i32
    greedy: jnp.ndarray          # bool
    # per-slot bad-word token sequences (reference InferenceRequest
    # bad_words_list, banBadWords.cu): [S, W, L] i32 padded with -1, and
    # [S, W] i32 word lengths (0 = unused row). None = feature disabled at
    # engine build (zero overhead; the compiled step never sees them).
    bad_words: Optional[jnp.ndarray] = None
    bad_lens: Optional[jnp.ndarray] = None

    @classmethod
    def neutral(cls, n: int, max_bad_words: int = 0,
                max_bad_word_len: int = 0) -> "SlotSamplingParams":
        bw = bl = None
        if max_bad_words > 0:
            bw = jnp.full((n, max_bad_words, max(max_bad_word_len, 1)),
                          -1, jnp.int32)
            bl = jnp.zeros((n, max_bad_words), jnp.int32)
        return cls(jnp.ones((n,), jnp.float32), jnp.zeros((n,), jnp.int32),
                   jnp.zeros((n,), jnp.float32), jnp.ones((n,), jnp.float32),
                   jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32),
                   jnp.zeros((n,), jnp.int32), jnp.ones((n,), bool),
                   bw, bl)

    def set_slot(self, slot: int, cfg: SamplingConfig) -> "SlotSamplingParams":
        """Host-side: write one request's config into its slot row."""
        out = self._replace(
            temperature=self.temperature.at[slot].set(cfg.temperature),
            top_k=self.top_k.at[slot].set(cfg.top_k),
            top_p=self.top_p.at[slot].set(cfg.top_p),
            rep_pen=self.rep_pen.at[slot].set(cfg.repetition_penalty),
            pres_pen=self.pres_pen.at[slot].set(cfg.presence_penalty),
            freq_pen=self.freq_pen.at[slot].set(cfg.frequency_penalty),
            min_len=self.min_len.at[slot].set(cfg.min_length),
            greedy=self.greedy.at[slot].set(cfg.is_greedy))
        if self.bad_words is not None:
            w_cap, l_cap = self.bad_words.shape[1], self.bad_words.shape[2]
            if len(cfg.bad_words) > w_cap or any(
                    len(w) > l_cap or not w for w in cfg.bad_words):
                raise ValueError(
                    f"bad_words exceed engine capacity (max {w_cap} words "
                    f"of length <= {l_cap}; empty words not allowed)")
            import numpy as _np
            words = _np.full((w_cap, l_cap), -1, _np.int32)
            lens = _np.zeros((w_cap,), _np.int32)
            for i, w in enumerate(cfg.bad_words):
                words[i, :len(w)] = w
                lens[i] = len(w)
            out = out._replace(
                bad_words=out.bad_words.at[slot].set(jnp.asarray(words)),
                bad_lens=out.bad_lens.at[slot].set(jnp.asarray(lens)))
        elif cfg.bad_words:
            raise ValueError(
                "per-request bad_words need the engine built with "
                "max_bad_words > 0")
        return out


def ban_bad_words_slots(logits, p: SlotSamplingParams, tail):
    """Per-slot multi-token bad-word ban (reference invokeBanBadWords,
    banBadWords.cu, driven by GptManager's per-InferenceRequest
    bad_words_list): for each slot's word w of length l, if the slot's last
    l-1 GENERATED tokens equal w[:-1], the completing token w[-1] is banned
    this step. All shapes are static: words [S, W, L] (-1 padded), lens
    [S, W] (0 = unused), tail [S, >=L-1] (the engine fills pre-generation
    positions with -2, which never equals a real token — so a word longer
    than the generated history simply cannot match).

    tail=None means 'sampling the first generated token': only single-token
    words can match (matching here is over generated ids only, as in the
    reference, which bans based on output ids)."""
    if p.bad_words is None:
        return logits
    s = logits.shape[0]
    words, wlens = p.bad_words, p.bad_lens            # [S,W,L], [S,W]
    w_cap, l_cap = words.shape[1], words.shape[2]
    last = jnp.take_along_axis(
        words, jnp.maximum(wlens - 1, 0)[:, :, None], axis=2)[:, :, 0]
    if tail is None:
        matched = wlens == 1
    else:
        t = tail.shape[1]
        j = jnp.arange(max(l_cap - 1, 1))
        # prefix element j of a length-l word aligns with tail[t-(l-1)+j]
        idx = jnp.clip(t - (wlens[:, :, None] - 1) + j, 0, t - 1)
        tl = jnp.take_along_axis(
            jnp.broadcast_to(tail[:, None, :], (s, w_cap, t)), idx, axis=2)
        pref = words[:, :, :max(l_cap - 1, 1)]
        is_pref = j[None, None, :] < (wlens[:, :, None] - 1)
        matched = (wlens >= 1) & jnp.all(
            jnp.where(is_pref, tl == pref, True), axis=2)
    bad = jnp.where(matched, last, 0)                 # clamp pads to 0
    return logits.at[jnp.arange(s)[:, None], bad].add(
        jnp.where(matched, NEG_INF, 0.0))


def sample_step_slots(logits, p: SlotSamplingParams, key, token_counts,
                      gen_lens, end_id: int, tail=None):
    """Vectorized per-slot sampling. logits [S, V] -> tokens [S] int32.

    Every feature is applied unconditionally with per-slot parameters whose
    neutral values are no-ops (the branches of sample_step become selects),
    so the compiled step is config-independent. One shared descending sort
    feeds both the top-k threshold and the top-p cumulative mass
    (reference TopKTopPSamplingLayer ordering: penalties -> temperature ->
    top-k -> top-p -> sample)."""
    s, v = logits.shape
    logits = logits.astype(jnp.float32)

    # penalties (samplingPenaltyKernels.cu semantics)
    seen = token_counts > 0
    r = p.rep_pen[:, None]
    penalized = jnp.where(logits > 0, logits / r, logits * r)
    logits = jnp.where(seen & (r != 1.0), penalized, logits)
    logits = logits - p.pres_pen[:, None] * seen.astype(jnp.float32)
    logits = logits - p.freq_pen[:, None] * token_counts.astype(jnp.float32)
    # min-length: ban end_id until min_len generated
    ban = gen_lens < p.min_len
    logits = logits.at[:, end_id].add(jnp.where(ban, NEG_INF, 0.0))
    # per-slot bad-word ban (no-op when the engine was built without it)
    logits = ban_bad_words_slots(logits, p, tail)

    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = transform_slots(logits, p)
    sampled = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    return jnp.where(p.greedy, greedy_tok, sampled)


def transform_slots(logits, p: SlotSamplingParams):
    """Per-slot temperature/top-k/top-p logits shaping ([S, V] -> [S, V]).

    This defines each slot's ACTUAL sampling distribution, so speculative
    rejection sampling (runtime/serving_spec.py) must use exactly this
    transform for both p and q — the same rule the offline path states at
    speculative.py::_transform. One shared descending sort feeds both the
    top-k threshold and the top-p cumulative mass. Greedy slots pass
    through shaped too; callers select argmax for them."""
    v = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    t = jnp.where(p.temperature > 0, p.temperature, 1.0)[:, None]
    logits = logits / t
    # one sort serves top-k and top-p
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    k = jnp.clip(p.top_k, 0, v)
    kth = jnp.take_along_axis(
        sorted_desc, jnp.maximum(k - 1, 0)[:, None], axis=-1)
    kth = jnp.where((k > 0)[:, None], kth, NEG_INF)
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    p_eff = jnp.where((p.top_p > 0) & (p.top_p < 1), p.top_p, 1.0)[:, None]
    keep_sorted = (cum - probs) < p_eff
    p_thresh = jnp.min(jnp.where(keep_sorted, sorted_desc, jnp.inf),
                       axis=-1, keepdims=True)
    return jnp.where(logits < jnp.maximum(kth, p_thresh), NEG_INF, logits)


def update_tail(tail, tokens):
    """Roll the last-tokens window: tail [B, T] <- append tokens [B]."""
    return jnp.concatenate([tail[:, 1:], tokens[:, None]], axis=1)


def _tail_matches(tail, seq):
    """[B] bool: does the history window end with `seq` (a static tuple)?"""
    t = len(seq)
    if t == 0:
        return jnp.ones((tail.shape[0],), bool)
    if t > tail.shape[1]:
        return jnp.zeros((tail.shape[0],), bool)
    ref = jnp.asarray(seq, jnp.int32)
    return jnp.all(tail[:, tail.shape[1] - t:] == ref[None, :], axis=1)


def apply_bad_words(logits, tail, bad_words):
    """Ban the completing token of any bad word whose prefix matches the
    generated tail (reference invokeBanBadWords semantics). `bad_words` is a
    static tuple of token tuples; single-token words are always banned."""
    for word in bad_words:
        prefix, last = tuple(word[:-1]), int(word[-1])
        hit = _tail_matches(tail, prefix)
        logits = logits.at[:, last].add(
            jnp.where(hit, -1e9, 0.0).astype(logits.dtype))
    return logits


def stop_words_matched(tail, stop_words):
    """[B] bool: any stop sequence fully matched at the end of the tail
    (reference invokeStopWordsCriterion)."""
    if not stop_words:
        return jnp.zeros((tail.shape[0],), bool)
    hits = [_tail_matches(tail, tuple(w)) for w in stop_words]
    out = hits[0]
    for h in hits[1:]:
        out = out | h
    return out


def update_token_counts(token_counts, tokens):
    """Scatter-add new tokens into per-sequence occurrence counts."""
    b = tokens.shape[0]
    return token_counts.at[jnp.arange(b), tokens].add(1)


def init_token_counts(input_ids, seq_lens, vocab_size: int):
    """Count prompt tokens (padding excluded) for repetition penalties.

    Scatter-add, not one-hot: a [B, S, V] one-hot is O(B*S*V) HBM (2+ GB at
    B=8/S=2048/V=32k) where the scatter is O(B*V)."""
    b, s = input_ids.shape
    valid = (jnp.arange(s)[None, :] < seq_lens[:, None]).astype(jnp.int32)
    counts = jnp.zeros((b, vocab_size), jnp.int32)
    return counts.at[jnp.arange(b)[:, None], input_ids].add(valid)
