"""Speculative decoding: exactness vs vanilla greedy decode.

Greedy speculative decoding is provably output-identical to plain greedy
decode (the accepted prefix matches the target argmax by construction and
the bonus token IS the target argmax), so every test asserts token-for-token
equality with GenerationSession — across gammas, draft quality (random
draft ≈ always-reject; self-draft ≈ always-accept), EOS truncation, and
ragged batches. No reference analogue (the reference decodes one token per
step, runtime/generation.py:852-996).
"""

import numpy as np
import pytest
import jax

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.session import GenerationSession
from trtllm_llama_tpu.runtime.speculative import SpeculativeSession

CFG = ModelConfig.tiny(dtype="float32")
DCFG = ModelConfig.tiny(dtype="float32", num_layers=1, hidden_size=64,
                        intermediate_size=128, num_heads=2, num_kv_heads=2,
                        head_dim=32)
ECFG = EngineConfig(max_batch_size=2, max_input_len=16, max_seq_len=64)


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    dparams = llama.init_params(DCFG, jax.random.PRNGKey(1))
    base = GenerationSession(CFG, params, ECFG)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 250, (9,)).tolist(),
               rng.integers(3, 250, (5,)).tolist()]
    return params, dparams, base, prompts


@pytest.mark.parametrize("gamma", [1, 2, 4, 6])
def test_matches_greedy_random_draft(setup, gamma):
    """A random draft proposes garbage — near-zero acceptance — yet the
    output must still be exactly the target's greedy decode."""
    params, dparams, base, prompts = setup
    scfg = SamplingConfig(end_id=-1)
    ref = base.generate(prompts, sampling=scfg, max_new_tokens=24)
    spec = SpeculativeSession(CFG, params, DCFG, dparams, ECFG, gamma=gamma)
    got = spec.generate(prompts, sampling=scfg, max_new_tokens=24)
    np.testing.assert_array_equal(got.output_ids, ref.output_ids)
    np.testing.assert_array_equal(got.lengths, ref.lengths)


def test_matches_greedy_self_draft(setup):
    """Draft == target: every proposal accepted (γ+1 tokens/iteration);
    output still identical."""
    params, _, base, prompts = setup
    scfg = SamplingConfig(end_id=-1)
    ref = base.generate(prompts, sampling=scfg, max_new_tokens=24)
    spec = SpeculativeSession(CFG, params, CFG, params, ECFG, gamma=4)
    got = spec.generate(prompts, sampling=scfg, max_new_tokens=24)
    np.testing.assert_array_equal(got.output_ids, ref.output_ids)
    np.testing.assert_array_equal(got.lengths, ref.lengths)


@pytest.mark.parametrize("end_id", [7, 62])
def test_eos_truncation(setup, end_id):
    """EOS inside an accepted slab truncates at exactly the same position
    as vanilla decode (including EOS produced by the bonus token)."""
    params, dparams, base, prompts = setup
    scfg = SamplingConfig(end_id=end_id)
    ref = base.generate(prompts, sampling=scfg, max_new_tokens=24)
    spec = SpeculativeSession(CFG, params, DCFG, dparams, ECFG, gamma=3)
    got = spec.generate(prompts, sampling=scfg, max_new_tokens=24)
    np.testing.assert_array_equal(got.output_ids, ref.output_ids)
    np.testing.assert_array_equal(got.lengths, ref.lengths)


def test_penalties_rejected(setup):
    params, dparams, _, prompts = setup
    spec = SpeculativeSession(CFG, params, DCFG, dparams, ECFG)
    with pytest.raises(ValueError, match="not supported"):
        spec.generate(prompts,
                      sampling=SamplingConfig(repetition_penalty=1.3),
                      max_new_tokens=4)


def _tv(h1, h2):
    """Total-variation distance between two empirical histograms."""
    p = h1 / h1.sum()
    q = h2 / h2.sum()
    return 0.5 * np.abs(p - q).sum()


def _tv_noise(h1, h2):
    """Expected TV between two SIZE-B empirical draws of the same
    distribution: E[TV] ~ 0.5*sqrt(4/(pi*B)) * sum_i sqrt(p_i)
    <= 0.5*sqrt(4S/(pi*B)) for support size S. Returns a 2.5x bound."""
    b = h1.sum()
    p = (h1 + h2) / (h1.sum() + h2.sum())
    return 2.5 * 0.5 * np.sqrt(4 / (np.pi * b)) * np.sqrt(p).sum()


def test_stochastic_matches_target_distribution(setup):
    """Rejection-sampling speculative decoding must emit tokens distributed
    exactly as vanilla sampling from the target (Leviathan Thm. 1). Checked
    empirically: B iid rows of the same prompt, compare per-step marginal
    histograms vs GenerationSession sampling. The draft is a mismatched
    random model, so rejections + residual resampling genuinely occur."""
    params, dparams, base, _ = setup
    scfg = SamplingConfig(end_id=-1, top_k=8, temperature=0.8)
    B = 4096
    prompt = np.tile(np.array([[7, 23, 101, 55, 200]], np.int32), (B, 1))

    spec = SpeculativeSession(CFG, params, DCFG, dparams, ECFG, gamma=3)
    got = spec.generate(prompt, sampling=scfg, max_new_tokens=3, seed=5)
    ref = base.generate(prompt, sampling=scfg, max_new_tokens=3, seed=11)

    for step in range(3):
        h_got = np.bincount(got.output_ids[:, step], minlength=256)
        h_ref = np.bincount(ref.output_ids[:, step], minlength=256)
        thr = max(0.05, _tv_noise(h_got, h_ref))
        assert _tv(h_got, h_ref) < thr, (step, _tv(h_got, h_ref), thr)


def test_stochastic_self_draft_all_accept(setup):
    """draft == target: acceptance probability is exactly 1 (p == q), so
    every iteration commits γ+1 tokens; outputs stay correctly distributed
    and lengths fill the budget."""
    params, _, base, _ = setup
    scfg = SamplingConfig(end_id=-1, top_k=8, temperature=0.9)
    B = 2048
    prompt = np.tile(np.array([[9, 41, 3, 77]], np.int32), (B, 1))
    spec = SpeculativeSession(CFG, params, CFG, params, ECFG, gamma=4)
    got = spec.generate(prompt, sampling=scfg, max_new_tokens=4, seed=3)
    ref = base.generate(prompt, sampling=scfg, max_new_tokens=4, seed=7)
    assert (got.lengths == 4).all()
    for step in range(4):
        h_got = np.bincount(got.output_ids[:, step], minlength=256)
        h_ref = np.bincount(ref.output_ids[:, step], minlength=256)
        thr = max(0.05, _tv_noise(h_got, h_ref))
        assert _tv(h_got, h_ref) < thr, (step, _tv(h_got, h_ref), thr)


def test_vocab_mismatch_rejected(setup):
    params, dparams, _, _ = setup
    bad = ModelConfig.tiny(vocab_size=128)
    with pytest.raises(ValueError, match="vocabulary"):
        SpeculativeSession(CFG, params, bad, dparams, ECFG)


def test_forward_extend_matches_sequential_decode():
    """forward_extend over T tokens == T sequential forward_decode calls
    (logits and cache contents)."""
    import jax.numpy as jnp
    params = llama.init_params(CFG, jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    B, L, T = 2, 7, 4
    ids = jnp.asarray(rng.integers(3, 250, (B, L)))
    lens = jnp.asarray([7, 5], jnp.int32)
    toks = jnp.asarray(rng.integers(3, 250, (B, T)))

    c1 = llama.init_caches(CFG, B, 64)
    _, c1 = llama.forward_prefill(params, CFG, ids, lens, c1)
    seq_logits, pos = [], lens
    for i in range(T):
        lg, c1 = llama.forward_decode(params, CFG, toks[:, i], pos, c1)
        seq_logits.append(lg)
        pos = pos + 1
    seq_logits = jnp.stack(seq_logits, 1)

    c2 = llama.init_caches(CFG, B, 64)
    _, c2 = llama.forward_prefill(params, CFG, ids, lens, c2)
    ext_logits, c2 = llama.forward_extend(params, CFG, toks, lens, c2)

    np.testing.assert_allclose(np.asarray(ext_logits),
                               np.asarray(seq_logits), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c1.k), np.asarray(c2.k), atol=1e-5)


@pytest.mark.parametrize("with_kv", [False, True])
def test_quantized_target(setup, with_kv):
    """Quantized targets (int8-wo, +int8-KV) fall out of the weight
    containers — the verify extend path quantizes K/V like decode does."""
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import quantize_params
    _, dparams, _, prompts = setup
    qm = QuantMode.use_weight_only(False)
    if with_kv:
        qm = qm | QuantMode.INT8_KV_CACHE
    cfg = ModelConfig.tiny(dtype="float32", quant_mode=qm)
    params = quantize_params(
        llama.init_params(ModelConfig.tiny(dtype="float32"),
                          jax.random.PRNGKey(0)), qm)
    kvs = (np.full((cfg.num_layers,), 0.05, np.float32) if with_kv else None)
    scfg = SamplingConfig(end_id=-1)
    ref = GenerationSession(cfg, params, ECFG, kv_scales=kvs).generate(
        prompts, sampling=scfg, max_new_tokens=16)
    got = SpeculativeSession(cfg, params, DCFG, dparams, ECFG, gamma=3,
                             kv_scales=kvs).generate(
        prompts, sampling=scfg, max_new_tokens=16)
    np.testing.assert_array_equal(got.output_ids, ref.output_ids)
    np.testing.assert_array_equal(got.lengths, ref.lengths)


# ---------------------------------------------------------------------------
# Prompt-lookup (n-gram) speculation: no draft model at all
# ---------------------------------------------------------------------------

def test_prompt_lookup_matches_greedy(setup):
    """Whatever the lookup proposes (hit or garbage), the output must be
    exactly the target's greedy decode."""
    from trtllm_llama_tpu.runtime.speculative import PromptLookupSession
    params, _, base, prompts = setup
    scfg = SamplingConfig(end_id=-1)
    ref = base.generate(prompts, sampling=scfg, max_new_tokens=24)
    for gamma, ngram in ((4, 3), (2, 2), (6, 1)):
        spec = PromptLookupSession(CFG, params, ECFG, gamma=gamma,
                                   ngram=ngram)
        got = spec.generate(prompts, sampling=scfg, max_new_tokens=24)
        np.testing.assert_array_equal(got.output_ids, ref.output_ids)
        np.testing.assert_array_equal(got.lengths, ref.lengths)
        assert spec.last_iters <= 24


def test_prompt_lookup_accelerates_periodic_output(setup):
    """When greedy decode settles into a cycle (tiny random models do),
    the n-gram lookup must hit and commit multiple tokens per target read:
    device-loop iterations < tokens generated."""
    from trtllm_llama_tpu.runtime.speculative import PromptLookupSession
    params, _, base, prompts = setup
    scfg = SamplingConfig(end_id=-1)
    n_new = 24
    # seed 5 drives THIS tiny model's greedy decode into a cycle (probed);
    # assert that, so a model change that breaks the premise is loud
    prompt = np.random.default_rng(5).integers(3, 250, (9,)).tolist()
    ref = base.generate([prompt], sampling=scfg, max_new_tokens=n_new)
    out = ref.output_ids[0].tolist()
    period = next((p for p in range(1, 9)
                   if out[-2 * p:-p] == out[-p:]), None)
    assert period is not None, "premise broken: greedy output not periodic"
    spec = PromptLookupSession(CFG, params, ECFG, gamma=4, ngram=2)
    got = spec.generate([prompt], sampling=scfg, max_new_tokens=n_new)
    np.testing.assert_array_equal(got.output_ids, ref.output_ids)
    assert spec.last_iters < n_new, (
        f"lookup never accepted: {spec.last_iters} iters for {n_new} tokens")


def test_prompt_lookup_eos_and_ragged(setup):
    from trtllm_llama_tpu.runtime.speculative import PromptLookupSession
    params, _, base, prompts = setup
    scfg = SamplingConfig(end_id=7)
    ref = base.generate(prompts, sampling=scfg, max_new_tokens=20)
    spec = PromptLookupSession(CFG, params, ECFG, gamma=3, ngram=3)
    got = spec.generate(prompts, sampling=scfg, max_new_tokens=20)
    np.testing.assert_array_equal(got.output_ids, ref.output_ids)
    np.testing.assert_array_equal(got.lengths, ref.lengths)


def test_prompt_lookup_rejects_stochastic(setup):
    from trtllm_llama_tpu.runtime.speculative import PromptLookupSession
    params, _, _, prompts = setup
    spec = PromptLookupSession(CFG, params, ECFG)
    with pytest.raises(ValueError, match="greedy-only"):
        spec.generate(prompts, sampling=SamplingConfig(end_id=-1,
                                                       temperature=0.8,
                                                       top_k=4),
                      max_new_tokens=8)
