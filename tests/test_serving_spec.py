"""Speculative decoding under continuous batching (SpeculativeServingEngine).

Exactness bar: greedy speculative serving must emit exactly the plain
serving engine's tokens for every request (which are themselves exactly the
offline session's tokens) — for drafts that almost never match (random) and
drafts that always match (self-draft)."""

import numpy as np
import pytest
import jax

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.serving import ServingEngine
from trtllm_llama_tpu.runtime.serving_spec import SpeculativeServingEngine

CFG = ModelConfig.tiny(dtype="float32")
DCFG = ModelConfig.tiny(dtype="float32", num_layers=1, hidden_size=64,
                        intermediate_size=128, num_heads=2, num_kv_heads=2,
                        head_dim=32)
ECFG = EngineConfig(max_batch_size=3, max_input_len=16, max_seq_len=48)
SCFG = SamplingConfig(end_id=-1)


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(CFG, jax.random.PRNGKey(5))
    dparams = llama.init_params(DCFG, jax.random.PRNGKey(1))
    return params, dparams


def _ref_outputs(params, prompts, new_tokens, scfg=SCFG):
    eng = ServingEngine(CFG, params, ECFG, sampling=scfg, decode_chunk=3)
    rids = [eng.submit(p, n) for p, n in zip(prompts, new_tokens)]
    done = eng.run_to_completion()
    return [done[r] for r in rids]


@pytest.mark.parametrize("gamma", [1, 3])
def test_spec_serving_matches_plain_random_draft(setup, gamma):
    params, dparams = setup
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 250, (n,)).tolist() for n in (5, 9, 3, 7, 11)]
    new_tokens = [6, 4, 8, 5, 7]
    ref = _ref_outputs(params, prompts, new_tokens)
    eng = SpeculativeServingEngine(CFG, params, DCFG, dparams, ECFG,
                                   gamma=gamma, sampling=SCFG,
                                   decode_chunk=4)
    rids = [eng.submit(p, n) for p, n in zip(prompts, new_tokens)]
    done = eng.run_to_completion()
    for rid, want in zip(rids, ref):
        assert done[rid].output_ids == want.output_ids, (
            rid, done[rid].output_ids, want.output_ids)
        assert done[rid].finished_reason == want.finished_reason


def test_spec_serving_self_draft_and_streaming_arrivals(setup):
    """Self-draft (100% acceptance) + a request arriving mid-flight."""
    params, _ = setup
    rng = np.random.default_rng(2)
    p1 = rng.integers(3, 250, (6,)).tolist()
    p2 = rng.integers(3, 250, (9,)).tolist()
    ref = _ref_outputs(params, [p1, p2], [8, 6])
    eng = SpeculativeServingEngine(CFG, params, CFG, params, ECFG,
                                   gamma=4, sampling=SCFG, decode_chunk=5)
    r1 = eng.submit(p1, 8)
    done = {fr.request_id: fr for fr in eng.step()}
    r2 = eng.submit(p2, 6)                 # joins mid-flight
    done.update(eng.run_to_completion())
    assert done[r1].output_ids == ref[0].output_ids
    assert done[r2].output_ids == ref[1].output_ids


def test_spec_serving_eos_and_logprobs(setup):
    params, dparams = setup
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 250, (6,)).tolist()
    free = _ref_outputs(params, [prompt], [6])[0]
    eos = free.output_ids[2]
    scfg = SamplingConfig(end_id=eos)
    want = _ref_outputs(params, [prompt], [6], scfg)[0]
    eng = SpeculativeServingEngine(CFG, params, DCFG, dparams, ECFG,
                                   gamma=3, sampling=scfg, decode_chunk=4,
                                   return_logprobs=True)
    rid = eng.submit(prompt, 6)
    done = eng.run_to_completion()
    assert done[rid].finished_reason == "eos"
    assert done[rid].output_ids == want.output_ids
    # logprobs align with the offline session's
    from trtllm_llama_tpu.runtime.session import GenerationSession
    ref = GenerationSession(CFG, params, ECFG).generate(
        [prompt], sampling=scfg, max_new_tokens=6, return_logprobs=True)
    n = len(done[rid].output_ids)
    np.testing.assert_allclose(done[rid].logprobs, ref.logprobs[0][:n],
                               atol=1e-4)


def test_spec_serving_validation(setup):
    params, dparams = setup
    with pytest.raises(ValueError, match="per_request_sampling"):
        SpeculativeServingEngine(CFG, params, DCFG, dparams, ECFG,
                                 sampling=SamplingConfig(top_k=4))
    with pytest.raises(ValueError, match="vocabulary"):
        SpeculativeServingEngine(
            CFG, params, ModelConfig.tiny(vocab_size=128), dparams, ECFG)


def test_spec_serving_quantized_target(setup):
    """int8-wo + int8-KV target under speculative serving — quantization
    rides the weight containers; outputs still match plain serving."""
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import quantize_params
    _, dparams = setup
    qm = QuantMode.use_weight_only(False) | QuantMode.INT8_KV_CACHE
    cfg = ModelConfig.tiny(dtype="float32", quant_mode=qm)
    params = quantize_params(
        llama.init_params(ModelConfig.tiny(dtype="float32"),
                          jax.random.PRNGKey(5)), qm)
    kvs = np.full((cfg.num_layers,), 0.05, np.float32)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(3, 250, (n,)).tolist() for n in (5, 8)]

    plain = ServingEngine(cfg, params, ECFG, sampling=SCFG, decode_chunk=3,
                          kv_scales=kvs)
    p_ids = [plain.submit(p, 6) for p in prompts]
    p_done = plain.run_to_completion()

    spec = SpeculativeServingEngine(cfg, params, DCFG, dparams, ECFG,
                                    gamma=3, sampling=SCFG, decode_chunk=4,
                                    kv_scales=kvs)
    s_ids = [spec.submit(p, 6) for p in prompts]
    s_done = spec.run_to_completion()
    for pi, si in zip(p_ids, s_ids):
        assert s_done[si].output_ids == p_done[pi].output_ids


# ---------------------------------------------------------------------------
# Stochastic speculative serving (per_request_sampling=True)

def _tv(h1, h2):
    """Total-variation distance between two empirical histograms."""
    p = h1 / h1.sum()
    q = h2 / h2.sum()
    return 0.5 * np.abs(p - q).sum()


def _tv_noise(h1, h2):
    """Expected TV between two size-B empirical draws of one distribution
    (2.5x bound, same derivation as tests/test_speculative.py)."""
    b = h1.sum()
    p = (h1 + h2) / (h1.sum() + h2.sum())
    return 2.5 * 0.5 * np.sqrt(4 / (np.pi * b)) * np.sqrt(p).sum()


def test_spec_serving_stochastic_matches_plain_distribution(setup):
    """Rejection sampling under continuous batching must emit tokens
    distributed exactly as the plain engine's per-slot sampler (Leviathan
    Thm. 1). B iid same-prompt requests through a wide slot pool; per-step
    marginal histograms vs the plain ServingEngine. Random mismatched
    draft, so rejections + residual resampling genuinely occur."""
    params, dparams = setup
    B = 768
    ecfg = EngineConfig(max_batch_size=B, max_input_len=16, max_seq_len=24)
    prompt = [7, 23, 101, 55, 200]
    scfg = SamplingConfig(end_id=-1, top_k=8, temperature=0.8)

    plain = ServingEngine(CFG, params, ecfg, sampling=SCFG, decode_chunk=3,
                          per_request_sampling=True)
    for _ in range(B):
        plain.submit(prompt, 3, sampling=scfg)
    ref_done = plain.run_to_completion()

    eng = SpeculativeServingEngine(CFG, params, DCFG, dparams, ecfg,
                                   gamma=3, sampling=SCFG, decode_chunk=4,
                                   per_request_sampling=True)
    rids = [eng.submit(prompt, 3, sampling=scfg) for _ in range(B)]
    done = eng.run_to_completion()

    got = np.array([done[r].output_ids for r in rids])
    ref = np.array([fr.output_ids for fr in ref_done.values()])
    assert got.shape == ref.shape == (B, 3)
    for step in range(3):
        h_got = np.bincount(got[:, step], minlength=256)
        h_ref = np.bincount(ref[:, step], minlength=256)
        thr = max(0.05, _tv_noise(h_got, h_ref))
        assert _tv(h_got, h_ref) < thr, (step, _tv(h_got, h_ref), thr)


def test_spec_serving_mixed_greedy_stochastic_exactness(setup):
    """A greedy request in a pool that also holds stochastic requests must
    still be BIT-identical to the plain greedy engine — greedy slots keep
    the argmax-prefix acceptance regardless of their neighbors."""
    params, dparams = setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(3, 250, (n,)).tolist() for n in (5, 9, 7)]
    new_tokens = [6, 5, 7]
    ref = _ref_outputs(params, prompts, new_tokens)

    eng = SpeculativeServingEngine(CFG, params, DCFG, dparams, ECFG,
                                   gamma=2, sampling=SCFG, decode_chunk=4,
                                   per_request_sampling=True)
    stoch = SamplingConfig(end_id=-1, top_k=4, temperature=1.2)
    r0 = eng.submit(prompts[0], new_tokens[0])             # greedy default
    r1 = eng.submit(prompts[1], new_tokens[1], sampling=stoch)
    r2 = eng.submit(prompts[2], new_tokens[2])             # greedy default
    done = eng.run_to_completion()
    assert done[r0].output_ids == ref[0].output_ids
    assert done[r2].output_ids == ref[2].output_ids
    assert len(done[r1].output_ids) == new_tokens[1]


def test_spec_serving_stochastic_needs_per_request(setup):
    params, dparams = setup
    with pytest.raises(ValueError, match="per_request_sampling"):
        SpeculativeServingEngine(
            CFG, params, DCFG, dparams, ECFG,
            sampling=SamplingConfig(end_id=-1, top_k=4))


def test_spec_serving_rejects_unsupported_features(setup):
    params, dparams = setup
    eng = SpeculativeServingEngine(CFG, params, DCFG, dparams, ECFG,
                                   sampling=SCFG,
                                   per_request_sampling=True)
    bad = SamplingConfig(end_id=-1, repetition_penalty=1.3)
    with pytest.raises(ValueError, match="penalties"):
        eng.submit([5, 6, 7], 4, sampling=bad)


# ---------------------------------------------------------------------------
# PromptLookupServingEngine (draft-free)
# ---------------------------------------------------------------------------

def test_prompt_lookup_serving_matches_plain(setup):
    """Greedy exactness: prompt-lookup serving emits exactly the plain
    engine's token streams (mixed lengths + mid-flight arrival)."""
    from trtllm_llama_tpu.runtime.serving_spec import (
        PromptLookupServingEngine,
    )
    params, _ = setup
    rng = np.random.default_rng(7)
    prompts = [rng.integers(3, 250, (n,)).tolist() for n in (5, 9, 3, 7)]
    new_tokens = [6, 4, 8, 7]
    ref = _ref_outputs(params, prompts, new_tokens)
    eng = PromptLookupServingEngine(CFG, params, ECFG, gamma=3, ngram=2,
                                    sampling=SCFG, decode_chunk=4)
    rids = [eng.submit(p, n) for p, n in zip(prompts[:2], new_tokens[:2])]
    done = {fr.request_id: fr for fr in eng.step()}
    rids += [eng.submit(p, n) for p, n in zip(prompts[2:], new_tokens[2:])]
    done.update(eng.run_to_completion())
    for rid, want in zip(rids, ref):
        assert done[rid].output_ids == want.output_ids, (
            rid, done[rid].output_ids, want.output_ids)
        assert done[rid].finished_reason == want.finished_reason


def test_prompt_lookup_serving_accepts_on_repetition(setup):
    """Provable acceptance: on a copy-capable model (make_copy_params — the
    greedy continuation IS the periodic cycle), the engine must (a) stay
    exactly equal to the plain engine's stream and (b) commit strictly more
    tokens than it ran verify iterations — i.e. at least one multi-token
    (n > 0) commit flowed through _pl_decode_fn's slab/EOS/history
    bookkeeping. Random weights can't test (b): the model never copies, so
    acceptance stays ~0 regardless of the proposal machinery."""
    from trtllm_llama_tpu.quantization.evaluate import make_copy_params
    from trtllm_llama_tpu.runtime.serving_spec import (
        PromptLookupServingEngine,
    )
    params, _ = setup
    cycle = [11, 23, 5, 42]
    cparams = make_copy_params(CFG, params, cycle)
    prompt = cycle * 3                 # periodic prompt, in-cycle tokens
    ref = _ref_outputs(cparams, [prompt], [10])[0]
    # sanity: the copy model really does continue the cycle
    want = [cycle[(prompt.index(prompt[-1]) + 1 + i) % len(cycle)]
            for i in range(10)]
    assert ref.output_ids == want, (ref.output_ids, want)
    eng = PromptLookupServingEngine(CFG, cparams, ECFG, gamma=4, ngram=2,
                                    sampling=SCFG, decode_chunk=10)
    rid = eng.submit(prompt, 10)
    done = eng.run_to_completion()
    assert done[rid].output_ids == ref.output_ids
    assert eng.spec_committed > eng.spec_iters, (
        "no multi-token commit happened", eng.spec_committed, eng.spec_iters)


def test_prompt_lookup_zero_acceptance_budget(setup):
    """Weight-read budgeting: on a NON-copying model (random weights) a
    chunk must still commit ~1 token per iteration per active slot — the
    r4 regression was committing only ceil(chunk/(gamma+1)) iterations'
    worth per chunk. Committed tokens must be >= iterations run (bonus
    token every iteration), and the stream stays exact."""
    from trtllm_llama_tpu.runtime.serving_spec import (
        PromptLookupServingEngine,
    )
    params, _ = setup
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 250, (7,)).tolist()
    ref = _ref_outputs(params, [prompt], [9])[0]
    eng = PromptLookupServingEngine(CFG, params, ECFG, gamma=4, ngram=2,
                                    sampling=SCFG, decode_chunk=9)
    rid = eng.submit(prompt, 9)
    done = eng.run_to_completion()
    assert done[rid].output_ids == ref.output_ids
    assert eng.spec_iters > 0
    assert eng.spec_committed >= eng.spec_iters


def test_prompt_lookup_serving_rejects_stochastic():
    from trtllm_llama_tpu.runtime.serving_spec import (
        PromptLookupServingEngine,
    )
    params = llama.init_params(CFG, jax.random.PRNGKey(5))
    with pytest.raises(ValueError, match="greedy"):
        PromptLookupServingEngine(
            CFG, params, ECFG, sampling=SamplingConfig(end_id=-1, top_k=5,
                                                       temperature=0.7))


def test_prompt_lookup_serving_stop_words(setup):
    """Host-side stop criteria compose with the speculative slab."""
    from trtllm_llama_tpu.runtime.serving_spec import (
        PromptLookupServingEngine,
    )
    params, _ = setup
    rng = np.random.default_rng(9)
    prompt = rng.integers(3, 250, (6,)).tolist()
    free = _ref_outputs(params, [prompt], [8])[0]
    stop = [free.output_ids[3]]
    scfg = SamplingConfig(end_id=-1, stop_words=[stop])
    eng = PromptLookupServingEngine(CFG, params, ECFG, gamma=3,
                                    sampling=scfg, decode_chunk=4)
    rid = eng.submit(prompt, 8)
    done = eng.run_to_completion()
    assert done[rid].output_ids == free.output_ids[:4]
    assert done[rid].finished_reason == "stop_words"
