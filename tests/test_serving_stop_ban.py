"""Per-request stop_words / bad_words under continuous batching.

Reference contract: InferenceRequest carries per-request stop_words_list
and bad_words_list (batch_manager/GptManager.h:48-89);
stopCriteriaKernels.cu ends a sequence when a stop word appears in its
generated ids, and banBadWords.cu masks the token that would complete a
bad word given the generated tail. Here: stop words are matched host-side
at decode-chunk boundaries (exact — tokens decoded past the match are
discarded), bad words are banned in-graph per slot
(sampling.ban_bad_words_slots, carried tail in the decode chunk).
"""

import numpy as np
import pytest
import jax

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.serving import ServingEngine


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    ecfg = EngineConfig(max_batch_size=3, max_input_len=16, max_seq_len=48)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(3, 250, (n,)).tolist() for n in (6, 9)]
    # greedy per-request baseline (no stop/bad words)
    engine = ServingEngine(cfg, params, ecfg,
                           sampling=SamplingConfig(end_id=-1),
                           decode_chunk=4, per_request_sampling=True)
    rids = [engine.submit(p, 12) for p in prompts]
    done = engine.run_to_completion()
    baselines = [done[r].output_ids for r in rids]
    return cfg, params, ecfg, prompts, baselines


def _engine(cfg, params, ecfg, **kw):
    kw.setdefault("sampling", SamplingConfig(end_id=-1))
    kw.setdefault("decode_chunk", 4)
    return ServingEngine(cfg, params, ecfg, **kw)


def test_stop_words_truncate_and_reason(setup):
    cfg, params, ecfg, prompts, base = setup
    stop = tuple(base[0][3:5])                      # 2-token stop sequence
    eng = _engine(cfg, params, ecfg, per_request_sampling=True)
    r0 = eng.submit(prompts[0], 12,
                    sampling=SamplingConfig(end_id=-1, stop_words=(stop,)))
    r1 = eng.submit(prompts[1], 12)                 # unconstrained neighbor
    done = eng.run_to_completion()
    assert done[r0].output_ids == base[0][:5]       # stop word kept, then cut
    assert done[r0].finished_reason == "stop_words"
    assert done[r1].output_ids == base[1]           # per-slot isolation


def test_stop_words_first_token(setup):
    cfg, params, ecfg, prompts, base = setup
    eng = _engine(cfg, params, ecfg, per_request_sampling=True)
    rid = eng.submit(prompts[0], 12, sampling=SamplingConfig(
        end_id=-1, stop_words=((base[0][0],),)))
    done = eng.run_to_completion()
    assert done[rid].output_ids == base[0][:1]
    assert done[rid].finished_reason == "stop_words"


def test_stop_words_global_mode(setup):
    """Engine-default stop_words apply to every request, even without
    per_request_sampling (matching is host-side)."""
    cfg, params, ecfg, prompts, base = setup
    stop = tuple(base[1][2:4])
    eng = _engine(cfg, params, ecfg,
                  sampling=SamplingConfig(end_id=-1, stop_words=(stop,)))
    rid = eng.submit(prompts[1], 12)
    done = eng.run_to_completion()
    assert done[rid].output_ids == base[1][:4]
    assert done[rid].finished_reason == "stop_words"


def test_bad_words_single_token(setup):
    cfg, params, ecfg, prompts, base = setup
    banned = base[0][1]
    eng = _engine(cfg, params, ecfg, per_request_sampling=True,
                  max_bad_words=2)
    rid = eng.submit(prompts[0], 12, sampling=SamplingConfig(
        end_id=-1, bad_words=((banned,),)))
    done = eng.run_to_completion()
    out = done[rid].output_ids
    assert banned not in out                 # banned at every step
    assert out != base[0]
    assert len(out) == 12


def test_bad_words_multi_token(setup):
    """Banning (t1, t2) means t1 may appear but is never followed by t2."""
    cfg, params, ecfg, prompts, base = setup
    # first position i>=1 whose token hasn't occurred before it, so the ban
    # provably first bites at step i+1
    i = next(i for i in range(1, len(base[0]) - 1)
             if base[0][i] not in base[0][:i])
    t1, t2 = base[0][i], base[0][i + 1]
    eng = _engine(cfg, params, ecfg, per_request_sampling=True,
                  max_bad_words=2)
    r0 = eng.submit(prompts[0], 12, sampling=SamplingConfig(
        end_id=-1, bad_words=((t1, t2),)))
    r1 = eng.submit(prompts[1], 12)          # same engine, no ban
    done = eng.run_to_completion()
    out = done[r0].output_ids
    assert out[:i + 1] == base[0][:i + 1]    # identical until the ban bites
    assert out[i + 1] != t2
    pairs = list(zip(out, out[1:]))
    assert (t1, t2) not in pairs
    assert done[r1].output_ids == base[1]    # slot rows fully isolated


def test_bad_words_slot_reuse_clears_words(setup):
    """A released slot's bad words must not leak into its next occupant."""
    cfg, params, ecfg, prompts, base = setup
    ecfg1 = EngineConfig(max_batch_size=1, max_input_len=16, max_seq_len=48)
    eng = _engine(cfg, params, ecfg1, per_request_sampling=True,
                  max_bad_words=2)
    r0 = eng.submit(prompts[0], 4, sampling=SamplingConfig(
        end_id=-1, bad_words=((base[0][1],),)))
    r1 = eng.submit(prompts[0], 12)          # reuses slot 0, no ban
    done = eng.run_to_completion()
    assert done[r0].output_ids != base[0][:4]
    assert done[r1].output_ids == base[0]


def test_bad_words_validation(setup):
    cfg, params, ecfg, prompts, _ = setup
    with pytest.raises(ValueError, match="per_request_sampling"):
        _engine(cfg, params, ecfg, max_bad_words=2)
    with pytest.raises(ValueError, match="max_bad_words"):
        _engine(cfg, params, ecfg, sampling=SamplingConfig(
            end_id=-1, bad_words=((5,),)))
    eng = _engine(cfg, params, ecfg, per_request_sampling=True,
                  max_bad_words=1, max_bad_word_len=2)
    with pytest.raises(ValueError, match="capacity"):
        eng.submit(prompts[0], 4, sampling=SamplingConfig(
            end_id=-1, bad_words=((1,), (2,))))
    with pytest.raises(ValueError, match="capacity"):
        eng.submit(prompts[0], 4, sampling=SamplingConfig(
            end_id=-1, bad_words=((1, 2, 3),)))
    with pytest.raises(ValueError, match="max_bad_words"):
        eng2 = _engine(cfg, params, ecfg, per_request_sampling=True)
        eng2.submit(prompts[0], 4, sampling=SamplingConfig(
            end_id=-1, bad_words=((5,),)))
