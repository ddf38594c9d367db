"""forward_extend for the GPT/decoder families (chunked prefill +
speculative support beyond llama).

Gates: (a) extend over T tokens == T sequential forward_decode calls
(logits + cache bits) per family incl. ALiBi/partial-rotary/learned-pos
wiring; (b) self-draft speculative generation == plain greedy through
GenerationSession; (c) chunked-prefill serving == plain serving."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import decoder, gpt
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.serving import ServingEngine
from trtllm_llama_tpu.runtime.session import GenerationSession
from trtllm_llama_tpu.runtime.speculative import SpeculativeSession

ECFG = EngineConfig(max_batch_size=2, max_input_len=48, max_seq_len=64)
SCFG = SamplingConfig(end_id=-1)


def _families():
    cfg = ModelConfig.tiny(dtype="float32")
    out = []
    for name, fam in decoder.FAMILIES.items():
        params = fam.init_params(cfg, jax.random.PRNGKey(hash(name) % 2**31))
        out.append((name, fam, cfg, params))
    out.append(("gpt", gpt,
                ModelConfig.tiny(dtype="float32", architecture="gpt"),
                gpt.init_params(ModelConfig.tiny(dtype="float32"),
                                jax.random.PRNGKey(7))))
    return out


@pytest.mark.parametrize("name,fam,cfg,params",
                         _families(), ids=lambda v: str(v)[:12])
def test_extend_matches_sequential_decode(name, fam, cfg, params):
    if not isinstance(name, str):
        pytest.skip("param plumbing")
    rng = np.random.default_rng(3)
    B, L, T = 2, 7, 4
    ids = jnp.asarray(rng.integers(3, 250, (B, L)))
    lens = jnp.asarray([7, 5], jnp.int32)
    toks = jnp.asarray(rng.integers(3, 250, (B, T)))

    c1 = fam.init_caches(cfg, B, 64)
    _, c1 = fam.forward_prefill(params, cfg, ids, lens, c1)
    seq_logits, pos = [], lens
    for i in range(T):
        lg, c1 = fam.forward_decode(params, cfg, toks[:, i], pos, c1)
        seq_logits.append(lg)
        pos = pos + 1
    seq_logits = jnp.stack(seq_logits, 1)

    c2 = fam.init_caches(cfg, B, 64)
    _, c2 = fam.forward_prefill(params, cfg, ids, lens, c2)
    ext_logits, c2 = fam.forward_extend(params, cfg, toks, lens, c2)
    np.testing.assert_allclose(np.asarray(ext_logits),
                               np.asarray(seq_logits), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c1.k), np.asarray(c2.k),
                               atol=1e-5)


@pytest.mark.parametrize("which", ["bloom", "gpt"])
def test_speculative_self_draft_family(which):
    """Self-draft speculative == plain greedy for a non-llama family
    (Bloom exercises ALiBi in the extend path; GPT the learned positions)."""
    cfg = ModelConfig.tiny(dtype="float32")
    if which == "bloom":
        fam, params = decoder.BLOOM, decoder.BLOOM.init_params(
            cfg, jax.random.PRNGKey(0))
    else:
        fam, params = gpt, gpt.init_params(cfg, jax.random.PRNGKey(0))
    prompts = [np.random.default_rng(0).integers(3, 250, (9,)).tolist(),
               np.random.default_rng(1).integers(3, 250, (5,)).tolist()]
    ref = GenerationSession(cfg, params, ECFG, model=fam).generate(
        prompts, sampling=SCFG, max_new_tokens=12)
    spec = SpeculativeSession(cfg, params, cfg, params, ECFG, gamma=3,
                              model=fam, draft_model=fam)
    got = spec.generate(prompts, sampling=SCFG, max_new_tokens=12)
    np.testing.assert_array_equal(got.output_ids, ref.output_ids)


def test_chunked_prefill_serving_family():
    """Chunked-context serving for the OPT family (learned positions with
    the +2 offset must hold at per-row chunk offsets)."""
    cfg = ModelConfig.tiny(dtype="float32")
    fam = decoder.OPT
    params = fam.init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(5)
    prompts = [rng.integers(3, 250, (40,)).tolist(),
               rng.integers(3, 250, (10,)).tolist()]
    ref_e = ServingEngine(cfg, params, ECFG, sampling=SCFG, decode_chunk=3,
                          model=fam)
    r = [ref_e.submit(p, 5) for p in prompts]
    ref = ref_e.run_to_completion()
    eng = ServingEngine(cfg, params, ECFG, sampling=SCFG, decode_chunk=3,
                        model=fam, prefill_chunk=16)
    s = [eng.submit(p, 5) for p in prompts]
    done = eng.run_to_completion()
    for ri, si in zip(r, s):
        assert done[si].output_ids == ref[ri].output_ids


def test_chatglm_extend_and_speculative():
    """ChatGLM 2D-rotary extend: slab == sequential decode, and self-draft
    speculative == plain greedy (prefix-LM semantics preserved)."""
    from trtllm_llama_tpu.models import chatglm
    cfg = ModelConfig.tiny(dtype="float32")
    params = chatglm.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(6)
    B, L, T = 2, 7, 3
    ids = jnp.asarray(rng.integers(3, 250, (B, L)))
    lens = jnp.asarray([7, 5], jnp.int32)
    toks = jnp.asarray(rng.integers(3, 250, (B, T)))

    c1 = chatglm.init_caches(cfg, B, 64)
    _, c1 = chatglm.forward_prefill(params, cfg, ids, lens, c1)
    seq_logits, pos = [], lens
    for i in range(T):
        lg, c1 = chatglm.forward_decode(params, cfg, toks[:, i], pos, c1)
        seq_logits.append(lg)
        pos = pos + 1
    seq_logits = jnp.stack(seq_logits, 1)

    c2 = chatglm.init_caches(cfg, B, 64)
    _, c2 = chatglm.forward_prefill(params, cfg, ids, lens, c2)
    ext_logits, c2 = chatglm.forward_extend(params, cfg, toks, lens, c2)
    np.testing.assert_allclose(np.asarray(ext_logits),
                               np.asarray(seq_logits), atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c1.kv.k), np.asarray(c2.kv.k),
                               atol=1e-5)

    prompts = [rng.integers(3, 250, (9,)).tolist(),
               rng.integers(3, 250, (5,)).tolist()]
    ref = GenerationSession(cfg, params, ECFG, model=chatglm).generate(
        prompts, sampling=SCFG, max_new_tokens=10)
    spec = SpeculativeSession(cfg, params, cfg, params, ECFG, gamma=3,
                              model=chatglm, draft_model=chatglm)
    got = spec.generate(prompts, sampling=SCFG, max_new_tokens=10)
    np.testing.assert_array_equal(got.output_ids, ref.output_ids)
