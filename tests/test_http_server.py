"""HTTP serving front-end (examples/serve_http.py) over ServingEngine."""

import json
import threading
import urllib.request

import numpy as np
import pytest
import jax

from trtllm_llama_tpu.config import EngineConfig, ModelConfig
from trtllm_llama_tpu.models import llama
from trtllm_llama_tpu.runtime.sampling import SamplingConfig
from trtllm_llama_tpu.runtime.serving import ServingEngine
from trtllm_llama_tpu.runtime.session import GenerationSession


class _Tok:
    """Identity 'tokenizer': prompts are space-joined ids."""

    def __call__(self, text):
        class R:
            input_ids = [int(t) for t in text.split()]
        return R()

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


@pytest.fixture(scope="module")
def server():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "serve_http", os.path.join(os.path.dirname(__file__), "..",
                                   "examples", "serve_http.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    ecfg = EngineConfig(max_batch_size=3, max_input_len=16, max_seq_len=32)
    engine = ServingEngine(cfg, params, ecfg,
                           sampling=SamplingConfig(end_id=-1),
                           decode_chunk=3, return_logprobs=True)
    srv, worker = mod.build_server(engine, _Tok(), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    yield url, cfg, params, ecfg
    srv.shutdown()
    worker.shutdown()


def _post(url, payload, stream=False):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    resp = urllib.request.urlopen(req, timeout=120)
    if stream:
        return [json.loads(l) for l in resp.read().splitlines() if l.strip()]
    return json.loads(resp.read())


def test_health(server):
    url, *_ = server
    out = json.loads(urllib.request.urlopen(url + "/health",
                                            timeout=30).read())
    assert out["status"] == "ok"


def test_generate_matches_offline(server):
    url, cfg, params, ecfg = server
    prompt = np.random.default_rng(0).integers(3, 250, (7,)).tolist()
    out = _post(url, {"prompt": " ".join(map(str, prompt)),
                      "max_new_tokens": 6, "logprobs": True})
    ref = GenerationSession(cfg, params, ecfg).generate(
        [prompt], sampling=SamplingConfig(end_id=-1), max_new_tokens=6,
        return_logprobs=True)
    assert out["output_ids"] == ref.output_ids[0].tolist()
    np.testing.assert_allclose(out["logprobs"], ref.logprobs[0][:6],
                               atol=1e-4)
    assert out["finished_reason"] == "length"


def test_generate_stream(server):
    url, cfg, params, ecfg = server
    prompt = np.random.default_rng(1).integers(3, 250, (5,)).tolist()
    lines = _post(url, {"input_ids": prompt, "max_new_tokens": 6,
                        "stream": True}, stream=True)
    toks = [t for l in lines if "token_ids" in l for t in l["token_ids"]]
    assert lines[-1]["finished_reason"] == "length"
    ref = GenerationSession(cfg, params, ecfg).generate(
        [prompt], sampling=SamplingConfig(end_id=-1), max_new_tokens=6)
    assert toks == ref.output_ids[0].tolist()


def test_concurrent_requests(server):
    """Several clients at once ride the same continuous batch."""
    url, cfg, params, ecfg = server
    rng = np.random.default_rng(2)
    prompts = [rng.integers(3, 250, (n,)).tolist() for n in (4, 6, 9, 5)]
    results = [None] * len(prompts)

    def go(i):
        results[i] = _post(url, {"input_ids": prompts[i],
                                 "max_new_tokens": 5})

    threads = [threading.Thread(target=go, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    offline = GenerationSession(cfg, params, ecfg)
    for p, r in zip(prompts, results):
        ref = offline.generate([p], sampling=SamplingConfig(end_id=-1),
                               max_new_tokens=5)
        assert r is not None and r["output_ids"] == ref.output_ids[0].tolist()


def test_http_over_speculative_engine():
    """build_server is engine-agnostic: serve a SpeculativeServingEngine
    and get offline-identical greedy outputs over HTTP."""
    import importlib.util
    import os
    import threading
    from trtllm_llama_tpu.runtime.serving_spec import (
        SpeculativeServingEngine)

    spec_file = importlib.util.spec_from_file_location(
        "serve_http2", os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "serve_http.py"))
    mod = importlib.util.module_from_spec(spec_file)
    spec_file.loader.exec_module(mod)

    cfg = ModelConfig.tiny(dtype="float32")
    dcfg = ModelConfig.tiny(dtype="float32", num_layers=1, hidden_size=64,
                            intermediate_size=128, num_heads=2,
                            num_kv_heads=2, head_dim=32)
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    dparams = llama.init_params(dcfg, jax.random.PRNGKey(1))
    ecfg = EngineConfig(max_batch_size=2, max_input_len=16, max_seq_len=32)
    engine = SpeculativeServingEngine(
        cfg, params, dcfg, dparams, ecfg, gamma=3,
        sampling=SamplingConfig(end_id=-1), decode_chunk=4,
        per_request_sampling=True)
    srv, worker = mod.build_server(engine, _Tok(), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        prompt = np.random.default_rng(3).integers(3, 250, (6,)).tolist()
        out = _post(url, {"input_ids": prompt, "max_new_tokens": 6})
        ref = GenerationSession(cfg, params, ecfg).generate(
            [prompt], sampling=SamplingConfig(end_id=-1), max_new_tokens=6)
        assert out["output_ids"] == ref.output_ids[0].tolist()
        # a stochastic request rides the same speculative engine
        # (--draft_engine_dir + --per_request_sampling)
        out2 = _post(url, {"input_ids": prompt, "max_new_tokens": 6,
                           "temperature": 0.8, "top_k": 8})
        assert len(out2["output_ids"]) == 6
    finally:
        srv.shutdown()
        worker.shutdown()


def test_http_stop_and_bad_words():
    """stop / bad_words request fields reach the per-request engine."""
    import importlib.util
    import os
    import threading

    spec_file = importlib.util.spec_from_file_location(
        "serve_http3", os.path.join(os.path.dirname(__file__), "..",
                                    "examples", "serve_http.py"))
    mod = importlib.util.module_from_spec(spec_file)
    spec_file.loader.exec_module(mod)

    cfg = ModelConfig.tiny(dtype="float32")
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    ecfg = EngineConfig(max_batch_size=2, max_input_len=16, max_seq_len=48)
    engine = ServingEngine(cfg, params, ecfg,
                           sampling=SamplingConfig(end_id=-1),
                           decode_chunk=4, per_request_sampling=True,
                           max_bad_words=2)
    srv, worker = mod.build_server(engine, _Tok(), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        prompt = np.random.default_rng(4).integers(3, 250, (6,)).tolist()
        base = _post(url, {"input_ids": prompt, "max_new_tokens": 10})
        assert base["finished_reason"] == "length"
        stop = base["output_ids"][2:4]
        out = _post(url, {"input_ids": prompt, "max_new_tokens": 10,
                          "stop": [stop]})
        # truncates at the FIRST occurrence of the stop sequence
        b = base["output_ids"]
        k = next(i + 2 for i in range(len(b) - 1) if b[i:i + 2] == stop)
        assert out["output_ids"] == b[:k]
        assert out["finished_reason"] == "stop_words"
        banned = base["output_ids"][1]
        out = _post(url, {"input_ids": prompt, "max_new_tokens": 10,
                          "bad_words": [[banned]]})
        assert banned not in out["output_ids"]
    finally:
        srv.shutdown()
        worker.shutdown()
