"""Benchmark harness: LLaMA-7B decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md Task B): reference TRT weight-only INT8 on A10 decodes
50 tokens (bs1, in 8) in 0.78494 s => 63.70 tokens/s. vs_baseline is our
tokens/s on the matching config (LLaMA-7B, weight-only INT8, bs 1) divided
by that. Weights are random — decode throughput is weight-value independent.

Env knobs:
  BENCH_CONFIG   fp16|int8|int4|int4pc|int8kv|sq|fp8|fp8kv  (default int8)
  BENCH_BATCH    batch size                           (default 1)
  BENCH_IN/OUT   prompt len / new tokens              (default 8 / 50)
"""

import json
import os
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("TLLM_FORCE_CPU"):
    # smoke-test knob: the env-var form (JAX_PLATFORMS) is ignored here —
    # sitecustomize force-registers the axon backend before user code runs.
    jax.config.update("jax_platforms", "cpu")

from trtllm_llama_tpu.utils.compile_cache import enable_compile_cache

# TRT-engine-file analogue: repeat runs (driver reruns, retries after a
# transient tunnel failure) skip the multi-minute 7B XLA compile entirely.
enable_compile_cache()

_MAX_ATTEMPTS = int(os.environ.get("BENCH_ATTEMPTS", "3"))


def _emit(payload: dict) -> None:
    """Print the one JSON line the driver parses (always, even on failure).
    Every record is also appended to scripts/bench_history.jsonl with its
    env-knob context — the committed raw artifact behind every README
    results cell (the reference backs its table with test_res/*.txt)."""
    if os.environ.get("BENCH_TINY"):     # smoke runs must not look like 7B
        payload["metric"] = payload["metric"].replace(
            "LLaMA-7B", "TINY-SMOKE")
        payload["vs_baseline"] = None
    print(json.dumps(payload))
    sys.stdout.flush()
    try:
        rec = dict(payload)
        rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        rec["env"] = {k: v for k, v in os.environ.items()
                      if k.startswith("BENCH_")}
        hist = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scripts", "bench_history.jsonl")
        with open(hist, "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass                             # read-only checkout: stdout stands

# A10 reference Task-B latencies for 50 new tokens, bs1 in8 (BASELINE.md)
_BASELINE_TOKS_PER_S = {
    "fp16": 50 / 1.40416,    # TRT KV-cache+attn plugin FP16 -> 35.61
    "int8": 50 / 0.78494,    # weight-only INT8            -> 63.70
    "int4": 50 / 0.48769,    # weight-only INT4            -> 102.52
    # the reference's int4 IS per-channel (thop symmetric_quantize, no
    # grouping) — int4pc is the format-matched comparison row; the g128
    # "int4" row carries grouped scales the reference lacks (accuracy)
    "int4pc": 50 / 0.48769,
    "int8kv": 50 / 1.40520,  # INT8 KV cache               -> 35.58
    "sq": 50 / 0.78494,      # reference SQ never built; use INT8 row
    "fp8": 50 / 1.40416,     # reference FP8 was stubs; use FP16 row
    "fp8kv": 50 / 1.40416,
    # the deployment pairing: int8 weights + int8 KV. The reference never
    # measured the combination (BASELINE.md has separate rows); score
    # against its stricter (weight-only INT8) row.
    "int8_int8kv": 50 / 0.78494,
}

# A10 reference Task-A totals: 20 articles x 100 tokens, in<=923 (BASELINE.md)
_BASELINE_TASK_A_TOKS_PER_S = {
    "fp16": 2000 / 66.031,   # -> 30.29
    "int8": 2000 / 40.297,   # -> 49.63
    "int4": 2000 / 28.596,   # -> 69.94
    "int4pc": 2000 / 28.596,
    "int8kv": 2000 / 66.319, # -> 30.16
    "sq": 2000 / 40.297,
    "fp8": 2000 / 66.031,
    "fp8kv": 2000 / 66.031,
    "int8_int8kv": 2000 / 40.297,
}


def _model_cfg(**kw):
    from trtllm_llama_tpu.config import ModelConfig
    if os.environ.get("BENCH_TINY"):
        # smoke knob: run the ENTIRE bench flow on a tiny model (useful on
        # CPU / when validating the driver command without a chip); numbers
        # are meaningless, the point is exercising the exact code path
        kw.pop("max_position_embeddings", None)
        return ModelConfig.tiny(**kw)
    return ModelConfig.llama_7b(**kw)


def build_engine(config_name: str, batch: int, max_len: int):
    from trtllm_llama_tpu.config import EngineConfig, ModelConfig
    from trtllm_llama_tpu.models import llama
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.runtime.session import GenerationSession

    # kernel-experiment knob: BENCH_DECODE_ATTN in {xla, split, fused, dma}
    mode = os.environ.get("BENCH_DECODE_ATTN")
    if mode:
        from trtllm_llama_tpu.ops.registry import KERNELS
        KERNELS["decode_attn_mode"] = mode

    qm = {
        "fp16": QuantMode(0),
        "int8": QuantMode.use_weight_only(False),
        "int4": QuantMode.use_weight_only(True, per_group=True),
        "int4pc": QuantMode.use_weight_only(True),
        "int8kv": QuantMode.INT8_KV_CACHE,
        "sq": QuantMode.use_smooth_quant(per_token=True, per_channel=True),
        "fp8": QuantMode.FP8_QDQ,
        "fp8kv": QuantMode.FP8_QDQ | QuantMode.FP8_KV_CACHE,
        "int8_int8kv": (QuantMode.use_weight_only(False)
                        | QuantMode.INT8_KV_CACHE),
    }[config_name]
    group = 128 if config_name == "int4" else 0
    # long-context runs (BENCH_IN past LLaMA-1's 2048) extend the RoPE table;
    # prefill streams K/V blocks (streaming_prefill_attention) past S=2048.
    n_pos = max(2048, 1 << (max_len - 1).bit_length())
    cfg = _model_cfg(quant_mode=qm, group_size=group,
                     max_position_embeddings=n_pos)

    # Random weights born quantized — never materializes the fp 7B model
    # (decode throughput is weight-value independent).
    from trtllm_llama_tpu.quantization.quantize import init_random_quantized_params
    params = init_random_quantized_params(cfg, jax.random.PRNGKey(0), qm, group)
    kv_scales = (np.full((cfg.num_layers,), 0.05, np.float32)
                 if (qm.has_int8_kv_cache() or qm.has_fp8_kv_cache())
                 else None)
    sess = GenerationSession(
        cfg, params,
        EngineConfig(max_batch_size=batch,
                     max_input_len=max(1024, max_len - 1),
                     max_seq_len=max_len),
        kv_scales=kv_scales)
    return cfg, sess


def serving_bench(config_name: str):
    """Continuous-batching throughput (BENCH_MODE=serving): N requests
    streamed through the slot pool — the workload the reference's
    in-flight batching TODO never shipped (README.md:855-866)."""
    from trtllm_llama_tpu.config import EngineConfig, ModelConfig
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import (
        init_random_quantized_params,
    )
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    from trtllm_llama_tpu.runtime.serving import ServingEngine

    slots = int(os.environ.get("BENCH_SLOTS", "8"))
    n_req = int(os.environ.get("BENCH_REQUESTS", "24"))
    dmode = os.environ.get("BENCH_DECODE_ATTN")
    if dmode:
        from trtllm_llama_tpu.ops.registry import KERNELS
        KERNELS["decode_attn_mode"] = dmode
    in_len, out_len = 128, 64
    qm = {"int8": QuantMode.use_weight_only(False),
          "int4": QuantMode.use_weight_only(True, per_group=True),
          "int4pc": QuantMode.use_weight_only(True),
          # 16+ dense slots do NOT fit with bf16 KV on one 16 GB chip
          # (2 x [32,33,32,200,128] bf16 = 9.1 GB of cache + the XLA
          # loop-carry copy + 6.7 GB weights); int8 KV is the scaling
          # configuration, exactly like the speculative pairing below
          "int8kv": (QuantMode.use_weight_only(False)
                     | QuantMode.INT8_KV_CACHE),
          "int4kv": (QuantMode.use_weight_only(True, per_group=True)
                     | QuantMode.INT8_KV_CACHE),
          "fp8": QuantMode.FP8_QDQ,
          "fp16": QuantMode(0)}[config_name]
    # BENCH_SPEC_KV=1 (speculative only): int8-KV caches for BOTH models.
    # Two 7B cache sets + the XLA loop-carry copies of each (the
    # read-after-traced-write hazard, docs/kernels.md) exceed single-chip
    # HBM in bf16; int8 KV halves both and is the deployment pairing.
    # Resolved BEFORE building params: materializing a second 6.7 GB
    # weight set while the first is still live OOMs the chip.
    spec_kv = bool(int(os.environ.get("BENCH_SPEC_KV", "0")))
    if spec_kv and os.environ.get("BENCH_SPEC_DRAFT"):
        qm = qm | QuantMode.INT8_KV_CACHE
    cfg = _model_cfg(quant_mode=qm,
                     group_size=128 if config_name.startswith("int4") else 0)
    params = init_random_quantized_params(cfg, jax.random.PRNGKey(0), qm)
    # BENCH_COPY=1: teacher-forced copy workload (make_copy_params) — the
    # model's greedy continuation IS the prompt's periodic cycle, so
    # prompt-lookup acceptance is ~full while weight traffic and compute
    # stay at the real model's size. The honest upper bound companion to
    # the repetitive-but-non-copying workload (acceptance ~0).
    copy_model = bool(int(os.environ.get("BENCH_COPY", "0")))
    cycle = None
    if copy_model:
        from trtllm_llama_tpu.quantization.evaluate import make_copy_params
        cycle = np.random.default_rng(42).integers(
            3, cfg.vocab_size, (16,)).tolist()
        params = make_copy_params(cfg, params, cycle)
    kv_scales_plain = (np.full((cfg.num_layers,), 0.05, np.float32)
                       if qm.has_int8_kv_cache() else None)
    ecfg = EngineConfig(max_batch_size=slots, max_input_len=in_len,
                        max_seq_len=in_len + out_len + 8,
                        prefill_buckets=(in_len,))
    paged = bool(int(os.environ.get("BENCH_PAGED", "0")))
    pmode = os.environ.get("BENCH_PAGED_ATTN")   # {fused, xla}
    if pmode:
        from trtllm_llama_tpu.ops.registry import KERNELS
        KERNELS["paged_attn_mode"] = pmode
    packed = bool(int(os.environ.get("BENCH_PACKED", "0")))
    pchunk = int(os.environ.get("BENCH_PREFILL_CHUNK", "0")) or None
    mixed = bool(int(os.environ.get("BENCH_MIXED", "0")))
    pipelined = bool(int(os.environ.get("BENCH_PIPELINED", "0")))
    spec_draft = os.environ.get("BENCH_SPEC_DRAFT")  # self | random | lookup
    if spec_draft == "lookup":
        # draft-free prompt-lookup: repetitive workload knob below
        from trtllm_llama_tpu.runtime.serving_spec import (
            PromptLookupServingEngine,
        )
        paged, packed, pchunk = False, False, None
        eng = PromptLookupServingEngine(
            cfg, params, ecfg, gamma=int(os.environ.get("BENCH_GAMMA", "4")),
            ngram=int(os.environ.get("BENCH_NGRAM", "3")),
            sampling=SamplingConfig(end_id=-1),
            kv_scales=kv_scales_plain,
            decode_chunk=int(os.environ.get("BENCH_CHUNK", "16")))
    elif spec_draft:
        # the spec engine is dense/non-packed/non-chunked: drop the flags
        # so the emitted metric label matches the configuration that ran
        paged, packed, pchunk = False, False, None
        from trtllm_llama_tpu.runtime.serving_spec import (
            SpeculativeServingEngine,
        )
        gamma = int(os.environ.get("BENCH_GAMMA", "4"))
        kvs = (np.full((cfg.num_layers,), 0.05, np.float32) if spec_kv
               else None)
        if spec_draft == "self":
            dcfg, dparams = cfg, params
        else:
            from trtllm_llama_tpu.models import llama as _llama
            from trtllm_llama_tpu.config import ModelConfig as _MC
            dcfg = _MC(vocab_size=cfg.vocab_size, hidden_size=768,
                       intermediate_size=2048, num_layers=12, num_heads=12,
                       num_kv_heads=12, head_dim=64)
            dparams = _llama.init_params(dcfg, jax.random.PRNGKey(1))
        eng = SpeculativeServingEngine(
            cfg, params, dcfg, dparams, ecfg, gamma=gamma,
            sampling=SamplingConfig(end_id=-1),
            kv_scales=kvs, draft_kv_scales=kvs,
            decode_chunk=int(os.environ.get("BENCH_CHUNK", "16")))
    else:
        eng = ServingEngine(
            cfg, params, ecfg,
            sampling=SamplingConfig(end_id=-1),
            kv_scales=kv_scales_plain,
            decode_chunk=int(os.environ.get("BENCH_CHUNK", "16")),
            paged=paged,
            block_size=int(os.environ.get("BENCH_BLOCK", "64")),
            packed_prefill=packed,
            prefill_chunk=pchunk,
            mixed_step=mixed,
            pipelined=pipelined)
    # the engine fused q/k/v (+gate/up) into NEW stacked arrays that share
    # the remaining leaves; dropping the bench's reference to the originals
    # frees the ~4.5 GB of superseded unfused projections (without this the
    # two-cache speculative configuration exceeds single-chip HBM)
    params = dparams = None                                  # noqa: F841
    rng = np.random.default_rng(0)
    # warm every compile path the measured run can hit: admission waves of
    # each power-of-two size up to the slot count (mid-run slot churn admits
    # nb in {1,2,4,...}; the persistent compile cache amortizes these in
    # production, so cold compiles during timing would measure the tunnel's
    # compiler, not the engine), then one request running a full out_len
    # (warms the budget-tail decode chunks)
    nb = 1
    while nb <= slots:
        for _ in range(nb):
            eng.submit(rng.integers(3, cfg.vocab_size, (in_len,)).tolist(),
                       out_len)
        eng.run_to_completion()
        nb *= 2

    repetitive = bool(int(os.environ.get("BENCH_REPETITIVE", "0")))
    if copy_model:
        # every prompt repeats the copy cycle; the model continues it
        reqs = [(cycle * (-(-in_len // len(cycle))))[:in_len]
                for _ in range(n_req)]
    elif repetitive:
        # prompts made of a repeated 16-token span: the extractive/
        # repetitive regime where prompt-lookup proposals can hit
        reqs = [(rng.integers(3, cfg.vocab_size, (16,)).tolist()
                 * (-(-in_len // 16)))[:in_len] for _ in range(n_req)]
    else:
        reqs = [rng.integers(3, cfg.vocab_size, (in_len,)).tolist()
                for _ in range(n_req)]
    # BENCH_REPEATS independent sweeps (median reported, all samples
    # recorded — see latency_bench's repeats note); observability
    # accumulators reset per sweep so each latency/phase report covers
    # exactly its own measured window
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
    samples, stats = [], []
    for _ in range(repeats):
        if hasattr(eng, "phase_times"):
            for k in eng.phase_times:
                eng.phase_times[k] = 0 if k == "steps" else 0.0
            eng._req_times.clear()
        if hasattr(eng, "spec_iters"):      # acceptance over the last sweep
            eng.spec_iters = eng.spec_committed = 0
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r, out_len)
        done = eng.run_to_completion()
        dt = time.perf_counter() - t0
        total_tokens = sum(len(d.output_ids) for d in done.values())
        samples.append(round(total_tokens / dt, 2))
        st = ({"latency": eng.latency_stats(),
               "phases_ms_per_step": eng.phase_stats()}
              if hasattr(eng, "latency_stats") else {})
        if getattr(eng, "spec_iters", 0):
            st["spec"] = {"iters": eng.spec_iters,
                          "committed": eng.spec_committed}
        stats.append(st)
    # value + stats + spec counters all come from the SAME (median) sweep
    # so the record is internally consistent (even n picks upper-middle —
    # a real measurement, unlike np.median's midpoint average)
    med_i = int(np.argsort(samples)[len(samples) // 2])
    extra = dict(stats[med_i])
    extra["n"] = repeats
    extra["samples"] = samples
    _emit({
        "metric": f"serving throughput (LLaMA-7B {config_name}, "
                  f"{slots} slots, {n_req} reqs, in{in_len} out{out_len}"
                  + (", paged" if paged else "")
                  + (", packed" if packed else "")
                  + (f", chunked{pchunk}" if pchunk else "")
                  + (f", dchunk{eng.decode_chunk}"
                     if eng.decode_chunk != 16 else "")
                  + (", mixed" if mixed else "")
                  + (", pipelined" if pipelined else "")
                  + (f", spec-{spec_draft}" if spec_draft else "")
                  + (", int8kv" if spec_draft and spec_kv else "")
                  + (", repetitive" if repetitive else "")
                  + (", copy" if copy_model else "") + ")",
        "value": samples[med_i],
        "unit": "tokens/s",
        "vs_baseline": None,   # reference never shipped in-flight batching
        **extra,
    })


def speculative_bench(config_name: str):
    """BENCH_MODE=speculative: two-model speculative decode throughput.

    Random weights mean a real small draft would almost never match the
    target (acceptance ~ 1/V), so the measurable, honest configurations
    are: BENCH_DRAFT=self (draft == target: 100% acceptance — the γ+1
    dispatch-amortization UPPER BOUND) and BENCH_DRAFT=random (≈0%
    acceptance — the verify-overhead LOWER BOUND). Real-draft numbers land
    between, weighted by the measured acceptance rate of an actual
    checkpoint pair."""
    from trtllm_llama_tpu.config import EngineConfig, ModelConfig
    from trtllm_llama_tpu.quantization.mode import QuantMode
    from trtllm_llama_tpu.quantization.quantize import (
        init_random_quantized_params,
    )
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    from trtllm_llama_tpu.runtime.speculative import SpeculativeSession

    in_len = int(os.environ.get("BENCH_IN", "8"))
    out_len = int(os.environ.get("BENCH_OUT", "50"))
    gamma = int(os.environ.get("BENCH_GAMMA", "4"))
    draft_kind = os.environ.get("BENCH_DRAFT", "self")
    qm = {"int8": QuantMode.use_weight_only(False),
          "int4": QuantMode.use_weight_only(True, per_group=True),
          "int4pc": QuantMode.use_weight_only(True),
          # 16+ dense slots do NOT fit with bf16 KV on one 16 GB chip
          # (2 x [32,33,32,200,128] bf16 = 9.1 GB of cache + the XLA
          # loop-carry copy + 6.7 GB weights); int8 KV is the scaling
          # configuration, exactly like the speculative pairing below
          "int8kv": (QuantMode.use_weight_only(False)
                     | QuantMode.INT8_KV_CACHE),
          "int4kv": (QuantMode.use_weight_only(True, per_group=True)
                     | QuantMode.INT8_KV_CACHE),
          "fp16": QuantMode(0)}[config_name]
    group = 128 if config_name == "int4" else 0
    cfg = _model_cfg(quant_mode=qm, group_size=group)
    params = init_random_quantized_params(cfg, jax.random.PRNGKey(0), qm,
                                          group)
    ecfg = EngineConfig(max_input_len=max(16, in_len),
                        max_seq_len=in_len + out_len + gamma + 18)
    if draft_kind == "ngram":
        # prompt-lookup: no draft model. NOTE on reading this number:
        # random-WEIGHT greedy decode degenerates into repetitive token
        # loops, which the n-gram lookup exploits heavily (measured 150.4
        # tok/s vs 92 vanilla at int8) — treat it as the repetitive-text
        # regime, not a floor; real-text rates depend on how extractive
        # the workload is (summarize ≈ high, open-ended chat ≈ low).
        from trtllm_llama_tpu.runtime.speculative import PromptLookupSession
        sess = PromptLookupSession(cfg, params, ecfg, gamma=gamma,
                                   ngram=int(os.environ.get("BENCH_NGRAM",
                                                            "3")))
    else:
        if draft_kind == "self":
            dcfg, dparams = cfg, params
        else:   # a LLaMA-160M-shaped random draft
            dcfg = ModelConfig(vocab_size=cfg.vocab_size, hidden_size=768,
                               intermediate_size=2048, num_layers=12,
                               num_heads=12, num_kv_heads=12, head_dim=64)
            from trtllm_llama_tpu.models import llama as _llama
            dparams = _llama.init_params(dcfg, jax.random.PRNGKey(1))
        sess = SpeculativeSession(cfg, params, dcfg, dparams, ecfg,
                                  gamma=gamma)
    ids = np.random.default_rng(0).integers(3, cfg.vocab_size, (1, in_len))
    scfg = SamplingConfig(end_id=-1)

    sess.generate(ids, max_new_tokens=out_len, sampling=scfg)   # compile
    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        sess.generate(ids, max_new_tokens=out_len, sampling=scfg)
    dt = (time.perf_counter() - t0) / n_runs
    _emit({
        "metric": f"speculative tokens/sec/chip (LLaMA-7B {config_name}, "
                  f"draft={draft_kind}, gamma={gamma}, bs1 in{in_len} "
                  f"out{out_len})",
        "value": round(out_len / dt, 2),
        "unit": "tokens/s",
        "vs_baseline": round((out_len / dt)
                             / _BASELINE_TOKS_PER_S[config_name], 3),
    })


def latency_bench(config_name: str):
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    in_len = int(os.environ.get("BENCH_IN", "8"))
    out_len = int(os.environ.get("BENCH_OUT", "50"))

    cfg, sess = build_engine(config_name, batch, max_len=in_len + out_len + 16)
    ids = np.random.default_rng(0).integers(3, cfg.vocab_size, (batch, in_len))
    scfg = SamplingConfig(end_id=-1)  # fixed-length decode for stable timing

    def one_run():
        sess.generate(ids, max_new_tokens=out_len, sampling=scfg)

    # warmup/compile — a transient tunnel failure here must not kill the
    # round's scoreboard (round 1's BENCH artifact was exactly that: rc=1
    # from one FAILED_PRECONDITION inside np.asarray). Re-create the session
    # and retry; the persistent compile cache makes retries cheap.
    for attempt in range(_MAX_ATTEMPTS):
        try:
            one_run()
            break
        except jax.errors.JaxRuntimeError:
            traceback.print_exc(file=sys.stderr)
            if attempt == _MAX_ATTEMPTS - 1:
                raise
            time.sleep(5.0)
            cfg, sess = build_engine(config_name, batch,
                                     max_len=in_len + out_len + 16)
    # timed runs: BENCH_REPEATS independent measurements (each averaging
    # n_runs generates), median reported with all samples recorded — the
    # ±5% tunnel variance is larger than most round-over-round deltas, so
    # single-shot rows made comparisons noise-dominated (VERDICT r4 weak
    # #5: a slow-window capture understated the build by ~9%)
    n_runs = 3
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_runs):
            one_run()
        dt = (time.perf_counter() - t0) / n_runs
        samples.append(round(batch * out_len / dt, 2))
    # a real measured sample (odd n: the median; even n: upper-middle)
    toks_per_s = sorted(samples)[len(samples) // 2]

    # long-input shapes compare against the reference's Task-A (summarize)
    # rates, which include prefill the same way this measurement does.
    # Past 2048 there is NO baseline: the reference is LLaMA-1 with a
    # 2048-token context and no rope scaling — it cannot run the prompt at
    # all. Dividing by its in923 rate would charge this engine for 4.4x
    # the prefill amortized over 0.64x the output tokens; report null
    # instead of a fake ratio.
    table = (_BASELINE_TASK_A_TOKS_PER_S if in_len >= 512
             else _BASELINE_TOKS_PER_S)
    # batched rows have NO reference counterpart either (Task A/B are bs1
    # measurements); an aggregate/bs1 ratio would overstate by ~batch
    vs = (None if in_len > 2048 or batch > 1
          else round(toks_per_s / table[config_name], 3))
    _emit({
        "metric": f"tokens/sec/chip (LLaMA-7B {config_name}, "
                  f"bs{batch} in{in_len} out{out_len})",
        "value": round(toks_per_s, 2),
        "unit": "tokens/s",
        "vs_baseline": vs,
        "n": repeats,
        "samples": samples,
    })


def _watchdogs(config_name: str):
    """Bound the two infra hangs that can eat the round's scoreboard.

    (1) Backend/device discovery through the axon tunnel can HANG (not
    raise) when the tunnel is down — observed >120 s with no exception.
    Probe it in a daemon thread with a deadline so a dead tunnel becomes
    an emitted-JSON failure instead of a driver-side timeout kill.
    (2) A global deadline re-emits the JSON error line even if some later
    stage wedges (Mosaic remote compile, d2h transfer)."""
    import threading

    def _die(stage: str):
        _emit({
            "metric": f"tokens/sec/chip (LLaMA-7B {config_name})",
            "value": None, "unit": "tokens/s", "vs_baseline": None,
            "error": f"watchdog: {stage}",
        })
        os._exit(1)

    probe_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "180"))
    found = []
    t = threading.Thread(target=lambda: found.append(jax.devices()),
                         daemon=True)
    t.start()
    t.join(timeout=probe_s)
    if not found:
        _die(f"device discovery exceeded {probe_s:.0f}s (tunnel down?)")

    deadline_s = float(os.environ.get("BENCH_DEADLINE", "2400"))  # one observed false kill at 1500s: cold compiles right after 40 min of chip churn ran long; the driver's own timeout still governs
    if deadline_s > 0:
        timer = threading.Timer(deadline_s,
                                _die, (f"bench exceeded {deadline_s:.0f}s",))
        timer.daemon = True
        timer.start()
        return timer
    return None


def main():
    config_name = os.environ.get("BENCH_CONFIG", "int8")
    mode = os.environ.get("BENCH_MODE", "latency")
    timer = _watchdogs(config_name)
    last_err = None
    for attempt in range(_MAX_ATTEMPTS):
        try:
            if mode == "serving":
                serving_bench(config_name)
            elif mode == "speculative":
                speculative_bench(config_name)
            else:
                latency_bench(config_name)
            if timer is not None:
                timer.cancel()
            return
        except Exception as e:  # noqa: BLE001 — always emit the JSON line
            last_err = e
            traceback.print_exc(file=sys.stderr)
            time.sleep(5.0)
    _emit({
        "metric": f"tokens/sec/chip (LLaMA-7B {config_name})",
        "value": None,
        "unit": "tokens/s",
        "vs_baseline": None,
        "error": f"{type(last_err).__name__}: {last_err}",
    })
    sys.exit(1)


if __name__ == "__main__":
    main()
