"""Mid-scale (hidden 1024 / 8 layers) per-QuantMode accuracy gates.

The nightly tier between the fast golden-scale gates
(tests/test_accuracy_gates.py, hidden 128 / 2 layers, thresholds 3-5x
measured) and the environmentally-unreachable real-LLaMA-7B ROUGE contract
(reference README.md:919-921, zero egress -> no checkpoint). At this scale
the thresholds are <= 2x the measured envelope (committed below from
`python examples/accuracy_report.py --hidden 1024 --layers 8 --heads 16
--intermediate 2816 --vocab 2048 --batch 4 --prompt_len 48 --cont_len 24`),
so subtler scale-math/kernel degradations that slip through a 3-5x
golden-scale margin trip here.

Measured (r3, CPU f32, seed 0):

    mode        pre KL     dec KL     ppl      dec top-1
    int8-wo     2.31e-2    3.08e-2    1.062    0.760
    sq-static   1.32e-1    1.59e-1    1.238    0.583
    sq-ptpc     5.81e-2    7.49e-2    1.123    0.771
    int8-kv     0          2.65e-2    1.014    0.844
    int8-wo+kv  2.31e-2    5.72e-2    1.113    0.698

INT4 and FP8-weight modes get their own tier (r4): full width 1024 —
where every packing/grouping/interleave count production hits lives
(K=1024 -> 8 groups per int4 column, 8 fp8 interleave blocks) — at depth
4, with trained-like structured weights (evaluate.structure_weights:
low-rank energy concentration + log-normal per-channel scales with
outliers). Depth 8 at random weights collapses these formats by honest
noise accumulation (int4 ppl 41x r3; structure alone moved it only to
24x — the missing ingredient is trained logit MARGINS, which no static
weight transform supplies), so a depth-8 gate would pin a collapsed
model and assert nothing. Depth 4 keeps the metrics in a responsive
range (measured: fp8 ppl 1.286, int4 11.26 — int4's KL is near
saturation even here, so its gate is a wide regression pin, not a
quality bar). The DETERMINISTIC regression net for subtle packing/scale
bugs is tests/test_quant_tensors.py's RTN contract tests at real 7B
shapes: round-to-nearest guarantees err <= step/2 per element, and any
layout/scale-pairing regression blows that bound by orders of magnitude.

Run: TLLM_NIGHTLY=1 python -m pytest tests/test_accuracy_midscale.py -q
(~20 min CPU; auto-skipped otherwise.)
"""

import os

import numpy as np
import pytest

from trtllm_llama_tpu.quantization.evaluate import (build_golden_setup,
                                                    evaluate_quant_mode,
                                                    reference_run)
from trtllm_llama_tpu.quantization.mode import QuantMode

pytestmark = [
    pytest.mark.nightly,
    pytest.mark.skipif(not os.environ.get("TLLM_NIGHTLY"),
                       reason="mid-scale tier runs with TLLM_NIGHTLY=1"),
]

# (name, mode, group_size, max prefill KL, max decode KL, max ppl ratio,
#  min decode top-1) — all bounds <= 2x the worse of two observed runs:
# XLA-CPU reduction order shifts with the virtual-device split (the pytest
# harness forces 8 CPU devices), which at depth 8 moves ppl_ratio by up to
# ~0.15 (sq-static observed 1.238 and 1.393 on identical inputs). 2x the
# observed envelope still catches the subtle degradations the 3-5x
# golden-scale margins cannot.
# int4/fp8 tier: hidden 1024 / 4 layers / structured weights (see module
# docstring). Bounds = measured + 2x headroom on the excess over ideal
# (measured r4: int4-g128 ppl 11.26 dkl 1.281 top1 0.146; fp8 ppl 1.286
# dkl 0.127 top1 0.635; int8-wo ppl 1.026 dkl 0.014 top1 0.854).
GATES_STRUCTURED = [
    ("s-int8-wo", QuantMode.use_weight_only(False), 0,
     1.06, 0.03, 0.70),
    # r5 (VERDICT item 8): tightened from (22.0, 2.0) — the r4 bounds were
    # ~2x measured, so a 1.9x quality regression would still have passed.
    # Re-measured r5 (CPU, bit-identical to r4: ppl 11.2601 dkl 1.2811
    # top1 0.1458); bounds now 1.5x measured, so a 1.5x regression trips.
    ("s-int4-g128", QuantMode.use_weight_only(True, per_group=True), 128,
     16.9, 1.92, 0.09),
    ("s-fp8", QuantMode.FP8_QDQ, 0,
     1.60, 0.26, 0.45),
]

GATES = [
    ("int8-wo", QuantMode.use_weight_only(False), 0,
     4.7e-2, 6.2e-2, 1.13, 0.55),
    ("sq-static", QuantMode.use_smooth_quant(), 0,
     2.7e-1, 3.2e-1, 1.80, 0.40),
    ("sq-ptpc", QuantMode.use_smooth_quant(per_token=True, per_channel=True),
     0, 1.2e-1, 1.5e-1, 1.25, 0.50),
    ("int8-kv", QuantMode.INT8_KV_CACHE, 0,
     0.0, 5.8e-2, 1.09, 0.60),
    ("int8-wo+kv",
     QuantMode.use_weight_only(False) | QuantMode.INT8_KV_CACHE, 0,
     4.7e-2, 1.15e-1, 1.23, 0.48),
]


@pytest.fixture(scope="module")
def golden():
    cfg, params, act_ranges, kv_scales, _ = build_golden_setup(
        hidden=1024, layers=8, heads=16, intermediate=2816, vocab=2048)
    prompts = np.random.default_rng(0).integers(3, 2048, (4, 48))
    ref = reference_run(cfg, params, prompts, cont_len=24)
    rows = {}
    for name, qm, gs, *_ in GATES:
        rows[name] = evaluate_quant_mode(
            cfg, params, name, qm, prompts, act_ranges=act_ranges,
            kv_scales=kv_scales, group_size=gs, cont_len=24, ref_run=ref)
    return rows


@pytest.fixture(scope="module")
def golden_structured():
    from trtllm_llama_tpu.quantization.evaluate import structure_weights
    cfg, params, _, _, _ = build_golden_setup(
        hidden=1024, layers=4, heads=16, intermediate=2816, vocab=2048)
    params = structure_weights(params)
    prompts = np.random.default_rng(0).integers(3, 2048, (4, 48))
    ref = reference_run(cfg, params, prompts, cont_len=24)
    rows = {}
    for name, qm, gs, *_ in GATES_STRUCTURED:
        rows[name] = evaluate_quant_mode(
            cfg, params, name, qm, prompts, group_size=gs, cont_len=24,
            ref_run=ref)
    return rows


@pytest.mark.parametrize("name,qm,gs,max_ppl,max_kl,min_top1",
                         GATES_STRUCTURED,
                         ids=[g[0] for g in GATES_STRUCTURED])
def test_midscale_structured_gate(golden_structured, name, qm, gs, max_ppl,
                                  max_kl, min_top1):
    row = golden_structured[name]
    assert row["ppl_ratio"] <= max_ppl, row
    assert row["decode_kl"] <= max_kl, row
    assert row["decode_top1"] >= min_top1, row


def test_midscale_structured_ordering(golden_structured):
    """Format-quality ordering at width: int8 tighter than fp8 (3
    mantissa bits) tighter than int4 (16 levels)."""
    assert (golden_structured["s-int8-wo"]["decode_kl"]
            < golden_structured["s-fp8"]["decode_kl"]
            < golden_structured["s-int4-g128"]["decode_kl"])


@pytest.mark.parametrize(
    "name,qm,gs,max_pre_kl,max_kl,max_ppl,min_top1",
    GATES, ids=[g[0] for g in GATES])
def test_midscale_gate(golden, name, qm, gs, max_pre_kl, max_kl, max_ppl,
                       min_top1):
    row = golden[name]
    assert row["prefill_kl"] <= max_pre_kl, row
    assert row["decode_kl"] <= max_kl, row
    assert row["ppl_ratio"] <= max_ppl, row
    assert row["decode_top1"] >= min_top1, row


def test_midscale_ordering(golden):
    """Scale-quality ordering must hold at depth: per-token SQ tighter than
    static SQ; int8-kv alone tighter than int8-wo+kv."""
    assert golden["sq-ptpc"]["decode_kl"] < golden["sq-static"]["decode_kl"]
    assert (golden["int8-kv"]["decode_kl"]
            < golden["int8-wo+kv"]["decode_kl"])
