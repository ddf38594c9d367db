"""Quantization-accuracy metrics: the zero-egress substitute for the
reference's ROUGE contract.

The reference gates every quantized engine on CNN/DailyMail ROUGE vs the FP16
HF baseline (examples/llama/summarize.py:251-323; README.md:919-921 adopts
"rouge delta <= ~1"). This environment has no LLaMA checkpoint (zero egress),
so we gate on the quantity ROUGE is a proxy for: how much the quantized
model's predictive distribution moves away from the fp32 model's, measured at
golden-model scale on the exact engine code paths (prefill + decode, same
kernels the bench runs).

Metrics per (quant-mode, eval batch):
  - top1_agree: fraction of positions where argmax(quant) == argmax(fp32).
    The greedy-decoding metric: directly bounds how quickly sampled outputs
    diverge.
  - kl: mean KL(fp32 || quant) of the next-token softmax, in nats. The
    distribution-shift metric that ROUGE-delta tracks.
  - ppl_ratio: exp(mean NLL_quant - mean NLL_fp32) on held-out continuations
    scored teacher-forced under the fp32 model's own samples — the
    perplexity-delta gate VERDICT asks for (>1 means the quantized model is
    worse at predicting what the fp32 model considers likely).
  - max_abs_err: worst-case logit perturbation (diagnostic, not gated).
"""

from __future__ import annotations

import numpy as np


def _log_softmax(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.float64)
    m = x.max(axis=-1, keepdims=True)
    s = x - m
    return s - np.log(np.exp(s).sum(axis=-1, keepdims=True))


def logit_metrics(ref_logits: np.ndarray, test_logits: np.ndarray) -> dict:
    """Compare two [..., V] logit arrays position-wise.

    Returns {'top1_agree', 'kl', 'max_abs_err'} with kl = mean over positions
    of KL(softmax(ref) || softmax(test)).
    """
    ref = np.asarray(ref_logits, np.float64)
    test = np.asarray(test_logits, np.float64)
    assert ref.shape == test.shape, (ref.shape, test.shape)
    top1 = float((ref.argmax(-1) == test.argmax(-1)).mean())
    lp_ref = _log_softmax(ref)
    lp_test = _log_softmax(test)
    kl = float((np.exp(lp_ref) * (lp_ref - lp_test)).sum(-1).mean())
    return {
        "top1_agree": top1,
        "kl": kl,
        "max_abs_err": float(np.abs(ref - test).max()),
    }


def nll(logits: np.ndarray, targets: np.ndarray) -> float:
    """Mean negative log-likelihood of targets [...,] under logits [..., V]."""
    lp = _log_softmax(np.asarray(logits, np.float64))
    t = np.asarray(targets)
    picked = np.take_along_axis(lp, t[..., None], axis=-1)[..., 0]
    return float(-picked.mean())


def ppl_ratio(ref_logits: np.ndarray, test_logits: np.ndarray,
              targets: np.ndarray) -> float:
    """exp(NLL_test - NLL_ref) on the same targets: >1.0 = quantized model is
    worse. This is the perplexity-delta gate in ratio form (scale-free, so one
    threshold works across model sizes)."""
    return float(np.exp(nll(test_logits, targets) - nll(ref_logits, targets)))
