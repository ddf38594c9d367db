"""CLI: CNN/DailyMail summarization accuracy + latency benchmark.

The reference's north-star evaluation (examples/llama/summarize.py,
examples/llama_quant/summarize.py): summarize test articles with the engine
(greedy, matching the reference's batch 1 / max input 923 / output 100),
optionally the HF baseline, and report ROUGE + total latency.

Zero-egress note: pass --dataset_path to a locally saved cnn_dailymail copy
(datasets.load_from_disk format) or --data_file as JSONL with
{"article": ..., "highlights": ...} rows.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TLLM_FORCE_CPU"):
    # the environment's sitecustomize force-registers the TPU backend;
    # config.update is the only reliable override (see tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")
import json
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--engine_dir", required=True)
    p.add_argument("--tokenizer_dir", required=True)
    p.add_argument("--dataset_path", default=None,
                   help="datasets.load_from_disk dir of cnn_dailymail test")
    p.add_argument("--data_file", default=None, help="JSONL fallback")
    p.add_argument("--max_ite", type=int, default=20,
                   help="number of batches (reference default 20)")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_input_len", type=int, default=923)
    p.add_argument("--output_len", type=int, default=100)
    p.add_argument("--test_hf", action="store_true",
                   help="also run the HF CPU/torch baseline")
    p.add_argument("--hf_model_dir", default=None)
    p.add_argument("--check_accuracy", action="store_true")
    p.add_argument("--prompt_lookup", type=int, default=0, metavar="NGRAM",
                   help="draft-free speculative decoding via n-gram lookup "
                        "over the article — summaries copy spans, so this "
                        "is the workload it accelerates (greedy-exact: "
                        "ROUGE unchanged by construction)")
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--rouge1_threshold", type=float, default=None,
                   help="assert rouge1 >= threshold (reference tensorrt_llm_rouge1_threshold)")
    return p.parse_args()


def load_articles(args):
    if args.data_file:
        rows = [json.loads(l) for l in open(args.data_file) if l.strip()]
        return [(r["article"], r["highlights"]) for r in rows]
    if args.dataset_path:
        import datasets
        ds = datasets.load_from_disk(args.dataset_path)
        if hasattr(ds, "keys") and "test" in ds:
            ds = ds["test"]
        return [(r["article"], r["highlights"]) for r in ds]
    raise SystemExit("need --dataset_path or --data_file (zero-egress env)")


def rouge_scores(preds, refs):
    from rouge_score import rouge_scorer, scoring
    scorer = rouge_scorer.RougeScorer(
        ["rouge1", "rouge2", "rougeL", "rougeLsum"], use_stemmer=True)
    agg = scoring.BootstrapAggregator()
    for p, r in zip(preds, refs):
        agg.add_scores(scorer.score(r, p))
    result = agg.aggregate()
    return {k: v.mid.fmeasure * 100 for k, v in result.items()}


_PROMPT = ("Summarize the following news article:\n{article}\n"
           "Summary:\n")


def main():
    args = parse_args()
    from transformers import AutoTokenizer

    from trtllm_llama_tpu.config import EngineConfig
    from trtllm_llama_tpu.convert.serialize import load_engine
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    from trtllm_llama_tpu.runtime.session import GenerationSession
    from trtllm_llama_tpu.utils.profiler import Timer

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_dir)
    articles = load_articles(args)[: args.max_ite * args.batch_size]

    cfg, params, kv_scales = load_engine(args.engine_dir)
    ecfg = EngineConfig(max_batch_size=args.batch_size,
                        max_input_len=args.max_input_len,
                        max_seq_len=args.max_input_len + args.output_len,
                        prefill_buckets=(args.max_input_len,))
    if args.prompt_lookup:
        from trtllm_llama_tpu.runtime.speculative import PromptLookupSession
        sess = PromptLookupSession(cfg, params, ecfg, gamma=args.gamma,
                                   ngram=args.prompt_lookup,
                                   kv_scales=kv_scales)
    else:
        sess = GenerationSession(cfg, params, ecfg, kv_scales=kv_scales)
    scfg = SamplingConfig(top_k=1, end_id=(tokenizer.eos_token_id
                                  if tokenizer.eos_token_id is not None
                                  else 2),
                          pad_id=tokenizer.pad_token_id or 0)

    # warmup compile outside the timed region (TRT pays this at build time)
    sess.generate([[1, 2, 3]], sampling=scfg, max_new_tokens=args.output_len)

    preds, refs = [], []
    timer = Timer()
    timer.start("tpu_engine")
    for i in range(0, len(articles), args.batch_size):
        batch = articles[i:i + args.batch_size]
        prompts = [_PROMPT.format(article=a) for a, _ in batch]
        ids = [tokenizer(p, truncation=True,
                         max_length=args.max_input_len).input_ids
               for p in prompts]
        out = sess.generate(ids, sampling=scfg,
                            max_new_tokens=args.output_len)
        for j, (_, ref) in enumerate(batch):
            text = tokenizer.decode(out.output_ids[j][:out.lengths[j]],
                                    skip_special_tokens=True)
            preds.append(text.split("\n")[0])
            refs.append(ref)
    tpu_s = timer.stop("tpu_engine")

    print(f"TPU engine: {len(preds)} summaries in {tpu_s:.3f} s "
          f"({len(preds) * args.output_len / tpu_s:.2f} tokens/s)")
    scores = rouge_scores(preds, refs)
    for k, v in scores.items():
        print(f"  {k}: {v:.4f}")

    if args.test_hf:
        import torch
        from transformers import LlamaForCausalLM
        hf_dir = args.hf_model_dir or args.tokenizer_dir
        hf = LlamaForCausalLM.from_pretrained(hf_dir).eval()
        hf_preds = []
        timer.start("hf")
        with torch.no_grad():
            for a, _ in articles:
                ids = tokenizer(_PROMPT.format(article=a), truncation=True,
                                max_length=args.max_input_len,
                                return_tensors="pt")
                o = hf.generate(ids.input_ids, do_sample=False,
                                max_new_tokens=args.output_len,
                                pad_token_id=0)
                hf_preds.append(tokenizer.decode(
                    o[0][ids.input_ids.shape[1]:],
                    skip_special_tokens=True).split("\n")[0])
        hf_s = timer.stop("hf")
        print(f"HF baseline: {hf_s:.3f} s (speedup {hf_s / tpu_s:.3f}x)")
        hf_scores = rouge_scores(hf_preds, refs)
        for k in scores:
            print(f"  {k}: hf {hf_scores[k]:.4f} "
                  f"(delta {hf_scores[k] - scores[k]:+.4f})")

    if args.check_accuracy and args.rouge1_threshold is not None:
        assert scores["rouge1"] >= args.rouge1_threshold, (
            f"rouge1 {scores['rouge1']:.3f} < {args.rouge1_threshold}")
        print(f"accuracy check passed: rouge1 >= {args.rouge1_threshold}")


if __name__ == "__main__":
    main()
