"""End-to-end CLI tests: convert_checkpoint.py -> run.py -> summarize.py.

Reference analogue: the gpt example's end-to-end script test
(tests/model/test_gpt_e2e.py spawns build+run scripts).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A real on-disk HF checkpoint + trained-from-scratch BPE tokenizer."""
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import (LlamaConfig, LlamaForCausalLM,
                              PreTrainedTokenizerFast)

    d = tmp_path_factory.mktemp("ckpt")
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=256)
    LlamaForCausalLM(cfg).save_pretrained(d)

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=256, special_tokens=["<unk>", "<s>", "</s>"])
    corpus = ["the quick brown fox jumps over the lazy dog",
              "news article summary test text data model"] * 20
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                                   bos_token="<s>", eos_token="</s>",
                                   pad_token="<unk>")
    fast.save_pretrained(d)
    return str(d)


def run_cli(script, *args, timeout=300):
    env = dict(os.environ, TLLM_FORCE_CPU="1")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)
    assert res.returncode == 0, f"{script} failed:\n{res.stdout}\n{res.stderr}"
    return res.stdout


def test_convert_run_summarize(tiny_ckpt, tmp_path):
    eng = str(tmp_path / "engine")
    out = run_cli("convert_checkpoint.py", "--model_dir", tiny_ckpt,
                  "--output_dir", eng, "--use_weight_only",
                  "--weight_bits", "8", "--dtype", "float32")
    assert "engine written" in out

    out = run_cli("run.py", "--engine_dir", eng, "--tokenizer_dir", tiny_ckpt,
                  "--input_text", "the quick brown fox",
                  "--max_output_len", "8", "--max_input_len", "16")
    assert "Output:" in out

    data = str(tmp_path / "data.jsonl")
    with open(data, "w") as f:
        for _ in range(2):
            f.write(json.dumps({
                "article": "the quick brown fox jumps over the lazy dog "
                           "news article text data",
                "highlights": "fox jumps over dog"}) + "\n")
    out = run_cli("summarize.py", "--engine_dir", eng,
                  "--tokenizer_dir", tiny_ckpt, "--data_file", data,
                  "--max_ite", "2", "--max_input_len", "32",
                  "--output_len", "8")
    assert "rouge1" in out and "tokens/s" in out


def test_benchmark_cli(tiny_ckpt, tmp_path):
    eng = str(tmp_path / "engine")
    run_cli("convert_checkpoint.py", "--model_dir", tiny_ckpt,
            "--output_dir", eng, "--dtype", "float32")
    out = run_cli("benchmark.py", "--engine_dir", eng,
                  "--batch_sizes", "1,2", "--input_lens", "8",
                  "--output_len", "4", "--num_runs", "1")
    rows = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert len(rows) == 2 and all(r["tokens_per_s"] > 0 for r in rows)


def test_run_speculative_cli(tiny_ckpt, tmp_path):
    """run.py --draft_engine_dir: speculative output == plain greedy run."""
    eng = str(tmp_path / "engine")
    draft = str(tmp_path / "draft")
    run_cli("convert_checkpoint.py", "--model_dir", tiny_ckpt,
            "--output_dir", eng, "--dtype", "float32")
    # draft: the same tiny model weight-only-quantized (stand-in for a
    # genuinely smaller model; vocabularies must match)
    run_cli("convert_checkpoint.py", "--model_dir", tiny_ckpt,
            "--output_dir", draft, "--use_weight_only", "--weight_bits", "8",
            "--dtype", "float32")
    plain = run_cli("run.py", "--engine_dir", eng,
                    "--tokenizer_dir", tiny_ckpt,
                    "--input_text", "the quick brown fox",
                    "--max_output_len", "8", "--max_input_len", "16")
    spec = run_cli("run.py", "--engine_dir", eng,
                   "--tokenizer_dir", tiny_ckpt,
                   "--draft_engine_dir", draft, "--gamma", "3",
                   "--input_text", "the quick brown fox",
                   "--max_output_len", "8", "--max_input_len", "16")
    get = lambda s: [ln for ln in s.splitlines() if ln.startswith("Output:")]
    assert get(spec) == get(plain)
    # draft-free prompt-lookup speculation: same greedy output, no 2nd model
    lookup = run_cli("run.py", "--engine_dir", eng,
                     "--tokenizer_dir", tiny_ckpt,
                     "--prompt_lookup", "2", "--gamma", "3",
                     "--input_text", "the quick brown fox",
                     "--max_output_len", "8", "--max_input_len", "16")
    assert get(lookup) == get(plain)


@pytest.fixture(scope="module")
def tiny_mixtral_ckpt(tmp_path_factory, tiny_ckpt):
    """Tiny on-disk HF Mixtral checkpoint (tokenizer copied from tiny_ckpt)."""
    import shutil
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    d = tmp_path_factory.mktemp("mixtral_ckpt")
    torch.manual_seed(0)
    cfg = MixtralConfig(vocab_size=256, hidden_size=64, intermediate_size=96,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, num_local_experts=4,
                        num_experts_per_tok=2, max_position_embeddings=256)
    MixtralForCausalLM(cfg).save_pretrained(d)
    for f in os.listdir(tiny_ckpt):
        if "token" in f or f in ("special_tokens_map.json",):
            shutil.copy(os.path.join(tiny_ckpt, f), os.path.join(str(d), f))
    return str(d)


def test_convert_run_mixtral(tiny_mixtral_ckpt, tmp_path):
    """Family auto-detection: a Mixtral checkpoint converts into an engine
    dir tagged architecture=mixtral and run.py serves it via models/moe."""
    eng = str(tmp_path / "engine")
    out = run_cli("convert_checkpoint.py", "--model_dir", tiny_mixtral_ckpt,
                  "--output_dir", eng, "--dtype", "float32")
    assert "engine written" in out
    cfg = json.load(open(os.path.join(eng, "config.json")))["model_config"]
    assert cfg["architecture"] == "mixtral" and cfg["num_experts"] == 4
    out = run_cli("run.py", "--engine_dir", eng,
                  "--tokenizer_dir", tiny_mixtral_ckpt,
                  "--input_text", "the quick brown fox",
                  "--max_output_len", "8", "--max_input_len", "16")
    assert "Output:" in out
