"""Minimal HTTP serving front-end over ServingEngine (continuous batching).

The reference's serving story ends at the closed-source batch manager with
a Triton backend; here the open scheduler gets an open front-end — stdlib
only, one engine thread owning the device, HTTP handlers talking to it
through a queue.

  POST /generate   {"prompt": "...", "max_new_tokens": 64,
                    "temperature": 1.0, "top_k": 0, "top_p": 0.0,
                    "stop": [[13]], "bad_words": [[12, 7]],
                    "stream": false, "logprobs": false}
    stop / bad_words are token-id sequences; bad_words needs the server
    started with --max_bad_words N.
    -> {"request_id", "text", "output_ids", "finished_reason"[, "logprobs"]}
    stream=true -> chunked JSON-lines, one {"token_ids": [...], "text_delta"}
    per engine chunk, final line carries "finished_reason".
  GET  /health     -> {"status": "ok", "active", "queued"}

Run:  python examples/serve_http.py --engine_dir E --tokenizer_dir T --port 8080
"""

import argparse
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TLLM_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


class EngineWorker(threading.Thread):
    """Single thread owning the ServingEngine: drains submissions, steps the
    engine while work exists, publishes per-request progress snapshots."""

    def __init__(self, engine):
        super().__init__(daemon=True)
        self.engine = engine
        self._submit_q = queue.Queue()
        self._lock = threading.Lock()
        self._progress = {}        # rid -> list of tokens so far
        self._logprobs = {}        # rid -> list of floats so far
        self._finished = {}        # rid -> FinishedRequest
        self._wake = threading.Event()
        self._stop = False
        self._fault = None

    def submit(self, input_ids, max_new_tokens, sampling=None):
        done = threading.Event()
        box = {}
        self._submit_q.put(("submit",
                            (input_ids, max_new_tokens, sampling), box,
                            done))
        self._wake.set()
        done.wait()
        if "error" in box:
            raise ValueError(box["error"])
        return box["rid"]

    def cancel(self, rid):
        """Cancel an in-flight request (client disconnected mid-stream) —
        routed through the engine thread like every other engine call."""
        self._submit_q.put(("cancel", rid, None, None))
        self._wake.set()

    def snapshot(self, rid):
        with self._lock:
            fin = self._finished.get(rid)
            toks = list(self._progress.get(rid, []))
            lps = list(self._logprobs.get(rid, []))
        return toks, lps, fin

    def claim_finished(self, rid):
        """Final read: returns the FinishedRequest and evicts all state for
        rid (long-running servers must not accumulate every past request)."""
        with self._lock:
            fin = self._finished.pop(rid, None)
            self._progress.pop(rid, None)
            self._logprobs.pop(rid, None)
        return fin

    def shutdown(self):
        self._stop = True
        self._wake.set()

    def run(self):
        eng = self.engine
        while not self._stop:
            drained = False
            while True:
                try:
                    op, payload, box, done = self._submit_q.get_nowait()
                except queue.Empty:
                    break
                drained = True
                if op == "cancel":
                    try:
                        eng.cancel(payload)
                    except Exception:       # already finished/unknown: fine
                        pass
                    with self._lock:
                        self._progress.pop(payload, None)
                        self._logprobs.pop(payload, None)
                        self._finished.pop(payload, None)
                    continue
                ids, mnt, scfg = payload
                try:
                    box["rid"] = eng.submit(ids, mnt, sampling=scfg)
                except Exception as e:      # reject THIS request, stay alive
                    box["error"] = str(e)
                done.set()
            if eng.scheduler.has_work:
                try:
                    finished = eng.step()
                except Exception as e:      # engine fault: fail pending work
                    import traceback
                    traceback.print_exc(file=sys.stderr)
                    with self._lock:
                        for req in eng.scheduler.active_requests():
                            eng.scheduler.cancel(req.request_id)
                        self._fault = str(e)
                    continue
                with self._lock:
                    for req in eng.scheduler.active_requests():
                        self._progress[req.request_id] = list(req.output_ids)
                        if eng.return_logprobs:
                            self._logprobs[req.request_id] = (
                                eng.poll_logprobs(req.request_id))
                    for fr in finished:
                        self._progress[fr.request_id] = list(fr.output_ids)
                        if fr.logprobs is not None:
                            self._logprobs[fr.request_id] = list(fr.logprobs)
                        self._finished[fr.request_id] = fr
            elif not drained:
                self._wake.wait(timeout=0.05)
                self._wake.clear()


def make_handler(worker, tokenizer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"   # chunked framing needs 1.1

        def log_message(self, *a):   # quiet
            pass

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/health":
                return self._json(404, {"error": "not found"})
            sch = worker.engine.scheduler
            self._json(200, {"status": "ok", "active": sch.num_active,
                             "queued": sch.num_queued})

        def do_POST(self):
            if self.path != "/generate":
                return self._json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if "input_ids" in req:
                    ids = [int(t) for t in req["input_ids"]]
                else:
                    ids = tokenizer(req["prompt"]).input_ids
                mnt = int(req.get("max_new_tokens", 64))
                scfg = None
                wants_sampling = any(k in req for k in
                                     ("temperature", "top_k", "top_p",
                                      "stop", "bad_words"))

                def _word_lists(key):
                    # token-id sequences: [[1,2],[7]] (strings would need
                    # the tokenizer's exact ids; keep the API unambiguous)
                    return tuple(tuple(int(t) for t in w)
                                 for w in req.get(key, ()))

                if worker.engine.per_request:
                    from trtllm_llama_tpu.runtime.sampling import (
                        SamplingConfig)
                    base = worker.engine.scfg
                    scfg = SamplingConfig(
                        end_id=base.end_id, pad_id=base.pad_id,
                        temperature=float(req.get("temperature", 1.0)),
                        top_k=int(req.get("top_k", 0)),
                        top_p=float(req.get("top_p", 0.0)),
                        stop_words=_word_lists("stop"),
                        bad_words=_word_lists("bad_words"))
                elif wants_sampling:
                    return self._json(400, {
                        "error": "server started without "
                                 "--per_request_sampling; per-request "
                                 "temperature/top_k/top_p/stop/bad_words "
                                 "unavailable"})
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": str(e)})

            try:
                rid = worker.submit(ids, mnt, scfg)
            except ValueError as e:        # e.g. exceeds max_seq_len
                return self._json(400, {"error": str(e)})
            if req.get("stream"):
                return self._stream(rid)
            while True:
                _, lps, fin = worker.snapshot(rid)
                if fin is not None:
                    break
                time.sleep(0.01)
            worker.claim_finished(rid)
            out = {"request_id": rid, "output_ids": fin.output_ids,
                   "text": tokenizer.decode(fin.output_ids),
                   "finished_reason": fin.finished_reason}
            if req.get("logprobs") and fin.logprobs is not None:
                out["logprobs"] = fin.logprobs
            self._json(200, out)

        def _stream(self, rid):
            self.send_response(200)
            self.send_header("Content-Type", "application/jsonl")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def emit(obj):
                line = (json.dumps(obj) + "\n").encode()
                self.wfile.write(f"{len(line):x}\r\n".encode() + line
                                 + b"\r\n")

            sent = 0
            sent_text = ""
            try:
                while True:
                    toks, _, fin = worker.snapshot(rid)
                    if len(toks) > sent:
                        # cumulative decode: subword/byte tokens only render
                        # correctly in context, so the delta is the SUFFIX of
                        # decode(all tokens so far), not decode(new tokens)
                        full = tokenizer.decode(toks)
                        emit({"token_ids": toks[sent:],
                              "text_delta": full[len(sent_text):]})
                        sent, sent_text = len(toks), full
                    if fin is not None:
                        emit({"finished_reason": fin.finished_reason,
                              "n_tokens": len(fin.output_ids)})
                        break
                    time.sleep(0.01)
                self.wfile.write(b"0\r\n\r\n")
                worker.claim_finished(rid)
            except (BrokenPipeError, ConnectionResetError):
                # client went away: stop generating, free the slot
                worker.cancel(rid)

    return Handler


def build_server(engine, tokenizer, port: int = 0):
    """(server, worker) — worker started, server ready for serve_forever."""
    worker = EngineWorker(engine)
    worker.start()
    srv = ThreadingHTTPServer(("127.0.0.1", port),
                              make_handler(worker, tokenizer))
    return srv, worker


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--engine_dir", required=True)
    p.add_argument("--tokenizer_dir", required=True)
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max_batch_size", type=int, default=8)
    p.add_argument("--max_input_len", type=int, default=1024)
    p.add_argument("--max_seq_len", type=int, default=2048)
    p.add_argument("--decode_chunk", type=int, default=8)
    p.add_argument("--prefill_chunk", type=int, default=None)
    p.add_argument("--per_request_sampling", action="store_true")
    p.add_argument("--max_bad_words", type=int, default=0,
                   help="per-request bad_words capacity (words per request;"
                        " needs --per_request_sampling)")
    p.add_argument("--max_bad_word_len", type=int, default=4)
    p.add_argument("--logprobs", action="store_true")
    p.add_argument("--draft_engine_dir", default=None,
                   help="engine dir of a small draft model: serve with "
                        "speculative decoding (greedy by default; with "
                        "--per_request_sampling, per-request temperature/"
                        "top_k/top_p run rejection-sampling verification)")
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--prompt_lookup", type=int, default=0, metavar="NGRAM",
                   help="serve with DRAFT-FREE prompt-lookup speculative "
                        "decoding (n-gram proposals from each request's "
                        "own history; greedy-only, no draft model needed)")
    args = p.parse_args()
    if args.draft_engine_dir and args.prompt_lookup:
        raise SystemExit("--draft_engine_dir and --prompt_lookup are "
                         "mutually exclusive speculative modes")

    from transformers import AutoTokenizer
    from trtllm_llama_tpu.config import EngineConfig
    from trtllm_llama_tpu.convert.serialize import load_engine
    from trtllm_llama_tpu.runtime.sampling import SamplingConfig
    from trtllm_llama_tpu.runtime.serving import ServingEngine

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_dir)
    cfg, params, kv_scales = load_engine(args.engine_dir)
    ecfg = EngineConfig(max_batch_size=args.max_batch_size,
                        max_input_len=args.max_input_len,
                        max_seq_len=args.max_seq_len)
    scfg = SamplingConfig(
        end_id=(tokenizer.eos_token_id
                if tokenizer.eos_token_id is not None else -1))
    if args.prompt_lookup:
        from trtllm_llama_tpu.runtime.serving_spec import (
            PromptLookupServingEngine)
        engine = PromptLookupServingEngine(
            cfg, params, ecfg, gamma=args.gamma, ngram=args.prompt_lookup,
            sampling=scfg, kv_scales=kv_scales,
            decode_chunk=args.decode_chunk,
            return_logprobs=args.logprobs)
    elif args.draft_engine_dir:
        from trtllm_llama_tpu.runtime.serving_spec import (
            SpeculativeServingEngine)
        dcfg, dparams, dkv = load_engine(args.draft_engine_dir)
        engine = SpeculativeServingEngine(
            cfg, params, dcfg, dparams, ecfg, gamma=args.gamma,
            sampling=scfg, kv_scales=kv_scales, draft_kv_scales=dkv,
            decode_chunk=args.decode_chunk,
            per_request_sampling=args.per_request_sampling,
            return_logprobs=args.logprobs)
    else:
        engine = ServingEngine(
            cfg, params, ecfg, sampling=scfg,
            kv_scales=kv_scales, decode_chunk=args.decode_chunk,
            prefill_chunk=args.prefill_chunk,
            per_request_sampling=args.per_request_sampling,
            max_bad_words=args.max_bad_words,
            max_bad_word_len=args.max_bad_word_len,
            return_logprobs=args.logprobs)
    srv, _ = build_server(engine, tokenizer, args.port)
    print(f"serving on http://127.0.0.1:{srv.server_address[1]}  "
          f"(POST /generate, GET /health)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
