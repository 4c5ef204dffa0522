#!/usr/bin/env python
"""Batch inference CLI (reference: src/tools/llm_inference.cc).

Drives AddQuery/Infer/Commit over an ini-driven query list (including a
dynamic-batching list), prints generated text and tokens/sec
(llm_inference.cc:454-457).

Usage:
  python tools/llm_inference.py --config <ini>          # ini-driven
  python tools/llm_inference.py --model-dir <dir> [--spec model_spec.json]
      [--quant Q4_B64T1] [--prompt "..."] [--max-new 128] [--batch-queries N]
  python tools/llm_inference.py --zoo tinyllama-1.1b --quant Q4_B64T1
      [--synthetic]                                      # synthetic bench
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_engine(args):
    from inferflow_tpu.models.spec import ModelSpec
    from inferflow_tpu.runtime.engine import InferenceEngine

    if args.zoo:
        from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
        spec = make_spec(args.zoo)
        params = make_synthetic_params(spec,
                                       weight_format=args.quant or None,
                                       stacked=True)
        return InferenceEngine(spec, params,
                               max_concurrent_queries=args.max_queries), None

    if args.config:
        from inferflow_tpu.config import load_engine_config
        ec = load_engine_config(args.config)
        spec = ec.model
        if spec is None:
            sys.exit("no model configured")
        max_q = ec.max_concurrent_queries
    else:
        from inferflow_tpu.config.model_spec import load_model_spec
        spec_path = os.path.join(args.model_dir,
                                 args.spec or "model_spec.json")
        spec = load_model_spec(spec_path)
        spec.dir = args.model_dir
        max_q = args.max_queries
    if args.quant:
        spec.device_weight_data_type = args.quant

    from inferflow_tpu.loaders.model_loader import load_model
    from inferflow_tpu.tokenizer.loading import load_tokenizer
    t0 = time.time()
    params = load_model(spec)
    print(f"# model loaded in {time.time() - t0:.1f}s", file=sys.stderr)
    tok = load_tokenizer(spec)
    if tok is None and spec.model_file_format == "llama2.c":
        from inferflow_tpu.loaders.llama2c import load_llama2c_tokenizer
        tk_path = os.path.join(spec.dir, spec.tokenizer_files[0]) \
            if spec.tokenizer_files else ""
        if os.path.isfile(tk_path):
            from inferflow_tpu.tokenizer.tokenizer import Tokenizer
            v = load_llama2c_tokenizer(tk_path, spec.hyper_params.vocab_size)
            tok = Tokenizer(v, "bpe")
    from inferflow_tpu.runtime.engine import InferenceEngine
    eng = InferenceEngine(spec, params, max_concurrent_queries=max_q,
                          tokenizer=tok,
                          vocab=tok.vocab if tok else None)
    return eng, tok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="service ini")
    ap.add_argument("--model-dir", help="model directory")
    ap.add_argument("--spec", help="model_spec.json filename")
    ap.add_argument("--zoo", help="synthetic zoo model name")
    ap.add_argument("--quant", default="", help="weight format override")
    ap.add_argument("--prompt", action="append", default=[])
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--max-queries", type=int, default=8)
    ap.add_argument("--strategy", default="greedy")
    ap.add_argument("--temperature", type=float, default=1.0)
    args = ap.parse_args()

    from inferflow_tpu.sampling.strategies import SamplingOptions
    eng, tok = build_engine(args)

    prompts = args.prompt or ["Once upon a time"]
    opts = SamplingOptions(strategy=args.strategy,
                           temperature=args.temperature)

    # dynamic batching: add all queries, run the engine loop
    qids = []
    for p in prompts:
        if tok is None and not args.config and args.zoo:
            q = eng.add_query(list(range(1, 17)), opts, args.max_new)
        else:
            q = eng.add_query(p, opts, args.max_new)
        if q > 0:
            qids.append((q, p))
        else:
            print(f"# query rejected ({q}): {p!r}", file=sys.stderr)

    t0 = time.time()
    steps = 0
    while eng.has_work():
        eng.commit_inference_result(eng.infer())
        steps += 1
    dt = time.time() - t0

    total_tokens = 0
    for qid, p in qids:
        toks = eng.query_tokens(qid)
        total_tokens += len(toks)
        text = eng.tokenizer.decode(toks) if eng.tokenizer else str(toks)
        print(f"=== query {qid}: {p!r}\n{text}\n")
    print(f"# {total_tokens} tokens in {dt:.2f}s -> "
          f"{total_tokens / max(dt, 1e-9):.2f} tokens/sec "
          f"({steps} engine steps)", file=sys.stderr)


if __name__ == "__main__":
    main()
