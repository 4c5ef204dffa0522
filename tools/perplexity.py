#!/usr/bin/env python
"""Perplexity harness (reference: src/tools/perplexity.cc + bin/perplexity.ini).

Protocol: tokenize the whole corpus, slice into windows of `max_length`
with `stride`, run the forward pass per window, accumulate next-token NLL
via log-softmax over positions [first_eval, window_end), report
PPL +/- stderr (perplexity.cc:100-157, 278-287).

Usage:
  python tools/perplexity.py --model-dir <dir> [--quant Q4] \
      --text data/wiki.test.raw [--max-length 512] [--stride 512]
  python tools/perplexity.py --zoo tinyllama-1.1b --quant Q4 --synthetic-text
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def compute_ppl(forward_fn, tokens, max_length=512, stride=512,
                progress=True):
    """forward_fn(window_tokens: (1, T) int32) -> logits (1, T, V) f32.

    Returns (ppl, stderr, nll_list).  Mirrors perplexity.cc: for each
    window starting at `begin`, evaluate positions [prev_end, end) via
    teacher forcing; NLL of token t+1 given logits at t."""
    import jax.numpy as jnp
    import jax

    n = len(tokens)
    nlls = []
    prev_end = 0
    begin = 0
    t0 = time.time()
    while begin + 1 < n:
        end = min(begin + max_length, n)
        window = np.asarray(tokens[begin:end], np.int32)[None, :]
        logits = np.asarray(forward_fn(window), np.float32)[0]
        first_eval = max(prev_end - begin, 1)
        # log-softmax NLL for positions first_eval..end-begin-1
        for pos in range(first_eval, end - begin):
            row = logits[pos - 1]
            row = row - row.max()
            lse = math.log(np.exp(row, dtype=np.float64).sum())
            nlls.append(lse - float(row[window[0, pos]]))
        prev_end = end
        if end == n:
            break
        begin += stride
        if progress:
            print(f"\r# {end}/{n} tokens, interim ppl "
                  f"{math.exp(np.mean(nlls)):.4f}", end="", file=sys.stderr)
    if progress:
        print(f"\n# eval took {time.time() - t0:.1f}s", file=sys.stderr)
    nll = np.asarray(nlls)
    ppl = math.exp(nll.mean())
    stderr = ppl * nll.std(ddof=1) / math.sqrt(len(nll))
    return ppl, stderr, nlls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir")
    ap.add_argument("--spec", default="model_spec.json")
    ap.add_argument("--zoo")
    ap.add_argument("--quant", default="")
    ap.add_argument("--text", help="corpus file (e.g. wiki.test.raw)")
    ap.add_argument("--synthetic-text", action="store_true")
    ap.add_argument("--max-length", type=int, default=512)
    ap.add_argument("--stride", type=int, default=512)
    ap.add_argument("--max-tokens", type=int, default=0,
                    help="cap corpus tokens (0 = all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from inferflow_tpu.models.decoder import decoder_forward_scan

    if args.zoo:
        from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
        spec = make_spec(args.zoo)
        params = make_synthetic_params(spec, weight_format=args.quant or None,
                                       stacked=True)
        tok = None
    else:
        from inferflow_tpu.config.model_spec import load_model_spec
        from inferflow_tpu.loaders.model_loader import load_model
        from inferflow_tpu.tokenizer.loading import load_tokenizer
        spec = load_model_spec(os.path.join(args.model_dir, args.spec))
        spec.dir = args.model_dir
        if args.quant:
            spec.device_weight_data_type = args.quant
        params = load_model(spec)
        tok = load_tokenizer(spec)

    if args.synthetic_text or not args.text:
        rng = np.random.default_rng(0)
        tokens = rng.integers(4, spec.hyper_params.vocab_size - 1,
                              size=4096).tolist()
    else:
        with open(args.text, encoding="utf-8") as fh:
            text = fh.read()
        if tok is None:
            sys.exit("corpus eval needs a tokenizer")
        tokens = tok.tokenize(text, add_bos=True)
    if args.max_tokens:
        tokens = tokens[:args.max_tokens]
    print(f"# corpus: {len(tokens)} tokens", file=sys.stderr)

    @jax.jit
    def fwd(window):
        pos = jnp.arange(window.shape[1], dtype=jnp.int32)[None, :]
        logits, _ = decoder_forward_scan(spec, params, window, pos, None)
        return logits

    ppl, stderr, nlls = compute_ppl(fwd, tokens, args.max_length, args.stride)
    print(f"PPL = {ppl:.4f} +/- {stderr:.4f}  "
          f"({len(nlls)} scored tokens)")


if __name__ == "__main__":
    main()
