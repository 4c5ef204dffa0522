#!/usr/bin/env python
"""HTTP client CLI (reference: src/tools/inferflow_client.cc driven by
bin/inferflow_client.ini)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inferflow_tpu.serving.client import InferFlowClient


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8080")
    ap.add_argument("--config", help="ini with [client] url/query keys")
    ap.add_argument("--query", default="Hello!")
    ap.add_argument("--system-prompt", default="")
    ap.add_argument("--max-output-len", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--openai", action="store_true")
    ap.add_argument("--stream", action="store_true")
    args = ap.parse_args()

    url, query = args.url, args.query
    if args.config:
        from inferflow_tpu.config import ConfigData
        cfg = ConfigData.load(args.config)
        url = cfg.get("client", "url", url)
        query = cfg.get("client", "query", query)

    client = InferFlowClient(url)
    if args.stream:
        for chunk in client.stream(query, args.max_output_len,
                                   openai=args.openai):
            if args.openai:
                delta = chunk["choices"][0]["delta"].get("content", "")
            else:
                delta = chunk.get("text", "")
            print(delta, end="", flush=True)
        print()
    else:
        resp = client.query(query, args.system_prompt, args.max_output_len,
                            args.temperature, openai=args.openai)
        if args.openai:
            print(resp["choices"][0]["message"]["content"])
        else:
            print(resp.get("text", ""))


if __name__ == "__main__":
    main()
