#!/usr/bin/env python
"""HTTP service entrypoint (reference: src/service/inferflow_service_main.cc
+ bin/inferflow_service.ini).

Usage:
  python tools/inferflow_service.py --config bin/inferflow_service.ini
  python tools/inferflow_service.py --zoo tinyllama-1.1b --quant Q4 --port 8080
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="service ini")
    ap.add_argument("--zoo", help="synthetic zoo model (no checkpoint)")
    ap.add_argument("--quant", default="")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--max-queries", type=int, default=8)
    # multi-host serving (parallel/mesh.py): launch this binary on every
    # host with the same --coordinator and its own --process-id
    ap.add_argument("--coordinator", default="",
                    help="host0:port for jax.distributed multi-host init")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    args = ap.parse_args()

    if args.coordinator:
        from inferflow_tpu.parallel.mesh import init_distributed
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)

    from inferflow_tpu.runtime.engine import InferenceEngine
    from inferflow_tpu.runtime import make_engine
    from inferflow_tpu.serving import InferFlowService

    port = args.port
    template = ""
    name = "inferflow-tpu"
    if args.config:
        from inferflow_tpu.config import load_engine_config
        ec = load_engine_config(args.config)
        eng = make_engine(ec)
        port = port or ec.http_port
        spec = ec.model
        template = spec.decoder_input_template or ec.default_prompt_template
        name = spec.sid or name
    elif args.zoo:
        from inferflow_tpu.models.zoo import make_spec, make_synthetic_params
        spec = make_spec(args.zoo)
        params = make_synthetic_params(spec, weight_format=args.quant or None,
                                       stacked=True)
        eng = InferenceEngine(spec, params,
                              max_concurrent_queries=args.max_queries)
        name = args.zoo
        port = port or 8080
    else:
        sys.exit("need --config or --zoo")

    if hasattr(eng, "warmup"):
        # pre-compile the prefill buckets so the first prompt doesn't pay
        # compile latency (PLAN: per-bucket compile-cache warmup)
        print("# warming up prefill buckets...", file=sys.stderr)
        eng.warmup()
    svc = InferFlowService(eng, port=port, prompt_template=template,
                           model_name=name)
    print(f"# serving {name} on http://0.0.0.0:{svc.port} "
          f"(POST / or /v1/chat/completions)", file=sys.stderr)
    try:
        svc.start(block=True)
    except KeyboardInterrupt:
        svc.stop()


if __name__ == "__main__":
    main()
