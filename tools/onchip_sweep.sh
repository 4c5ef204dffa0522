#!/bin/bash
# One-shot real-chip measurement sweep (run when the TPU tunnel is up).
# Strictly sequential: the chip wedges under concurrent jobs
# (.claude/skills/verify/SKILL.md).  Logs land in /tmp/sweep_*.log.
set -u
cd "$(dirname "$0")/.."
ENV="PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  env $ENV timeout "${SWEEP_TIMEOUT:-1800}" "$@" > "/tmp/sweep_$name.log" 2>&1
  rc=$?
  tail -4 "/tmp/sweep_$name.log"
  echo "=== $name rc=$rc"
}

# 1. kernel parity gate + mega-kernel parity/timing + i8mm rate
run kb python tools/kernel_bench.py --formats Q8_B32T2,Q4_B64T1,Q3H_B64T1 \
    --k 4096 --n 4096 --attention --i8mm --mega

# 2. headline + context sweep
run t1k python bench.py
INFERFLOW_BENCH_CTX=4096 run t4k python bench.py

# 3. device-layout A/B (bytes-for-VPU-ops trades)
INFERFLOW_BENCH_LAYOUT=i4 run i4 python bench.py
INFERFLOW_BENCH_LAYOUT=q8c run q8c python bench.py
INFERFLOW_BENCH_LAYOUT=i8mm run i8mm python bench.py
run kb_i4 python tools/kernel_bench.py --skip-perf --formats Q8_B32T2 \
    --k 1024 --n 1024 --mega --mega-layout i4

# 4. the BASELINE.md primary configs
INFERFLOW_BENCH_MODEL=llama2-7b run 7b python bench.py
INFERFLOW_BENCH_MODEL=llama2-13b SWEEP_TIMEOUT=3600 run 13b python bench.py

# 5. routed-MoE decode: bytes/step must scale with top_k/E, not E
INFERFLOW_BENCH_MODEL=mixtral-scaled run moe python bench.py

echo "sweep complete $(date +%H:%M:%S)"
