#!/bin/bash
# Round-5 TPU measurement chain — sequential solo processes.
# Usage: bash scripts/r5_tpu_chain.sh [vox|trace|bench|gates ...]
set -u
cd /root/repo
export JAX_PLATFORMS=
export PYTHONPATH=/root/repo:/root/.axon_site

steps=${@:-"trace"}

for step in $steps; do
  echo "=== $step $(date -u +%H:%M:%S) ===" >> /tmp/r5_chain.log
  case $step in
    vox)
      python scripts/prof_r6_vox.py >> /tmp/r5_vox.log 2>&1 ;;
    trace)
      python scripts/prof_r6_trace.py >> /tmp/r5_trace.log 2>&1 ;;
    bench)
      BENCH_PRESET=full BENCH_BACKEND=fast \
        python bench.py >> /tmp/r5_bench.log 2>&1 ;;
    gates)
      python scripts/run_gates.py >> /tmp/r5_gates.log 2>&1 ;;
  esac
  echo "=== $step done rc=$? $(date -u +%H:%M:%S) ===" >> /tmp/r5_chain.log
done
