#!/bin/bash
# Round-3 TPU measurement chain — run as the ONLY TPU user on the box.
# Sequential solo processes (CLAUDE.md discipline: one TPU process at a
# time, never kill mid-work):
#   1. prof_r3 stages V2,H2,H3,J2  -> /tmp/r3_prof.jsonl
#   2. bench.py full preset        -> /tmp/r3_bench.json
#   3. run_gates.py full scale     -> /tmp/r3_gates.jsonl
# Usage:  bash scripts/r3_tpu_chain.sh [prof|bench|gates ...]
set -u
cd /root/repo
export JAX_PLATFORMS=
export PYTHONPATH=/root/repo:/root/.axon_site

steps=${@:-"prof bench gates"}

for step in $steps; do
  case $step in
    prof)
      echo "=== prof $(date -u +%H:%M:%S) ===" >> /tmp/r3_chain.log
      PROF_STAGES=V2,H2,H3,J2,T PROF_RUNS=3 \
        python scripts/prof_r3.py > /tmp/r3_prof.jsonl 2> /tmp/r3_prof.err
      echo "prof exit=$?" >> /tmp/r3_chain.log ;;
    bench)
      echo "=== bench $(date -u +%H:%M:%S) ===" >> /tmp/r3_chain.log
      python bench.py > /tmp/r3_bench.json 2> /tmp/r3_bench.err
      echo "bench exit=$?" >> /tmp/r3_chain.log ;;
    gates)
      echo "=== gates $(date -u +%H:%M:%S) ===" >> /tmp/r3_chain.log
      python scripts/run_gates.py > /tmp/r3_gates.jsonl 2> /tmp/r3_gates.err
      echo "gates exit=$?" >> /tmp/r3_chain.log ;;
  esac
done
echo "=== chain done $(date -u +%H:%M:%S) ===" >> /tmp/r3_chain.log
