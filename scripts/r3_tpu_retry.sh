#!/bin/bash
# Retry wrapper around r3_tpu_chain.sh for TPU-tunnel outages.
#
# The axon backend init retries its claim for ~25 min and then raises
# UNAVAILABLE when the tunnel is down (observed 2026-08-18: prof waited
# 02:30->02:56 and failed; the pool was unreachable for every process).
# This loop just re-runs the chain until the prof step succeeds, letting
# the backend's own claim-retry act as the waiter.  One TPU process at a
# time throughout (the chain is sequential; this adds no concurrency).
# Usage: bash scripts/r3_tpu_retry.sh [max_attempts]
set -u
cd /root/repo
max=${1:-12}
for i in $(seq 1 "$max"); do
  echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> /tmp/r3_chain.log
  bash scripts/r3_tpu_chain.sh prof
  if [ -s /tmp/r3_prof.jsonl ]; then
    bash scripts/r3_tpu_chain.sh bench gates
    echo "=== retry wrapper done ok $(date -u +%H:%M:%S) ===" >> /tmp/r3_chain.log
    exit 0
  fi
  sleep 120
done
echo "=== retry wrapper exhausted $(date -u +%H:%M:%S) ===" >> /tmp/r3_chain.log
exit 1
