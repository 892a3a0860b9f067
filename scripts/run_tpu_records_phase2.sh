#!/usr/bin/env bash
# Phase 2 of the round-5 TPU record queue: extraction-throughput refreshes
# (pipelined dispatch + per-layer pooling). Waits for phase 1's queue.log
# DONE marker so the single chip is never shared, then runs each benchmark
# with the same retry-through-outage loop.
#
# Usage: bash scripts/run_tpu_records_phase2.sh [phase1_logdir] [logdir]
set -u
cd "$(dirname "$0")/.."
P1LOG="${1:-/tmp/tpu_records}/queue.log"
LOGDIR="${2:-/tmp/tpu_records2}"
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

echo "[queue2] waiting for phase 1 ($P1LOG)" | tee -a "$LOGDIR/queue.log"
while ! grep -q "DONE" "$P1LOG" 2>/dev/null; do sleep 60; done

probe_wait() {
  while true; do
    if timeout 120 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); assert float(jnp.sum(x @ x)) == 256.0 * 256 * 256
EOF
    then return 0; fi
    echo "[queue2] backend down; sleeping 180s" | tee -a "$LOGDIR/queue.log"
    sleep 180
  done
}

run_step() {
  local name="$1"; shift
  for attempt in 1 2 3; do
    echo "[queue2] step $name attempt $attempt: $*" | tee -a "$LOGDIR/queue.log"
    if "$@" >"$LOGDIR/$name.log" 2>&1; then
      echo "[queue2] step $name OK" | tee -a "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queue2] step $name FAILED — probing backend" \
      | tee -a "$LOGDIR/queue.log"
    probe_wait
  done
  echo "[queue2] step $name gave up" | tee -a "$LOGDIR/queue.log"
  return 1
}

run_step lm_extraction python benchmarks/lm_extraction.py --gpt2_small \
  --out benchmarks/lm_extraction_tpu.json
run_step speech_extraction python benchmarks/speech_extraction.py \
  --out benchmarks/speech_extraction_tpu.json
echo "[queue2] DONE" | tee -a "$LOGDIR/queue.log"
