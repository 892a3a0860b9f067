#!/usr/bin/env bash
# Phase 4 of the round-5 TPU record queue: re-capture the LM extraction
# record after fixing the bench's warm pass (short warm runs left the
# large prefix-chain buckets' bf16/batch-256 programs uncompiled, so the
# timed region paid tunnel compiles — a spurious 9x on the bf16 row).
#
# Usage: bash scripts/run_tpu_records_phase4.sh [phase3_logdir] [logdir]
set -u
cd "$(dirname "$0")/.."
P3LOG="${1:-/tmp/tpu_records3}/queue.log"
LOGDIR="${2:-/tmp/tpu_records4}"
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

echo "[queue4] waiting for phase 3 ($P3LOG)" | tee -a "$LOGDIR/queue.log"
while ! grep -q "DONE" "$P3LOG" 2>/dev/null; do sleep 60; done

probe_wait() {
  while true; do
    if timeout 120 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); assert float(jnp.sum(x @ x)) == 256.0 * 256 * 256
EOF
    then return 0; fi
    echo "[queue4] backend down; sleeping 180s" | tee -a "$LOGDIR/queue.log"
    sleep 180
  done
}

run_step() {
  local name="$1" rc; shift
  for attempt in 1 2 3; do
    echo "[queue4] step $name attempt $attempt: $*" \
      | tee -a "$LOGDIR/queue.log"
    "$@" >"$LOGDIR/$name.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "[queue4] step $name OK" | tee -a "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queue4] step $name FAILED (rc=$rc) — probing backend" \
      | tee -a "$LOGDIR/queue.log"
    probe_wait
  done
  echo "[queue4] step $name gave up" | tee -a "$LOGDIR/queue.log"
  return 1
}

run_step lm_extraction python benchmarks/lm_extraction.py --gpt2_small \
  --out benchmarks/lm_extraction_tpu.json
echo "[queue4] DONE" | tee -a "$LOGDIR/queue.log"
