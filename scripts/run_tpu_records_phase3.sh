#!/usr/bin/env bash
# Phase 3 of the round-5 TPU record queue: the whole-brain (V=95556)
# banded and stacking records — re-run after the HBM fixes (banded:
# alpha-batched chunk scoring + factor drops; stacking: the chunked
# refit/QP/blend/test driver). Waits for phase 2's DONE marker so the
# single chip is never shared, then runs each benchmark with the same
# retry-through-outage loop.
#
# Usage: bash scripts/run_tpu_records_phase3.sh [phase2_logdir] [logdir]
set -u
cd "$(dirname "$0")/.."
P2LOG="${1:-/tmp/tpu_records2}/queue.log"
LOGDIR="${2:-/tmp/tpu_records3}"
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

echo "[queue3] waiting for phase 2 ($P2LOG)" | tee -a "$LOGDIR/queue.log"
while ! grep -q "DONE" "$P2LOG" 2>/dev/null; do sleep 60; done

probe_wait() {
  while true; do
    if timeout 120 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); assert float(jnp.sum(x @ x)) == 256.0 * 256 * 256
EOF
    then return 0; fi
    echo "[queue3] backend down; sleeping 180s" | tee -a "$LOGDIR/queue.log"
    sleep 180
  done
}

run_step() {
  local name="$1" rc; shift
  for attempt in 1 2 3; do
    echo "[queue3] step $name attempt $attempt: $*" \
      | tee -a "$LOGDIR/queue.log"
    "$@" >"$LOGDIR/$name.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "[queue3] step $name OK" | tee -a "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queue3] step $name FAILED (rc=$rc) — probing backend" \
      | tee -a "$LOGDIR/queue.log"
    probe_wait
  done
  echo "[queue3] step $name gave up" | tee -a "$LOGDIR/queue.log"
  return 1
}

run_step banded_whole_brain python benchmarks/banded_scan.py \
  --whole_brain --n_gammas 10 20
run_step stacking_whole_brain python benchmarks/stacking_bench.py \
  --whole_brain
echo "[queue3] DONE" | tee -a "$LOGDIR/queue.log"
