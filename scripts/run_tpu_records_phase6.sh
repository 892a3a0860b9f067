#!/usr/bin/env bash
# Phase 6 of the round-5 TPU record queue: re-capture the end-to-end
# trainer wall after the brain-data prefetch overlap (transfers ride the
# link during extraction instead of serializing inside structure_data —
# previously 80.3 s of the 353.5 s wall), then refresh the bench
# snapshot so an end-of-round tunnel outage falls back to a same-day
# number. Waits for phase 5's DONE marker.
#
# Usage: bash scripts/run_tpu_records_phase6.sh [phase5_logdir] [logdir]
set -u
cd "$(dirname "$0")/.."
P5LOG="${1:-/tmp/tpu_records5}/queue.log"
LOGDIR="${2:-/tmp/tpu_records6}"
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

echo "[queue6] waiting for phase 5 ($P5LOG)" | tee -a "$LOGDIR/queue.log"
while ! grep -q "DONE" "$P5LOG" 2>/dev/null; do sleep 60; done

probe_wait() {
  while true; do
    if timeout 120 python - <<'EOF2'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); assert float(jnp.sum(x @ x)) == 256.0 * 256 * 256
EOF2
    then return 0; fi
    echo "[queue6] backend down; sleeping 180s" | tee -a "$LOGDIR/queue.log"
    sleep 180
  done
}

run_step() {
  local name="$1" rc a; shift
  for a in 1 2 3; do
    echo "[queue6] step $name attempt $a: $*" | tee -a "$LOGDIR/queue.log"
    "$@" >"$LOGDIR/$name.attempt$a.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "[queue6] step $name OK" | tee -a "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queue6] step $name FAILED (rc=$rc) — probing backend" \
      | tee -a "$LOGDIR/queue.log"
    probe_wait
  done
  echo "[queue6] step $name gave up" | tee -a "$LOGDIR/queue.log"
  return 1
}

run_step trainer_e2e python benchmarks/trainer_e2e.py
run_step bench_snapshot python bench.py
echo "[queue6] DONE" | tee -a "$LOGDIR/queue.log"
