#!/usr/bin/env bash
# Phase 5 of the round-5 TPU record queue: the whole-brain banded record,
# re-run after dropping the chunked scan's resident (D, V) cross-product
# (the scan peaked at ~15.5 of 16 GB HBM and killed the backend; it now
# peaks ~13.7 GB). Waits for phase 4's DONE marker.
#
# Usage: bash scripts/run_tpu_records_phase5.sh [phase4_logdir] [logdir]
set -u
cd "$(dirname "$0")/.."
P4LOG="${1:-/tmp/tpu_records4}/queue.log"
LOGDIR="${2:-/tmp/tpu_records5}"
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

echo "[queue5] waiting for phase 4 ($P4LOG)" | tee -a "$LOGDIR/queue.log"
while ! grep -q "DONE" "$P4LOG" 2>/dev/null; do sleep 60; done

probe_wait() {
  while true; do
    if timeout 120 python - <<'EOF2'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); assert float(jnp.sum(x @ x)) == 256.0 * 256 * 256
EOF2
    then return 0; fi
    echo "[queue5] backend down; sleeping 180s" | tee -a "$LOGDIR/queue.log"
    sleep 180
  done
}

run_step() {
  local name="$1" rc a; shift
  for a in 1 2 3; do
    echo "[queue5] step $name attempt $a: $*" | tee -a "$LOGDIR/queue.log"
    "$@" >"$LOGDIR/$name.attempt$a.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "[queue5] step $name OK" | tee -a "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queue5] step $name FAILED (rc=$rc) — probing backend" \
      | tee -a "$LOGDIR/queue.log"
    probe_wait
  done
  echo "[queue5] step $name gave up" | tee -a "$LOGDIR/queue.log"
  return 1
}

run_step banded_whole_brain python benchmarks/banded_scan.py \
  --whole_brain --n_gammas 10 20
echo "[queue5] DONE" | tee -a "$LOGDIR/queue.log"
