#!/usr/bin/env bash
# Phase 7 (bonus) of the round-5 TPU record queue: a fast_scan='auto'
# whole-brain banded row next to the fp32-HIGHEST g=10/g=20 records.
# The guarded bf16 scan self-validates its per-voxel argmax against a
# fp32 probe (models/banded.py fast_scan policy, same as the plain
# solver); at surface scale it halved the scan term — this measures what
# it buys at V=95556, where the intercept (streamed XtY + per-fold fixed
# work) dominates. Waits for the sweeper's DONE so it never competes
# with the primary captures for the chip.
#
# Usage: bash scripts/run_tpu_records_phase7.sh [sweep_logdir] [logdir]
set -u
cd "$(dirname "$0")/.."
SWLOG="${1:-/tmp/tpu_records_sweep}/queue.log"
LOGDIR="${2:-/tmp/tpu_records7}"
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

echo "[queue7] waiting for sweeper ($SWLOG)" | tee -a "$LOGDIR/queue.log"
while ! grep -q "DONE" "$SWLOG" 2>/dev/null; do sleep 60; done

probe_wait() {
  while true; do
    if timeout 120 python - <<'EOF2'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); assert float(jnp.sum(x @ x)) == 256.0 * 256 * 256
EOF2
    then return 0; fi
    echo "[queue7] backend down; sleeping 180s" | tee -a "$LOGDIR/queue.log"
    sleep 180
  done
}

run_step() {
  local name="$1" rc a; shift
  for a in 1 2 3; do
    echo "[queue7] step $name attempt $a: $*" | tee -a "$LOGDIR/queue.log"
    "$@" >"$LOGDIR/$name.attempt$a.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "[queue7] step $name OK" | tee -a "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queue7] step $name FAILED (rc=$rc) — probing backend" \
      | tee -a "$LOGDIR/queue.log"
    probe_wait
  done
  echo "[queue7] step $name gave up" | tee -a "$LOGDIR/queue.log"
  return 1
}

run_step banded_whole_brain_fast \
  python benchmarks/banded_scan.py --whole_brain --n_gammas 10 \
    --fast_scan auto
echo "[queue7] DONE" | tee -a "$LOGDIR/queue.log"
