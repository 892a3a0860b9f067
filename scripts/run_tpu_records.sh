#!/usr/bin/env bash
# Sequential TPU record capture: the round-5 evidence queue.
#
# Runs each benchmark as its own process (one chip — never concurrent),
# retrying through tunnel outages: a failed step waits for the backend to
# come back (fresh-subprocess probes, CLAUDE.md) and retries up to 3 times
# before moving on, so one flap cannot sink the whole queue.
#
# Usage: bash scripts/run_tpu_records.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/tpu_records}"
mkdir -p "$LOGDIR"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

probe_wait() {  # block until the backend answers (fresh subprocess each try)
  while true; do
    if timeout 120 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); assert float(jnp.sum(x @ x)) == 256.0 * 256 * 256
EOF
    then return 0; fi
    echo "[queue] backend down; sleeping 180s" | tee -a "$LOGDIR/queue.log"
    sleep 180
  done
}

run_step() {  # run_step <name> <cmd...>
  local name="$1"; shift
  for attempt in 1 2 3; do
    echo "[queue] step $name attempt $attempt: $*" | tee -a "$LOGDIR/queue.log"
    if "$@" >"$LOGDIR/$name.log" 2>&1; then
      echo "[queue] step $name OK" | tee -a "$LOGDIR/queue.log"
      return 0
    fi
    echo "[queue] step $name FAILED (rc=$?) — probing backend" \
      | tee -a "$LOGDIR/queue.log"
    probe_wait
  done
  echo "[queue] step $name gave up after 3 attempts" | tee -a "$LOGDIR/queue.log"
  return 1
}

run_step stacking_surface python benchmarks/stacking_bench.py
run_step banded_whole_brain python benchmarks/banded_scan.py --whole_brain --n_gammas 10 20
run_step stacking_whole_brain python benchmarks/stacking_bench.py --whole_brain
run_step trainer_e2e python benchmarks/trainer_e2e.py
run_step bench_headline python bench.py
echo "[queue] DONE" | tee -a "$LOGDIR/queue.log"
