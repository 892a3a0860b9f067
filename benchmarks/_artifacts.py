"""Shared JSON-artifact helper for the benchmark scripts.

Every benchmark appends its records to a JSON-array artifact next to the
script (the PARITY.md / docs evidence files). One implementation instead of
a copy in each script, and it tolerates a missing or malformed existing
file — a crashed earlier run must not poison the next one's write.
"""

import json
import os
import sys


def ensure_backend(deadline_s: float = 480.0) -> None:
    """Probe the default JAX backend in a FRESH subprocess before a long
    benchmark run; exit with a clear message instead of hanging for many
    minutes when the TPU tunnel is down (JAX caches init failure
    in-process, so probing must happen in a subprocess — CLAUDE.md)."""
    from litcoder_core_tpu.utils.benchguard import wait_for_backend

    ok, rc = wait_for_backend(deadline_s=deadline_s)
    if not ok:
        sys.exit(f"backend unavailable (fresh-subprocess probe rc={rc}); "
                 f"retry when the TPU tunnel is back")


def pin_platform() -> None:
    """Apply LITCODER_BENCH_PLATFORM to THIS process via jax.config.

    The tunneled TPU plugin ignores the JAX_PLATFORMS env var (CLAUDE.md),
    so CPU smoke runs of the benchmark scripts need an explicit
    jax.config.update — same knob the benchguard probe honors. No-op when
    the env var is unset (normal TPU benchmarking)."""
    p = os.environ.get("LITCODER_BENCH_PLATFORM")
    if p:
        import jax

        jax.config.update("jax_platforms", p)


def append_records(path: str, records) -> None:
    """Append `records` (a list of dicts) to the JSON array at `path`."""
    existing = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                existing = json.load(f)
            if not isinstance(existing, list):
                existing = [existing]
        except (json.JSONDecodeError, OSError):
            existing = []
    with open(path, "w") as f:
        json.dump(existing + list(records), f, indent=1)


def artifact_path(script_file: str, name: str) -> str:
    """Artifact path next to the calling benchmark script."""
    return os.path.join(os.path.dirname(os.path.abspath(script_file)), name)
