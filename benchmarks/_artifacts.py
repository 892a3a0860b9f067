"""Shared JSON-artifact helper for the benchmark scripts.

Every benchmark appends its records to a JSON-array artifact next to the
script (the PARITY.md / docs evidence files). One implementation instead of
a copy in each script, and it tolerates a missing or malformed existing
file — a crashed earlier run must not poison the next one's write.
"""

import json
import os


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
