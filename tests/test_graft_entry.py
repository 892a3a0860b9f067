"""Driver-hook contract tests.

The round-1 driver record MULTICHIP_r01.json was red because
dryrun_multichip(8) was called directly from the driver process (no
conftest, env pointing JAX at the tunneled TPU) and JAX initialized the
wrong backend. These tests reproduce the driver's call pattern in fresh
subprocesses — no conftest env leakage — and require the hook to
self-provision its 8-device virtual CPU mesh.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """The session's real environment as the driver would have it: TPU
    platform selected, no virtual-device XLA flag injected by conftest."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def _run(code: str, env) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=900,
    )


def test_dryrun_multichip_from_driver_env():
    """Exactly the driver's call: import __graft_entry__, call
    dryrun_multichip(8), in a process whose env selects the TPU platform.
    JAX is uninitialized at call time -> the in-process provisioning path."""
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    proc = _run(code, _driver_env())
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "dryrun_multichip OK: 8 devices" in proc.stdout


def test_dryrun_multichip_after_jax_initialized_elsewhere():
    """When the calling process has ALREADY initialized JAX on an
    incompatible backend (here: 1 CPU device), the hook must detect it and
    re-exec the dry run in a clean subprocess."""
    code = (
        f"import sys; sys.path.insert(0, {REPO!r}); "
        "import jax; "
        "jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1; "  # commit the backend to 1 device
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    env = _driver_env()
    env["JAX_PLATFORMS"] = "cpu"
    proc = _run(code, env)
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "dryrun_multichip OK: 8 devices" in proc.stdout


def test_entry_main_self_check():
    """python __graft_entry__.py runs both hooks under the driver env."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        env=_driver_env(), capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    assert "entry() compile+run OK" in proc.stdout
    assert "dryrun_multichip OK: 8 devices" in proc.stdout


def test_make_mesh_raises_on_too_few_devices():
    from litcoder_core_tpu.parallel.mesh import make_mesh

    with pytest.raises(RuntimeError, match="needs 16 devices"):
        make_mesh(16)
