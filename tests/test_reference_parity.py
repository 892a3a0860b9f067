"""Golden parity tests against the ACTUAL reference implementation.

Loads individual reference modules straight from /root/reference (they can't
be imported as a package — transformer_lens isn't installed) and compares our
TPU kernels' outputs elementwise on identical inputs. Skipped when the
reference tree isn't mounted.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not mounted"
)

rng = np.random.default_rng(11)


def _load_ref_module(relpath: str, fullname: str):
    """Load one reference file as a module, stubbing parent packages."""
    for pkg in ("encoding", "encoding.models", "encoding.features",
                "encoding.downsample"):
        if pkg not in sys.modules:
            sys.modules[pkg] = types.ModuleType(pkg)
    spec = importlib.util.spec_from_file_location(fullname, REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_ridge():
    _load_ref_module("encoding/models/ridge_utils.py",
                     "encoding.models.ridge_utils")
    return _load_ref_module("encoding/models/ridge_regression.py",
                            "encoding.models.ridge_regression")


@pytest.fixture(scope="module")
def ref_interp():
    return _load_ref_module("encoding/downsample/interpdata.py",
                            "encoding.downsample.interpdata")


@pytest.fixture(scope="module")
def ref_fir():
    return _load_ref_module("encoding/features/FIR_expander.py",
                            "encoding.features.FIR_expander")


def _data(T=150, Tp=50, D=12, V=20):
    X = rng.normal(size=(T, D)).astype(np.float32)
    wt = rng.normal(size=(D, V)).astype(np.float32)
    Y = (X @ wt + 0.5 * rng.normal(size=(T, V))).astype(np.float32)
    Xp = rng.normal(size=(Tp, D)).astype(np.float32)
    Yp = (Xp @ wt + 0.5 * rng.normal(size=(Tp, V))).astype(np.float32)
    return X, Y, Xp, Yp


def test_ridge_weights_match_reference(ref_ridge):
    import torch

    from litcoder_core_tpu.models.ridge import ridge_fit

    X, Y, _, _ = _data()
    valphas = rng.choice([0.5, 5.0, 50.0], size=Y.shape[1]).astype(np.float32)
    ref_wt = ref_ridge.ridge_torch(
        torch.tensor(X), torch.tensor(Y), torch.tensor(valphas),
        normalpha=True,
    ).numpy()
    ours = np.asarray(ridge_fit(X, Y, valphas, normalpha=True, method="svd"))
    assert np.allclose(ours, ref_wt, atol=2e-3)


def test_ridge_corr_matches_reference(ref_ridge):
    import torch

    from litcoder_core_tpu.models.ridge import ridge_corr

    X, Y, Xp, Yp = _data()
    alphas = np.logspace(-1, 4, 6).astype(np.float32)
    ref_corr = ref_ridge.ridge_corr_torch(
        torch.tensor(X), torch.tensor(Xp), torch.tensor(Y),
        torch.tensor(Yp), list(alphas), normalpha=True,
    ).numpy()
    ours = np.asarray(
        ridge_corr(X, Xp, Y, Yp, alphas, normalpha=True, method="svd")
    )
    assert np.allclose(ours, ref_corr, atol=2e-3)


def test_ridge_corr_pred_matches_reference(ref_ridge):
    import torch

    from litcoder_core_tpu.models.ridge import ridge_corr_pred

    X, Y, Xp, Yp = _data()
    valphas = rng.choice([1.0, 10.0], size=Y.shape[1]).astype(np.float32)
    ref = ref_ridge.ridge_corr_pred_torch(
        torch.tensor(X), torch.tensor(Xp), torch.tensor(Y),
        torch.tensor(Yp), torch.tensor(valphas), normalpha=True,
    ).numpy()
    ours = np.asarray(
        ridge_corr_pred(X, Xp, Y, Yp, valphas, normalpha=True, method="svd")
    )
    assert np.allclose(ours, ref, atol=2e-3)


def test_lanczos_matches_reference(ref_interp):
    from litcoder_core_tpu.ops.interp import lanczosinterp2D

    oldtime = np.sort(rng.uniform(0, 80, 200))
    newtime = np.arange(1.0, 79.0, 2.0)
    data = rng.normal(size=(200, 9)).astype(np.float32)
    ref = ref_interp.lanczosinterp2D(data, oldtime, newtime, window=3)
    ours = np.asarray(lanczosinterp2D(data, oldtime, newtime, window=3))
    assert np.allclose(ours, ref, atol=1e-4)


def test_sinc_matches_reference(ref_interp):
    from litcoder_core_tpu.ops.interp import sincinterp2D

    oldtime = np.sort(rng.uniform(0, 80, 150))
    newtime = np.arange(1.0, 79.0, 2.0)
    data = rng.normal(size=(150, 5)).astype(np.float32)
    ref = ref_interp.sincinterp2D(data, oldtime, newtime, window=1)
    ours = np.asarray(sincinterp2D(data, oldtime, newtime, window=1))
    assert np.allclose(ours, ref, atol=1e-4)


def test_fir_matches_reference(ref_fir):
    from litcoder_core_tpu.features.fir_expander import FIR

    stim = rng.normal(size=(40, 6)).astype(np.float32)
    for delays in ([1, 2, 3, 4], [-2, 0, 3]):
        for circpad in (False, True):
            ref = ref_fir.FIR.make_delayed(stim, delays, circpad)
            ours = FIR.make_delayed(stim, delays, circpad)
            assert np.allclose(ours, ref, atol=1e-6)
