"""Activation caches (lazy npz + legacy pkl) and ModelSaver round trips."""

import pickle

import numpy as np
import pytest

from litcoder_core_tpu.utils.caches import (
    ActivationCache,
    LazyLayerCache,
    SpeechActivationCache,
)
from litcoder_core_tpu.utils.saver import ModelSaver

rng = np.random.default_rng(6)


def _layers(n=3, shape=(10, 4)):
    return {i: rng.normal(size=shape).astype(np.float32) for i in range(n)}


def test_activation_cache_roundtrip(tmp_path):
    cache = ActivationCache(cache_dir=str(tmp_path))
    key = cache._get_cache_key(
        story="s1", lookback=256, model_name="gpt2",
        context_type="fullcontext", last_token=True, dataset_type="lebel",
        raw=True,
    )
    layers = _layers()
    meta = {"model_name": "gpt2", "context_type": "fullcontext",
            "available_layers": [0, 1, 2]}
    cache.save_multi_layer_activations(key, layers, meta)

    lazy = cache.load_multi_layer_activations(key)
    assert lazy is not None
    assert lazy.get_available_layers() == [0, 1, 2]
    assert np.allclose(lazy.get_layer(1), layers[1])
    assert lazy.get_metadata()["model_name"] == "gpt2"
    lazy.validate_context_type("fullcontext")
    with pytest.raises(ValueError, match="context_type mismatch"):
        lazy.validate_context_type("nocontext")
    with pytest.raises(ValueError, match="not found in cache"):
        lazy.get_layer(99)


def test_activation_cache_key_determinism(tmp_path):
    cache = ActivationCache(cache_dir=str(tmp_path))
    kw = dict(story="s", lookback=10, model_name="m",
              context_type="fullcontext", last_token=False,
              dataset_type="lebel", raw=True)
    assert cache._get_cache_key(**kw) == cache._get_cache_key(**kw)
    kw2 = dict(kw, lookback=11)
    assert cache._get_cache_key(**kw) != cache._get_cache_key(**kw2)


def test_activation_cache_miss_returns_none(tmp_path):
    cache = ActivationCache(cache_dir=str(tmp_path))
    assert cache.load_multi_layer_activations("nope") is None


def test_legacy_pickle_cache_readable(tmp_path):
    """Caches written by the reference (pickle blobs) must load."""
    layers = _layers()
    blob = {"metadata": {"context_type": "fullcontext"}, "layers": layers}
    path = tmp_path / "abc.pkl"
    with open(path, "wb") as f:
        pickle.dump(blob, f)
    lazy = LazyLayerCache(path)
    assert np.allclose(lazy.get_layer(2), layers[2])
    assert lazy.get_metadata()["context_type"] == "fullcontext"

    cache = ActivationCache(cache_dir=str(tmp_path))
    found = cache.load_multi_layer_activations("abc")
    assert found is not None and np.allclose(found.get_layer(0), layers[0])


def test_speech_cache_roundtrip(tmp_path):
    cache = SpeechActivationCache(cache_dir=str(tmp_path))
    key = cache.get_cache_key(
        audio_id="/x/y.wav", model_name="whisper-tiny", chunk_size=0.1,
        context_size=16.0, pool="last", target_sample_rate=16000,
        dataset_type="lebel", extra={"layer_mode": "all"},
    )
    layers = _layers(2, (7, 6))
    times = np.linspace(16, 20, 7)
    meta = {"model_name": "whisper-tiny", "chunk_size": 0.1,
            "context_size": 16.0, "pool": "last",
            "target_sample_rate": 16000, "dataset_type": "lebel"}
    cache.save_multi_layer_activations(key, layers, meta, times=times)

    lazy = cache.load_multi_layer_activations(key)
    assert np.allclose(lazy.get_times(), times)
    assert np.allclose(lazy.get_layer(0), layers[0])
    lazy.validate_params(expected={"model_name": "whisper-tiny", "pool": "last"})
    with pytest.raises(ValueError, match="parameter mismatch"):
        lazy.validate_params(expected={"pool": "mean"})


def test_model_saver_roundtrip(tmp_path):
    saver = ModelSaver(base_dir=str(tmp_path))
    weights = rng.normal(size=(8, 5)).astype(np.float32)
    alphas = rng.normal(size=5).astype(np.float32)
    metrics = {"median_score": 0.5, "correlations": [0.1] * 5}
    run_dir = saver.save_encoding_model(
        weights, alphas, {"layer_idx": 9}, metrics, save_weights=True,
    )
    w, a, hp, m = saver.load_encoding_model(run_dir)
    assert np.allclose(w, weights)
    assert np.allclose(a, alphas)  # reference never saved these (latent bug)
    assert hp["layer_idx"] == 9
    assert m["median_score"] == 0.5

    runs = saver.list_runs()
    assert len(runs) == 1
    assert runs[0]["hyperparams"]["layer_idx"] == 9


def test_model_saver_weights_optional(tmp_path):
    saver = ModelSaver(base_dir=str(tmp_path))
    run_dir = saver.save_encoding_model(
        np.zeros((2, 2)), np.zeros(2), {}, {"median_score": 0.0},
        save_weights=False,
    )
    w, a, hp, m = saver.load_encoding_model(run_dir)
    assert w is None and a is not None


def test_list_runs_sorts_same_day_by_time(tmp_path):
    """Timestamps keep the HHMMSS part so same-day runs sort (regression)."""
    import json
    import pickle

    from litcoder_core_tpu.utils.saver import ModelSaver

    saver = ModelSaver(base_dir=str(tmp_path))
    for t in ["20260816_090000", "20260816_110000", "20260816_100000"]:
        d = tmp_path / f"run_{t}_abcd1234"
        d.mkdir()
        (d / "hyperparams.json").write_text(json.dumps({"t": t}))
        with open(d / "metrics.pkl", "wb") as f:
            pickle.dump({}, f)
    runs = saver.list_runs()
    assert [r["timestamp"] for r in runs] == [
        "20260816_110000", "20260816_100000", "20260816_090000"
    ]
