"""Dataset processors, brain projection, surface cache, and the unified CLI."""

import pickle

import numpy as np
import pandas as pd
import pytest

from litcoder_core_tpu.assembly.assembly_generator import AssemblyGenerator
from litcoder_core_tpu.assembly.lebel_processor import LebelAssemblyGenerator
from litcoder_core_tpu.brain_projection.project import VolumeProcessor
from litcoder_core_tpu.brain_projection.simple_cache import SimpleSurfaceCache

rng = np.random.default_rng(9)


class WordTokenizer:
    """Offline tokenizer: one token per whitespace word (encode/decode)."""

    def encode(self, text, add_special_tokens=False):
        return text.split()

    def decode(self, tokens):
        return " ".join(tokens)


def _generator(tmp_path, dataset_type="lebel", tr=2.0):
    gen = LebelAssemblyGenerator(
        data_dir=str(tmp_path), dataset_type=dataset_type, tr=tr,
        use_volume=True, tokenizer=WordTokenizer(),
    )
    return gen


# ---- context-window stimulus construction -------------------------------------

def _transcript(words):
    return pd.DataFrame({
        "word_orig": words,
        "word_times": np.arange(len(words), dtype=float),
    })


def test_fullcontext_window(tmp_path):
    gen = _generator(tmp_path)
    gen.context_type = "fullcontext"
    words = [f"w{i}" for i in range(10)]
    stimuli = gen.generate_stimuli_with_context(_transcript(words), lookback=3)
    assert stimuli[0] == "w0"
    # Token budget enforced: at most `lookback` tokens survive.
    assert stimuli[5] == "w3 w4 w5"
    assert all(len(s.split()) <= 3 for s in stimuli)


def test_fullcontext_empty_words(tmp_path):
    gen = _generator(tmp_path)
    gen.context_type = "fullcontext"
    stimuli = gen.generate_stimuli_with_context(
        _transcript(["a", "", "b"]), lookback=5
    )
    assert stimuli[1] == ""
    assert len(stimuli) == 3


def test_nocontext_resets_on_budget(tmp_path):
    gen = _generator(tmp_path)
    gen.context_type = "nocontext"
    words = [f"w{i}" for i in range(9)]
    stimuli = gen.generate_stimuli_with_context(_transcript(words), lookback=3)
    # Window accumulates to 3 tokens then resets from the NEXT word.
    assert stimuli[:4] == ["w0", "w0 w1", "w0 w1 w2", "w3"]


def test_halfcontext_slides_by_half(tmp_path):
    gen = _generator(tmp_path)
    gen.context_type = "halfcontext"
    words = [f"w{i}" for i in range(12)]
    stimuli = gen.generate_stimuli_with_context(_transcript(words), lookback=4)
    assert len(stimuli) == 12
    assert all(len(s.split()) <= 4 for s in stimuli)
    # After overflow, the window start advanced by lookback//2.
    assert stimuli[4] == "w2 w3 w4"


def test_invalid_context_type(tmp_path):
    gen = _generator(tmp_path)
    gen.context_type = "bogus"
    with pytest.raises(ValueError, match="Invalid context type"):
        gen.generate_stimuli_with_context(_transcript(["a"]), 3)


# ---- word rate ------------------------------------------------------------------

def test_word_rate_matches_reference_loop(tmp_path):
    gen = _generator(tmp_path, tr=2.0)
    times = np.sort(rng.uniform(0, 20, 40))
    words = [f"w{i}" if i % 7 else "" for i in range(40)]  # some empties
    transcript = pd.DataFrame({"word_orig": words, "word_times": times})
    tr_times = np.arange(0.0, 20.0, 2.0)

    ours = gen.compute_word_rate_features(transcript, tr_times)

    # Reference loop (base_processor.py:312-336).
    ref = []
    for i in range(len(tr_times)):
        start = tr_times[i]
        end = tr_times[i + 1] if i < len(tr_times) - 1 else start + gen.tr
        in_tr = [
            w for w, t in zip(words, times)
            if start <= t < end and str(w).strip() != ""
        ]
        ref.append([float(len(in_tr))])
    assert np.allclose(ours, np.array(ref))


# ---- temporal baseline -----------------------------------------------------------

def test_temporal_baseline_reconstructs_autocorr(tmp_path):
    gen = _generator(tmp_path)
    n, L = 60, 10
    feats = gen.create_temporal_baseline(["x"] * n, d_model=60,
                                         correlation_length=L)
    assert feats.shape == (60, 60)
    idx = np.arange(n)
    autocorr = np.exp(-np.abs(idx[:, None] - idx[None, :]) / L)
    assert np.allclose(feats @ feats.T, autocorr, atol=1e-6)


def test_temporal_baseline_truncates_d_model(tmp_path):
    gen = _generator(tmp_path)
    feats = gen.create_temporal_baseline(["x"] * 20, d_model=128,
                                         correlation_length=5)
    assert feats.shape == (20, 20)  # d_model clipped to n


# ---- analysis mask ------------------------------------------------------------

def test_analysis_mask(tmp_path):
    gen = _generator(tmp_path)
    gen.analysis_mask = np.array([True, False, True, False])
    data = rng.normal(size=(5, 4))
    masked, idx = gen.apply_analysis_mask(data)
    assert masked.shape == (5, 2)
    assert np.array_equal(idx, [0, 2])
    gen.analysis_mask = np.array([True])
    with pytest.raises(ValueError, match="doesn't match"):
        gen.apply_analysis_mask(data)


# ---- LeBel end-to-end on synthetic pickles -------------------------------------

@pytest.fixture
def lebel_dir(tmp_path):
    """Synthetic LeBel data dir: transcript pickle + response pickle."""
    stories = ["adollshouse", "adventuresinsayingyes"]
    transcript_data = []
    responses = {}
    for s in stories:
        n_words, n_trs = 30, 12
        transcript_data.append({
            "story_name": s,
            "words": [f"{s[:3]}{i}" for i in range(n_words)],
            "split_indices": sorted(
                rng.integers(0, n_trs, n_words).tolist()
            ),
            "tr_times": np.arange(n_trs) * 2.0,
            "data_times": np.sort(rng.uniform(0, n_trs * 2.0, n_words)),
        })
        responses[s] = rng.normal(size=(n_trs, 7)).astype(np.float32)
    with open(tmp_path / "lebel_data.pkl", "wb") as f:
        pickle.dump(transcript_data, f)
    with open(tmp_path / "noslice_sub-UTS03_story_data.pkl", "wb") as f:
        pickle.dump(responses, f)
    return tmp_path, stories


def test_lebel_generator_end_to_end(lebel_dir):
    data_dir, stories = lebel_dir
    gen = LebelAssemblyGenerator(
        data_dir=str(data_dir), dataset_type="lebel", tr=2.0,
        use_volume=True, tokenizer=WordTokenizer(),
    )
    gen.stories = stories  # restrict to the synthetic subset
    assembly = gen.generate_assembly("UTS03", lookback=5)
    assert assembly.stories == stories
    assert assembly.get_validation_method() == "outer"
    sd = assembly.story_data[stories[0]]
    assert sd.brain_data.shape == (12, 7)
    assert len(sd.stimuli) == 30
    assert sd.word_rates.shape == (12, 1)
    assert sd.audio_path.endswith("adollshouse.wav")


def test_missing_story_raises(lebel_dir):
    data_dir, _ = lebel_dir
    gen = LebelAssemblyGenerator(
        data_dir=str(data_dir), dataset_type="lebel", use_volume=True,
        tokenizer=WordTokenizer(),
    )
    gen.context_type = "fullcontext"
    with pytest.raises(ValueError, match="not found in lebel_data.pkl"):
        gen.process_transcript(str(data_dir), "nonexistent_story")


# ---- factory -------------------------------------------------------------------

def test_assembly_generator_factory():
    with pytest.raises(ValueError, match="Unsupported dataset type"):
        AssemblyGenerator.create("bogus", "/tmp")
    gen = AssemblyGenerator.create("lebel", "/tmp", use_volume=True,
                                   tokenizer=WordTokenizer())
    assert isinstance(gen, LebelAssemblyGenerator)


# ---- brain projection ------------------------------------------------------------

def test_volume_processor_flatten():
    vol = rng.normal(size=(4, 5, 6, 10)).astype(np.float32)
    out = VolumeProcessor().process_brain_data(vol, np.eye(4))
    assert out.data.shape == (10, 120)
    # Row t equals the flattened t-th volume.
    assert np.allclose(out.data[3], vol[:, :, :, 3].reshape(-1))


def test_volume_processor_mask():
    vol = rng.normal(size=(4, 5, 6, 10)).astype(np.float32)
    mask = rng.uniform(size=(4, 5, 6)) > 0.5
    out = VolumeProcessor(mask=mask).process_brain_data(vol, np.eye(4))
    assert out.data.shape == (10, mask.sum())
    # Reference loop semantics (project.py:110-114).
    for t in [0, 7]:
        assert np.allclose(out.data[t], vol[:, :, :, t][mask])
    with pytest.raises(ValueError, match="does not match"):
        VolumeProcessor(mask=mask[:2]).process_brain_data(vol, np.eye(4))


def test_surface_cache_roundtrip(tmp_path):
    cache = SimpleSurfaceCache(cache_dir=str(tmp_path))
    vol_file = tmp_path / "vol.nii.gz"
    vol_file.write_bytes(b"fake")
    data = rng.normal(size=(5, 9))
    assert cache.get("sub1", str(vol_file)) is None
    cache.set("sub1", str(vol_file), data)
    hit = cache.get("sub1", str(vol_file))
    assert np.allclose(hit, data)
    # Keyed on mtime: touching the file invalidates.
    import os
    import time

    time.sleep(0.01)
    os.utime(vol_file)
    assert cache.get("sub1", str(vol_file)) is None
    cache.clear()


# ---- unified CLI ----------------------------------------------------------------

def test_cli_end_to_end_with_prepackaged_assembly(tmp_path):
    from litcoder_core_tpu.assembly.assembly_loader import save_assembly
    from litcoder_core_tpu.cli import main

    from tests.test_trainer_e2e import _make_story
    from litcoder_core_tpu.assembly.assemblies import SimpleNeuroidAssembly

    assembly = SimpleNeuroidAssembly(
        [_make_story(f"s{i}") for i in range(3)], "outer"
    )
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)

    metrics = main([
        "--dataset_type", "lebel",
        "--assembly_path", asm_path,
        "--modality", "wordrate",
        "--model_name", "wordrate",
        "--ndelays", "4",
        "--lookback", "256",
        "--cache_dir", str(tmp_path / "cache"),
        "--results_dir", str(tmp_path / "results"),
        "--logger_backend", "none",
        "--chunk_length", "10",
        "--n_inner_folds", "3",
        # Synthetic stories are short; relax the LeBel trims.
        "--train_features_start", "5", "--train_features_end", "-5",
        "--train_targets_start", "5", "--train_targets_end", "-5",
        "--test_features_start", "5", "--test_features_end", "-5",
        "--test_targets_start", "5", "--test_targets_end", "-5",
    ])
    assert np.isfinite(metrics["median_score"])
    assert metrics["median_score"] > 0.2
    # Trimming override must NOT leak into the module-level preset.
    from litcoder_core_tpu.cli import DATASET_CONFIGS

    assert DATASET_CONFIGS["lebel"]["trimming"]["train_features_start"] == 10


def test_lebel_multi_subject_cache_not_stale(lebel_dir):
    """One generator serving two subjects must reload per subject
    (regression: the response cache was not subject-keyed)."""
    data_dir, stories = lebel_dir
    responses2 = {s: rng.normal(size=(12, 7)).astype(np.float32)
                  for s in stories}
    with open(data_dir / "noslice_sub-UTS99_story_data.pkl", "wb") as f:
        pickle.dump(responses2, f)

    gen = LebelAssemblyGenerator(
        data_dir=str(data_dir), dataset_type="lebel", tr=2.0,
        use_volume=True, tokenizer=WordTokenizer(),
    )
    gen.stories = stories
    a1 = gen.generate_assembly("UTS03", lookback=5)
    a2 = gen.generate_assembly("UTS99", lookback=5)
    b1 = a1.story_data[stories[0]].brain_data
    b2 = a2.story_data[stories[0]].brain_data
    assert not np.allclose(b1, b2)
    assert np.allclose(b2, responses2[stories[0]])


def test_surface_cache_corrupt_entry_recovers(tmp_path):
    """A truncated .npy entry (killed mid-save) must be treated as a miss
    and deleted, not crash every rerun (regression)."""
    from litcoder_core_tpu.brain_projection.simple_cache import (
        SimpleSurfaceCache,
    )

    cache = SimpleSurfaceCache(str(tmp_path / "cache"))
    vol = tmp_path / "vol.nii.gz"
    vol.write_bytes(b"x")
    data = rng.normal(size=(3, 4)).astype(np.float32)
    cache.set("s1", str(vol), data)
    np.testing.assert_allclose(cache.get("s1", str(vol)), data)

    # Corrupt the entry in place.
    entry = next((tmp_path / "cache").glob("*.npy"))
    entry.write_bytes(b"not a npy file")
    assert cache.get("s1", str(vol)) is None     # miss, not crash
    assert not entry.exists()                    # corrupt file removed


def test_surface_cache_singleton_redirect(tmp_path):
    from litcoder_core_tpu.brain_projection import simple_cache

    simple_cache._GLOBAL_CACHE = None
    try:
        a = simple_cache.get_surface_cache(str(tmp_path / "a"))
        assert simple_cache.get_surface_cache() is a       # None keeps it
        b = simple_cache.get_surface_cache(str(tmp_path / "b"))
        assert b is not a
        assert str(b.cache_dir) == str(tmp_path / "b")
    finally:
        simple_cache._GLOBAL_CACHE = None
