"""Speech extractor tests with a tiny random Flax Wav2Vec2 (offline)."""

import numpy as np
import pytest
from scipy.io import wavfile

from litcoder_core_tpu.features.speech_model import (
    SpeechFeatureExtractor,
    load_audio,
)

rng = np.random.default_rng(14)


@pytest.fixture(scope="module")
def tiny_speech_model():
    from transformers import (
        FlaxWav2Vec2Model,
        Wav2Vec2Config,
        Wav2Vec2FeatureExtractor,
    )

    cfg = Wav2Vec2Config(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, conv_dim=(8, 8), conv_kernel=(10, 3),
        conv_stride=(5, 2), num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=True, feat_extract_norm="layer",
    )
    model = FlaxWav2Vec2Model(cfg, seed=0)
    return model, Wav2Vec2FeatureExtractor()


@pytest.fixture
def wav_file(tmp_path):
    """3-second 16 kHz mono wav."""
    sr = 16000
    wav = (0.1 * rng.normal(size=3 * sr)).astype(np.float32)
    path = str(tmp_path / "story.wav")
    wavfile.write(path, sr, wav)
    return path


def _extractor(tiny_speech_model, **kw):
    model, fe = tiny_speech_model
    defaults = dict(
        model_name="tiny-w2v2", chunk_size=0.5, context_size=1.0,
        pool="last", target_sample_rate=16000, batch_size=4,
        model=model, feature_extractor=fe,
    )
    defaults.update(kw)
    return SpeechFeatureExtractor(**defaults)


def test_load_audio_resamples(tmp_path):
    sr_in = 22050
    wav = (0.1 * rng.normal(size=sr_in)).astype(np.float32)  # 1 s
    path = str(tmp_path / "x.wav")
    wavfile.write(path, sr_in, wav)
    out = load_audio(path, 16000)
    assert abs(len(out) - 16000) <= 20
    assert out.dtype == np.float32


def test_load_audio_int16_normalized(tmp_path):
    sr = 16000
    wav = (0.1 * rng.normal(size=sr) * 32767).astype(np.int16)
    path = str(tmp_path / "i.wav")
    wavfile.write(path, sr, wav)
    out = load_audio(path, 16000)
    assert np.abs(out).max() <= 1.0


def test_window_layout(tiny_speech_model, wav_file):
    """Window count/times match the reference formula
    (speech_model.py:153,159-165)."""
    ex = _extractor(tiny_speech_model, chunk_size=0.5, context_size=1.0)
    wav = load_audio(wav_file, 16000)
    windows, times = ex._windows(wav)
    # n = (total - context)//chunk + 1 = (48000-16000)//8000 + 1 = 5
    assert windows.shape == (5, 16000)
    assert np.allclose(times, [1.0, 1.5, 2.0, 2.5, 3.0])
    # Window i covers [i*chunk, i*chunk + context).
    assert np.allclose(windows[2], wav[16000:32000])


def test_extract_all_layers(tiny_speech_model, wav_file):
    ex = _extractor(tiny_speech_model)
    layers, times = ex.extract_all_layers(wav_file)
    assert set(layers.keys()) == {0, 1}  # embeddings hs[0] excluded
    for feats in layers.values():
        assert feats.shape == (5, 16)
        assert np.isfinite(feats).all()
    assert len(times) == 5


def test_extract_single_layer_matches_all(tiny_speech_model, wav_file):
    ex = _extractor(tiny_speech_model)
    all_layers, _ = ex.extract_all_layers(wav_file)
    last, times = ex.extract_features(wav_file, layer="last")
    assert np.allclose(last, all_layers[1], atol=1e-5)
    layer0, _ = ex.extract_features(wav_file, layer=0)
    assert np.allclose(layer0, all_layers[0], atol=1e-5)


def test_mean_pooling_differs_from_last(tiny_speech_model, wav_file):
    last = _extractor(tiny_speech_model, pool="last")
    mean = _extractor(tiny_speech_model, pool="mean")
    f_last, _ = last.extract_features(wav_file)
    f_mean, _ = mean.extract_features(wav_file)
    assert not np.allclose(f_last, f_mean)


def test_audio_shorter_than_context(tiny_speech_model, tmp_path):
    sr = 16000
    wavfile.write(str(tmp_path / "short.wav"), sr,
                  (0.1 * rng.normal(size=sr // 4)).astype(np.float32))
    ex = _extractor(tiny_speech_model, context_size=1.0)
    layers, times = ex.extract_all_layers(str(tmp_path / "short.wav"))
    assert layers == {} and len(times) == 0


def test_invalid_pool():
    with pytest.raises(ValueError, match="pool must be"):
        SpeechFeatureExtractor(model_name="x", chunk_size=0.1,
                               context_size=1.0, pool="max", model=object(),
                               feature_extractor=object())


def test_factory_speech_caching(tiny_speech_model, wav_file, tmp_path):
    """Speech path through the factory: compute, cache, reload."""
    from litcoder_core_tpu.features.factory import FeatureExtractorFactory
    from litcoder_core_tpu.utils.caches import SpeechActivationCache

    ex = _extractor(tiny_speech_model)
    ex.speech_cache = SpeechActivationCache(cache_dir=str(tmp_path))

    class FakeAssembly:
        def get_audio_path(self):
            return [wav_file]

    feats1, times1 = FeatureExtractorFactory._extract_speech_features(
        ex, FakeAssembly(), "story", 0, 1, "lebel"
    )
    assert len(list(tmp_path.glob("*.npz"))) == 1
    feats2, times2 = FeatureExtractorFactory._extract_speech_features(
        ex, FakeAssembly(), "story", 0, 1, "lebel"
    )
    assert len(list(tmp_path.glob("*.npz"))) == 1  # cache hit
    assert np.allclose(feats1, feats2)
    assert np.allclose(times1, times2)


def test_windows_are_strided_views():
    """Window extraction must not materialize n_chunks x context floats
    (regression: fancy-index gather -> GBs for long audio)."""
    ex = object.__new__(SpeechFeatureExtractor)
    ex.chunk_size = 0.5
    ex.context_size = 2.0
    ex.target_sample_rate = 100
    wav = np.arange(1000, dtype=np.float32)
    windows, times = SpeechFeatureExtractor._windows(ex, wav)
    assert windows.base is not None            # a view, not a copy
    n = (1000 - 200) // 50 + 1
    assert windows.shape == (n, 200)
    np.testing.assert_array_equal(windows[0], wav[:200])
    np.testing.assert_array_equal(windows[1], wav[50:250])
    np.testing.assert_allclose(times[0], 2.0)


@pytest.mark.parametrize("pool", ["last", "mean"])
def test_speech_bf16_close_to_fp32(tiny_speech_model, wav_file, pool):
    """dtype='bfloat16' encoder forwards must track the fp32 features."""
    f32, t32 = _extractor(tiny_speech_model, pool=pool).extract_all_layers(
        wav_file)
    b16, t16 = _extractor(tiny_speech_model, pool=pool,
                          dtype="bfloat16").extract_all_layers(wav_file)
    assert np.array_equal(t32, t16)
    for layer in f32:
        a, b = f32[layer], b16[layer]
        assert b.dtype == np.float32
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
        assert rel < 0.06, (layer, rel)


def test_speech_dtype_validation(tiny_speech_model):
    with pytest.raises(ValueError, match="dtype"):
        _extractor(tiny_speech_model, dtype="float16")


def test_factory_speech_cache_keys_by_dtype(tiny_speech_model, wav_file,
                                            tmp_path):
    """bf16 features must not collide with fp32 ones in the cache."""
    from litcoder_core_tpu.features.factory import FeatureExtractorFactory
    from litcoder_core_tpu.utils.caches import SpeechActivationCache

    class FakeAssembly:
        def get_audio_path(self):
            return [wav_file]

    ex32 = _extractor(tiny_speech_model)
    ex32.speech_cache = SpeechActivationCache(cache_dir=str(tmp_path))
    FeatureExtractorFactory._extract_speech_features(
        ex32, FakeAssembly(), "story", 0, 1, "lebel")
    ex16 = _extractor(tiny_speech_model, dtype="bfloat16")
    ex16.speech_cache = SpeechActivationCache(cache_dir=str(tmp_path))
    FeatureExtractorFactory._extract_speech_features(
        ex16, FakeAssembly(), "story", 0, 1, "lebel")
    assert len(list(tmp_path.glob("*.npz"))) == 2  # distinct cache entries
