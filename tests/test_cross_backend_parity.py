"""Cross-backend numerical parity: flax vs torch on IDENTICAL weights.

The reference extracts LM features with TransformerLens/torch
(encoding/features/language_model.py:122-159) and speech features with HF
torch models (encoding/features/speech_model.py:189-251); our native path
is Flax. These tests pin the two backends to the same weights (offline via
transformers' flax->torch weight transfer) and assert the EXTRACTOR outputs
— all layers, both poolings, with and without prefix sharing — agree to
1e-4. This is the strongest offline stand-in for parity on real
pretrained checkpoints (no network in this environment).
"""

import numpy as np
import pytest

from litcoder_core_tpu.features.language_model import (
    LanguageModelFeatureExtractor,
)
from litcoder_core_tpu.features.speech_model import SpeechFeatureExtractor
from tests.test_features import StubTokenizer

rng = np.random.default_rng(21)


@pytest.fixture(scope="module")
def gpt2_pair():
    """(flax_model, torch_model) tiny GPT-2 with identical weights."""
    import torch
    from transformers import FlaxGPT2Model, GPT2Config, GPT2Model
    from transformers.modeling_flax_pytorch_utils import (
        load_flax_weights_in_pytorch_model,
    )

    cfg = GPT2Config(vocab_size=600, n_positions=128, n_embd=16, n_layer=3,
                     n_head=2)
    fm = FlaxGPT2Model(cfg, seed=0)
    tm = load_flax_weights_in_pytorch_model(GPT2Model(cfg), fm.params)
    tm.eval()
    torch.set_grad_enabled(False)
    return fm, tm


@pytest.fixture(scope="module")
def stimuli():
    """Mix of prefix-chained contexts (the fullcontext growth pattern),
    an empty string, and unchained texts."""
    words = [f"tok{i}" for i in range(14)]
    chained = [" ".join(words[: i + 1]) for i in range(len(words))]
    return chained[:6] + [""] + ["zebra qux", "lonely"] + chained[6:]


@pytest.mark.parametrize("last_token", [True, False])
@pytest.mark.parametrize("prefix_sharing", [True, False])
def test_lm_flax_torch_all_layer_parity(gpt2_pair, stimuli, last_token,
                                        prefix_sharing):
    fm, tm = gpt2_pair
    tok = StubTokenizer()
    ex_flax = LanguageModelFeatureExtractor({
        "model_name": "tiny", "model": fm, "tokenizer": tok,
        "backend": "flax", "last_token": last_token,
        "prefix_sharing": prefix_sharing, "batch_size": 4,
    })
    ex_torch = LanguageModelFeatureExtractor({
        "model_name": "tiny", "model": tm, "tokenizer": tok,
        "backend": "torch", "last_token": last_token, "batch_size": 4,
    })
    out_f = ex_flax.extract_all_layers(stimuli)
    out_t = ex_torch.extract_all_layers(stimuli)
    assert set(out_f) == set(out_t) == set(range(3))
    for layer in out_f:
        np.testing.assert_allclose(out_f[layer], out_t[layer], atol=1e-4,
                                   err_msg=f"layer {layer}")
    # Empty string -> zero vector on both backends
    # (reference language_model.py:133-136).
    assert not out_f[0][6].any() and not out_t[0][6].any()


@pytest.mark.parametrize("hook_type", ["hook_resid_pre", "hook_resid_post"])
def test_lm_flax_torch_single_layer_parity(gpt2_pair, stimuli, hook_type):
    fm, tm = gpt2_pair
    tok = StubTokenizer()
    common = {"model_name": "tiny", "tokenizer": tok, "last_token": True,
              "layer_idx": 1, "hook_type": hook_type, "batch_size": 4}
    ex_flax = LanguageModelFeatureExtractor(
        {**common, "model": fm, "backend": "flax"}
    )
    ex_torch = LanguageModelFeatureExtractor(
        {**common, "model": tm, "backend": "torch"}
    )
    np.testing.assert_allclose(
        ex_flax.extract_features(stimuli), ex_torch.extract_features(stimuli),
        atol=1e-4,
    )


@pytest.fixture(scope="module")
def w2v2_pair():
    import torch
    from transformers import (
        FlaxWav2Vec2Model,
        Wav2Vec2Config,
        Wav2Vec2FeatureExtractor,
        Wav2Vec2Model,
    )
    from transformers.modeling_flax_pytorch_utils import (
        load_flax_weights_in_pytorch_model,
    )

    cfg = Wav2Vec2Config(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, conv_dim=(8, 8), conv_kernel=(10, 3),
        conv_stride=(5, 2), num_feat_extract_layers=2,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=True, feat_extract_norm="layer",
    )
    fm = FlaxWav2Vec2Model(cfg, seed=0)
    tm = load_flax_weights_in_pytorch_model(Wav2Vec2Model(cfg), fm.params)
    tm.eval()
    torch.set_grad_enabled(False)
    return fm, tm, Wav2Vec2FeatureExtractor()


@pytest.fixture
def wav_file(tmp_path):
    from scipy.io import wavfile

    sr = 16000
    wav = (0.1 * rng.normal(size=3 * sr)).astype(np.float32)
    path = str(tmp_path / "story.wav")
    wavfile.write(path, sr, wav)
    return path


@pytest.mark.parametrize("pool", ["last", "mean"])
def test_speech_flax_torch_all_layer_parity(w2v2_pair, wav_file, pool):
    fm, tm, fe = w2v2_pair
    common = dict(model_name="tiny-w2v2", chunk_size=0.5, context_size=1.0,
                  pool=pool, target_sample_rate=16000, batch_size=4,
                  feature_extractor=fe)
    ex_flax = SpeechFeatureExtractor(model=fm, backend="flax", **common)
    ex_torch = SpeechFeatureExtractor(model=tm, backend="torch", **common)
    layers_f, times_f = ex_flax.extract_all_layers(wav_file)
    layers_t, times_t = ex_torch.extract_all_layers(wav_file)
    np.testing.assert_allclose(times_f, times_t)
    assert set(layers_f) == set(layers_t)
    for layer in layers_f:
        np.testing.assert_allclose(layers_f[layer], layers_t[layer],
                                   atol=1e-4, err_msg=f"layer {layer}")
