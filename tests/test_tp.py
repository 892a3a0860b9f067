"""Tensor-parallel LM extraction: placement rules, shard shapes, parity.

Runs on the 8-virtual-CPU-device mesh from conftest. Sharding annotations
must never change numerics — every test's ground truth is the unsharded
single-device forward.
"""

import numpy as np
import pytest

from jax.sharding import PartitionSpec as P

from litcoder_core_tpu.parallel.tp import (
    make_lm_mesh,
    pad_batch_rows,
    shard_lm_params,
    spec_for_param,
)


class StubTokenizer:
    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def encode(self, text):
        return [3 + (hash(w) % 500) for w in text.split()]


@pytest.fixture(scope="module")
def tiny_lm():
    from transformers import FlaxGPT2Model, GPT2Config

    config = GPT2Config(
        vocab_size=600, n_positions=128, n_embd=16, n_layer=3, n_head=2
    )
    return FlaxGPT2Model(config, seed=0), StubTokenizer()


def _extractor(tiny_lm, mesh=None, **kw):
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model, tokenizer = tiny_lm
    cfg = {
        "model_name": "tiny-gpt2-random",
        "model": model,
        "tokenizer": tokenizer,
        "last_token": True,
        "batch_size": 4,
    }
    if mesh is not None:
        cfg["mesh"] = mesh
    cfg.update(kw)
    return LanguageModelFeatureExtractor(cfg)


TEXTS = [
    "hello world",
    "the cat sat on the mat",
    "",
    "one more text here with a few extra tokens to vary length",
    "short",
]


# ---- placement rules ---------------------------------------------------------

def test_spec_column_parallel_gpt2_conv1d_layout():
    # GPT-2 Conv1D kernels are (out, in): c_attn is (3d, d), c_fc (4d, d)
    assert spec_for_param("h/0/attn/c_attn/kernel",
                          (48, 16), 4) == P("model", None)
    assert spec_for_param("h/0/attn/c_attn/bias", (48,), 4) == P("model")
    assert spec_for_param("h/2/mlp/c_fc/kernel",
                          (64, 16), 4) == P("model", None)


def test_spec_row_parallel_kernel_bias_replicated():
    # GPT-2 Conv1D c_proj is (out, in): row-parallel shards the IN dim
    assert spec_for_param("h/0/mlp/c_proj/kernel",
                          (16, 64), 4) == P(None, "model")
    # Dense-layout (in, out) row-parallel shards dim 0
    assert spec_for_param("model/layers/0/mlp/down_proj/kernel",
                          (64, 16), 4) == P("model", None)
    # row-parallel bias adds AFTER the reduction -> replicated
    assert spec_for_param("h/0/mlp/c_proj/bias", (16,), 4) == P()


def test_spec_replicates_embeddings_norms_and_unknown():
    assert spec_for_param("wte/embedding", (600, 16), 4) == P()
    assert spec_for_param("h/0/ln_1/scale", (16,), 4) == P()
    assert spec_for_param("some/novel/param/kernel", (16, 16), 4) == P()


def test_spec_divisibility_guard_falls_back_to_replicated():
    # out dim 18 not divisible by 4 -> replicate rather than crash
    assert spec_for_param("h/0/attn/c_attn/kernel", (18, 16), 4) == P()


def test_separate_projection_family_names():
    # Dense-layout families: kernel (in, out); col shards out, row shards in
    assert spec_for_param("model/layers/0/self_attn/q_proj/kernel",
                          (16, 16), 4) == P(None, "model")
    assert spec_for_param("model/layers/0/self_attn/o_proj/kernel",
                          (16, 16), 4) == P("model", None)
    assert spec_for_param("model/layers/0/mlp/up_proj/kernel",
                          (16, 64), 4) == P(None, "model")


# ---- mesh + placement on a real param tree ------------------------------------

def test_make_lm_mesh_shapes_and_overflow():
    mesh = make_lm_mesh(2, 4)
    assert dict(mesh.shape) == {"data": 2, "model": 4}
    with pytest.raises(RuntimeError, match="needs 16 devices"):
        make_lm_mesh(2, 8)


def test_param_shards_shrink_on_model_axis(tiny_lm):
    model, _ = tiny_lm
    mesh = make_lm_mesh(1, 4)
    placed = shard_lm_params(model.params, mesh)
    k = placed["h"]["0"]["attn"]["c_attn"]["kernel"]
    # Conv1D (48, 16) column-parallel over 4 devices -> (12, 16) per shard
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(12, 16)}
    v = placed["wte"]["embedding"]
    assert {s.data.shape for s in v.addressable_shards} == {(600, 16)}


# ---- numerical parity: sharded == unsharded ------------------------------------

@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_tp_forward_matches_unsharded(tiny_lm, mesh_shape):
    base = _extractor(tiny_lm)
    ref = base.extract_all_layers(TEXTS)
    tp = _extractor(tiny_lm, mesh=make_lm_mesh(*mesh_shape))
    got = tp.extract_all_layers(TEXTS)
    assert set(got) == set(ref)
    for layer in ref:
        np.testing.assert_allclose(got[layer], ref[layer],
                                   atol=1e-4, rtol=1e-4)


def test_tp_with_prefix_chains_matches(tiny_lm):
    """Chain-forward path (growing-prefix windows) under a 2-D mesh."""
    words = ("the quick brown fox jumps over the lazy dog again and "
             "again today").split()
    chains = [" ".join(words[: i + 1]) for i in range(len(words))]
    base = _extractor(tiny_lm, prefix_sharing=True)
    ref = base.extract_all_layers(chains)
    tp = _extractor(tiny_lm, mesh=make_lm_mesh(2, 4), prefix_sharing=True)
    got = tp.extract_all_layers(chains)
    for layer in ref:
        np.testing.assert_allclose(got[layer], ref[layer],
                                   atol=1e-4, rtol=1e-4)


def test_tp_mean_pooling_matches(tiny_lm):
    base = _extractor(tiny_lm, last_token=False)
    ref = base.extract_all_layers(TEXTS)
    tp = _extractor(tiny_lm, mesh=make_lm_mesh(4, 2), last_token=False)
    got = tp.extract_all_layers(TEXTS)
    for layer in ref:
        np.testing.assert_allclose(got[layer], ref[layer],
                                   atol=1e-4, rtol=1e-4)


# ---- guards -------------------------------------------------------------------

def test_mesh_requires_flax_backend(tiny_lm):
    import torch.nn as nn  # noqa: F401  (torch present in the image)

    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model, tokenizer = tiny_lm
    with pytest.raises(ValueError, match="requires the flax backend"):
        LanguageModelFeatureExtractor({
            "model_name": "x", "model": model, "tokenizer": tokenizer,
            "backend": "torch", "mesh": make_lm_mesh(1, 8),
        })


def test_pad_batch_rows():
    mesh = make_lm_mesh(4, 2)
    assert pad_batch_rows(5, mesh) == 3
    assert pad_batch_rows(8, mesh) == 0


# ---- speech extractor under a mesh ---------------------------------------------

@pytest.fixture(scope="module")
def tiny_speech():
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
    return FlaxWav2Vec2Model(cfg, seed=0), Wav2Vec2FeatureExtractor()


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    from scipy.io import wavfile

    sr = 16000
    wav = (0.1 * np.random.default_rng(3).normal(size=2 * sr)).astype(
        np.float32)
    path = str(tmp_path_factory.mktemp("tp_audio") / "story.wav")
    wavfile.write(path, sr, wav)
    return path


def test_wav2vec2_param_placement_names(tiny_speech):
    model, _ = tiny_speech
    mesh = make_lm_mesh(1, 4)
    placed = shard_lm_params(model.params, mesh)
    q = placed["encoder"]["layers"]["0"]["attention"]["q_proj"]["kernel"]
    assert {s.data.shape for s in q.addressable_shards} == {(16, 4)}
    ff = placed["encoder"]["layers"]["0"]["feed_forward"][
        "intermediate_dense"]["kernel"]
    assert {s.data.shape for s in ff.addressable_shards} == {(16, 8)}
    out = placed["encoder"]["layers"]["0"]["feed_forward"][
        "output_dense"]["kernel"]
    assert {s.data.shape for s in out.addressable_shards} == {(8, 16)}


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_speech_tp_forward_matches_unsharded(tiny_speech, wav_file,
                                             mesh_shape):
    from litcoder_core_tpu.features.speech_model import (
        SpeechFeatureExtractor,
    )

    model, fe = tiny_speech
    kw = dict(model_name="tiny-w2v2", chunk_size=0.25, context_size=1.0,
              model=model, feature_extractor=fe, batch_size=3)
    base = SpeechFeatureExtractor(**kw)
    ref_feats, ref_times = base.extract_features(wav_file)
    tp = SpeechFeatureExtractor(mesh=make_lm_mesh(*mesh_shape), **kw)
    got_feats, got_times = tp.extract_features(wav_file)
    np.testing.assert_array_equal(got_times, ref_times)
    np.testing.assert_allclose(got_feats, ref_feats, atol=1e-4, rtol=1e-4)


def test_speech_mesh_requires_flax(tiny_speech):
    from litcoder_core_tpu.features.speech_model import (
        SpeechFeatureExtractor,
    )

    model, fe = tiny_speech
    with pytest.raises(ValueError, match="requires the flax backend"):
        SpeechFeatureExtractor(
            model_name="x", chunk_size=0.1, context_size=1.0, model=model,
            feature_extractor=fe, backend="torch", mesh=make_lm_mesh(1, 8),
        )


def test_make_lm_mesh_rejects_oversized_data_axis():
    """n_data > device count must raise, not build an empty mesh."""
    with pytest.raises(RuntimeError, match="devices"):
        make_lm_mesh(16)
