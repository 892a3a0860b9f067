"""Feature extractors: wordrate, embeddings, LM (tiny random flax GPT-2)."""

import numpy as np
import pytest

from litcoder_core_tpu.features.embeddings import (
    SimpleKeyedVectors,
    StaticEmbeddingFeatureExtractor,
)
from litcoder_core_tpu.features.factory import FeatureExtractorFactory
from litcoder_core_tpu.features.simple_features import WordRateFeatureExtractor

rng = np.random.default_rng(5)


# ---- wordrate ----------------------------------------------------------------

def test_wordrate_reshapes():
    ex = WordRateFeatureExtractor({})
    out = ex.extract_features(np.arange(7.0))
    assert out.shape == (7, 1)
    out2 = ex.extract_features([1.0, 2.0, 3.0])
    assert out2.shape == (3, 1)
    with pytest.raises(ValueError, match="Unexpected stimuli shape"):
        ex.extract_features(np.zeros((3, 2)))


# ---- embeddings ----------------------------------------------------------------

@pytest.fixture
def kv_file(tmp_path):
    vocab = ["the", "cat", "sat", "mat"]
    vectors = rng.normal(size=(4, 5)).astype(np.float32)
    kv = SimpleKeyedVectors(vocab, vectors)
    path = str(tmp_path / "vecs.kv")
    kv.save_kv(path)
    return path, vocab, vectors


def test_embeddings_lookup(kv_file):
    path, vocab, vectors = kv_file
    ex = StaticEmbeddingFeatureExtractor({"vector_path": path})
    out = ex.extract_features(["the", "cat"])
    assert np.allclose(out, vectors[:2])


def test_embeddings_oov_policies(kv_file):
    path, vocab, vectors = kv_file
    tokens = ["the", "UNKNOWN", "cat"]
    for policy, check in [
        ("zero", lambda o: np.allclose(o[1], 0)),
        ("copy_prev", lambda o: np.allclose(o[1], vectors[0])),
        ("skip", lambda o: o.shape[0] == 2),
    ]:
        ex = StaticEmbeddingFeatureExtractor(
            {"vector_path": path, "oov_handling": policy, "lowercase": False}
        )
        out = ex.extract_features(tokens)
        assert check(out), policy
    ex = StaticEmbeddingFeatureExtractor(
        {"vector_path": path, "oov_handling": "error", "lowercase": False}
    )
    with pytest.raises(KeyError):
        ex.extract_features(tokens)


def test_embeddings_oov_before_first_valid(kv_file):
    path, _, vectors = kv_file
    ex = StaticEmbeddingFeatureExtractor(
        {"vector_path": path, "oov_handling": "copy_prev", "lowercase": False}
    )
    out = ex.extract_features(["UNK", "the"])
    assert np.allclose(out[0], 0.0)
    assert np.allclose(out[1], vectors[0])


def test_embeddings_word2vec_text_roundtrip(tmp_path):
    path = tmp_path / "w2v.w2v.txt"
    path.write_text("2 3\nfoo 1.0 2.0 3.0\nbar 4.0 5.0 6.0\n")
    ex = StaticEmbeddingFeatureExtractor({"vector_path": str(path)})
    out = ex.extract_features(["foo", "bar"])
    assert np.allclose(out, [[1, 2, 3], [4, 5, 6]])


def test_embeddings_glove_no_header(tmp_path):
    path = tmp_path / "glove.txt"
    path.write_text("foo 1.0 2.0\nbar 3.0 4.0\n")
    ex = StaticEmbeddingFeatureExtractor({"vector_path": str(path)})
    out = ex.extract_features("foo bar")
    assert np.allclose(out, [[1, 2], [3, 4]])


def test_embeddings_l2_normalize(kv_file):
    path, _, _ = kv_file
    ex = StaticEmbeddingFeatureExtractor(
        {"vector_path": path, "l2_normalize_tokens": True, "lowercase": False}
    )
    out = ex.extract_features(["the", "cat"])
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


# ---- language model (tiny random flax GPT-2) ---------------------------------

class StubTokenizer:
    """Offline word-hash tokenizer exposing the interface the extractor uses
    (encode + bos/pad/eos token ids). No network, deterministic."""

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
    model = FlaxGPT2Model(config, seed=0)
    return model, StubTokenizer()


@pytest.fixture(scope="module")
def lm_extractor(tiny_lm):
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model, tokenizer = tiny_lm
    return LanguageModelFeatureExtractor({
        "model_name": "tiny-gpt2-random",
        "model": model,
        "tokenizer": tokenizer,
        "last_token": True,
        "batch_size": 4,
    })


def test_lm_all_layers_shapes(lm_extractor):
    texts = ["hello world", "the cat sat", "", "one more text here"]
    out = lm_extractor.extract_all_layers(texts)
    assert set(out.keys()) == {0, 1, 2}
    for layer, feats in out.items():
        assert feats.shape == (4, 16)
    # empty text -> zeros in all layers (reference language_model.py:170-175)
    for layer in out:
        assert np.allclose(out[layer][2], 0.0)
    # layer 0 = hidden_states[0] = embeddings (resid_pre of block 0) differs
    # from layer 2
    assert not np.allclose(out[0][0], out[2][0])


def test_lm_batching_invariance(lm_extractor):
    """Features must not depend on batch composition or padding."""
    texts = ["short", "a much longer text with several tokens in it",
             "mid length text"]
    together = lm_extractor.extract_all_layers(texts)
    separate = [lm_extractor.extract_all_layers([t]) for t in texts]
    for layer in together:
        for i in range(3):
            assert np.allclose(
                together[layer][i], separate[i][layer][0], atol=1e-4
            ), (layer, i)


def test_lm_single_layer_matches_all_layers(lm_extractor):
    texts = ["hello world", "another"]
    all_layers = lm_extractor.extract_all_layers(texts)
    single = lm_extractor.extract_features(texts, layer_idx=1)
    assert np.allclose(single, all_layers[1], atol=1e-5)


def test_lm_mean_pooling(tiny_lm):
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model, tokenizer = tiny_lm
    ex = LanguageModelFeatureExtractor({
        "model_name": "tiny-gpt2-random",
        "model": model,
        "tokenizer": tokenizer,
        "last_token": False,
    })
    out = ex.extract_all_layers(["hello world"])
    assert out[0].shape == (1, 16)
    assert np.isfinite(out[0]).all()


def test_find_prefix_chains():
    from litcoder_core_tpu.features.language_model import _find_prefix_chains

    lists = [
        [1], [1, 5], [1, 5, 9], [1, 5, 9, 9],        # chain of 4
        [1, 7],                                       # breaks the chain
        [1, 8], [1, 8, 2], [1, 8, 2, 3], [1, 8, 2, 3, 4], [1, 8, 2, 3, 4, 5],
    ]
    chains, singles = _find_prefix_chains(lists, min_chain=4)
    assert chains == [[0, 1, 2, 3], [5, 6, 7, 8, 9]]
    assert singles == [4]


@pytest.mark.parametrize("last_token", [True, False])
def test_lm_prefix_sharing_exactness(tiny_lm, last_token):
    """The chain fast path must reproduce the per-window forwards exactly
    (causal model: prefix hidden states are invariant to the suffix)."""
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model, tokenizer = tiny_lm
    # fullcontext-style growing windows + a truncation break + a second chain
    words = "the quick brown fox jumps over a lazy dog again and again".split()
    texts = [" ".join(words[:i + 1]) for i in range(8)]
    texts += [" ".join(words[3:3 + i + 1]) for i in range(4)]

    def build(prefix_sharing):
        return LanguageModelFeatureExtractor({
            "model_name": "tiny-gpt2-random",
            "model": model,
            "tokenizer": tokenizer,
            "last_token": last_token,
            "prefix_sharing": prefix_sharing,
            "batch_size": 3,
        })

    fast = build(True).extract_all_layers(texts)
    slow = build(False).extract_all_layers(texts)
    for layer in slow:
        np.testing.assert_allclose(
            fast[layer], slow[layer], rtol=0, atol=2e-5
        )


def test_lm_config_validation():
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    with pytest.raises(ValueError, match="model_name"):
        LanguageModelFeatureExtractor({})
    with pytest.raises(ValueError, match="context_type"):
        LanguageModelFeatureExtractor(
            {"model_name": "x", "context_type": "bogus"}
        )


# ---- factory -------------------------------------------------------------------

def test_factory_unknown_modality():
    with pytest.raises(ValueError, match="Unsupported modality"):
        FeatureExtractorFactory.create_extractor("bogus", "x", {})


def test_factory_wordrate_roundtrip():
    ex = FeatureExtractorFactory.create_extractor("wordrate", "wordrate", {})
    assert isinstance(ex, WordRateFeatureExtractor)


def test_factory_register_custom():
    class MyExtractor(WordRateFeatureExtractor):
        pass

    FeatureExtractorFactory.register_extractor("my_custom", MyExtractor)
    try:
        ex = FeatureExtractorFactory.create_extractor("my_custom", "m", {})
        assert isinstance(ex, MyExtractor)
    finally:
        del FeatureExtractorFactory._extractors["my_custom"]


class SpecialsAddingTokenizer(StubTokenizer):
    """Tokenizer that injects BOS/EOS unless add_special_tokens=False
    (llama-style) — the extractor must suppress that."""

    def encode(self, text, add_special_tokens=True):
        ids = [3 + (hash(w) % 500) for w in text.split()]
        if add_special_tokens:
            return [self.bos_token_id] + ids + [self.eos_token_id]
        return ids


def test_lm_encode_suppresses_auto_specials(tiny_lm):
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model, _ = tiny_lm
    ex = LanguageModelFeatureExtractor({
        "model_name": "tiny", "model": model,
        "tokenizer": SpecialsAddingTokenizer(),
    })
    ids = ex._encode("hello world")
    assert ids[0] == 1                    # exactly one BOS
    assert ids.count(1) == 1
    assert 2 not in ids                   # no EOS appended


def test_lm_negative_layer_idx(lm_extractor):
    """-1 = last block (Python indexing); out-of-range raises loudly."""
    texts = ["hello there world"]
    all_layers = lm_extractor.extract_all_layers(texts)
    last = lm_extractor.extract_features(texts, layer_idx=-1)
    np.testing.assert_allclose(last, all_layers[2], atol=1e-6)
    with pytest.raises(ValueError, match="out of range"):
        lm_extractor.extract_features(texts, layer_idx=7)


def test_lm_injected_model_backend_auto(tiny_lm):
    """backend='auto' with an injected flax model must use the flax path."""
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model, tokenizer = tiny_lm
    ex = LanguageModelFeatureExtractor({
        "model_name": "tiny", "model": model, "tokenizer": tokenizer,
        "backend": "auto",
    })
    assert ex.backend == "flax"
    out = ex.extract_features(["hello world"], layer_idx=0)
    assert np.isfinite(out).all()


def test_embeddings_truncated_binary_raises(tmp_path):
    import struct

    from litcoder_core_tpu.features.embeddings import SimpleKeyedVectors

    path = tmp_path / "trunc.bin"
    with open(path, "wb") as f:
        f.write(b"5 4\n")                       # declares 5 vectors
        f.write(b"only ")                       # ... provides one
        f.write(struct.pack("<4f", 1, 2, 3, 4))
    with pytest.raises(ValueError, match="truncated"):
        SimpleKeyedVectors.load_word2vec_format(str(path), binary=True)


@pytest.mark.parametrize("last_token", [True, False])
def test_lm_bf16_close_to_fp32(tiny_lm, last_token):
    """dtype='bfloat16' runs the forward in bf16 but must stay close to the
    fp32 features (opt-in fast path; fp32 stays the parity default)."""
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model, tokenizer = tiny_lm
    common = {"model_name": "tiny", "model": model, "tokenizer": tokenizer,
              "last_token": last_token, "batch_size": 4}
    texts = ["hello world", "the cat sat on the mat",
             "one more text here with a few extra tokens"]
    f32 = LanguageModelFeatureExtractor(common).extract_all_layers(texts)
    bf16 = LanguageModelFeatureExtractor(
        {**common, "dtype": "bfloat16"}
    ).extract_all_layers(texts)
    for layer in f32:
        a, b = f32[layer], bf16[layer]
        assert b.dtype == np.float32
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
        assert rel < 0.05, (layer, rel)


def test_lm_bf16_prefix_sharing_close(tiny_lm):
    """bf16 + prefix chains: the chain forward's pooled reads must also
    track fp32 (fp32 cumsum guards the mean-pool path)."""
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model, tokenizer = tiny_lm
    words = "the quick brown fox jumps over the lazy dog again".split()
    texts = [" ".join(words[: i + 1]) for i in range(len(words))]
    common = {"model_name": "tiny", "model": model, "tokenizer": tokenizer,
              "last_token": False, "prefix_sharing": True, "batch_size": 4}
    f32 = LanguageModelFeatureExtractor(common).extract_all_layers(texts)
    bf16 = LanguageModelFeatureExtractor(
        {**common, "dtype": "bfloat16"}
    ).extract_all_layers(texts)
    for layer in f32:
        rel = (np.linalg.norm(f32[layer] - bf16[layer])
               / max(np.linalg.norm(f32[layer]), 1e-6))
        assert rel < 0.05, (layer, rel)


def test_lm_dtype_validation(tiny_lm):
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    model, tokenizer = tiny_lm
    with pytest.raises(ValueError, match="dtype"):
        LanguageModelFeatureExtractor({
            "model_name": "tiny", "model": model, "tokenizer": tokenizer,
            "dtype": "float16",
        })


def test_lm_bf16_requires_flax():
    from transformers import GPT2Config, GPT2Model

    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )

    cfg = GPT2Config(vocab_size=600, n_positions=64, n_embd=16, n_layer=2,
                     n_head=2)
    with pytest.raises(ValueError, match="bfloat16.*flax|flax.*bfloat16"):
        LanguageModelFeatureExtractor({
            "model_name": "tiny", "model": GPT2Model(cfg),
            "tokenizer": StubTokenizer(), "backend": "torch",
            "dtype": "bfloat16",
        })


def test_factory_lm_cache_keys_by_dtype(tiny_lm, tmp_path):
    """bf16 LM features must not collide with fp32 ones in the cache."""
    from litcoder_core_tpu.features.factory import FeatureExtractorFactory
    from litcoder_core_tpu.features.language_model import (
        LanguageModelFeatureExtractor,
    )
    from litcoder_core_tpu.utils.caches import ActivationCache

    model, tokenizer = tiny_lm

    class FakeAssembly:
        def get_stimuli(self):
            return [["hello world", "the cat sat"]]

    def run(dtype):
        ex = LanguageModelFeatureExtractor({
            "model_name": "tiny", "model": model, "tokenizer": tokenizer,
            "dtype": dtype,
        })
        ex.activation_cache = ActivationCache(cache_dir=str(tmp_path))
        return FeatureExtractorFactory._extract_language_model_features(
            ex, FakeAssembly(), "story", 0, 0, 16, "lebel")

    run("float32")
    n_after_f32 = len(list(tmp_path.iterdir()))
    run("bfloat16")
    assert len(list(tmp_path.iterdir())) == 2 * n_after_f32
