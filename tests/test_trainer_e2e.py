"""End-to-end trainer tests mirroring the reference's de-facto smoke test
(train_simple.py: assembly -> wordrate -> FIR -> trim -> nested-CV ridge)."""

import numpy as np
import pytest

from litcoder_core_tpu import (
    AbstractTrainer,
    Downsampler,
    NestedCVModel,
    SimpleNeuroidAssembly,
    StoryData,
    load_assembly,
    save_assembly,
)
from litcoder_core_tpu.features.factory import FeatureExtractorFactory

rng = np.random.default_rng(7)


N_VOX = 12
# ONE ground-truth weight set shared by all synthetic stories, so the signal
# transfers from train stories to the held-out test story.
TRUE_WEIGHTS = np.random.default_rng(99).normal(size=(4, N_VOX)).astype(
    np.float32
)


def _make_story(name: str, n_trs: int = 80, n_vox: int = N_VOX,
                words_per_tr: float = 3.0, signal_scale: float = 1.0):
    """Synthetic story whose brain data carries word-rate signal.

    Seeded per NAME (not from a shared stream): several test files import
    this helper, and drawing from one module-level stream made a story's
    contents depend on which other tests ran first — a real order-
    dependent flake (it once surfaced the trailing-empty-TR downsampler
    bug only in full-suite runs)."""
    import zlib

    rng = np.random.default_rng(zlib.crc32(name.encode()))
    n_words = int(n_trs * words_per_tr)
    tr = 2.0
    tr_times = np.arange(n_trs) * tr + tr / 2
    data_times = np.sort(rng.uniform(0, n_trs * tr, n_words))
    split_indices = np.clip((data_times // tr).astype(int), 0, n_trs - 1)
    word_rates = np.bincount(split_indices, minlength=n_trs).astype(np.float32)

    # Brain data = HRF-ish delayed word rate + noise.
    delayed = np.stack(
        [np.roll(word_rates, d) for d in [1, 2, 3, 4]], axis=1
    ).astype(np.float32)
    brain = signal_scale * delayed @ TRUE_WEIGHTS + rng.normal(
        size=(n_trs, n_vox)
    ).astype(np.float32)

    words = [f"w{i}" for i in range(n_words)]
    return StoryData(
        name=name,
        brain_data=brain.astype(np.float32),
        stimuli=words,  # one "context" per word
        split_indices=split_indices.tolist(),
        tr_times=tr_times,
        data_times=data_times,
        word_rates=word_rates,
        words=words,
    )


@pytest.fixture
def assembly():
    stories = [_make_story(f"story{i}") for i in range(4)]
    return SimpleNeuroidAssembly(stories, validation_method="outer")


def test_assembly_accessors(assembly):
    assert len(assembly.stories) == 4
    assert assembly.get_validation_method() == "outer"
    assert assembly.data.shape[0] == sum(
        sd.brain_data.shape[0] for sd in assembly.story_data.values()
    )
    assert len(assembly.get_word_rates()) == 4
    # coords are per-STIMULUS (word), not per-TR (reference assemblies.py:29-42)
    total_stimuli = sum(
        len(sd.stimuli) for sd in assembly.story_data.values()
    )
    assert assembly.get_coord("story_id").shape[0] == total_stimuli


def test_assembly_pickle_roundtrip(assembly, tmp_path):
    path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, path)
    loaded = load_assembly(path)
    assert loaded.stories == assembly.stories
    assert np.allclose(loaded.data, assembly.data)


def test_reference_pickle_class_aliasing(assembly, tmp_path):
    """A pickle naming the ORIGINAL encoding.assembly.* classes must load."""
    import pickle
    import sys
    import types

    # Fabricate the reference's module layout and pickle the assembly under
    # those class paths, exactly as a reference-written pickle would record.
    mods = {
        "encoding": types.ModuleType("encoding"),
        "encoding.assembly": types.ModuleType("encoding.assembly"),
        "encoding.assembly.assemblies":
            types.ModuleType("encoding.assembly.assemblies"),
        "encoding.assembly.story_data":
            types.ModuleType("encoding.assembly.story_data"),
    }
    mods["encoding.assembly.assemblies"].SimpleNeuroidAssembly = (
        SimpleNeuroidAssembly
    )
    mods["encoding.assembly.story_data"].StoryData = StoryData
    saved_modules = {k: sys.modules.get(k) for k in mods}
    saved_attrs = (SimpleNeuroidAssembly.__module__, StoryData.__module__)
    sys.modules.update(mods)
    SimpleNeuroidAssembly.__module__ = "encoding.assembly.assemblies"
    StoryData.__module__ = "encoding.assembly.story_data"
    try:
        path = tmp_path / "ref_style.pkl"
        path.write_bytes(pickle.dumps(assembly))
    finally:
        SimpleNeuroidAssembly.__module__, StoryData.__module__ = saved_attrs
        for k, v in saved_modules.items():
            if v is None:
                del sys.modules[k]
            else:
                sys.modules[k] = v

    assert "encoding.assembly" not in sys.modules  # loader must not need it
    loaded = load_assembly(str(path))
    assert loaded.stories == assembly.stories
    assert isinstance(loaded, SimpleNeuroidAssembly)


def test_trainer_wordrate_train_test_split(assembly, tmp_path):
    """The train_simple.py-equivalent run: wordrate + FIR + LeBel trimming."""
    extractor = FeatureExtractorFactory.create_extractor(
        "wordrate", "wordrate", {}, cache_dir=str(tmp_path / "cache")
    )
    trainer = AbstractTrainer(
        assembly=assembly,
        feature_extractors=[extractor],
        downsampler=Downsampler(),
        model=NestedCVModel(model_name="ridge_regression", seed=0),
        fir_delays=[1, 2, 3, 4],
        trimming_config={
            "train_features_start": 10, "train_features_end": -5,
            "train_targets_start": 10, "train_targets_end": -5,
            "test_features_start": 10, "test_features_end": -5,
            "test_targets_start": 10, "test_targets_end": -5,
        },
        use_train_test_split=True,
        dataset_type="lebel",
        logger_backend="none",
        results_dir=str(tmp_path / "results"),
    )
    metrics = trainer.train(chunk_length=10, n_inner_folds=3)
    assert metrics["median_score"] > 0.25  # word-rate signal recovered
    assert "n_significant" in metrics
    # Artifacts persisted.
    runs = trainer.model_saver.list_runs()
    assert len(runs) == 1


def test_trainer_concatenated_mode(assembly, tmp_path):
    extractor = FeatureExtractorFactory.create_extractor(
        "wordrate", "wordrate", {}, cache_dir=str(tmp_path / "cache")
    )
    trainer = AbstractTrainer(
        assembly=assembly,
        feature_extractors=[extractor],
        downsampler=Downsampler(),
        model=NestedCVModel(seed=0),
        fir_delays=[1, 2, 3, 4],
        trimming_config={},
        use_train_test_split=False,
        dataset_type="narratives",
        logger_backend="none",
        results_dir=str(tmp_path / "results"),
    )
    metrics = trainer.train(
        chunk_length=10, n_outer_folds=3, n_inner_folds=3
    )
    assert metrics["median_score"] > 0.2
    assert "majority_significant_mask" in metrics


def test_trainer_lm_features_with_cache(assembly, tmp_path):
    """LM modality through the full trainer, twice (second run = cache hit)."""
    from transformers import FlaxGPT2Model, GPT2Config

    from tests.test_features import StubTokenizer

    config = GPT2Config(vocab_size=600, n_positions=64, n_embd=8,
                        n_layer=2, n_head=2)
    model = FlaxGPT2Model(config, seed=0)
    tokenizer = StubTokenizer()
    extractor = FeatureExtractorFactory.create_extractor(
        "language_model", "tiny-gpt2",
        {"model": model, "tokenizer": tokenizer, "last_token": True,
         "batch_size": 16},
        cache_dir=str(tmp_path / "cache"),
    )
    kwargs = dict(
        assembly=assembly,
        feature_extractors=[extractor],
        downsampler=Downsampler(),
        model=NestedCVModel(seed=0),
        fir_delays=[1, 2],
        trimming_config={},
        use_train_test_split=False,
        layer_idx=1,
        dataset_type="narratives",
        logger_backend="none",
        results_dir=str(tmp_path / "results"),
        downsample_config={"method": "average"},
        story_selection=[assembly.stories[0], assembly.stories[1]],
    )
    m1 = AbstractTrainer(**kwargs).train(
        chunk_length=10, n_outer_folds=3, n_inner_folds=3
    )
    # Cache files written once per story.
    n_cache = len(list((tmp_path / "cache").glob("*.npz")))
    assert n_cache == 2
    m2 = AbstractTrainer(**kwargs).train(
        chunk_length=10, n_outer_folds=3, n_inner_folds=3
    )
    assert len(list((tmp_path / "cache").glob("*.npz"))) == 2  # hit, no new
    assert np.allclose(m1["median_score"], m2["median_score"], atol=1e-6)


def test_trainer_multi_extractor_concat(assembly, tmp_path):
    """wordrate + embeddings hstack with timepoint alignment
    (reference: trainer.py:146-150)."""
    from litcoder_core_tpu.features.embeddings import SimpleKeyedVectors

    n_words_total = max(len(sd.words) for sd in assembly.story_data.values())
    vocab = [f"w{i}" for i in range(n_words_total)]
    kv = SimpleKeyedVectors(vocab, rng.normal(size=(len(vocab), 6)))
    kv_path = str(tmp_path / "v.kv")
    kv.save_kv(kv_path)

    wordrate = FeatureExtractorFactory.create_extractor(
        "wordrate", "wordrate", {}
    )
    emb = FeatureExtractorFactory.create_extractor(
        "embeddings", "test-vecs",
        {"vector_path": kv_path, "lowercase": False},
    )
    trainer = AbstractTrainer(
        assembly=assembly,
        feature_extractors=[wordrate, emb],
        downsampler=Downsampler(),
        model=NestedCVModel(seed=0),
        fir_delays=[1, 2],
        trimming_config={},
        use_train_test_split=False,
        dataset_type="narratives",
        logger_backend="none",
        results_dir=str(tmp_path / "results"),
        downsample_config={"method": "average"},
        story_selection=[assembly.stories[0]],
    )
    feats = trainer.extract_and_downsample_features()
    story0 = assembly.stories[0]
    # 1 wordrate col + 6 embedding cols
    assert feats[story0].shape[1] == 7


def test_trainer_banded_mode(assembly, tmp_path):
    """Banded ridge through the trainer: wordrate + embeddings as separate
    feature spaces (concat_features=False)."""
    from litcoder_core_tpu.features.embeddings import SimpleKeyedVectors
    from litcoder_core_tpu.models.banded import BandedRidgeModel

    n_words_total = max(len(sd.words) for sd in assembly.story_data.values())
    vocab = [f"w{i}" for i in range(n_words_total)]
    kv = SimpleKeyedVectors(vocab, rng.normal(size=(len(vocab), 5)))
    kv_path = str(tmp_path / "v.kv")
    kv.save_kv(kv_path)

    wordrate = FeatureExtractorFactory.create_extractor(
        "wordrate", "wordrate", {}
    )
    emb = FeatureExtractorFactory.create_extractor(
        "embeddings", "vecs", {"vector_path": kv_path, "lowercase": False},
    )
    trainer = AbstractTrainer(
        assembly=assembly,
        feature_extractors=[wordrate, emb],
        downsampler=Downsampler(),
        model=BandedRidgeModel(seed=0, n_gammas=4),
        fir_delays=[1, 2],
        trimming_config={
            "train_features_start": 5, "train_features_end": -5,
            "train_targets_start": 5, "train_targets_end": -5,
            "test_features_start": 5, "test_features_end": -5,
            "test_targets_start": 5, "test_targets_end": -5,
        },
        use_train_test_split=True,
        dataset_type="lebel",
        logger_backend="none",
        results_dir=str(tmp_path / "results"),
        downsample_config={"method": "average"},
        concat_features=False,
    )
    metrics = trainer.train(chunk_length=10, n_inner_folds=3)
    # Wordrate band carries the signal; the fit should recover it.
    assert metrics["median_score"] > 0.2
    assert "best_gammas" in metrics


def test_trainer_banded_wordless_final_tr(assembly, tmp_path):
    """Regression: a story whose LAST TR contains no words. The split-index
    downsampler used to size its output max(split)+1 (reference semantics,
    reference downsampling.py:70,121), silently dropping the trailing TR —
    features then had one row fewer than the brain data and banded training
    crashed with a contraction-shape mismatch (surfaced order-dependently
    in full-suite runs; see _per_word_pool)."""
    import dataclasses

    from litcoder_core_tpu.features.embeddings import SimpleKeyedVectors
    from litcoder_core_tpu.models.banded import BandedRidgeModel

    stories = []
    for name in assembly.stories:
        sd = assembly.story_data[name]
        n_trs = len(sd.tr_times)
        # Squeeze every word into the first n_trs-1 TRs.
        scale = (n_trs - 1) / n_trs
        data_times = np.asarray(sd.data_times) * scale
        split = np.clip((data_times // 2.0).astype(int), 0, n_trs - 2)
        stories.append(dataclasses.replace(
            sd, data_times=data_times, split_indices=split.tolist(),
        ))
        assert max(stories[-1].split_indices) < n_trs - 1
    asm = SimpleNeuroidAssembly(stories, validation_method="outer")

    n_words_total = max(len(sd.words) for sd in asm.story_data.values())
    vocab = [f"w{i}" for i in range(n_words_total)]
    kv = SimpleKeyedVectors(vocab, rng.normal(size=(len(vocab), 5)))
    kv_path = str(tmp_path / "v.kv")
    kv.save_kv(kv_path)
    wordrate = FeatureExtractorFactory.create_extractor(
        "wordrate", "wordrate", {}
    )
    emb = FeatureExtractorFactory.create_extractor(
        "embeddings", "vecs", {"vector_path": kv_path, "lowercase": False},
    )
    trainer = AbstractTrainer(
        assembly=asm,
        feature_extractors=[wordrate, emb],
        downsampler=Downsampler(),
        model=BandedRidgeModel(seed=0, n_gammas=3),
        fir_delays=[1, 2],
        trimming_config={
            "train_features_start": 5, "train_features_end": -5,
            "train_targets_start": 5, "train_targets_end": -5,
            "test_features_start": 5, "test_features_end": -5,
            "test_targets_start": 5, "test_targets_end": -5,
        },
        use_train_test_split=True,
        dataset_type="lebel",
        logger_backend="none",
        results_dir=str(tmp_path / "results"),
        downsample_config={"method": "average"},
        concat_features=False,
    )
    metrics = trainer.train(chunk_length=10, n_inner_folds=3)
    assert np.isfinite(metrics["median_score"])


def test_trainer_banded_requires_train_test_split(assembly, tmp_path):
    from litcoder_core_tpu.models.banded import BandedRidgeModel

    wordrate = FeatureExtractorFactory.create_extractor(
        "wordrate", "wordrate", {}
    )
    trainer = AbstractTrainer(
        assembly=assembly,
        feature_extractors=[wordrate],
        downsampler=Downsampler(),
        model=BandedRidgeModel(seed=0),
        fir_delays=[1, 2],
        trimming_config={},
        use_train_test_split=False,
        dataset_type="narratives",
        logger_backend="none",
        results_dir=str(tmp_path / "results"),
        concat_features=False,
    )
    with pytest.raises(ValueError, match="requires use_train_test_split"):
        trainer.train()


def test_layer_sweep(assembly, tmp_path):
    """Layer sweep reuses the activation cache after the first layer."""
    from transformers import FlaxGPT2Model, GPT2Config

    from litcoder_core_tpu.sweeps import run_layer_sweep
    from tests.test_features import StubTokenizer

    config = GPT2Config(vocab_size=600, n_positions=64, n_embd=8,
                        n_layer=3, n_head=2)
    model = FlaxGPT2Model(config, seed=0)
    extractor = FeatureExtractorFactory.create_extractor(
        "language_model", "tiny-gpt2-sweep",
        {"model": model, "tokenizer": StubTokenizer(), "last_token": True},
        cache_dir=str(tmp_path / "cache"),
    )

    def make_trainer(layer_idx):
        return AbstractTrainer(
            assembly=assembly,
            feature_extractors=[extractor],
            downsampler=Downsampler(),
            model=NestedCVModel(seed=0),
            fir_delays=[1, 2],
            trimming_config={},
            use_train_test_split=False,
            layer_idx=layer_idx,
            dataset_type="narratives",
            logger_backend="none",
            results_dir=str(tmp_path / "results"),
            downsample_config={"method": "average"},
            story_selection=[assembly.stories[0], assembly.stories[1]],
        )

    results = run_layer_sweep(
        make_trainer, layers=[0, 1, 2],
        train_kwargs=dict(chunk_length=10, n_outer_folds=3,
                          n_inner_folds=3),
    )
    assert [r["layer"] for r in results] == [0, 1, 2]
    # One cache file per story despite 3 layer runs.
    assert len(list((tmp_path / "cache").glob("*.npz"))) == 2


def test_subject_sweep(assembly, tmp_path):
    """Subject sweep over CLI configs; bad configs recorded, not raised."""
    from litcoder_core_tpu.assembly.assembly_loader import save_assembly
    from litcoder_core_tpu.sweeps import run_subject_sweep

    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)
    base = dict(
        dataset_type="lebel", assembly_path=asm_path, data_dir=None,
        subject="S1", tr=2.0, context_type="fullcontext", use_volume=False,
        story_idx=None, modalities=["wordrate"], model_names=["wordrate"],
        layer_idx=9, last_token=False, n_outer_folds=5, n_inner_folds=3,
        folding_type="chunked", chunk_length=10, singcutoff=1e-10,
        single_alpha=True, seed=0, downsample_method="lanczos",
        lanczos_cutoff_mult=1.0, lanczos_window=3, normalize_features=False,
        normalize_targets=False, ndelays=4, lookback=256,
        cache_dir=str(tmp_path / "cache"),
        results_dir=str(tmp_path / "results"), logger_backend="none",
        train_features_start=5, train_features_end=-5,
        train_targets_start=5, train_targets_end=-5,
        test_features_start=5, test_features_end=-5,
        test_targets_start=5, test_targets_end=-5,
    )
    bad = dict(base, assembly_path=str(tmp_path / "missing.pkl"),
               subject="S2")
    rows = run_subject_sweep([base, bad])
    assert rows[0]["error"] is None and rows[0]["median_score"] > 0.2
    assert rows[1]["error"] is not None and np.isnan(rows[1]["median_score"])


def test_subject_sweep_resume(assembly, tmp_path):
    """Interrupted sweeps resume: completed configs are checkpoint-skipped."""
    from litcoder_core_tpu.assembly.assembly_loader import save_assembly
    from litcoder_core_tpu.sweeps import run_subject_sweep

    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)
    config = dict(
        dataset_type="lebel", assembly_path=asm_path, data_dir=None,
        subject="S1", tr=2.0, context_type="fullcontext", use_volume=False,
        story_idx=None, modalities=["wordrate"], model_names=["wordrate"],
        layer_idx=9, last_token=False, n_outer_folds=5, n_inner_folds=3,
        folding_type="chunked", chunk_length=10, singcutoff=1e-10,
        single_alpha=True, seed=0, downsample_method="lanczos",
        lanczos_cutoff_mult=1.0, lanczos_window=3, normalize_features=False,
        normalize_targets=False, ndelays=4, lookback=256,
        cache_dir=str(tmp_path / "cache"),
        results_dir=str(tmp_path / "results"), logger_backend="none",
        train_features_start=5, train_features_end=-5,
        train_targets_start=5, train_targets_end=-5,
        test_features_start=5, test_features_end=-5,
        test_targets_start=5, test_targets_end=-5,
    )
    ckpt = str(tmp_path / "sweep_ckpt")
    r1 = run_subject_sweep([config], checkpoint_dir=ckpt)
    assert r1[0]["error"] is None
    n_runs_after_first = len(list((tmp_path / "results").glob("run_*")))
    # Second invocation: checkpoint hit, no new training run.
    r2 = run_subject_sweep([config], checkpoint_dir=ckpt)
    assert r2 == r1
    assert len(list((tmp_path / "results").glob("run_*"))) == \
        n_runs_after_first


# ---------------------------------------------------------------- fused path


def _lanczos_trainer(assembly, tmp_path, extractors, fused, **overrides):
    kwargs = dict(
        assembly=assembly,
        feature_extractors=extractors,
        downsampler=Downsampler(),
        model=NestedCVModel(seed=0),
        fir_delays=[1, 2, 3, 4],
        trimming_config={},
        use_train_test_split=False,
        dataset_type="narratives",
        logger_backend="none",
        results_dir=str(tmp_path / "results"),
        downsample_config={"method": "lanczos", "window": 3,
                           "cutoff_mult": 1.0},
        fused_downsample_fir=fused,
    )
    kwargs.update(overrides)
    return AbstractTrainer(**kwargs)


def _emb_extractor(assembly, tmp_path, dim=6):
    from litcoder_core_tpu.features.embeddings import SimpleKeyedVectors

    n_words_total = max(len(sd.words) for sd in assembly.story_data.values())
    vocab = [f"w{i}" for i in range(n_words_total)]
    kv = SimpleKeyedVectors(vocab, rng.normal(size=(len(vocab), dim)))
    kv_path = str(tmp_path / "fused_vecs.kv")
    kv.save_kv(kv_path)
    return FeatureExtractorFactory.create_extractor(
        "embeddings", "fused-vecs",
        {"vector_path": kv_path, "lowercase": False},
    )


def test_fused_lanczos_fir_matches_two_stage(assembly, tmp_path):
    """The fused Lanczos+FIR kernel must equal Downsampler('lanczos') ->
    FIR.make_delayed exactly (<=1e-5), including multi-extractor column
    interleaving with a non-downsampled (wordrate) space."""
    wordrate = FeatureExtractorFactory.create_extractor(
        "wordrate", "wordrate", {}
    )
    emb = _emb_extractor(assembly, tmp_path)

    two_stage = _lanczos_trainer(assembly, tmp_path, [wordrate, emb],
                                 fused=False)
    fused = _lanczos_trainer(assembly, tmp_path, [wordrate, emb],
                             fused=True)
    ref = two_stage.apply_fir_delays(
        two_stage.extract_and_downsample_features()
    )
    got = fused.extract_and_delay_features_fused()
    assert set(got) == set(ref)
    for story in ref:
        assert got[story].shape == ref[story].shape
        np.testing.assert_allclose(got[story], ref[story], atol=1e-5)


def test_fused_lanczos_fir_matches_two_stage_banded(assembly, tmp_path):
    """Per-space (concat_features=False) fused output equals the two-stage
    per-space pipeline."""
    wordrate = FeatureExtractorFactory.create_extractor(
        "wordrate", "wordrate", {}
    )
    emb = _emb_extractor(assembly, tmp_path)
    two_stage = _lanczos_trainer(assembly, tmp_path, [wordrate, emb],
                                 fused=False, concat_features=False)
    fused = _lanczos_trainer(assembly, tmp_path, [wordrate, emb],
                             fused=True, concat_features=False)
    ref = two_stage.apply_fir_delays(
        two_stage.extract_and_downsample_features()
    )
    got = fused.extract_and_delay_features_fused()
    for story in ref:
        assert len(got[story]) == len(ref[story])
        for g, r in zip(got[story], ref[story]):
            np.testing.assert_allclose(g, r, atol=1e-5)


def test_fused_auto_engages_and_trains(assembly, tmp_path):
    """fused_downsample_fir='auto' (the default) routes lanczos+FIR configs
    through the fused stage and produces the same metrics as two-stage."""
    emb = _emb_extractor(assembly, tmp_path)
    fused = _lanczos_trainer(assembly, tmp_path, [emb], fused="auto")
    assert fused._fused_eligible()
    m_fused = fused.train(chunk_length=10, n_outer_folds=3, n_inner_folds=3)
    two_stage = _lanczos_trainer(assembly, tmp_path, [emb], fused=False)
    m_ref = two_stage.train(chunk_length=10, n_outer_folds=3,
                            n_inner_folds=3)
    assert np.allclose(m_fused["median_score"], m_ref["median_score"],
                       atol=1e-4)


def test_fused_auto_disengages_for_other_methods(assembly, tmp_path):
    emb = _emb_extractor(assembly, tmp_path)
    t = _lanczos_trainer(
        assembly, tmp_path, [emb], fused="auto",
        downsample_config={"method": "average"},
    )
    assert not t._fused_eligible()
    # rectify splits pos/neg parts -> not expressible as one kernel matmul.
    t2 = _lanczos_trainer(
        assembly, tmp_path, [emb], fused="auto",
        downsample_config={"method": "lanczos", "window": 3,
                           "cutoff_mult": 1.0, "rectify": True},
    )
    assert not t2._fused_eligible()


def test_fused_true_raises_when_ineligible(assembly, tmp_path):
    emb = _emb_extractor(assembly, tmp_path)
    t = _lanczos_trainer(
        assembly, tmp_path, [emb], fused=True,
        downsample_config={"method": "average"},
    )
    with pytest.raises(ValueError, match="fused_downsample_fir"):
        t._fused_eligible()


# ------------------------------------------------------- device-resident path


def test_device_resident_structuring_matches_host(assembly, tmp_path):
    """device_resident=True keeps arrays on device through structure_data;
    structured matrices must match the host numpy path elementwise."""
    emb = _emb_extractor(assembly, tmp_path)
    host = _lanczos_trainer(assembly, tmp_path, [emb], fused=True,
                            use_train_test_split=True,
                            trimming_config={"train_features_start": 3,
                                             "test_targets_start": 2},
                            device_resident=False)
    dev = _lanczos_trainer(assembly, tmp_path, [emb], fused=True,
                           use_train_test_split=True,
                           trimming_config={"train_features_start": 3,
                                            "test_targets_start": 2},
                           device_resident=True)
    ref = host.structure_data(host.extract_and_delay_features_fused())
    got = dev.structure_data(dev.extract_and_delay_features_fused())
    assert set(got) == set(ref)
    import jax

    for key in ref:
        assert isinstance(got[key], jax.Array), key  # actually resident
        np.testing.assert_allclose(np.asarray(got[key]), ref[key],
                                   atol=2e-5, rtol=1e-5)


def test_brain_prefetch_structuring_identical(assembly, tmp_path):
    """Round-5 overlap: train() enqueues the per-story response
    transfers before extraction so they ride the link while the chip
    runs forwards. Prefetched structuring must be IDENTICAL to the
    transfer-at-structuring path, the prefetch must be consumed
    exactly once, and the HBM budget gate must disable it."""
    emb = _emb_extractor(assembly, tmp_path)
    dev = _lanczos_trainer(assembly, tmp_path, [emb], fused=True,
                           use_train_test_split=True,
                           trimming_config={"train_features_start": 3},
                           device_resident=True)
    feats = dev.extract_and_delay_features_fused()
    ref = dev.structure_data(feats)              # no prefetch staged
    pre = dev._prefetch_brain_data()
    assert pre is not None and set(pre) == set(dev.stories_to_process)
    dev._brain_prefetch = pre
    got = dev.structure_data(feats)
    assert dev._brain_prefetch is None           # consumed
    for key in ref:
        np.testing.assert_array_equal(np.asarray(got[key]),
                                      np.asarray(ref[key]))
    # Budget gate: a zero budget must refuse (whole-brain behavior).
    assert dev._prefetch_brain_data(budget_bytes=0) is None
    # Host structuring never prefetches.
    host = _lanczos_trainer(assembly, tmp_path, [emb], fused=True,
                            use_train_test_split=True,
                            device_resident=False)
    assert host._prefetch_brain_data() is None


def test_device_resident_banded_structuring_matches_host(assembly, tmp_path):
    wordrate = FeatureExtractorFactory.create_extractor(
        "wordrate", "wordrate", {}
    )
    emb = _emb_extractor(assembly, tmp_path)
    kw = dict(fused=True, use_train_test_split=True, concat_features=False,
              trimming_config={"train_targets_start": 1})
    host = _lanczos_trainer(assembly, tmp_path, [wordrate, emb],
                            device_resident=False, **kw)
    dev = _lanczos_trainer(assembly, tmp_path, [wordrate, emb],
                           device_resident=True, **kw)
    ref = host.structure_data(host.extract_and_delay_features_fused())
    got = dev.structure_data(dev.extract_and_delay_features_fused())
    for key in ("Rstim", "Pstim"):
        for g, r in zip(got[key], ref[key]):
            np.testing.assert_allclose(np.asarray(g), r, atol=2e-5,
                                       rtol=1e-5)
    for key in ("Rresp", "Presp"):
        np.testing.assert_allclose(np.asarray(got[key]), ref[key],
                                   atol=2e-5, rtol=1e-5)


def test_device_resident_auto_trains_end_to_end(assembly, tmp_path):
    """Default ('auto'/'auto') pipeline: fused kernel + device structuring,
    metrics equal to the all-host two-stage flow."""
    emb = _emb_extractor(assembly, tmp_path)
    dev = _lanczos_trainer(assembly, tmp_path, [emb], fused="auto",
                           use_train_test_split=True)
    assert dev._device_resident_active()
    m_dev = dev.train(chunk_length=10, n_inner_folds=3)
    host = _lanczos_trainer(assembly, tmp_path, [emb], fused=False,
                            use_train_test_split=True,
                            device_resident=False)
    m_host = host.train(chunk_length=10, n_inner_folds=3)
    assert np.allclose(m_dev["median_score"], m_host["median_score"],
                       atol=1e-4)
    assert m_dev["n_significant"] == m_host["n_significant"]


# ------------------------------------------------------------- edge shapes


def test_single_voxel_fit():
    """V=1 end to end: correlations/pvalues keep (1,) shapes, no NaNs."""
    from litcoder_core_tpu.models.nested_cv import NestedCVModel

    r = np.random.default_rng(21)
    X = r.normal(size=(200, 8)).astype(np.float32)
    w = r.normal(size=(8, 1)).astype(np.float32)
    Y = (X @ w + r.normal(size=(200, 1))).astype(np.float32)
    Xt = r.normal(size=(40, 8)).astype(np.float32)
    Yt = (Xt @ w + r.normal(size=(40, 1))).astype(np.float32)
    m, wt, a = NestedCVModel(seed=0).fit_predict(
        X, Y, X_test=Xt, y_test=Yt, chunk_length=10)
    assert np.asarray(m["correlations"]).shape == (1,)
    assert np.isfinite(m["median_score"])
    assert wt.shape == (8, 1) and a.shape == (1,)


def test_two_story_train_test_split(assembly, tmp_path):
    """Minimum viable train/test split: one train story + one test story."""
    wordrate = FeatureExtractorFactory.create_extractor(
        "wordrate", "wordrate", {}
    )
    t = AbstractTrainer(
        assembly=assembly,
        feature_extractors=[wordrate],
        downsampler=Downsampler(),
        model=NestedCVModel(seed=0),
        fir_delays=[1, 2],
        trimming_config={},
        use_train_test_split=True,
        story_selection=[assembly.stories[0], assembly.stories[1]],
        logger_backend="none",
        results_dir=str(tmp_path / "results"),
    )
    m = t.train(chunk_length=10, n_inner_folds=3)
    assert np.isfinite(m["median_score"])
