"""Banded-ridge CLI path (driver config #5: joint wordrate+LM+speech
spaces) + CLI trimming-override effect tests.

The reference has no banded mode (it concatenates spaces with one shared
regularizer, encoding/trainer.py:146-150); --banded is the TPU build's
first-class route to models.banded.BandedRidgeModel through the SAME
unified CLI surface."""

import numpy as np
import pytest
from scipy.io import wavfile

from litcoder_core_tpu.assembly.assemblies import SimpleNeuroidAssembly
from litcoder_core_tpu.assembly.assembly_loader import save_assembly
from litcoder_core_tpu.cli import main, parse_args, run
from tests.test_features import StubTokenizer
from tests.test_trainer_e2e import _make_story

rng = np.random.default_rng(31)


def _assembly_with_audio(tmp_path, n_stories=3, n_vox=12):
    """Synthetic stories carrying word-rate signal + a 3 s wav per story."""
    stories = []
    for i in range(n_stories):
        sd = _make_story(f"s{i}", n_vox=n_vox) if n_vox == 12 else None
        if sd is None:
            # Rebuild with a custom voxel count (volume/surface shapes).
            base = _make_story(f"s{i}")
            brain = rng.normal(
                size=(base.brain_data.shape[0], n_vox)
            ).astype(np.float32)
            # Voxel 0 carries the word-rate signal so the fit finds it.
            brain[:, 0] += np.roll(base.word_rates, 2)
            sd = base
            sd.brain_data = brain
        wav_path = str(tmp_path / f"s{i}.wav")
        wavfile.write(wav_path, 16000,
                      (0.1 * rng.normal(size=3 * 16000)).astype(np.float32))
        sd.audio_path = wav_path
        stories.append(sd)
    return SimpleNeuroidAssembly(stories, validation_method="outer")


def _tiny_lm():
    from transformers import FlaxGPT2Model, GPT2Config

    cfg = GPT2Config(vocab_size=600, n_positions=64, n_embd=16, n_layer=2,
                     n_head=2)
    return FlaxGPT2Model(cfg, seed=0), StubTokenizer()


def _tiny_speech():
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


def _banded_config(tmp_path, asm_path, **overrides):
    """run(config)-level dict mirroring parse_args defaults."""
    config = dict(
        dataset_type="lebel", assembly_path=asm_path, data_dir=None,
        subject=None, tr=2.0, context_type="fullcontext", use_volume=False,
        story_idx=None, modalities=["wordrate"], model_names=["wordrate"],
        layer_idx=1, last_token=True, n_outer_folds=5, n_inner_folds=3,
        folding_type="chunked", chunk_length=10, singcutoff=1e-10,
        single_alpha=True, banded=True, n_gammas=3, seed=0,
        downsample_method="lanczos", lanczos_cutoff_mult=1.0,
        lanczos_window=3, normalize_features=False, normalize_targets=False,
        ndelays=2, lookback=64, cache_dir=str(tmp_path / "cache"),
        results_dir=str(tmp_path / "results"), logger_backend="none",
        train_features_start=5, train_features_end=-5,
        train_targets_start=5, train_targets_end=-5,
        test_features_start=5, test_features_end=-5,
        test_targets_start=5, test_targets_end=-5,
    )
    config.update(overrides)
    return config


@pytest.mark.parametrize("n_vox", [12, 20484],
                         ids=["volume_shape", "surface_shape"])
def test_banded_cli_wordrate_lm_speech(tmp_path, n_vox):
    """Driver config #5 end-to-end through the unified CLI code path: one
    band per modality (wordrate + language_model + speech), banded ridge,
    per-voxel (gamma, alpha) selection — on volume- and fsaverage5
    surface-shaped responses."""
    assembly = _assembly_with_audio(tmp_path, n_vox=n_vox)
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)

    lm, tok = _tiny_lm()
    sp, fe = _tiny_speech()
    config = _banded_config(
        tmp_path, asm_path,
        modalities=["wordrate", "language_model", "speech"],
        model_names=["wordrate", "tiny-gpt2", "tiny-w2v2"],
        chunk_size=0.5, context_size=1.0,
        extractor_config_overrides={
            "language_model": {"model": lm, "tokenizer": tok,
                               "batch_size": 16},
            "speech": {"model": sp, "feature_extractor": fe},
        },
    )
    metrics = run(config)
    assert np.isfinite(metrics["median_score"])
    assert "best_gammas" in metrics
    gammas = np.asarray(metrics["best_gammas"])
    assert gammas.shape == (n_vox, 3)  # one share per band per voxel
    np.testing.assert_allclose(gammas.sum(axis=1), 1.0, atol=1e-5)
    if n_vox == 12:
        # All-story word-rate signal (TRUE_WEIGHTS) must be recovered.
        assert metrics["median_score"] > 0.2


def test_banded_flag_via_argv(tmp_path):
    """ONE command reproduces a banded run: --banded with two offline
    modalities (wordrate + embeddings)."""
    from litcoder_core_tpu.features.embeddings import SimpleKeyedVectors

    assembly = SimpleNeuroidAssembly(
        [_make_story(f"s{i}") for i in range(3)], "outer"
    )
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)
    n_words = max(len(sd.words) for sd in assembly.story_data.values())
    vocab = [f"w{i}" for i in range(n_words)]
    kv = SimpleKeyedVectors(vocab, rng.normal(size=(len(vocab), 5)))
    kv_path = str(tmp_path / "v.kv")
    kv.save_kv(kv_path)

    metrics = main([
        "--dataset_type", "lebel",
        "--assembly_path", asm_path,
        "--modalities", "wordrate", "embeddings",
        "--model_names", "wordrate", "vecs",
        "--vector_path", kv_path,
        "--banded", "--n_gammas", "3",
        "--fast_scan", "auto",
        "--ndelays", "2", "--lookback", "64",
        "--cache_dir", str(tmp_path / "cache"),
        "--results_dir", str(tmp_path / "results"),
        "--logger_backend", "none",
        "--chunk_length", "10", "--n_inner_folds", "3",
        "--train_features_start", "5", "--train_features_end", "-5",
        "--train_targets_start", "5", "--train_targets_end", "-5",
        "--test_features_start", "5", "--test_features_end", "-5",
        "--test_targets_start", "5", "--test_targets_end", "-5",
    ])
    assert metrics["median_score"] > 0.2
    assert "best_gammas" in metrics


def test_banded_rejects_concat_datasets(tmp_path):
    assembly = SimpleNeuroidAssembly(
        [_make_story(f"s{i}") for i in range(3)], "inner"
    )
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)
    config = _banded_config(tmp_path, asm_path, dataset_type="narratives")
    with pytest.raises(ValueError, match="--banded requires"):
        run(config)


def test_banded_flags_parse():
    args = parse_args([
        "--dataset_type", "lebel", "--banded", "--n_gammas", "7",
        "--ndelays", "4", "--lookback", "256", "--cache_dir", "c",
    ])
    assert args.banded is True and args.n_gammas == 7
    args2 = parse_args([
        "--dataset_type", "lebel",
        "--ndelays", "4", "--lookback", "256", "--cache_dir", "c",
    ])
    assert args2.banded is False


def test_round3_flags_parse():
    base = ["--dataset_type", "lebel", "--ndelays", "4", "--lookback",
            "256", "--cache_dir", "c"]
    args = parse_args(base)
    assert args.fast_scan is False
    assert args.significance == "parametric"
    assert parse_args(base + ["--fast_scan"]).fast_scan is True
    assert parse_args(base + ["--fast_scan", "auto"]).fast_scan == "auto"
    args2 = parse_args(base + ["--significance", "permutation",
                               "--n_permutations", "500"])
    assert args2.significance == "permutation"
    assert args2.n_permutations == 500


def test_banded_permutation_significance_end_to_end(tmp_path):
    """--banded --significance permutation through the CLI run(): metrics
    carry significance_method and the 1/(n+1)-floored permutation
    p-values (replaces the round-2/3 refusal of this combination)."""
    assembly = SimpleNeuroidAssembly(
        [_make_story(f"s{i}") for i in range(3)], "outer"
    )
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)
    config = _banded_config(tmp_path, asm_path)
    config["significance"] = "permutation"
    config["n_permutations"] = 100
    metrics = run(config)
    assert metrics["significance_method"] == "permutation"
    assert min(metrics["p_values"]) >= 1.0 / 101 - 1e-9
    assert "best_gammas" in metrics


def test_banded_fast_scan_matches_fp32():
    """fast_scan=True/'auto' on the banded scan: on CPU the DEFAULT matmul
    precision IS fp32, so selections and weights must match exactly, and
    'auto' must log ACCEPTED."""
    import logging

    from litcoder_core_tpu.models.banded import fit_banded_ridge

    T, Tp, V = 200, 50, 9
    X1 = rng.normal(size=(T, 5)).astype(np.float32)
    X2 = rng.normal(size=(T, 3)).astype(np.float32)
    wt = rng.normal(size=(5, V)).astype(np.float32)
    Y = (X1 @ wt + 0.5 * rng.normal(size=(T, V))).astype(np.float32)
    Xt1 = rng.normal(size=(Tp, 5)).astype(np.float32)
    Xt2 = rng.normal(size=(Tp, 3)).astype(np.float32)
    Yt = (Xt1 @ wt + 0.5 * rng.normal(size=(Tp, V))).astype(np.float32)
    kw = dict(alphas=np.logspace(-1, 3, 5), n_gammas=3, chunk_length=10,
              n_inner_folds=4, seed=0)

    m0, w0, a0, g0 = fit_banded_ridge([X1, X2], Y, X_tests=[Xt1, Xt2],
                                      y_test=Yt, **kw)
    m1, w1, a1, g1 = fit_banded_ridge([X1, X2], Y, X_tests=[Xt1, Xt2],
                                      y_test=Yt, fast_scan=True, **kw)
    assert np.array_equal(a1, a0) and np.array_equal(g1, g0)
    assert np.allclose(w1, w0)

    # The shared guard logs through the nested_cv module (ONE policy for
    # plain/fused/banded scans).
    logger = logging.getLogger("litcoder_core_tpu.models.nested_cv")
    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Grab(level=logging.INFO)
    logger.addHandler(h)
    old_level = logger.level
    logger.setLevel(logging.INFO)
    try:
        m2, w2, a2, g2 = fit_banded_ridge(
            [X1, X2], Y, X_tests=[Xt1, Xt2], y_test=Yt, fast_scan="auto",
            **kw)
    finally:
        logger.removeHandler(h)
        logger.setLevel(old_level)
    assert any("ACCEPTED" in m for m in records)
    assert np.array_equal(a2, a0) and np.array_equal(g2, g0)


def test_banded_fast_scan_fallback_path_warns(caplog):
    """method='svd' forces the per-(gamma, fold) fallback, which has no
    bf16 variant: fast_scan must warn and produce the fp32 result."""
    import logging

    from litcoder_core_tpu.models.banded import fit_banded_ridge

    T, V = 120, 6
    X1 = rng.normal(size=(T, 4)).astype(np.float32)
    X2 = rng.normal(size=(T, 3)).astype(np.float32)
    Y = rng.normal(size=(T, V)).astype(np.float32)
    kw = dict(alphas=np.logspace(-1, 3, 4), n_gammas=2, chunk_length=10,
              n_inner_folds=3, seed=0, method="svd")
    m0, w0, a0, g0 = fit_banded_ridge([X1, X2], Y, **kw)
    with caplog.at_level(logging.WARNING,
                         logger="litcoder_core_tpu.models.banded"):
        m1, w1, a1, g1 = fit_banded_ridge([X1, X2], Y, fast_scan=True, **kw)
    assert any("fallback engaged" in r.message for r in caplog.records)
    assert np.array_equal(a1, a0) and np.array_equal(g1, g0)
    assert np.allclose(w1, w0)


def test_cli_permutation_significance_end_to_end(tmp_path):
    """--significance permutation flows through trainer -> model: metrics
    carry significance_method and floored p-values."""
    assembly = SimpleNeuroidAssembly(
        [_make_story(f"s{i}") for i in range(3)], "outer"
    )
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)
    config = _banded_config(tmp_path, asm_path)
    config["banded"] = False
    config["significance"] = "permutation"
    config["n_permutations"] = 100
    metrics = run(config)
    assert metrics["significance_method"] == "permutation"
    assert min(metrics["p_values"]) >= 1.0 / 101 - 1e-9


def test_cli_trimming_flag_changes_structured_shapes(tmp_path, monkeypatch):
    """--test_targets_start N must flow into the structured test split
    (reference override logic: unified.py:522-535)."""
    from litcoder_core_tpu.trainer import AbstractTrainer

    assembly = SimpleNeuroidAssembly(
        [_make_story(f"s{i}") for i in range(3)], "outer"
    )
    asm_path = str(tmp_path / "asm.pkl")
    save_assembly(assembly, asm_path)

    captured = {}
    orig = AbstractTrainer.structure_data

    def spy(self, features):
        out = orig(self, features)
        captured["Presp_rows"] = out["Presp"].shape[0]
        captured["Pstim_rows"] = (out["Pstim"].shape[0]
                                  if not isinstance(out["Pstim"], list)
                                  else out["Pstim"][0].shape[0])
        return out

    monkeypatch.setattr(AbstractTrainer, "structure_data", spy)

    def run_with(start):
        main([
            "--dataset_type", "lebel",
            "--assembly_path", asm_path,
            "--modality", "wordrate", "--model_name", "wordrate",
            "--ndelays", "2", "--lookback", "64",
            "--cache_dir", str(tmp_path / "cache"),
            "--results_dir", str(tmp_path / "results"),
            "--logger_backend", "none",
            "--chunk_length", "10", "--n_inner_folds", "3",
            "--train_features_start", "5", "--train_features_end", "-5",
            "--train_targets_start", "5", "--train_targets_end", "-5",
            "--test_features_start", str(start),
            "--test_features_end", "-5",
            "--test_targets_start", str(start),
            "--test_targets_end", "-5",
        ])
        return dict(captured)

    # Stories are 80 TRs; start/end trim rows off the held-out story.
    shapes_40 = run_with(40)
    shapes_30 = run_with(30)
    assert shapes_40["Presp_rows"] == 80 - 40 - 5
    assert shapes_30["Presp_rows"] == 80 - 30 - 5
    assert shapes_40["Pstim_rows"] == 80 - 40 - 5


def test_cli_tp_mesh_extraction_matches_single_device(tmp_path):
    """--tp_data/--tp_model build the extraction mesh through the CLI and
    leave metrics unchanged vs single-device extraction."""
    assembly = _assembly_with_audio(tmp_path)
    asm_path = str(tmp_path / "asm_tp.pkl")
    save_assembly(assembly, asm_path)

    lm, tok = _tiny_lm()
    base = _banded_config(
        tmp_path, asm_path, banded=False,
        modalities=["language_model"], model_names=["tiny-gpt2"],
        extractor_config_overrides={
            "language_model": {"model": lm, "tokenizer": tok},
        },
    )
    m_single = run(dict(base, cache_dir=str(tmp_path / "c1"),
                        results_dir=str(tmp_path / "r1")))
    m_mesh = run(dict(base, tp_data=2, tp_model=4,
                      cache_dir=str(tmp_path / "c2"),
                      results_dir=str(tmp_path / "r2")))
    assert np.allclose(m_single["median_score"], m_mesh["median_score"],
                       atol=1e-4)
    assert m_single["n_significant"] == m_mesh["n_significant"]


def test_cli_tp_flags_parse():
    args = parse_args([
        "--dataset_type", "lebel", "--modality", "wordrate",
        "--model_name", "wordrate", "--ndelays", "4", "--lookback", "256",
        "--cache_dir", "c", "--tp_data", "2", "--tp_model", "4",
    ])
    assert args.tp_data == 2 and args.tp_model == 4


def test_banded_voxel_chunked_matches_unchunked():
    """voxel_chunk_size streams the scan's voxel work in chunks (the
    single-chip whole-brain memory knob); selection and weights must match
    the whole-array path exactly (chunking only reorders columnwise work)."""
    from litcoder_core_tpu.models.banded import fit_banded_ridge

    T, Tp, V = 200, 40, 77
    Xs = [rng.normal(size=(T, d)).astype(np.float32) for d in (16, 8)]
    Xts = [rng.normal(size=(Tp, d)).astype(np.float32) for d in (16, 8)]
    wts = [rng.normal(size=(d, V)).astype(np.float32) / np.sqrt(d)
           for d in (16, 8)]
    Y = (sum(x @ w for x, w in zip(Xs, wts))
         + rng.normal(size=(T, V))).astype(np.float32)
    yt = (sum(x @ w for x, w in zip(Xts, wts))
          + rng.normal(size=(Tp, V))).astype(np.float32)
    kw = dict(X_tests=Xts, y_test=yt, n_gammas=4, n_inner_folds=4,
              chunk_length=10, seed=0)

    m0, w0, a0, g0 = fit_banded_ridge(Xs, Y, **kw)
    # 32-voxel chunks: 2 full chunks + a 13-voxel tail dispatch.
    m1, w1, a1, g1 = fit_banded_ridge(Xs, Y, voxel_chunk_size=32, **kw)
    assert np.array_equal(a0, a1)
    assert np.array_equal(g0, g1)
    assert np.abs(w0 - w1).max() < 1e-6
    assert m0["median_score"] == pytest.approx(m1["median_score"], abs=1e-7)


def test_banded_voxel_chunk_warns_on_eigh_scan(caplog):
    """voxel_chunk_size without the chol scan gates must warn + run
    unchunked (not silently produce a different program)."""
    import logging

    from litcoder_core_tpu.models.banded import fit_banded_ridge

    T, V = 120, 40
    Xs = [rng.normal(size=(T, d)).astype(np.float32) for d in (10, 6)]
    Y = rng.normal(size=(T, V)).astype(np.float32)
    with caplog.at_level(logging.WARNING,
                         logger="litcoder_core_tpu.models.banded"):
        fit_banded_ridge(Xs, Y, alphas=np.logspace(-4, 3, 5),  # min < 0.03
                         n_gammas=2, n_inner_folds=3, chunk_length=10,
                         seed=0, voxel_chunk_size=16)
    assert any("voxel_chunk_size requires" in r.message
               for r in caplog.records)
