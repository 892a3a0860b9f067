"""Logger backends + BrainPlotter (headless, nilearn-free paths)."""

import numpy as np
import pytest

from litcoder_core_tpu.plotting.plotting_utils import (
    FSAVERAGE5_VERTS_PER_HEMI,
    BrainPlotter,
    NullLogger,
    TensorBoardLogger,
)

rng = np.random.default_rng(15)
FULL = 2 * FSAVERAGE5_VERTS_PER_HEMI


def test_null_logger_records():
    log = NullLogger()
    log.log_scalar("a", 1.0)
    log.log_histogram("h", np.arange(3))
    assert log.scalars == {"a": 1.0}
    assert log.histograms == ["h"]


def test_brain_plotter_logs_histograms_without_nilearn():
    log = NullLogger()
    plotter = BrainPlotter(log)
    corr = rng.normal(scale=0.2, size=FULL)
    mask = corr > 0.2
    plotter.log_plots(corr, mask, prefix="p_")
    # Histogram images logged even though surface rendering is unavailable.
    assert "p_correlation_histogram_all" in log.images
    assert "p_correlation_histogram_significant" in log.images
    assert "p_correlation_histogram_data_all" in log.histograms


def test_brain_plotter_volume_mode_any_length():
    log = NullLogger()
    BrainPlotter(log).log_plots(
        rng.normal(size=500), rng.uniform(size=500) > 0.5, is_volume=True
    )
    assert "correlation_histogram_all" in log.images


def test_brain_plotter_surface_length_check():
    log = NullLogger()
    with pytest.raises(ValueError, match="must be length"):
        BrainPlotter(log).log_plots(np.zeros(100), np.zeros(100, bool))


def test_brain_plotter_mask_summaries():
    log = NullLogger()
    corr = rng.normal(size=FULL)
    mask = corr > 0
    lang = np.zeros(FULL, bool)
    lang[:50] = True
    roi = {"V1!": np.ones(FULL, bool)}
    BrainPlotter(log).log_plots(corr, mask, language_mask=lang,
                                roi_masks=roi)
    assert "lanA_mean" in log.scalars
    assert "v1__median" in log.scalars  # sanitized key
    with pytest.raises(ValueError, match="must match correlations length"):
        BrainPlotter(log).log_plots(corr, mask,
                                    language_mask=np.zeros(3, bool))


def test_tensorboard_logger(tmp_path):
    log = TensorBoardLogger(log_dir=str(tmp_path / "tb"))
    log.log_scalar("x", 0.5, step=1)
    log.log_histogram("h", rng.normal(size=100), step=1)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    plt.plot([1, 2, 3])
    log.log_image("fig", fig, step=1)
    plt.close(fig)
    log.close()
    assert any((tmp_path / "tb").iterdir())
