"""Behavioral tests for the beat metrics against known-answer cases."""

import numpy as np
import pytest

from zeronotesamba_tpu.metrics.beat import (
    continuity,
    evaluate_beats,
    f_measure,
    information_gain,
    trim_beats,
)


def grid(bpm, start=0.0, n=60):
    return start + np.arange(n) * 60.0 / bpm


def test_trim_beats():
    b = np.array([0.5, 3.0, 5.0, 7.5])
    np.testing.assert_allclose(trim_beats(b), [5.0, 7.5])


def test_f_measure_perfect_and_empty():
    r = grid(120)
    assert f_measure(r, r) == 1.0
    assert f_measure(r, np.array([])) == 0.0
    assert f_measure(np.array([]), r) == 0.0


def test_f_measure_jitter_within_window():
    r = grid(120, n=40)
    rng = np.random.default_rng(0)
    e = r + rng.uniform(-0.05, 0.05, r.shape)
    assert f_measure(r, e) == 1.0
    e_bad = r + 0.10  # beyond the 70 ms window
    assert f_measure(r, e_bad) == 0.0


def test_f_measure_double_counting_prevented():
    r = np.array([1.0, 2.0])
    e = np.array([1.0, 1.01, 1.02])  # three candidates near one reference beat
    # only one match possible: precision 1/3, recall 1/2
    f = f_measure(r, e)
    assert abs(f - (2 * (1 / 3) * (1 / 2) / (1 / 3 + 1 / 2))) < 1e-12


def test_f_measure_partial():
    r = grid(120, n=10)
    e = np.concatenate([r[:5], r[5:] + 0.2])
    p, rec = 5 / 10, 5 / 10
    assert abs(f_measure(r, e) - 2 * p * rec / (p + rec)) < 1e-12


def test_continuity_perfect():
    r = grid(120, n=40)
    cmlc, cmlt, amlc, amlt = continuity(r, r)
    assert cmlc == cmlt == amlc == amlt == 1.0


def test_continuity_double_tempo_counts_for_aml_only():
    r = grid(60, n=30)
    e = grid(120, n=59)  # double tempo, aligned
    cmlc, cmlt, amlc, amlt = continuity(r, e)
    assert cmlt < 0.6
    assert amlt > 0.95
    assert amlc > 0.95


def test_continuity_offbeat_counts_for_aml_only():
    r = grid(120, n=40)
    e = r + 0.25  # exactly off-beat at 120 bpm
    cmlc, cmlt, amlc, amlt = continuity(r, e)
    assert cmlt == 0.0
    assert amlt > 0.9


def test_continuity_break_halves_cmlc():
    r = grid(120, n=40)
    e = r.copy()
    e[20] += 0.2  # one bad beat in the middle breaks continuity
    cmlc, cmlt, amlc, amlt = continuity(r, e)
    assert cmlt > 0.9
    assert 0.4 < cmlc < 0.6


def test_information_gain_perfect_and_uniform():
    r = grid(120, n=60)
    assert abs(information_gain(r, r) - np.log2(41)) < 1e-9
    rng = np.random.default_rng(1)
    e = np.sort(rng.uniform(0, 30, 60))
    assert information_gain(r, e) < 1.0


def test_information_gain_sparse_estimates_penalized():
    # A handful of correct beats must not score highly (both directions used).
    # Jittered grid: on a perfectly uniform grid, multi-period errors fold to
    # zero and sparse estimates would (like mir_eval) score perfectly.
    rng = np.random.default_rng(7)
    r = np.cumsum(0.5 + rng.uniform(-0.05, 0.05, 60))
    e = r[:4]
    assert information_gain(r, e) < np.log2(41) / 2


def test_evaluate_beats_suite():
    r = grid(120, n=60)
    res = evaluate_beats(r, r)
    assert res[0] == 1.0
    assert res[1] == res[2] == res[3] == res[4] == 1.0
    assert abs(res[5] - np.log2(41)) < 1e-9


@pytest.mark.parametrize("bpm", [55, 90, 175])
def test_small_phase_error_tolerated(bpm):
    r = grid(bpm, n=50)
    period = 60.0 / bpm
    e = r + 0.1 * period  # within 17.5% phase threshold
    cmlc, cmlt, _, _ = continuity(r, e)
    assert cmlt > 0.9
