"""Native C++ Viterbi vs the numpy reference: exact path equality + speed."""

import time

import numpy as np
import pytest

from zeronotesamba_tpu.decode.dbn import DBNBeatDecoderConfig, _state_space, _viterbi_numpy, decode_beats
from zeronotesamba_tpu.decode.dbn_native import native_available, viterbi_native


@pytest.fixture(scope="module")
def fixture_act():
    rng = np.random.default_rng(0)
    fps = 62.5
    n = int(30 * fps)
    act = np.abs(0.05 * rng.standard_normal(n))
    for f in range(30, n - 2, 31):
        act[f] = 0.9
    return np.clip(act, 0, 1)


def test_native_builds_and_matches_numpy(fixture_act):
    if not native_available():
        pytest.skip("no C++ toolchain available")
    cfg = DBNBeatDecoderConfig()
    intervals, firsts, lasts, positions, _, log_trans, is_beat = _state_space(cfg)
    eps = np.spacing(1)
    la = np.log(fixture_act + eps)
    lna = np.log((1.0 - fixture_act) / (cfg.observation_lambda - 1) + eps)
    ref_path = _viterbi_numpy(la, lna, intervals, firsts, lasts, log_trans, is_beat)
    nat_path = viterbi_native(la, lna, intervals, log_trans, is_beat, firsts, lasts)
    np.testing.assert_array_equal(nat_path, ref_path)


def test_decode_beats_native_equals_numpy(fixture_act):
    if not native_available():
        pytest.skip("no C++ toolchain available")
    b_native = decode_beats(fixture_act, use_native=True)
    b_numpy = decode_beats(fixture_act, use_native=False)
    np.testing.assert_allclose(b_native, b_numpy)


def test_native_faster(fixture_act):
    if not native_available():
        pytest.skip("no C++ toolchain available")
    decode_beats(fixture_act, use_native=True)  # warm both paths
    decode_beats(fixture_act, use_native=False)
    t0 = time.perf_counter()
    for _ in range(3):
        decode_beats(fixture_act, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        decode_beats(fixture_act, use_native=False)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)
