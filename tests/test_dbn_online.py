"""Online (streaming) DBN decoder behavior."""

import numpy as np

from zeronotesamba_tpu.decode.dbn import decode_beats
from zeronotesamba_tpu.decode.dbn_online import OnlineBeatDecoder, decode_beats_online
from zeronotesamba_tpu.metrics.beat import f_measure


def _pulse(bpm, dur=25.0, fps=62.5, seed=0):
    rng = np.random.default_rng(seed)
    n = int(dur * fps)
    act = np.abs(0.04 * rng.standard_normal(n))
    period = int(round(60.0 / bpm * fps))
    for f in range(8, n - 2, period):
        act[f] = 0.9
    return np.clip(act, 0, 1)


def test_online_tracks_clean_pulse():
    act = _pulse(120)
    online = decode_beats_online(act)
    offline = decode_beats(act)
    # After the forward posterior locks in, online must match offline closely
    # (skip the first 3 s burn-in, inherent to streaming decoding).
    f1 = f_measure(offline[offline > 3], online[online > 3])
    assert f1 > 0.9, (f1, len(online), len(offline))


def test_online_incremental_equals_batch():
    act = _pulse(100, seed=4)
    dec = OnlineBeatDecoder()
    for a in act:
        dec.process_frame(float(a))
    inc = np.asarray(dec.beats)
    batch = decode_beats_online(act)
    np.testing.assert_allclose(inc, batch)


def test_online_reset():
    act = _pulse(140, seed=5)
    dec = OnlineBeatDecoder()
    first = dec.process(act)
    dec.reset()
    second = dec.process(act)
    np.testing.assert_allclose(first, second)
