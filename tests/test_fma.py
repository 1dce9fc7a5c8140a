"""FMA-style mining pipeline: stem mining with watermark resume, CLMR bank."""

import os

import numpy as np

from zeronotesamba_tpu.data import audio_io
from zeronotesamba_tpu.data.fma import gen_clmr_bank, load_watermark, mine_stems
from zeronotesamba_tpu.data.synthetic import percussive_pair


def _make_corpus(root, n=3, duration=12.0):
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        anchor, positive, _ = percussive_pair(duration, 100 + 15 * i, seed=i)
        audio_io.write_wav(os.path.join(root, f"track{i:03d}.wav"), anchor + positive, 16000)


def test_mine_stems_and_resume(tmp_path):
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "stems")
    _make_corpus(corpus, n=3)
    written = mine_stems(corpus, out, separation="hpss", lower_p=0.05, upper_p=1.0)
    done_after_first = load_watermark(out)
    assert len(done_after_first) == 3
    for tid in written:
        assert os.path.exists(os.path.join(out, tid, "drums.wav"))
        assert os.path.exists(os.path.join(out, tid, "other.wav"))
    # Resume: nothing new to do.
    written2 = mine_stems(corpus, out, separation="hpss", lower_p=0.05, upper_p=1.0)
    assert written2 == []


def test_mine_stems_skips_short_and_bad(tmp_path):
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "stems")
    os.makedirs(corpus)
    audio_io.write_wav(os.path.join(corpus, "short.wav"), np.zeros(8000, np.float32), 16000)
    with open(os.path.join(corpus, "corrupt.wav"), "wb") as fh:
        fh.write(b"RIFFgarbage")
    written = mine_stems(corpus, out, separation="mix", lower_p=0.0, upper_p=1.0)
    assert written == []
    assert load_watermark(out) == {"short", "corrupt"}


def test_gen_clmr_bank(tmp_path):
    corpus = str(tmp_path / "corpus")
    _make_corpus(corpus, n=2, duration=12.0)
    bank = gen_clmr_bank(corpus, n_samples=2, clip_frames=128, clip_len_s=10.0, seed=0)
    assert bank.shape == (2, 2, 96, 128)
    # Two crops of the SAME vqt: identical distributions, generally different content.
    assert bank.dtype == np.float32
