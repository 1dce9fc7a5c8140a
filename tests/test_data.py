"""Data layer: annotations, pulse targets, stems/gating, dataset ETL."""

import json
import os

import numpy as np

from zeronotesamba_tpu.data import audio_io
from zeronotesamba_tpu.data.annotations import (
    parse_ballroom_beats,
    parse_hainsworth_master,
    parse_jams_beats,
    parse_smc_beats,
)
from zeronotesamba_tpu.data.datasets import BeatDataset, build_ballroom, build_gtzan, build_synthetic
from zeronotesamba_tpu.data.pulse import beat_pulse
from zeronotesamba_tpu.data.stems import fold_stems, mine_pair, rms_gate
from zeronotesamba_tpu.data.synthetic import click_track, percussive_pair


def test_pulse_targets_match_reference_semantics():
    # 1.0 at round(62.5 t), 0.5 at +-1 frame, clamped to [1, n-2]
    p = beat_pulse([1.0, 0.0, 100.0], 100, fps=62.5)
    assert p[62] == 1.0 and p[61] == 0.5 and p[63] == 0.5  # round(62.5*1.0)=62
    assert p[1] == 1.0 and p[0] == 0.5 and p[2] == 0.5  # t=0 clamps to 1
    assert p[98] == 1.0 and p[99] == 0.5  # t beyond end clamps to n-2


def test_parse_ballroom(tmp_path):
    f = tmp_path / "a.beats"
    f.write_text("0.50 1\n1.00 2\n1.50 3\n2.00 4\n2.50 1\n")
    ann = parse_ballroom_beats(str(f))
    assert ann.beat_times == [0.5, 1.0, 1.5, 2.0, 2.5]
    assert ann.downbeat_times == [0.5, 2.5]


def test_parse_jams(tmp_path):
    doc = {
        "annotations": [
            {
                "namespace": "beat",
                "sandbox": {"annotation_type": "beat"},
                "data": [{"time": 0.5, "value": 1}, {"time": 1.0, "value": 2}],
            },
            {
                "namespace": "beat",
                "sandbox": {"annotation_type": "downbeat"},
                "data": [{"time": 0.5, "value": 1}],
            },
        ]
    }
    f = tmp_path / "x.jams"
    f.write_text(json.dumps(doc))
    ann = parse_jams_beats(str(f))
    assert ann.beat_times == [0.5, 1.0]
    assert ann.downbeat_times == [0.5]


def test_parse_smc(tmp_path):
    f = tmp_path / "s.txt"
    f.write_text("0.5\n1.0\n1.5\n")
    assert parse_smc_beats(str(f)).beat_times == [0.5, 1.0, 1.5]


def test_parse_hainsworth(tmp_path):
    header = "\n" * 13
    line = "<sep>".join(
        ["song1.wav", "x", "x", "x", "x", "x", "x", "x", "x", "44100 88200 132300", "1 3"]
    )
    f = tmp_path / "data.txt"
    f.write_text(header + line + "\n")
    entries = parse_hainsworth_master(str(f))
    assert len(entries) == 1
    np.testing.assert_allclose(entries[0].beat_times, [1.0, 2.0, 3.0])
    # Downbeats resolved by 1-based index (NOT the reference's substring bug).
    np.testing.assert_allclose(entries[0].downbeat_times, [1.0, 3.0])


def test_fold_stems_and_gate(rng):
    drums = rng.standard_normal(32000).astype(np.float32) * 0.1
    other = {"bass": rng.standard_normal(32000).astype(np.float32) * 0.05,
             "vocals": rng.standard_normal(32000).astype(np.float32) * 0.05,
             "drums": drums}
    anchor, positive = fold_stems(other)
    assert anchor.shape == positive.shape == (32000,)
    np.testing.assert_allclose(positive, drums)
    assert rms_gate(anchor, positive, 0.3, 1.0)  # comparable energies
    assert not rms_gate(anchor, positive * 100, 0.3, 1.0)  # drums way too loud


def test_mine_pair_returns_clip():
    anchor, positive, _ = percussive_pair(15.0, 120.0)
    import random

    a, p = mine_pair(anchor, positive, clip_len_s=10.0, rng=random.Random(0))
    assert len(a) == len(p) == 160000


def test_synthetic_dataset_and_npz_roundtrip(tmp_path):
    ds = build_synthetic(n_songs=2, duration_s=6.0, seed=1)
    assert len(ds) == 2
    rec = ds[0]
    assert rec.vqt.shape[0] == 2 and rec.vqt.shape[1] == 96
    assert rec.pulse.shape == (rec.vqt.shape[-1],)
    assert rec.pulse.max() == 1.0

    out = str(tmp_path / "ds")
    ds.save(out)
    ds2 = BeatDataset.load(out)
    assert ds2.names == ds.names
    np.testing.assert_allclose(ds2[0].vqt, ds[0].vqt, atol=1e-6)


def test_build_ballroom_tree(tmp_path):
    # Miniature Ballroom layout with one genre, one song + one duplicate.
    root = tmp_path
    gdir = root / "BallroomData" / "ChaChaCha"
    adir = root / "BallroomAnnotations-master"
    os.makedirs(gdir)
    os.makedirs(adir)
    sig, beats = click_track(6.0, 120.0)
    audio_io.write_wav(str(gdir / "Media-1.wav"), sig, 16000)
    audio_io.write_wav(str(gdir / "Media-103402.wav"), sig, 16000)  # known duplicate
    (adir / "Media-1.beats").write_text("".join(f"{t:.3f} {i % 4 + 1}\n" for i, t in enumerate(beats)))
    (adir / "Media-103402.beats").write_text("0.5 1\n")
    ds = build_ballroom(str(root))
    assert ds.names == ["Media-1.wav"]
    assert ds[0].vqt.shape[0] == 1
    assert len(ds[0].beat_times) == len(beats)


def test_build_gtzan_tree(tmp_path):
    root = tmp_path
    os.makedirs(root / "audio")
    os.makedirs(root / "jams")
    sig, beats = click_track(6.0, 100.0)
    audio_io.write_wav(str(root / "audio" / "blues.00000.wav"), sig, 16000)
    doc = {
        "annotations": [
            {"namespace": "beat", "sandbox": {"annotation_type": "beat"},
             "data": [{"time": float(t), "value": i + 1} for i, t in enumerate(beats)]}
        ]
    }
    (root / "jams" / "blues.00000.wav.jams").write_text(json.dumps(doc))
    ds = build_gtzan(str(root))
    assert ds.names == ["blues.00000.wav"]
    assert len(ds[0].beat_times) == len(beats)
