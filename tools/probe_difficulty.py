"""Cheap (no-training) difficulty probe for the demo-suite corpora.

The round-2 corpora saturated every experiment arm at F1 ~0.95-1.0 (VERDICT
r2 weak #1), so the grid stopped ranking methods. Training-based calibration
is expensive; this probe measures the fast proxies that bound the grid:

- ``flux_dbn``: spectral-flux onset strength -> DBN decode on the MIX — the
  "old-school" no-learning ceiling. If this is ~1.0 the beat is recoverable
  by thresholding and no learned method can differentiate itself.
- ``flux_ellis``: same activation through the Ellis DP decoder.
- ``perc_dbn``: flux of the PERCUSSIVE stem -> DBN — an upper bound on what
  a perfect separator + onset detector achieves (zero-shot's ceiling).
- ``oracle_dbn``: the ground-truth pulse itself through the DBN — decoder
  headroom; should stay ~1.0 (if not, the corpus broke the decoder, too hard).

Usage: python tools/probe_difficulty.py [--difficulty 0,0.5,1.0] [--songs 8] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def probe(difficulty: float, n_songs: int, duration_s: float = 12.0, seed: int = 1):
    from zeronotesamba_tpu.data.pulse import beat_pulse
    from zeronotesamba_tpu.decode import decode
    from zeronotesamba_tpu.experiments.demo_suite import FPS, _build_corpus
    from zeronotesamba_tpu.metrics.beat import evaluate_beats

    def vqt_flux(log_vqt: np.ndarray) -> np.ndarray:
        """Spectral flux straight off the log-VQT (96, T) at the 62.5 fps grid."""
        d = np.maximum(np.diff(log_vqt, axis=-1, prepend=log_vqt[:, :1]), 0.0)
        f = d.mean(axis=0)
        return (f / max(f.max(), 1e-9)).astype(np.float32)

    split, mix, _ = _build_corpus(n_songs, duration_s, bpm_lo=70, bpm_hi=180,
                                  freq_lo=700.0, freq_hi=2800.0, seed=seed,
                                  difficulty=difficulty)
    rows = {k: [] for k in ("flux_dbn", "flux_ellis", "perc_dbn", "oracle_dbn")}
    for rec_s, rec_m in zip(split.records, mix.records):
        ref = rec_m.beat_times
        flux_mix = vqt_flux(rec_m.vqt[0])
        flux_perc = vqt_flux(rec_s.vqt[1])
        oracle = beat_pulse(ref, rec_m.n_frames, FPS)
        rows["flux_dbn"].append(evaluate_beats(ref, decode(flux_mix, "dbn", fps=FPS))[0])
        rows["flux_ellis"].append(evaluate_beats(ref, decode(flux_mix, "librosa", fps=FPS))[0])
        rows["perc_dbn"].append(evaluate_beats(ref, decode(flux_perc, "dbn", fps=FPS))[0])
        rows["oracle_dbn"].append(evaluate_beats(ref, decode(oracle, "dbn", fps=FPS))[0])
    return {k: round(float(np.mean(v)), 4) for k, v in rows.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--difficulty", default="0,0.5,1.0")
    ap.add_argument("--songs", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    for d in [float(s) for s in args.difficulty.split(",")]:
        t0 = time.time()
        r = probe(d, args.songs)
        print(json.dumps({"difficulty": d, **r, "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
