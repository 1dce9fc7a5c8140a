"""Zero-shot beat F1 through each separation backend (learned vs HPSS).

VERDICT r2 missing #1 acceptance: the learned STFT-mask separator must not
only beat HPSS on SI-SDR (results/separator_report.json) but also feed the
pretext model at least as well: zero-shot F1 via learned stems >= via HPSS
stems. This probe rebuilds demo corpus A, separates the raw MIX waveforms
with each backend (plus the true stems as the oracle ceiling), runs the
demo-suite pretext checkpoint zero-shot over each stem pair, and prints one
JSON line per backend.

Usage:
  python tools/probe_sep_zeroshot.py [--ckpt results/synthetic/pretext_ckpt]
                                     [--sep models/separator] [--songs 24]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="results/synthetic/pretext_ckpt")
    ap.add_argument("--sep", default="models/separator")
    ap.add_argument("--songs", type=int, default=24)
    ap.add_argument("--difficulty", type=float, default=1.0)
    ap.add_argument("--out", default="results/separation_zeroshot.json")
    args = ap.parse_args()

    from zeronotesamba_tpu.data.datasets import BeatDataset, SongRecord
    from zeronotesamba_tpu.data.separation import separate
    from zeronotesamba_tpu.experiments.beat import BeatExperimentConfig, run_beat_experiment
    from zeronotesamba_tpu.experiments.demo_suite import _build_corpus
    from zeronotesamba_tpu.ops.vqt import generate_xqt
    from zeronotesamba_tpu.train.checkpoint import load_params

    split_true, mix_ds, wavs = _build_corpus(args.songs, 12.0, bpm_lo=70, bpm_hi=180,
                                             freq_lo=700.0, freq_hi=2800.0, seed=1,
                                             difficulty=args.difficulty)
    best = load_params(args.ckpt)
    fused = {"params": {"pretext": best["params"]}}
    zcfg = BeatExperimentConfig(status="pretrained", pre="validation", eval_method="dbn", batch_size=8)

    def zero_shot(ds) -> float:
        res = run_beat_experiment(ds, zcfg, init_params=fused, progress=False)
        return round(float(res[0].test_metrics[0]), 4)

    report = {"true_stems": zero_shot(split_true)}
    print(json.dumps({"true_stems_f1": report["true_stems"]}), flush=True)

    for backend in ("hpss", "learned"):
        t0 = time.time()
        ds = BeatDataset()
        for rec, wav in zip(mix_ds.records, wavs):
            kw = {"model_path": args.sep} if backend == "learned" else {}
            anchor, positive = separate(wav, 16000, backend=backend, **kw)
            vq = np.stack([generate_xqt(anchor, 16000, "vqt"), generate_xqt(positive, 16000, "vqt")])
            ds.add(SongRecord(name=rec.name, vqt=vq, pulse=rec.pulse,
                              down_pulse=rec.down_pulse, beat_times=rec.beat_times,
                              downbeat_times=rec.downbeat_times))
        report[backend] = zero_shot(ds)
        print(json.dumps({f"{backend}_f1": report[backend],
                          "wall_s": round(time.time() - t0, 1)}), flush=True)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
