"""Targeted re-runs of individual demo-suite arms, patching summary.json.

The full suite costs ~70 min; single supervised arms cost 3-10 min. This
tool rebuilds the corpora (deterministic given the seed), loads the saved
pretext checkpoint, reruns the requested arms with the given overrides, and
rewrites those entries of results/synthetic/summary.json in place.

Usage:
  python tools/rerun_arms.py --arm pretrained --lr 6e-3
  python tools/rerun_arms.py --arm bock --lr 1e-3
  python tools/rerun_arms.py --arm cross --folds 4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", required=True, choices=["vanilla", "pretrained", "bock", "cross"])
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--folds", type=int, default=None)
    ap.add_argument("--out-dir", default="results/synthetic")
    ap.add_argument("--ckpt", default="results/synthetic/pretext_ckpt")
    ap.add_argument("--max-epochs", type=int, default=120)
    ap.add_argument("--difficulty", type=float, default=1.0)
    args = ap.parse_args()

    from zeronotesamba_tpu.experiments.beat import (
        BeatExperimentConfig, run_beat_experiment, summarize, summarize_extra,
    )
    from zeronotesamba_tpu.experiments.cross import run_cross_experiment
    from zeronotesamba_tpu.experiments.demo_suite import DemoSuiteConfig, _build_corpus
    from zeronotesamba_tpu.train.checkpoint import load_params

    cfg = DemoSuiteConfig()
    split_a, mix_a, _ = _build_corpus(cfg.n_songs, cfg.duration_s, bpm_lo=70, bpm_hi=180,
                                      freq_lo=700.0, freq_hi=2800.0, seed=cfg.seed + 1,
                                      difficulty=args.difficulty)
    base = BeatExperimentConfig(status="vanilla", lr=2e-4, eval_method="dbn", n_folds=cfg.folds,
                                max_epochs=args.max_epochs, patience=cfg.patience,
                                batch_size=cfg.batch_size, pos_weight=cfg.pos_weight, seed=cfg.seed,
                                extra_eval_methods=("librosa", "threshold"))

    def metrics_dict(s):
        return {k: round(v, 4) for k, v in s.items()}

    summary_path = os.path.join(args.out_dir, "summary.json")
    with open(summary_path) as fh:
        summary = json.load(fh)

    if args.arm == "cross":
        split_b, mix_b, _ = _build_corpus(cfg.n_songs_b, cfg.duration_s, bpm_lo=60, bpm_hi=140,
                                          freq_lo=550.0, freq_hi=1050.0, seed=cfg.seed + 2,
                                          difficulty=args.difficulty)
        ccfg = dataclasses.replace(base, n_folds=args.folds or 2,
                                   max_epochs=max(150, args.max_epochs))
        res = run_cross_experiment(mix_a, mix_b, ccfg)
        summary["cross_data"]["a_to_b"] = metrics_dict(summarize(res))
        res_b = run_beat_experiment(mix_b, ccfg, progress=False)
        summary["cross_data"]["b_in_domain"] = metrics_dict(summarize(res_b))
    else:
        status = args.arm
        kw = {}
        if status == "vanilla":
            acfg = dataclasses.replace(base, lr=args.lr or 2e-4)
            ds = mix_a
        elif status == "bock":
            acfg = dataclasses.replace(base, status="bock", lr=args.lr or 5e-4)
            ds = mix_a
        else:
            best = load_params(args.ckpt)
            kw["init_params"] = {"params": {"pretext": best["params"]}}
            acfg = dataclasses.replace(base, status="pretrained", lr=args.lr or 2e-3)
            ds = split_a
        if args.folds:
            acfg = dataclasses.replace(acfg, n_folds=args.folds)
        res = run_beat_experiment(ds, acfg, progress=False, **kw)
        key = "bock_tcn" if status == "bock" else status
        summary["supervised"][key] = metrics_dict(summarize(res))
        # Same key for main metrics and decoder columns (ADVICE r3: 'bock'
        # vs 'bock_tcn' split the arm across two names for readers).
        summary["supervised"].setdefault("by_decoder", {})[key] = {
            m: metrics_dict(t) for m, t in summarize_extra(res).items()
        }
        summary["supervised"].setdefault("arm_overrides", {})[key] = {
            "lr": acfg.lr, "max_epochs": acfg.max_epochs,
        }

    with open(summary_path, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary.get("supervised", {}).get("arm_overrides", {})))
    print("patched", args.arm)


if __name__ == "__main__":
    main()
