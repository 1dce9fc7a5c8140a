"""Regenerate the few-shot comparison standalone (reusing the pretext ckpt).

Rebuilds demo corpus A, loads results/synthetic/pretext_ckpt, and runs the
vanilla + pretrained few-shot sweeps at the reference's deep epoch budget
(data_exp.py:84 trains 500 epochs; at 1-2 train songs an epoch is one
update). Overwrites results/synthetic/few_shot_comparison.json and patches
the few_shot section of summary.json in place.

Usage: python tools/run_few_shot.py [--repeats 5] [--max-epochs 300]
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
    ap.add_argument("--out-dir", default="results/synthetic")
    ap.add_argument("--ckpt", default="results/synthetic/pretext_ckpt")
    ap.add_argument("--sizes", default="1,2,3,4,6,8,12")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--max-epochs", type=int, default=300)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--difficulty", type=float, default=1.0)
    ap.add_argument("--out-name", default="few_shot_comparison.json", help=(
        "artifact filename under --out-dir; a non-default name never patches "
        "summary.json (use for side runs like a claim-only 1-2-song pass)"))
    ap.add_argument("--n-songs", type=int, default=None, help=(
        "eval corpus size (default: demo n_songs=24 -> pool 18, max size 16). "
        "Sizes beyond 16 need a larger corpus; up to 48 the seed stream stays "
        "a prefix of the 48-song pretext bank, so every eval song remains in "
        "the (unlabeled) bank — the demo's transductive-SSL design holds."))
    args = ap.parse_args()

    from zeronotesamba_tpu.experiments.beat import BeatExperimentConfig
    from zeronotesamba_tpu.experiments.demo_suite import DemoSuiteConfig, _build_corpus
    from zeronotesamba_tpu.experiments.few_shot import run_few_shot
    from zeronotesamba_tpu.train.checkpoint import load_params

    cfg = DemoSuiteConfig()
    n_songs = args.n_songs or cfg.n_songs
    if n_songs > cfg.pretext_songs:
        raise SystemExit(f"--n-songs {n_songs} > pretext bank {cfg.pretext_songs}: "
                         "eval songs would leave the transductive bank")
    split_a, mix_a, _ = _build_corpus(n_songs, cfg.duration_s, bpm_lo=70, bpm_hi=180,
                                      freq_lo=700.0, freq_hi=2800.0, seed=cfg.seed + 1,
                                      difficulty=args.difficulty)
    fused = {"params": {"pretext": load_params(args.ckpt)["params"]}}
    sizes = tuple(int(s) for s in args.sizes.split(","))

    bcfg = BeatExperimentConfig(status="vanilla", lr=2e-4, eval_method="dbn",
                                max_epochs=args.max_epochs, patience=args.patience,
                                batch_size=cfg.batch_size, pos_weight=cfg.pos_weight, seed=cfg.seed)
    out_path = os.path.join(args.out_dir, args.out_name)
    payload = {
        "vanilla": {},
        "pretrained": {},
        "max_epochs": args.max_epochs,
        "repeats": args.repeats,
        "n_songs": n_songs,
        "partial": True,  # cleared when both arms complete
    }

    def writer(arm):
        def cb(size, rec):
            payload[arm][str(size)] = rec
            with open(out_path, "w") as fh:
                json.dump(payload, fh, indent=2)
            print(json.dumps({"arm": arm, "size": size, **rec}), flush=True)
        return cb

    run_few_shot(mix_a, bcfg, train_sizes=sizes, repeats=args.repeats,
                 on_size_done=writer("vanilla"))
    pcfg = dataclasses.replace(bcfg, status="pretrained", lr=2e-3)
    run_few_shot(split_a, pcfg, train_sizes=sizes, repeats=args.repeats,
                 init_params=fused, on_size_done=writer("pretrained"))

    del payload["partial"]
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=2)

    # Patch the grid summary only from a COMPLETE standard-named run.
    summary_path = os.path.join(args.out_dir, "summary.json")
    if args.out_name == "few_shot_comparison.json" and os.path.exists(summary_path):
        with open(summary_path) as fh:
            summary = json.load(fh)
        summary["few_shot"] = {k: payload[k] for k in ("vanilla", "pretrained")}
        with open(summary_path, "w") as fh:
            json.dump(summary, fh, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
