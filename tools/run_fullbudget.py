"""Full-budget pretext -> cv8 ordering experiment (VERDICT r4 next #7).

The 3-seed supervised_cv8 artifact established that at demo scale the
reference's full-label-budget ordering (pretrained > vanilla,
supervised.xlsx G20=0.875 > C20=0.847) is INVERTED (pooled 0.829 vs 0.925).
Open question: does a bigger pretext budget plus proxy-selected
checkpointing narrow the gap? One bounded run: the full 48-song demo bank,
~300 pretext epochs (5x the demo suite's 60) with selection='proxy_f1'
(beat-proxy F1 on a disjoint labeled set — guards against the known
val-loss/zero-shot non-monotonicity), then the 8-fold supervised CV
pretrained arm at seed 0 against the committed seed-0 vanilla record.

Writes results/synthetic/fullbudget_cv8.json.

Usage: python tools/run_fullbudget.py [--epochs 300]
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
    ap.add_argument("--out", default="results/synthetic/fullbudget_cv8.json")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--proxy-songs", type=int, default=6)
    ap.add_argument("--proxy-every", type=int, default=5)
    ap.add_argument("--folds", type=int, default=8)
    args = ap.parse_args()

    from zeronotesamba_tpu.experiments.beat import (
        BeatExperimentConfig, run_beat_experiment, summarize,
    )
    from zeronotesamba_tpu.experiments.demo_suite import DemoSuiteConfig, _build_corpus
    from zeronotesamba_tpu.experiments.pretext_driver import (
        PretextRunConfig, train_pretext, zero_shot_proxy_f1,
    )

    cfg = DemoSuiteConfig()
    split_a, _, _ = _build_corpus(cfg.n_songs, cfg.duration_s, bpm_lo=70, bpm_hi=180,
                                  freq_lo=700.0, freq_hi=2800.0, seed=cfg.seed + 1,
                                  difficulty=cfg.difficulty)
    split_u, _, _ = _build_corpus(cfg.pretext_songs, cfg.duration_s, bpm_lo=70, bpm_hi=180,
                                  freq_lo=700.0, freq_hi=2800.0, seed=cfg.seed + 1,
                                  difficulty=cfg.difficulty)
    proxy, _, _ = _build_corpus(args.proxy_songs, cfg.duration_s, bpm_lo=70, bpm_hi=180,
                                freq_lo=700.0, freq_hi=2800.0, seed=cfg.seed + 77,
                                difficulty=cfg.difficulty)

    bank = np.stack([r.vqt for r in split_u]).astype(np.float32)
    n_val = max(2, len(bank) // 8)
    ckpt = os.path.abspath("results/synthetic/pretext_ckpt_fullbudget")
    pre_cfg = PretextRunConfig(
        task="zerons", num_epochs=args.epochs, batch_size=16, seed=cfg.seed,
        lr=cfg.pretext_lr, tracks_per_step=cfg.pretext_accum,
        checkpoint_path=ckpt, selection="proxy_f1",
        proxy_dataset=proxy, proxy_every=args.proxy_every,
        # The first full-budget run pinned at ln(16) for all 300 epochs
        # (fullbudget_cv8.json best_proxy_epoch=9); give the watchdog a
        # demo-scale escape deadline so a pinned attempt is restarted
        # instead of burning the whole budget.
        plateau_deadline=80,
    )
    best_params, hist = train_pretext(bank[n_val:], bank[:n_val], pre_cfg)
    fused = {"params": {"pretext": best_params["params"]}}

    zs_f1 = zero_shot_proxy_f1(split_a, best_params)
    out = {
        "pretext_epochs": args.epochs,
        "selection": "proxy_f1",
        "best_proxy_epoch": int(hist["proxy_epoch"][int(np.argmax(hist["proxy_f1"]))]),
        "best_proxy_f1": round(float(np.max(hist["proxy_f1"])), 4),
        "zero_shot_f1_corpus_a": round(zs_f1, 4),
        "watchdog_restarts": hist.get("restarts", []),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)

    # 8-fold supervised CV, pretrained arm, seed 0 (run_cv8 cadence + lrs).
    bcfg = BeatExperimentConfig(
        status="pretrained", lr=6e-3, eval_method="dbn", n_folds=args.folds,
        max_epochs=cfg.max_epochs, patience=cfg.patience,
        batch_size=cfg.batch_size, pos_weight=cfg.pos_weight, seed=0,
    )
    res_pre = run_beat_experiment(split_a, bcfg, init_params=fused, progress=False)
    out["pretrained_fullbudget"] = {k: round(v, 4) for k, v in summarize(res_pre).items()}

    # Context: the committed seed-0 records (60-epoch val-loss-selected
    # pretext) from the 3-seed artifact, for a same-seed comparison.
    cv8_path = "results/synthetic/supervised_cv8.json"
    if os.path.exists(cv8_path):
        with open(cv8_path) as fh:
            cv8 = json.load(fh)
        seed0 = cv8.get("per_seed", {}).get("0")
        if seed0:
            out["committed_seed0"] = {
                "vanilla": seed0["vanilla"], "pretrained_demo_budget": seed0["pretrained"],
            }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
