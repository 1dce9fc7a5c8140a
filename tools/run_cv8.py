"""8-fold supervised CV at reference patience (beat_down.py:50-151 cadence).

Regenerates results/synthetic/supervised_cv8.json on the current demo corpus
(wide-timbre corpus A) for the vanilla and pretrained arms, reusing the
demo suite's 120-epoch pretext checkpoint (results/synthetic/pretext_ckpt)
for the pretrained init so the pretext stage is not retrained.

Multi-seed (VERDICT r3 next #2): ``--seed`` takes one or more EXPERIMENT
seeds (fold assignment + dropout/init streams); the corpus stays fixed, so
seed-to-seed spread isolates experiment noise from data noise. The artifact
records per-seed summaries plus a pooled mean+-std over all seeds' folds.

Usage: python tools/run_cv8.py [--seed 11 17 23] [--out results/...json]
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
    ap.add_argument("--out", default="results/synthetic/supervised_cv8.json")
    ap.add_argument("--ckpt", default="results/synthetic/pretext_ckpt")
    ap.add_argument("--folds", type=int, default=8)
    ap.add_argument("--difficulty", type=float, default=1.0)
    ap.add_argument("--seed", type=int, nargs="+", default=None,
                    help="experiment seed(s); corpus stays fixed (default: demo-suite seed)")
    ap.add_argument("--merge-prior", default=None, help=(
        "path to a prior artifact whose seeds are folded into per_seed/pooled "
        "(a single-seed-layout file is treated as the demo seed 0). Pooling "
        "uses its (mean, std, n) moments — per-fold values aren't stored in "
        "the historical layout, and moments pool exactly."))
    args = ap.parse_args()

    # Dedupe while preserving order: a duplicated --seed would otherwise
    # overwrite per_seed silently and double-count folds in the pool.
    seeds = list(dict.fromkeys(args.seed)) if args.seed else None

    prior_seeds: dict = {}
    prior_n = 0
    if args.merge_prior and os.path.exists(args.merge_prior):
        with open(args.merge_prior) as fh:
            pj = json.load(fh)
        prior_n = int(pj.get("n_folds", 8))
        if prior_n != args.folds:
            print(json.dumps({"warning": "prior n_folds differs from --folds",
                              "prior_n_folds": prior_n, "folds": args.folds}), flush=True)
        if "per_seed" in pj:
            prior_seeds = dict(pj["per_seed"])
        else:  # historical single-seed layout = demo-suite seed 0
            prior_seeds = {"0": {"vanilla": pj["vanilla"], "pretrained": pj["pretrained"]}}
        # A seed scheduled for THIS run replaces (never adds to) its prior
        # record: a retry after a mid-run wedge would otherwise read this
        # run's own incremental writes back as "prior" and double-count.
        if seeds:
            for s in seeds:
                prior_seeds.pop(str(s), None)

    from zeronotesamba_tpu.experiments.beat import (
        BeatExperimentConfig, run_beat_experiment, summarize,
    )
    from zeronotesamba_tpu.experiments.demo_suite import DemoSuiteConfig, _build_corpus
    from zeronotesamba_tpu.train.checkpoint import load_params

    cfg = DemoSuiteConfig()
    split_a, mix_a, _ = _build_corpus(
        cfg.n_songs, cfg.duration_s, bpm_lo=70, bpm_hi=180,
        freq_lo=700.0, freq_hi=2800.0, seed=cfg.seed + 1,
        difficulty=args.difficulty,
    )
    best_params = load_params(args.ckpt)
    fused_params = {"params": {"pretext": best_params["params"]}}

    if seeds is None:
        seeds = [cfg.seed]
    per_seed = {}
    fold_f1 = {"vanilla": [], "pretrained": []}

    def pooled_over_all():
        # Fresh seeds contribute per-fold values; merged prior seeds only
        # their (mean, std, n) moments — which pool exactly (ddof=0).
        # n is taken per prior-seed record when it carries one (mixed-fold
        # merges would otherwise be mis-weighted by the file-level n_folds).
        out = {}
        for arm in ("vanilla", "pretrained"):
            n = len(fold_f1[arm])
            s = float(np.sum(fold_f1[arm]))
            ss = float(np.sum(np.square(fold_f1[arm])))
            for rec in prior_seeds.values():
                m, st = float(rec[arm]["F1"]), float(rec[arm]["F1_std"])
                rn = int(rec.get("n_folds", prior_n))
                n += rn
                s += rn * m
                ss += rn * (st * st + m * m)
            mean = s / n
            out[arm] = {
                "F1": round(mean, 4),
                "F1_std": round(max(0.0, ss / n - mean * mean) ** 0.5, 4),
                "n": n,
            }
        return out

    def write_artifact(done_seeds):
        all_per_seed = {**prior_seeds, **per_seed}
        # Legacy top-level arms are pinned to the canonical demo seed 0 when
        # present (consumers of the pre-multi-seed layout read seed-0
        # numbers); only a run that never touched seed 0 falls back to its
        # own first seed.
        legacy = all_per_seed.get("0") or per_seed[str(done_seeds[0])]
        out = {
            "seeds": sorted({int(s) for s in all_per_seed}),
            "seeds_this_run": done_seeds,
            "per_seed": all_per_seed,
            "pooled": pooled_over_all(),
            "vanilla": legacy["vanilla"],
            "pretrained": legacy["pretrained"],
            "n_folds": args.folds,
            "difficulty": args.difficulty,
        }
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=2)
        return out

    for i, seed in enumerate(seeds):
        bcfg = BeatExperimentConfig(
            status="vanilla", lr=2e-4, eval_method="dbn", n_folds=args.folds,
            max_epochs=cfg.max_epochs, patience=cfg.patience,
            batch_size=cfg.batch_size, pos_weight=cfg.pos_weight, seed=seed,
        )
        res_van = run_beat_experiment(mix_a, bcfg, progress=False)
        # lr 6e-3 (eff 3e-4 under the 0.05x rule): the demo-scale pretrained
        # init needs a warmer fine-tune than the reference's (see
        # summary.json supervised.arm_overrides; 2e-3 leaves folds at the
        # zero-shot solution on the hardened corpus).
        pcfg = dataclasses.replace(bcfg, status="pretrained", lr=6e-3)
        res_pre = run_beat_experiment(split_a, pcfg, init_params=fused_params, progress=False)
        per_seed[str(seed)] = {
            "vanilla": {k: round(v, 4) for k, v in summarize(res_van).items()},
            "pretrained": {k: round(v, 4) for k, v in summarize(res_pre).items()},
            "n_folds": args.folds,
        }
        fold_f1["vanilla"].extend(float(r.test_metrics[0]) for r in res_van)
        fold_f1["pretrained"].extend(float(r.test_metrics[0]) for r in res_pre)
        print(json.dumps({"seed": seed, **per_seed[str(seed)]}), flush=True)
        # Incremental write: a relay outage mid-run still leaves every
        # completed seed committed to the artifact (VERDICT r3 weak #1 class).
        out = write_artifact(seeds[: i + 1])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
