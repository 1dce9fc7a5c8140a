"""Plateau-escape probe for supervised training on harmonic-click corpora.

Half the CV folds in the round-2 demo suite stalled at the BCE base rate for
20+ epochs on the harmonic-click corpus (pure-tone corpora trained fine), so
early stopping killed them at floor F1. This probe trains one fixed split
under a grid of (lr, pos_weight) variants x param seeds and reports the
epoch at which val F1 crosses 0.9 ("breakthrough"), so the demo suite can
adopt whichever variant escapes reliably. ``--pretext`` instead probes
demo-scale pretext learning rates (zero-shot F1 per lr).

Usage: python tools/probe_plateau.py [--epochs 40] [--seeds 0,1] [--pretext]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_corpora(n: int, seed: int, *, freq_lo: float = 700.0,
                  freq_hi: float = 2800.0, difficulty: float = 1.0):
    """(split_ds, mix_ds): the demo-suite corpus-A builder at a difficulty."""
    from zeronotesamba_tpu.experiments.demo_suite import _build_corpus

    split, mix, _ = _build_corpus(n, 12.0, bpm_lo=70, bpm_hi=180, freq_lo=freq_lo,
                                  freq_hi=freq_hi, seed=seed, difficulty=difficulty)
    return split, mix


def run_variant(staged, ds, train_names, val_names, *, lr, pos_weight, seed, epochs):
    import jax

    from zeronotesamba_tpu.train.supervised import SupervisedConfig, init_state, run_epoch

    cfg = SupervisedConfig(status="vanilla", lr=lr, batch_size=8, pos_weight=pos_weight)
    state = init_state(cfg, ds[0], jax.random.PRNGKey(seed))
    rng_np = np.random.default_rng(seed + 500)
    val_plan = staged.plan(val_names, cfg.batch_size)
    hist, breakthrough = [], None
    for epoch in range(epochs):
        plan = staged.plan(train_names, cfg.batch_size, shuffle_rng=rng_np)
        state, tr_loss, _ = run_epoch(state, staged, plan, cfg, train=True, epoch=epoch, score=False)
        if epoch % 2 == 1 or epoch == epochs - 1:
            _, _, vm = run_epoch(state, staged, val_plan, cfg, train=False, score=True)
            hist.append((epoch, round(tr_loss, 4), round(float(vm[0]), 3)))
            if breakthrough is None and vm[0] > 0.9:
                breakthrough = epoch
    return {"breakthrough_epoch": breakthrough, "tail": hist[-4:]}


def probe_supervised(args):
    from zeronotesamba_tpu.train.supervised import StagedDataset

    _, mix = build_corpora(args.songs, seed=1, difficulty=args.difficulty)
    names = list(mix.names)
    train_names, val_names = names[: args.songs - 4], names[args.songs - 4 :]
    staged = StagedDataset(mix.records, 128)

    variants = {
        "lr2e-4_pw1": dict(lr=2e-4, pos_weight=1.0),
        "lr2e-4_pw8": dict(lr=2e-4, pos_weight=8.0),
        "lr5e-4_pw1": dict(lr=5e-4, pos_weight=1.0),
        "lr5e-4_pw8": dict(lr=5e-4, pos_weight=8.0),
    }
    report = {}
    for name, kw in variants.items():
        rows = {}
        for seed in [int(s) for s in args.seeds.split(",")]:
            t0 = time.time()
            r = run_variant(staged, mix, train_names, val_names, seed=seed, epochs=args.epochs, **kw)
            rows[seed] = {**r, "wall_s": round(time.time() - t0, 1)}
            print(json.dumps({name: {seed: rows[seed]}}), flush=True)
        report[name] = rows
    print("=== SUPERVISED FINAL ===")
    print(json.dumps(report, indent=2))


def probe_pretext(args):
    """Zero-shot F1 of the pretext model per demo-scale lr."""
    import jax

    from zeronotesamba_tpu.experiments.beat import BeatExperimentConfig, run_beat_experiment
    from zeronotesamba_tpu.experiments.pretext_driver import PretextRunConfig, train_pretext

    split, _ = build_corpora(args.songs, seed=1, freq_lo=args.freq_lo,
                             freq_hi=args.freq_hi, difficulty=args.difficulty)
    bank = np.stack([r.vqt for r in split]).astype(np.float32)
    n_val = max(2, len(bank) // 8)
    report = {}
    zcfg0 = BeatExperimentConfig(status="pretrained", pre="validation", eval_method="dbn", batch_size=8)
    res0 = run_beat_experiment(split, zcfg0, init_params=None, progress=False)
    report["random_init"] = {"zero_shot_f1": round(float(res0[0].test_metrics[0]), 4)}
    print(json.dumps({"random_init": report["random_init"]}), flush=True)
    for lr in [float(s) for s in args.lrs.split(",")]:
        t0 = time.time()
        cfg = PretextRunConfig(task="zerons", num_epochs=args.epochs_pretext, batch_size=16, lr=lr, seed=0,
                               tracks_per_step=args.accum)
        params, hist = train_pretext(bank[n_val:], bank[:n_val], cfg)
        fused = {"params": {"pretext": params["params"]}}
        zcfg = BeatExperimentConfig(status="pretrained", pre="validation", eval_method="dbn", batch_size=8)
        res = run_beat_experiment(split, zcfg, init_params=fused, progress=False)
        report[f"lr{lr:g}"] = {
            "val_first": round(hist["val_loss"][0], 4), "val_best": round(min(hist["val_loss"]), 4),
            "pos_final": round(hist["val_pos"][-1], 3), "neg_final": round(hist["val_neg"][-1], 3),
            "zero_shot_f1": round(float(res[0].test_metrics[0]), 4),
            "wall_s": round(time.time() - t0, 1),
        }
        print(json.dumps({f"lr{lr:g}": report[f"lr{lr:g}"]}), flush=True)
    print("=== PRETEXT FINAL ===")
    print(json.dumps(report, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--epochs-pretext", type=int, default=10)
    ap.add_argument("--lrs", default="1e-6,1e-5,3e-5,1e-4", help="pretext lr grid (--pretext mode)")
    ap.add_argument("--accum", type=int, default=1, help="tracks accumulated per update (--pretext mode)")
    ap.add_argument("--freq-lo", type=float, default=700.0)
    ap.add_argument("--freq-hi", type=float, default=2800.0)
    ap.add_argument("--difficulty", type=float, default=1.0)
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--songs", type=int, default=18)
    ap.add_argument("--pretext", action="store_true")
    args = ap.parse_args()
    if args.pretext:
        probe_pretext(args)
    else:
        probe_supervised(args)


if __name__ == "__main__":
    main()
