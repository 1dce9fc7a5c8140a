"""Pretext checkpoint selection: val-loss vs beat-proxy F1 (VERDICT r3 #4).

The reference selects its pretext checkpoint on NT-Xent validation loss
(pretext.py:408-412). On the hardened demo corpora that metric is known to be
NON-MONOTONE in zero-shot beat F1: at 60 epochs the checkpoint tracks beats
at F1 ~0.73, by 150 epochs val loss is still improving while the pulse has
decayed into shortcut features (F1 ~0.35). This tool trains ONE 150-epoch
pretext run tracking BOTH selections — the reference's best-val-loss and the
designed-improvement best-proxy-F1 (zero-shot beat F1 over a small labeled
synthetic proxy set, DISJOINT from the eval corpus) — then zero-shot
evaluates both checkpoints on corpus A and writes
results/synthetic/selection_compare.json.

Usage: python tools/run_selection_compare.py [--epochs 150] [--proxy-songs 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/synthetic/selection_compare.json")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--proxy-songs", type=int, default=6)
    ap.add_argument("--proxy-every", type=int, default=5)
    args = ap.parse_args()

    from zeronotesamba_tpu.experiments.demo_suite import DemoSuiteConfig, _build_corpus
    from zeronotesamba_tpu.experiments.pretext_driver import (
        PretextRunConfig, train_pretext, zero_shot_proxy_f1,
    )
    from zeronotesamba_tpu.train.checkpoint import load_params

    cfg = DemoSuiteConfig()
    # Eval corpus A and the transductive pretext bank: bit-identical to the
    # demo suite's (same seeds), so this row composes with the main grid.
    split_a, _, _ = _build_corpus(cfg.n_songs, cfg.duration_s, bpm_lo=70, bpm_hi=180,
                                  freq_lo=700.0, freq_hi=2800.0, seed=cfg.seed + 1,
                                  difficulty=cfg.difficulty)
    split_u, _, _ = _build_corpus(cfg.pretext_songs, cfg.duration_s, bpm_lo=70, bpm_hi=180,
                                  freq_lo=700.0, freq_hi=2800.0, seed=cfg.seed + 1,
                                  difficulty=cfg.difficulty)
    # Proxy set: same distribution, DISJOINT seed stream — selection must not
    # read the eval corpus itself.
    proxy, _, _ = _build_corpus(args.proxy_songs, cfg.duration_s, bpm_lo=70, bpm_hi=180,
                                freq_lo=700.0, freq_hi=2800.0, seed=cfg.seed + 77,
                                difficulty=cfg.difficulty)

    bank = np.stack([r.vqt for r in split_u]).astype(np.float32)
    n_val = max(2, len(bank) // 8)
    ckpt = os.path.abspath("results/synthetic/selection_ckpt")
    pre_cfg = PretextRunConfig(
        task="zerons", num_epochs=args.epochs, batch_size=16, seed=cfg.seed,
        lr=cfg.pretext_lr, tracks_per_step=cfg.pretext_accum,
        checkpoint_path=ckpt, selection="proxy_f1",
        proxy_dataset=proxy, proxy_every=args.proxy_every,
    )
    best_proxy_params, hist = train_pretext(bank[n_val:], bank[:n_val], pre_cfg)

    f1_proxy_sel = zero_shot_proxy_f1(split_a, best_proxy_params)
    val_sel_params = load_params(ckpt + "_valsel")
    f1_val_sel = zero_shot_proxy_f1(split_a, val_sel_params)

    out = {
        "epochs": args.epochs,
        "proxy_songs": args.proxy_songs,
        "corpus_a_zero_shot_f1": {
            "val_loss_selection": round(f1_val_sel, 4),
            "proxy_f1_selection": round(f1_proxy_sel, 4),
        },
        "best_val_loss": round(min(hist["val_loss"]), 4),
        "best_val_loss_epoch": int(np.argmin(hist["val_loss"])),
        "best_proxy_epoch": int(hist["proxy_epoch"][int(np.argmax(hist["proxy_f1"]))]),
        "proxy_curve": {
            "epoch": hist["proxy_epoch"],
            "f1": [round(v, 4) for v in hist["proxy_f1"]],
        },
        "note": (
            "val_loss_selection is reference parity (pretext.py:408-412); "
            "proxy_f1_selection is a designed improvement — selection on "
            "zero-shot beat F1 over a disjoint labeled proxy set."
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
