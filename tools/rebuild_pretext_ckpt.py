"""Rebuild the demo-suite pretext checkpoint in place.

``results/synthetic/pretext_ckpt`` (the demo analogue of the reference's
shipped ``models/saved/shift_pret_cnn_16.pth``, loader.py:25) is gitignored —
orbax trees are large — so a fresh host has the committed grid artifacts but
not the checkpoint the downstream tools (run_cv8 / run_few_shot /
probe_sep_zeroshot / rerun_arms) load. This reruns EXACTLY the demo suite's
pretext stage (demo_suite.py pretext block: same seed stream, same
transductive bank, same PretextRunConfig) so the rebuilt checkpoint matches
the committed summary.json provenance. Prints the val-loss history tail and
the committed summary's pretext record side by side for a sanity check.

Usage: python tools/rebuild_pretext_ckpt.py [--out results/synthetic/pretext_ckpt]
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
    ap.add_argument("--out", default="results/synthetic/pretext_ckpt")
    ap.add_argument("--force", action="store_true", help="rebuild even if the checkpoint exists")
    args = ap.parse_args()

    # A bare `isdir` check can bless a half-trained checkpoint: train_pretext
    # saves best-val params DURING training, so a wedge mid-run leaves a
    # loadable-but-undertrained dir behind. Completion is signalled by a
    # sibling marker file written only after training finishes; the build
    # itself goes to a temp dir renamed into place on success.
    marker = args.out + ".complete"
    if os.path.exists(marker) and not args.force:
        print(json.dumps({"skipped": "completed checkpoint already present", "path": args.out}))
        return

    import shutil

    from zeronotesamba_tpu.experiments.demo_suite import DemoSuiteConfig, _build_corpus
    from zeronotesamba_tpu.experiments.pretext_driver import PretextRunConfig, train_pretext

    cfg = DemoSuiteConfig()
    split_u, _, _ = _build_corpus(cfg.pretext_songs, cfg.duration_s, bpm_lo=70, bpm_hi=180,
                                  freq_lo=700.0, freq_hi=2800.0, seed=cfg.seed + 1,
                                  difficulty=cfg.difficulty)
    bank = np.stack([r.vqt for r in split_u]).astype(np.float32)
    n_val = max(2, len(bank) // 8)
    tmp_out = args.out + ".building"
    if os.path.isdir(tmp_out):
        shutil.rmtree(tmp_out)
    pre_cfg = PretextRunConfig(task="zerons", num_epochs=cfg.pretext_epochs, batch_size=16,
                               seed=cfg.seed, lr=cfg.pretext_lr,
                               tracks_per_step=cfg.pretext_accum,
                               checkpoint_path=os.path.abspath(tmp_out))
    _, hist = train_pretext(bank[n_val:], bank[:n_val], pre_cfg)
    if os.path.isdir(args.out):
        shutil.rmtree(args.out)
    os.rename(tmp_out, args.out)

    record = {
        "val_loss_first": round(hist["val_loss"][0], 4),
        "val_loss_best": round(min(hist["val_loss"]), 4),
        "val_pos_final": round(hist["val_pos"][-1], 4),
        "val_neg_final": round(hist["val_neg"][-1], 4),
    }
    committed = None
    summary_path = "results/synthetic/summary.json"
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            committed = json.load(f).get("pretext")
    with open(marker, "w") as fh:
        json.dump({"record": record}, fh)
    print(json.dumps({"rebuilt": record, "committed_summary": committed, "path": args.out}))


if __name__ == "__main__":
    main()
