"""Cross-dataset generalization experiment (cross_data.py equivalent).

Train 8 folds on one dataset (SMC / Ballroom / Hainsworth), test every fold
on the full GTZAN set (reference cross_data.py:15-206): per fold the model
trains with early stopping on a validation split of the train dataset, then
the best-val params are evaluated on all of GTZAN.
"""

from __future__ import annotations

import dataclasses
import random
from typing import List

import jax
import numpy as np

from zeronotesamba_tpu.data.datasets import BeatDataset
from zeronotesamba_tpu.experiments.beat import BeatExperimentConfig, FoldResult, _folds, summarize
from zeronotesamba_tpu.train.supervised import StagedDataset, SupervisedConfig, init_state, run_epoch
from zeronotesamba_tpu.utils.logging import get_logger

log = get_logger("experiments.cross")


def run_cross_experiment(
    train_ds: BeatDataset,
    test_ds: BeatDataset,
    cfg: BeatExperimentConfig,
    *,
    init_params=None,
) -> List[FoldResult]:
    sup_cfg = SupervisedConfig(
        status=cfg.status, pre=cfg.pre, lr=cfg.lr, eval_method=cfg.eval_method,
        batch_size=cfg.batch_size, bucket_frames=cfg.bucket_frames, dropout_seed=cfg.seed,
        pos_weight=cfg.pos_weight,
    )
    rng = random.Random(cfg.seed)
    splits = _folds(train_ds.names, cfg.n_folds, rng)
    staged_train = StagedDataset(train_ds.records, cfg.bucket_frames)
    staged_test = StagedDataset(test_ds.records, cfg.bucket_frames)
    test_plan = staged_test.plan(test_ds.names, cfg.batch_size)
    results: List[FoldResult] = []

    for fold in range(cfg.n_folds):
        train_names = [n for i, s in enumerate(splits) if i != fold for n in s]
        rng.shuffle(train_names)
        # Val = one fold's worth of the remaining songs (see beat.py: the
        # round-1 formula left ZERO training songs at n_folds=2, which is
        # what collapsed the recorded cross-dataset result).
        n_val = max(1, round(len(train_names) / cfg.n_folds))
        val_names, train_names = train_names[:n_val], train_names[n_val:]
        if not train_names:
            raise ValueError(f"fold {fold}: no training songs left (folds={cfg.n_folds})")

        state = init_state(sup_cfg, train_ds[0], jax.random.PRNGKey(cfg.seed + fold), params=init_params)
        val_plan = staged_train.plan(val_names, cfg.batch_size)

        # Init params are the first best-checkpoint candidate (see beat.py).
        _, _, ivm = run_epoch(state, staged_train, val_plan, sup_cfg, train=False, score=True)
        best_f1 = float(ivm[0])
        best_params = jax.tree.map(lambda x: x.copy(), state.params)
        stale, epoch = 0, -1
        shuffle_rng = np.random.default_rng(cfg.seed * 977 + fold)
        for epoch in range(cfg.max_epochs):
            tp = staged_train.plan(train_names, cfg.batch_size, shuffle_rng)
            state, _, _ = run_epoch(state, staged_train, tp, sup_cfg, train=True, epoch=epoch, score=False)
            _, _, vm = run_epoch(state, staged_train, val_plan, sup_cfg, train=False, score=True)
            if vm[0] > best_f1:
                best_f1, best_params, stale = float(vm[0]), jax.tree.map(lambda x: x.copy(), state.params), 0
            else:
                stale += 1
            if stale >= cfg.patience:
                break

        test_state = state.replace(params=best_params)
        _, _, tm = run_epoch(test_state, staged_test, test_plan, sup_cfg, train=False, score=True)
        log.info("cross fold %d: GTZAN F1=%.3f", fold, tm[0])
        results.append(FoldResult(fold, tm, best_f1, epoch + 1))

    summarize(results)
    return results
