"""Command-line interface (the reference had none — every entry point was an
``if __name__ == '__main__'`` reading a hand-edited YAML).

    python -m zeronotesamba_tpu <command> [...]

Commands:
    build-data   ETL a dataset directory into an npz record cache
    beat         8-fold CV beat-tracking experiment on a cached dataset
    cross        cross-dataset experiment (train X, test Y)
    few-shot     training-set size sweep
    pretext      self-supervised contrastive pretraining
    old-school   Ellis DP baseline on raw audio
    measures     embedding information measures over a dataset
    infer        one file -> pulse + beats
    bench        single-chip throughput benchmark (also: python bench.py)
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _add_common(p):
    p.add_argument("--config", default=None, help="reference-format YAML config")
    p.add_argument("--seed", type=int, default=0)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser("zeronotesamba_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-data", help="ETL dataset -> npz cache")
    b.add_argument("dataset", choices=["ballroom", "gtzan", "hainsworth", "smc", "synthetic"])
    b.add_argument("--root", required=False, help="dataset root directory")
    b.add_argument("--out", required=True, help="output cache directory")
    b.add_argument("--separation", default="none", choices=["none", "hpss", "stems", "mix"])
    b.add_argument("--n-songs", type=int, default=16, help="synthetic only")

    t = sub.add_parser("beat", help="8-fold CV beat experiment")
    t.add_argument("--data", required=True, help="npz cache directory")
    t.add_argument("--status", default="vanilla", choices=["vanilla", "pretrained", "clmr", "bock"])
    t.add_argument("--pre", default="finetune", choices=["finetune", "frozen", "validation"])
    t.add_argument("--lr", type=float, default=1e-5)
    t.add_argument("--eval", default="dbn", choices=["dbn", "librosa", "threshold"])
    t.add_argument("--max-epochs", type=int, default=500)
    t.add_argument("--patience", type=int, default=20)
    t.add_argument("--batch-size", type=int, default=8)
    t.add_argument("--folds", type=int, default=8)
    t.add_argument("--params", default=None, help="pretrained params checkpoint")
    t.add_argument("--out", default=None, help="write results JSON here")
    t.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                   help="conv compute dtype (bfloat16 = MXU mixed precision)")
    t.add_argument("--steps-per-call", type=int, default=1,
                   help="K optimizer steps per executed program (lax.scan; "
                        "amortizes the relay round-trip, numerics identical)")
    t.add_argument("--freq-s2d", action="store_true",
                   help="compute conv2 via the exact frequency space-to-depth "
                        "fold (full-MXU schedule; params/numerics unchanged)")
    _add_common(t)

    c = sub.add_parser("cross", help="cross-dataset experiment")
    c.add_argument("--train-data", required=True)
    c.add_argument("--test-data", required=True)
    for a in (("--status", "vanilla"), ("--pre", "finetune")):
        c.add_argument(a[0], default=a[1])
    c.add_argument("--lr", type=float, default=1e-5)
    c.add_argument("--eval", default="dbn")
    c.add_argument("--max-epochs", type=int, default=500)
    c.add_argument("--patience", type=int, default=20)
    c.add_argument("--batch-size", type=int, default=8)
    c.add_argument("--params", default=None)
    c.add_argument("--out", default=None)
    _add_common(c)

    f = sub.add_parser("few-shot", help="training-set size sweep")
    f.add_argument("--data", required=True)
    f.add_argument("--status", default="vanilla")
    f.add_argument("--pre", default="finetune")
    f.add_argument("--lr", type=float, default=1e-5)
    f.add_argument("--sizes", default="1,2,4,8,16")
    f.add_argument("--repeats", type=int, default=3)
    f.add_argument("--max-epochs", type=int, default=100)
    f.add_argument("--patience", type=int, default=10)
    f.add_argument("--batch-size", type=int, default=8)
    f.add_argument("--params", default=None)
    f.add_argument("--out", default=None)
    _add_common(f)

    pt = sub.add_parser("pretext", help="contrastive pretraining")
    pt.add_argument("--stem-root", default=None, help="new_data/-style stem dir")
    pt.add_argument("--bank", default=None, help="prebuilt .npz bank (train_bank/val_bank arrays)")
    pt.add_argument("--task", default="zerons", choices=["zerons", "clmr"])
    pt.add_argument("--epochs", type=int, default=250)
    pt.add_argument("--batch-size", type=int, default=16)
    pt.add_argument("--checkpoint", default="models/shift_pret_cnn_16", help="best-val params path")
    pt.add_argument("--data-parallel", action="store_true", help="shard batches over all devices")
    pt.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                    help="conv compute dtype (bfloat16 = MXU mixed precision)")
    pt.add_argument("--selection", default="val_loss", choices=["val_loss", "proxy_f1"],
                    help="checkpoint selection: NT-Xent val loss (reference parity) "
                         "or zero-shot beat F1 on a labeled proxy set")
    pt.add_argument("--proxy-data", default=None,
                    help="npz dataset cache for --selection proxy_f1")
    pt.add_argument("--freq-s2d", action="store_true",
                    help="compute conv2 via the exact frequency space-to-depth "
                         "fold (full-MXU schedule; params/numerics unchanged)")
    pt.add_argument("--steps-per-call", type=int, default=1,
                    help="dispatch S optimizer steps per executed program "
                         "(lax.scan; amortizes the relay round-trip; "
                         "single-device only)")
    _add_common(pt)

    ts = sub.add_parser("train-separator", help="train the learned drum/rest mask separator")
    ts.add_argument("--steps", type=int, default=1500)
    ts.add_argument("--batch-size", type=int, default=8)
    ts.add_argument("--lr", type=float, default=3e-4)
    ts.add_argument("--train-songs", type=int, default=40)
    ts.add_argument("--val-songs", type=int, default=8)
    ts.add_argument("--checkpoint", default="models/separator", help="best-SI-SDR params path")
    ts.add_argument("--out", default=None, help="write the SI-SDR report JSON here")
    ts.add_argument("--seed", type=int, default=0)

    o = sub.add_parser("old-school", help="Ellis DP baseline on raw audio")
    o.add_argument("--data", required=True, help="npz cache (uses stored beat times)")
    o.add_argument("--audio-root", required=True, help="directory of wavs")

    m = sub.add_parser("measures", help="embedding information measures")
    m.add_argument("--data", default=None, help="npz dataset cache (not needed for --status std)")
    m.add_argument("--status", default="van", help="reference meastatus label (van/rand/drums/ros/mix/std/bock)")
    m.add_argument("--model", default=None, choices=["vanilla", "pretrained", "bock"],
                   help="override the model family (default: inferred from the data; "
                        "'bock' measures the TCN baseline's activations, reference measures.py:270-277)")
    m.add_argument("--stream", default="fused", choices=["fused", "anchor", "positive"],
                   help="which pulse to measure (reference drums=positive, ros=anchor, mix=fused)")
    m.add_argument("--bank", default=None, help="npz bank with val_bank array (--status std)")
    m.add_argument("--params", default=None)
    m.add_argument("--out", default="results/measures")

    d = sub.add_parser("demo-suite", help="reproduce the full experiment grid on synthetic data")
    d.add_argument("--out", default="results/synthetic")
    d.add_argument("--songs", type=int, default=24)
    d.add_argument("--pretext-epochs", type=int, default=120)
    d.add_argument("--max-epochs", type=int, default=60)
    d.add_argument("--folds", type=int, default=4)
    d.add_argument("--clmr", action="store_true", help="also run the CLMR pretext + finetune arm")
    d.add_argument("--difficulty", type=float, default=1.0,
                   help="corpus hardness scale (0 = clean round-2 corpora)")
    d.add_argument("--pretext-selection", default="proxy_f1", choices=["proxy_f1", "val_loss"],
                   help="pretext checkpoint selection: beat-proxy F1 (default; "
                        "results/synthetic/selection_compare.json) or reference-parity val loss")
    _add_common(d)

    i = sub.add_parser("infer", help="track one audio file")
    i.add_argument("audio", help="wav file")
    i.add_argument("--params", default=None)
    i.add_argument("--separation", default="hpss", choices=["hpss", "stems", "learned", "mix"])
    i.add_argument("--sep-model", default="models/separator", help="mask-net params (--separation learned)")
    i.add_argument("--decoder", default="dbn", choices=["dbn", "librosa", "threshold"])
    i.add_argument("--out", default=None, help="write JSON result here")

    rs = sub.add_parser("resave", help="re-sample every wav under a directory tree")
    rs.add_argument("audio_root", help="directory tree of .wav files")
    rs.add_argument("--out", required=True, help="output root (structure preserved)")
    rs.add_argument("--rate", type=int, default=44100, help="target sample rate")

    x = sub.add_parser("export-xlsx", help="render committed evidence JSONs as the "
                       "reference's six results workbooks (stdlib xlsx writer)")
    x.add_argument("--src", default="results/synthetic")
    x.add_argument("--out", default="results/synthetic/xlsx")

    td = sub.add_parser("track-dir", help="batch-track every wav in a directory")
    td.add_argument("audio_dir")
    td.add_argument("--params", default=None)
    td.add_argument("--separation", default="hpss", choices=["hpss", "stems", "learned", "mix"])
    td.add_argument("--sep-model", default="models/separator", help="mask-net params (--separation learned)")
    td.add_argument("--decoder", default="dbn", choices=["dbn", "librosa", "threshold"])
    td.add_argument("--out", required=True, help="output JSON (one entry per file)")

    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.cmd == "build-data":
        from zeronotesamba_tpu.data.datasets import BUILDERS, build_synthetic

        if args.dataset == "synthetic":
            ds = build_synthetic(n_songs=args.n_songs)
        else:
            if not args.root:
                raise SystemExit("--root required for real datasets")
            ds = BUILDERS[args.dataset](args.root, separation=args.separation)
        ds.save(args.out)
        print(f"saved {len(ds)} songs to {args.out}")

    elif args.cmd == "beat":
        from zeronotesamba_tpu.data.datasets import BeatDataset
        from zeronotesamba_tpu.experiments.beat import BeatExperimentConfig, run_beat_experiment, summarize

        ds = BeatDataset.load(args.data)
        cfg = BeatExperimentConfig(
            status=args.status, pre=args.pre, lr=args.lr, eval_method=args.eval,
            n_folds=args.folds, max_epochs=args.max_epochs, patience=args.patience,
            batch_size=args.batch_size, seed=args.seed, compute_dtype=args.dtype,
            steps_per_call=args.steps_per_call,
            freq_s2d=(1,) if args.freq_s2d else (),
        )
        params = _load_params(args.params)
        results = run_beat_experiment(ds, cfg, init_params=params)
        _dump(args.out, summarize(results))

    elif args.cmd == "cross":
        from zeronotesamba_tpu.data.datasets import BeatDataset
        from zeronotesamba_tpu.experiments.beat import BeatExperimentConfig, summarize
        from zeronotesamba_tpu.experiments.cross import run_cross_experiment

        cfg = BeatExperimentConfig(
            status=args.status, pre=args.pre, lr=args.lr, eval_method=args.eval,
            max_epochs=args.max_epochs, patience=args.patience, batch_size=args.batch_size, seed=args.seed,
        )
        results = run_cross_experiment(
            BeatDataset.load(args.train_data), BeatDataset.load(args.test_data), cfg,
            init_params=_load_params(args.params),
        )
        _dump(args.out, summarize(results))

    elif args.cmd == "few-shot":
        from zeronotesamba_tpu.data.datasets import BeatDataset
        from zeronotesamba_tpu.experiments.beat import BeatExperimentConfig
        from zeronotesamba_tpu.experiments.few_shot import run_few_shot

        cfg = BeatExperimentConfig(
            status=args.status, pre=args.pre, lr=args.lr, max_epochs=args.max_epochs,
            patience=args.patience, batch_size=args.batch_size, seed=args.seed,
        )
        sizes = [int(s) for s in args.sizes.split(",")]
        res = run_few_shot(BeatDataset.load(args.data), cfg, train_sizes=sizes, repeats=args.repeats,
                           init_params=_load_params(args.params))
        _dump(args.out, {str(k): v for k, v in res.items()})

    elif args.cmd == "pretext":
        from zeronotesamba_tpu.experiments.pretext_driver import (
            PretextRunConfig, build_bank_from_stem_root, train_pretext,
        )

        if args.bank:
            with np.load(args.bank) as z:
                train_bank, val_bank = z["train_bank"], z["val_bank"]
        elif args.stem_root:
            bank = build_bank_from_stem_root(args.stem_root, n_samples=10**9, seed=args.seed)
            n_val = max(1, len(bank) // 10)
            val_bank, train_bank = bank[:n_val], bank[n_val:]
        else:
            raise SystemExit("need --bank or --stem-root")
        mesh = None
        if args.data_parallel:
            from zeronotesamba_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(time=1)
        proxy_ds = None
        if args.proxy_data:
            from zeronotesamba_tpu.data.datasets import BeatDataset

            proxy_ds = BeatDataset.load(args.proxy_data)
        cfg = PretextRunConfig(task=args.task, num_epochs=args.epochs, batch_size=args.batch_size,
                               seed=args.seed, checkpoint_path=args.checkpoint,
                               compute_dtype=args.dtype, selection=args.selection,
                               proxy_dataset=proxy_ds, steps_per_call=args.steps_per_call,
                               freq_s2d=(1,) if args.freq_s2d else ())
        train_pretext(train_bank, val_bank, cfg, mesh=mesh)

    elif args.cmd == "train-separator":
        from zeronotesamba_tpu.train.separator import (
            SeparatorConfig, hpss_baseline_si_sdr, synth_bank, train_separator,
        )

        cfg = SeparatorConfig(steps=args.steps, batch_size=args.batch_size, lr=args.lr,
                              seed=args.seed, checkpoint_path=args.checkpoint)
        _, hist = train_separator(cfg, train_songs=args.train_songs, val_songs=args.val_songs)
        base_d, base_r = hpss_baseline_si_sdr(synth_bank(args.val_songs, 12.0, args.seed + 999))
        payload = {
            "learned_si_sdr_drums": max(hist["si_sdr_drums"]),
            "learned_si_sdr_rest": max(hist["si_sdr_rest"]),
            "hpss_si_sdr_drums": base_d,
            "hpss_si_sdr_rest": base_r,
            "history": hist,
        }
        print(json.dumps({k: v for k, v in payload.items() if k != "history"}, indent=2))
        _dump(args.out, payload)

    elif args.cmd == "old-school":
        import os

        from zeronotesamba_tpu.data import audio_io
        from zeronotesamba_tpu.data.datasets import BeatDataset
        from zeronotesamba_tpu.decode.ellis import beat_track_signal
        from zeronotesamba_tpu.metrics.beat import evaluate_beats

        ds = BeatDataset.load(args.data)
        all_scores = []
        for rec in ds:
            wav = os.path.join(args.audio_root, rec.name)
            if not os.path.exists(wav):
                continue
            sig, _ = audio_io.load_audio(wav, target_sr=16000)
            est = beat_track_signal(sig)
            all_scores.append(evaluate_beats(rec.beat_times, est))
        if not all_scores:
            raise SystemExit(f"no audio files from {args.data} found under {args.audio_root}")
        arr = np.asarray(all_scores)
        for i, n in enumerate(["F1", "CMLc", "CMLt", "AMLc", "AMLt", "InfoGain"]):
            print(f"Mean {n} is {arr[:, i].mean():.3f} +- {arr[:, i].std():.3f}.")

    elif args.cmd == "measures":
        import jax

        import jax.numpy as jnp

        from zeronotesamba_tpu.data.datasets import BeatDataset
        from zeronotesamba_tpu.experiments.measures import measure_arm, write_measures_report

        if args.status == "std":
            # NT-Xent validation re-run over a saved bank (reference
            # measures.py:394-429): report contrastive loss + similarities.
            from zeronotesamba_tpu.experiments.pretext_driver import PretextRunConfig, fixed_val_shifts
            from zeronotesamba_tpu.train.pretext import PretextConfig, init_pretext_state, make_eval_step

            if not args.bank:
                raise SystemExit("--status std requires --bank (npz with val_bank)")
            with np.load(args.bank) as z:
                val_bank = z["val_bank"]
            pcfg = PretextConfig()
            state = init_pretext_state(pcfg, jax.random.PRNGKey(0))
            if args.params:
                state = state.replace(params=_load_params(args.params))
            ev = make_eval_step(pcfg)
            losses, poss, negs = [], [], []
            for vb in fixed_val_shifts(val_bank, pcfg, 0):
                loss, pc, nc = ev(state, jnp.asarray(vb))
                losses.append(float(loss)); poss.append(float(pc)); negs.append(float(nc))
            payload = {"val_loss": float(np.mean(losses)), "pos_sim": float(np.mean(poss)),
                       "neg_sim": float(np.mean(negs))}
            print(json.dumps(payload, indent=2))
            _dump(args.out + "_std.json" if args.out else None, payload)
            return

        if not args.data:
            raise SystemExit("--data required (except for --status std)")
        ds = BeatDataset.load(args.data)
        status = args.model or ("pretrained" if ds[0].vqt.shape[0] == 2 else "vanilla")
        # Per-stream pulses (reference meastatus 'ros'/'drums' measure the
        # anchor / percussive streams separately, measures.py:341-392).
        table = measure_arm(ds, status, _load_params(args.params), stream=args.stream)
        write_measures_report(table, args.out, args.status)
        print(json.dumps(table, indent=2))

    elif args.cmd == "demo-suite":
        from zeronotesamba_tpu.experiments.demo_suite import DemoSuiteConfig, run_demo_suite

        cfg = DemoSuiteConfig(
            out_dir=args.out, n_songs=args.songs, pretext_epochs=args.pretext_epochs,
            max_epochs=args.max_epochs, folds=args.folds, clmr=args.clmr,
            difficulty=args.difficulty, seed=args.seed,
            pretext_selection=args.pretext_selection,
        )
        print(json.dumps(run_demo_suite(cfg), indent=2))

    elif args.cmd == "export-xlsx":
        from zeronotesamba_tpu.experiments.report_xlsx import export

        print(json.dumps(export(args.src, args.out)))

    elif args.cmd == "infer":
        from zeronotesamba_tpu.infer import BeatTracker

        tracker = BeatTracker(params=_load_params(args.params))
        res = tracker.track_file(args.audio, separation=args.separation, decoder=args.decoder,
                                 sep_model=args.sep_model if args.separation == "learned" else None)
        payload = {
            "n_frames": int(res.fused_pulse.shape[0]),
            "beat_times": [float(t) for t in (res.beat_times if res.beat_times is not None else [])],
        }
        print(json.dumps(payload))
        _dump(args.out, payload)

    elif args.cmd == "resave":
        # Dataset re-sample utility (reference measures.gtzan_44100,
        # zeroNoteSamba/measures.py:280-305 — generalized to any tree/rate).
        import os

        from zeronotesamba_tpu.data import audio_io

        n = 0
        for dirpath, _, files in os.walk(args.audio_root):
            rel = os.path.relpath(dirpath, args.audio_root)
            for f in sorted(files):
                if not f.endswith(".wav"):
                    continue
                sig, _ = audio_io.load_audio(os.path.join(dirpath, f), target_sr=args.rate)
                out_dir = os.path.join(args.out, rel) if rel != "." else args.out
                os.makedirs(out_dir, exist_ok=True)
                audio_io.write_wav(os.path.join(out_dir, f), sig, args.rate)
                n += 1
        print(f"resaved {n} files at {args.rate} Hz -> {args.out}")

    elif args.cmd == "track-dir":
        import os

        from zeronotesamba_tpu.infer import BeatTracker

        tracker = BeatTracker(params=_load_params(args.params))
        results = {}
        for f in sorted(os.listdir(args.audio_dir)):
            if not f.endswith(".wav"):
                continue
            try:
                res = tracker.track_file(os.path.join(args.audio_dir, f),
                                         separation=args.separation, decoder=args.decoder,
                                         sep_model=args.sep_model if args.separation == "learned" else None)
                results[f] = [float(t) for t in res.beat_times]
            except (ValueError, OSError) as e:
                results[f] = {"error": str(e)}
        _dump(args.out, results)
        print(f"tracked {len(results)} files -> {args.out}")


def _load_params(path):
    if not path:
        return None
    from zeronotesamba_tpu.train.checkpoint import load_params

    return load_params(path)


def _dump(path, obj):
    if path:
        with open(path, "w") as fh:
            json.dump(obj, fh, indent=2)


if __name__ == "__main__":
    main()
