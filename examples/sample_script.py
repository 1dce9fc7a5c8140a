"""End-to-end inference demo (the reference's sample_script.py, rebuilt).

Reference flow (sample_script.py:12-92): mp3 -> Spleeter 4stems -> fold to
drums/rest -> resample 16 kHz -> VQT x2 -> pretrained Down_CNN -> per-stream
and fused pulses -> plots. Here: WAV in, pluggable separation (built-in HPSS
by default; pre-separated stems via --stem-dir), batched VQT on TPU, fused
twin encoders, DBN beat decode, and the same waveform/pulse figures.

    python examples/sample_script.py song.wav --params <orbax dir> --save out/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# Runnable straight from a checkout without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio", help="wav file (mono or stereo)")
    ap.add_argument("--params", default=None, help="orbax params checkpoint (random init if omitted)")
    ap.add_argument("--torch-ckpt", default=None, help="reference-format Pretext_CNN .pth[.gz]")
    ap.add_argument("--separation", default="hpss", choices=["hpss", "stems", "mix"])
    ap.add_argument("--stem-dir", default=None)
    ap.add_argument("--decoder", default="dbn", choices=["dbn", "librosa", "threshold"])
    ap.add_argument("--save", default=None, help="directory for output figures")
    args = ap.parse_args()

    from zeronotesamba_tpu.data import audio_io
    from zeronotesamba_tpu.infer import BeatTracker
    from zeronotesamba_tpu.utils.plotting import plot_pulse_over_waveform, plot_xqt

    params = None
    if args.torch_ckpt:
        from zeronotesamba_tpu.models.torch_compat import fused_params_from_torch, load_torch_state_dict

        params = fused_params_from_torch(load_torch_state_dict(args.torch_ckpt))
    elif args.params:
        from zeronotesamba_tpu.train.checkpoint import load_params

        params = load_params(args.params)

    tracker = BeatTracker(params=params)
    sig, sr = audio_io.load_audio(args.audio, target_sr=16000)
    res = tracker.track_signal(sig, sr, separation=args.separation, stem_dir=args.stem_dir, decoder=args.decoder)

    print(f"{len(res.beat_times)} beats decoded ({args.decoder}); first: {np.round(res.beat_times[:8], 3)}")
    if args.save:
        os.makedirs(args.save, exist_ok=True)
        plot_xqt(res.vqt[0], save=os.path.join(args.save, "anchor_vqt.pdf"), title="anchor (non-percussive)")
        plot_xqt(res.vqt[1], save=os.path.join(args.save, "positive_vqt.pdf"), title="positive (percussive)")
        plot_pulse_over_waveform(
            sig, res.fused_pulse, beat_times=res.beat_times,
            save=os.path.join(args.save, "pulse.pdf"), title="fused beat pulse",
        )
        print(f"figures written to {args.save}")


if __name__ == "__main__":
    main()
