"""Source-separation interface: stems-from-disk, built-in HPSS, or passthrough.

The reference hardwires Spleeter (TensorFlow) for its percussive/rest split
(processing/source_separation.py:8-32). Here separation is a pluggable
boundary with three backends:

- ``stems``: load pre-separated 4-stem WAVs from ``<stem_dir>/<track_id>/
  {bass,drums,other,vocals}.wav`` (the reference's new_data/ layout,
  pretext.py:113-126) — use this to consume Spleeter output produced offline;
- ``hpss``: built-in TPU median-filter HPSS (ops/hpss.py), percussive stream
  stands in for drums;
- ``learned``: the trained STFT-mask separator (models/separator.py, trained
  by train/separator.py — the self-contained Spleeter-class capability);
- ``mix``: anchor = positive = mix (CLMR-style degenerate pair).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from zeronotesamba_tpu.data import audio_io
from zeronotesamba_tpu.data.stems import fold_stems

STEM_NAMES = ("bass", "drums", "other", "vocals")


def load_stem_dir(track_dir: str, target_sr: int = 16000) -> Dict[str, np.ndarray]:
    stems = {}
    for name in STEM_NAMES:
        path = os.path.join(track_dir, f"{name}.wav")
        if os.path.exists(path):
            sig, _ = audio_io.load_audio(path, target_sr=target_sr)
            stems[name] = sig
    if not stems:
        raise FileNotFoundError(f"no stem wavs in {track_dir}")
    n = min(len(s) for s in stems.values())
    return {k: v[:n] for k, v in stems.items()}


_LEARNED_PARAMS_CACHE: Dict[str, object] = {}


def _learned_params(model_path: str):
    """Memoized orbax restore keyed by path: track-dir sweeps call
    ``separate`` once per file, and a per-call restore + re-trace costs more
    than the separation itself (ADVICE r3). The jitted MaskNet.apply is
    cached by JAX's own jit cache once the params object is stable."""
    key = os.path.abspath(model_path)
    if key not in _LEARNED_PARAMS_CACHE:
        from zeronotesamba_tpu.train.checkpoint import load_params

        _LEARNED_PARAMS_CACHE[key] = load_params(key)
    return _LEARNED_PARAMS_CACHE[key]


def separate(
    signal: np.ndarray,
    sr: int,
    backend: str = "hpss",
    *,
    stem_dir: str | None = None,
    model_path: str | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (anchor, positive) streams for a mono signal."""
    if backend == "stems":
        if stem_dir is None:
            raise ValueError("backend='stems' requires stem_dir")
        return fold_stems(load_stem_dir(stem_dir, target_sr=sr))
    if backend == "hpss":
        from zeronotesamba_tpu.ops.hpss import hpss_host

        harmonic, percussive = hpss_host(signal)
        return harmonic, percussive
    if backend == "learned":
        if model_path is None:
            raise ValueError("backend='learned' requires model_path (train via `train-separator`)")
        from zeronotesamba_tpu.train.separator import separate_learned

        drums, rest = separate_learned(signal, _learned_params(model_path))
        return rest, drums  # (anchor=rest-of-signal, positive=drums)
    if backend == "mix":
        sig = np.asarray(signal, dtype=np.float32)
        return sig, sig.copy()
    raise ValueError(f"unknown separation backend {backend!r} (stems|hpss|learned|mix)")
