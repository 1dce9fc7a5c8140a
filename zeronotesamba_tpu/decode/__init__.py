"""Beat decoders: threshold picking, Ellis DP, DBN/HMM Viterbi."""

from __future__ import annotations

import numpy as np

from zeronotesamba_tpu.decode.dbn import DBNBeatDecoderConfig, beat_activation_to_times, decode_beats
from zeronotesamba_tpu.decode.dbn_jax import decode_beats_batch_device, decode_beats_device
from zeronotesamba_tpu.decode.dbn_online import OnlineBeatDecoder, decode_beats_online
from zeronotesamba_tpu.decode.ellis import beat_track_dp, beat_track_signal, estimate_tempo, onset_strength


def threshold_beats(activations: np.ndarray, thresh_val: float = 0.075, fps: float = 62.5) -> np.ndarray:
    """Every frame above threshold becomes a beat (reference evaluate.py:36-45)."""
    act = np.asarray(activations).ravel()
    return np.nonzero(act > thresh_val)[0] / fps


def decode(activations: np.ndarray, method: str = "dbn", *, fps: float = 62.5, thresh_val: float = 0.075) -> np.ndarray:
    """Dispatch on the reference's three decoder modes ('dbn'/'librosa'/'threshold')."""
    if method == "dbn":
        return beat_activation_to_times(activations, fps=fps)
    if method in ("librosa", "ellis"):
        return beat_track_dp(activations, fps=fps)
    if method == "threshold":
        return threshold_beats(activations, thresh_val=thresh_val, fps=fps)
    raise ValueError(f"unknown decoder {method!r} (expected dbn|librosa|threshold)")


__all__ = [
    "DBNBeatDecoderConfig",
    "beat_activation_to_times",
    "decode_beats",
    "decode_beats_device",
    "decode_beats_batch_device",
    "decode_beats_online",
    "OnlineBeatDecoder",
    "beat_track_dp",
    "beat_track_signal",
    "estimate_tempo",
    "onset_strength",
    "threshold_beats",
    "decode",
]
