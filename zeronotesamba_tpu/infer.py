"""One-call inference API (the reference sample_script.py as a library).

Pipeline (reference sample_script.py:12-48): audio file -> (anchor, positive)
streams via a separation backend -> resample 16 kHz -> batched VQT on device
-> pretrained twin encoders -> per-stream + fused per-frame pulse -> optional
beat decode.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from zeronotesamba_tpu.data import audio_io
from zeronotesamba_tpu.data.separation import separate
from zeronotesamba_tpu.decode import decode as decode_fn
from zeronotesamba_tpu.models.encoder import FusedDownstream
from zeronotesamba_tpu.ops.filterbank import XQTParams
from zeronotesamba_tpu.ops.vqt import best_log_xqt

SAMPLE_RATE = 16000
FPS = 62.5


@dataclasses.dataclass
class InferenceResult:
    anchor_pulse: np.ndarray  # (T,)
    positive_pulse: np.ndarray  # (T,)
    fused_pulse: np.ndarray  # (T,)
    beat_times: Optional[np.ndarray]  # decoded beats (seconds) or None
    vqt: np.ndarray  # (2, 96, T)


class BeatTracker:
    """Pretrained fused model + decoder, reusable across files."""

    def __init__(self, params=None, *, reduction: str = "max", seed: int = 0):
        self.model = FusedDownstream(reduction=reduction)
        if params is None:
            t = 313
            x = jnp.zeros((1, 96, t, 1))
            params = jax.jit(self.model.init)(jax.random.PRNGKey(seed), x, x)
        self.params = params

        @jax.jit
        def _forward(p, anc, pos):
            anc_emb, pos_emb = self.model.apply(p, anc, pos, method=lambda m, a, b: m.pretext(a, b))
            fused = jnp.maximum(anc_emb, pos_emb) if reduction == "max" else (anc_emb + pos_emb) / 2
            return anc_emb, pos_emb, fused

        self._forward = _forward

    def track_signal(
        self,
        signal: np.ndarray,
        sr: int = SAMPLE_RATE,
        *,
        separation: str = "hpss",
        stem_dir: Optional[str] = None,
        sep_model: Optional[str] = None,
        decoder: Optional[str] = "dbn",
        mode: str = "vqt",
    ) -> InferenceResult:
        sig = np.asarray(signal, dtype=np.float32)
        if sr != SAMPLE_RATE:
            from zeronotesamba_tpu.ops.resample import resample_poly_host

            sig = resample_poly_host(sig, sr, SAMPLE_RATE)
        anchor, positive = separate(sig, SAMPLE_RATE, backend=separation, stem_dir=stem_dir,
                                    model_path=sep_model)
        params = XQTParams(sample_rate=SAMPLE_RATE, mode=mode)
        vqts = np.asarray(best_log_xqt(jnp.asarray(np.stack([anchor, positive])), params))
        anc = jnp.asarray(vqts[0])[None, :, :, None]
        pos = jnp.asarray(vqts[1])[None, :, :, None]
        anc_emb, pos_emb, fused = self._forward(self.params, anc, pos)
        fused_np = np.asarray(fused[0])
        beats = decode_fn(fused_np, decoder, fps=FPS) if decoder else None
        return InferenceResult(
            anchor_pulse=np.asarray(anc_emb[0]),
            positive_pulse=np.asarray(pos_emb[0]),
            fused_pulse=fused_np,
            beat_times=beats,
            vqt=vqts,
        )

    def track_file(self, path: str, **kw) -> InferenceResult:
        sig, sr = audio_io.load_audio(path, target_sr=SAMPLE_RATE)
        return self.track_signal(sig, SAMPLE_RATE, **kw)
