"""Single-chip benchmark: VQT + fused-encoder inference throughput.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "audio_min/s/chip", "vs_baseline": N}

The metric is end-to-end front-end throughput — raw 10 s audio clips through
the batched multi-rate VQT (ops/vqt.py) and the FusedDownstream twin-encoder
forward (models/encoder.py) — in minutes of audio processed per second on one
chip. ``vs_baseline`` compares against the CPU pipeline the reference
implies (librosa VQT + torch CNN, zeroNoteSamba/processing/input_rep.py +
models/models.py): here an equivalent numpy multi-rate VQT + torch-CPU
encoder measured in-process (librosa itself is not installable in this
image). BASELINE.json's north star is >=20x that CPU number.
"""

from __future__ import annotations

import json
import time

import numpy as np

CLIP_S = 10.0
SR = 16000
# Large batch amortizes the fixed per-call overhead of the tunneled TPU
# runtime (~30 ms/round-trip) so the metric reflects on-chip throughput.
BATCH = 48
N_FRAMES = 626


def _device_pipeline():
    import jax
    import jax.numpy as jnp

    from zeronotesamba_tpu.models.encoder import FusedDownstream
    from zeronotesamba_tpu.ops.filterbank import XQTParams
    from zeronotesamba_tpu.ops.vqt import log_xqt

    params_x = XQTParams()
    model = FusedDownstream()
    t = N_FRAMES
    mparams = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 96, t, 1)), jnp.zeros((1, 96, t, 1)))

    @jax.jit
    def pipeline(mp, anc_sig, pos_sig):
        va = log_xqt(anc_sig, params_x)[:, :, :, None]
        vp = log_xqt(pos_sig, params_x)[:, :, :, None]
        return model.apply(mp, va, vp)

    return pipeline, mparams


def bench_device(n_iters: int = 8, n_distinct: int = 2) -> float:
    import jax
    import jax.numpy as jnp

    pipeline, mparams = _device_pipeline()
    rng = np.random.default_rng(0)
    # Several distinct pre-staged input batches, cycled: the axon relay
    # serves repeated identical (executable, args) requests from cache, so a
    # single reused batch measures nothing. A 4-byte host read per step
    # forces materialization (block_until_ready alone is unreliable there).
    ancs = [jnp.asarray(rng.standard_normal((BATCH, int(CLIP_S * SR))).astype(np.float32)) for _ in range(n_distinct)]
    poss = [jnp.asarray(rng.standard_normal((BATCH, int(CLIP_S * SR))).astype(np.float32)) for _ in range(n_distinct)]
    for i in range(n_distinct):  # compile + stage every batch server-side
        float(pipeline(mparams, ancs[i], poss[i])[0, 0])
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = pipeline(mparams, ancs[i % n_distinct], poss[i % n_distinct])
        float(out[0, 0])
    dt = time.perf_counter() - t0
    audio_minutes = n_iters * BATCH * CLIP_S / 60.0
    return audio_minutes / dt


def bench_cpu_baseline(n_clips: int = 4) -> float:
    """numpy multi-rate VQT + torch-CPU twin encoders (reference CPU path proxy)."""
    import torch
    import torch.nn as tnn

    from zeronotesamba_tpu.ops.filterbank import (
        XQTParams,
        halfband_decimation_filter,
        octave_kernel_bank,
    )
    from zeronotesamba_tpu.models.encoder import CONV_SPECS, POOL_AFTER

    p = XQTParams()
    bank = octave_kernel_bank(p)
    taps = halfband_decimation_filter()

    def np_vqt(sig: np.ndarray) -> np.ndarray:
        pad = (p.window_len // 2 + 1) << (p.n_octaves - 1)
        x = sig.astype(np.float64)
        while pad > 0:
            s = min(pad, len(x) - 1)
            x = np.pad(x, s, mode="reflect")
            pad -= s
        pad = (p.window_len // 2 + 1) << (p.n_octaves - 1)
        t_frames = p.num_frames(len(sig))
        out = np.empty((p.n_bins, t_frames))
        for j in range(p.n_octaves - 1, -1, -1):
            dec = p.n_octaves - 1 - j
            hop = p.hop >> dec
            pad_j = pad >> dec
            off = pad_j - p.window_len // 2
            frames = np.lib.stride_tricks.sliding_window_view(x[off:], p.window_len)[::hop][:t_frames]
            resp = frames @ np.conj(bank[j])
            out[12 * j : 12 * j + 12] = np.abs(resp).T
            if j > 0:
                xp = np.pad(x, len(taps) // 2, mode="reflect")
                if len(x) % 2 == 1:
                    xp = np.append(xp, 0.0)
                x = np.convolve(xp, taps, mode="valid")[::2]
        return np.log(out + p.log_eps)

    # torch twin encoder (architecture of the reference Down_CNN)
    def trunk():
        layers = []
        cin = 1
        for i, (cout, k) in enumerate(CONV_SPECS):
            layers.append(tnn.Conv2d(cin, cout, k, padding=(k[0] // 2, k[1] // 2)))
            if i in POOL_AFTER:
                layers.append(tnn.MaxPool2d((POOL_AFTER[i], 1)))
            layers.append(tnn.ReLU())
            cin = cout
        return tnn.Sequential(*layers)

    class TorchDown(tnn.Module):
        def __init__(self):
            super().__init__()
            self.a = trunk()
            self.p = trunk()
            self.ha = tnn.Conv1d(128, 1, 1)
            self.hp = tnn.Conv1d(128, 1, 1)

        def forward(self, va, vp):
            ea = torch.sigmoid(self.ha(self.a(va).squeeze(2)))
            ep = torch.sigmoid(self.hp(self.p(vp).squeeze(2)))
            return torch.maximum(ea, ep)

    model = TorchDown().eval()
    rng = np.random.default_rng(0)
    sigs = rng.standard_normal((n_clips, int(CLIP_S * SR))).astype(np.float32)
    t0 = time.perf_counter()
    with torch.no_grad():
        for i in range(n_clips):
            va = np_vqt(sigs[i])
            vp = np_vqt(sigs[i])
            ta = torch.from_numpy(va[None, None].astype(np.float32))
            tp = torch.from_numpy(vp[None, None].astype(np.float32))
            model(ta, tp)
    dt = time.perf_counter() - t0
    return n_clips * CLIP_S / 60.0 / dt


def main():
    device_tput = bench_device()
    cpu_tput = bench_cpu_baseline()
    print(
        json.dumps(
            {
                "metric": "vqt_encoder_throughput",
                "value": round(device_tput, 3),
                "unit": "audio_min/s/chip",
                "vs_baseline": round(device_tput / cpu_tput, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
