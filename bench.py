"""Single-chip benchmark: VQT + fused-encoder inference throughput.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "audio_min/s/chip", "vs_baseline": N, ...}

The metric is end-to-end front-end throughput — raw 10 s audio clips through
the batched multi-rate VQT and the FusedDownstream twin-encoder forward — in
minutes of audio processed per second on one chip. ``vs_baseline`` compares
against the CPU pipeline the reference implies (librosa VQT + torch CNN,
zeroNoteSamba/processing/input_rep.py + models/models.py): here an
equivalent numpy multi-rate VQT + torch-CPU encoder measured in-process
(librosa itself is not installable in this image). BASELINE.json's north
star is >=20x that CPU number.

Dedup-proofing (the axon relay serves repeated identical (executable, args)
requests from cache): EVERY timed iteration runs the pipeline on an input
batch that has never been executed before. Inputs are generated on-device
(jax.random with distinct keys) and materialized before the clock starts, so
neither the ~1 MB/s host link nor the RNG shows up in the timing; a 4-byte
host read per step forces real execution (block_until_ready alone can return
early through the relay). Sanity rails printed alongside the headline:

- ``tflops``/``mfu``: analytic FLOP count of the measured pipeline (encoder
  conv MACs + VQT filterbank/decimation MACs) divided by wall time, and that
  against the chip's bf16 peak;
- two variants: ``f32`` (XLA VQT + f32 encoder) and ``bf16`` (Pallas fused
  VQT + bfloat16 MXU encoder, the production inference path). The headline
  value is the best variant.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import traceback

import numpy as np

CLIP_S = 10.0
SR = 16000
# Large batch amortizes the fixed per-call overhead of the tunneled TPU
# runtime (~30 ms/round-trip) so the metric reflects on-chip throughput.
# Swept 48/96/192 on v5e: 38.2 / 45.9 / 43.1 audio-min/s — 96 is the knee
# (192 regresses; larger working sets start thrashing HBM).
BATCH = 96
N_FRAMES = 626

# bf16 MXU peak per chip by device kind (TFLOP/s); MFU is reported against
# this (f32 runs use multi-pass MXU, so bf16 peak is the common denominator).
_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v6e": 918.0,
    "TPU v6 lite": 918.0,
    "TPU7x": 2307.0,
}


def encoder_fwd_flops(t: int) -> float:
    """Analytic fwd FLOPs (mul+add = 2) of ONE encoder stream + head at t frames."""
    from zeronotesamba_tpu.models.encoder import CONV_SPECS, POOL_AFTER, EMBED_DIM

    # Encoder: SAME conv at input height h, pool after POOL_AFTER layers.
    macs_frame = 0
    h, cin = 96, 1
    for i, (cout, (kh, kw)) in enumerate(CONV_SPECS):
        macs_frame += kh * kw * cin * cout * h
        if i in POOL_AFTER:
            h //= POOL_AFTER[i]
        cin = cout
    return 2.0 * macs_frame * t + 2.0 * EMBED_DIM * t  # + 1x1 head


def pipeline_flops_per_clip() -> float:
    """Analytic FLOPs (mul+add = 2) for ONE clip through the measured path:
    two VQT front-ends + twin 8-conv encoders + heads."""
    from zeronotesamba_tpu.ops.filterbank import XQTParams, halfband_decimation_filter

    t = N_FRAMES
    enc = encoder_fwd_flops(t)
    # VQT: per octave a (2*bpo, W) filterbank at T frames, plus the halfband
    # decimation cascade over the (padded) signal.
    p = XQTParams()
    vqt = 0.0
    n_samp = int(CLIP_S * SR) + 2 * ((p.window_len // 2 + 1) << (p.n_octaves - 1))
    for j in range(p.n_octaves):
        vqt += 2.0 * (2 * p.bins_per_octave) * p.window_len * t
        if j < p.n_octaves - 1:
            vqt += 2.0 * len(halfband_decimation_filter()) * (n_samp >> (j + 1))
    return 2.0 * (enc + vqt)  # two streams (anchor + positive)


def _device_pipeline(variant: str):
    import jax
    import jax.numpy as jnp

    from zeronotesamba_tpu.models.encoder import FusedDownstream
    from zeronotesamba_tpu.ops.filterbank import XQTParams
    from zeronotesamba_tpu.ops.vqt import log_xqt
    from zeronotesamba_tpu.ops.pallas.vqt_kernel import log_xqt_pallas

    params_x = XQTParams()
    dtype = jnp.float32 if variant == "f32" else jnp.bfloat16
    # bf16_s2d: conv2 via the exact frequency space-to-depth fold — the one
    # heavy layer below 50% of MXU peak (models/encoder.fold_conv_freq2).
    s2d = (1,) if variant == "bf16_s2d" else ()
    model = FusedDownstream(compute_dtype=dtype, freq_s2d=s2d)
    # Fastest measured front-end (tools/bench_probe, batch 48 x 10 s): the
    # Pallas fused-cascade VQT at 32 ms vs 56 ms for the XLA path.
    if variant == "f32":
        front = log_xqt
    else:
        front = lambda s, p: log_xqt_pallas(s, p, fused_cascade=True)
    t = N_FRAMES
    mparams = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 96, t, 1)), jnp.zeros((1, 96, t, 1)))

    @jax.jit
    def pipeline(mp, anc_sig, pos_sig):
        va = front(anc_sig, params_x)[:, :, :, None]
        vp = front(pos_sig, params_x)[:, :, :, None]
        return model.apply(mp, va, vp)

    return pipeline, mparams


def bench_device(variant: str = "f32", n_iters: int = 8, warmup: int = 2) -> float:
    """audio-min/s with a never-before-executed input batch per timed step."""
    import jax

    pipeline, mparams = _device_pipeline(variant)
    n_samp = int(CLIP_S * SR)
    key = jax.random.PRNGKey(42)
    keys = jax.random.split(key, 2 * (warmup + n_iters))
    # Distinct on-device batches, materialized BEFORE the clock: dedup-proof
    # (fresh (executable, args) pair each call) without host-link uploads.
    batches = [jax.random.normal(k, (BATCH, n_samp), dtype=np.float32) for k in keys]
    jax.block_until_ready(batches)
    for i in range(warmup):
        float(pipeline(mparams, batches[2 * i], batches[2 * i + 1])[0, 0])
    t0 = time.perf_counter()
    for i in range(warmup, warmup + n_iters):
        out = pipeline(mparams, batches[2 * i], batches[2 * i + 1])
        float(out[0, 0])  # 4-byte host read: forces execution through the relay
    dt = time.perf_counter() - t0
    audio_minutes = n_iters * BATCH * CLIP_S / 60.0
    return audio_minutes / dt


def bench_pretext_train(n_iters: int = 10, warmup: int = 3, batch: int = 16, crop: int = 313,
                        dtype: str = "float32", steps_per_call: int = 1,
                        freq_s2d: tuple = ()):
    """Pretext train-step throughput (SURVEY §6's 'pretext step time at batch
    16'): the staged fwd+bwd NT-Xent step on a device-resident bank.
    Dedup-proof: every timed step uses distinct (track_idx, starts) args.
    Returns (step_ms, train_tflops) with the standard fwd+bwd ~= 3x fwd
    FLOP model over the twin encoder streams. ``dtype='bfloat16'`` measures
    the mixed-precision path (tests/test_bf16_training.py pins parity).
    Dropout keys come from the engines' default rbg impl — the threefry mask
    programs cost 42 ms of a 164 ms step (results/profile_train_step.json).
    ``steps_per_call=S`` measures the multi-step dispatch (lax.scan over S
    optimizer steps per executed program — amortizes the ~34 ms relay
    round-trip to 34/S ms); the reported ms is still per optimizer step."""
    import jax
    import jax.numpy as jnp

    from zeronotesamba_tpu.train.pretext import (
        PretextConfig, dropout_key, init_pretext_state, make_staged_train_step, sample_shifts,
    )

    cfg = PretextConfig(batch_size=batch, crop_frames=crop, compute_dtype=dtype,
                        freq_s2d=freq_s2d)
    state = init_pretext_state(cfg, jax.random.PRNGKey(0))
    step = make_staged_train_step(cfg, steps_per_call=steps_per_call)
    bank_frames = 2 * crop
    bank = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 96, bank_frames), dtype=np.float32)
    jax.block_until_ready(bank)
    rng = np.random.default_rng(2)
    key = dropout_key(3)
    times = []
    for i in range(warmup + n_iters):
        key, sub = jax.random.split(key)
        if steps_per_call > 1:
            tracks = jnp.asarray(rng.integers(0, 4, size=steps_per_call).astype(np.int32))
            starts = jnp.asarray(np.stack([
                sample_shifts(bank_frames, batch, crop, rng) for _ in range(steps_per_call)
            ]))
            t0 = time.perf_counter()
            state, losses, _, _ = step(state, bank, tracks, starts, sub)
            float(losses[-1])  # host read: forces real execution through the relay
        else:
            starts = jnp.asarray(sample_shifts(bank_frames, batch, crop, rng))
            t0 = time.perf_counter()
            state, loss, _, _ = step(state, bank, jnp.int32(i % 4), starts, sub)
            float(loss)  # host read: forces real execution through the relay
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    step_s = float(np.median(times)) / steps_per_call
    flops = 3.0 * 2.0 * batch * encoder_fwd_flops(crop)  # fwd+bwd, two streams
    return step_s * 1e3, flops / step_s / 1e12


def bench_supervised_train(n_iters: int = 10, warmup: int = 3, batch: int = 8, t_frames: int = 768,
                           dtype: str = "float32", steps_per_call: int = 1):
    """Supervised bucket-step throughput: donated masked-BCE train step on the
    fused twin model (train/supervised.train_step). A distinct VQT batch per
    timed step keeps the relay from dedup-serving. ``steps_per_call=K``
    measures the multi-step dispatch (make_multistep_train_step: one lax.scan
    program runs K optimizer steps, gathering rows from a device-resident
    bucket per step — amortizes the ~34 ms relay round-trip to 34/K ms); the
    reported ms is still per optimizer step."""
    import jax
    import jax.numpy as jnp

    from zeronotesamba_tpu.data.datasets import SongRecord
    from zeronotesamba_tpu.train.pretext import dropout_key
    from zeronotesamba_tpu.train.supervised import (
        SupervisedConfig, init_state, make_multistep_train_step, train_step,
    )

    cfg = SupervisedConfig(status="pretrained", lr=1e-4, bucket_frames=t_frames, compute_dtype=dtype)
    example = SongRecord(
        name="bench", vqt=np.zeros((2, 96, t_frames), np.float32),
        pulse=np.zeros(t_frames, np.float32), down_pulse=np.zeros(t_frames, np.float32),
        beat_times=np.zeros(1), downbeat_times=np.zeros(0),
    )
    state = init_state(cfg, example, jax.random.PRNGKey(0))
    pulse = jnp.zeros((batch, t_frames))
    mask = jnp.ones((batch, t_frames))
    times = []
    if steps_per_call > 1:
        # Device-resident bucket (the run_epoch layout); distinct (idx, keys)
        # args per timed call keep the relay from dedup-serving.
        n_rows = 4 * batch
        vqt_bank = jax.random.normal(jax.random.PRNGKey(1), (n_rows, 2, 96, t_frames), dtype=np.float32)
        pulse_bank = jnp.zeros((n_rows, t_frames))
        mask_bank = jnp.ones((n_rows, t_frames))
        jax.block_until_ready(vqt_bank)
        mstep = make_multistep_train_step("pretrained", False)
        base = dropout_key(2)
        rng = np.random.default_rng(3)
        for i in range(warmup + n_iters):
            idx = jnp.asarray(rng.integers(0, n_rows, size=(steps_per_call, batch)).astype(np.int32))
            offs = i * steps_per_call + jnp.arange(steps_per_call)
            keys_k = jax.vmap(lambda o: jax.random.fold_in(base, o))(offs)
            t0 = time.perf_counter()
            state, losses, _ = mstep(state, vqt_bank, pulse_bank, mask_bank, idx, keys_k)
            float(losses[-1])  # host read: forces real execution through the relay
            if i >= warmup:
                times.append(time.perf_counter() - t0)
    else:
        data_keys = jax.random.split(jax.random.PRNGKey(1), warmup + n_iters)
        keys = jax.random.split(dropout_key(2), warmup + n_iters)  # engine-default rbg
        vqts = [jax.random.normal(k, (batch, 2, 96, t_frames), dtype=np.float32) for k in data_keys]
        jax.block_until_ready(vqts)
        for i in range(warmup + n_iters):
            t0 = time.perf_counter()
            state, loss, _ = train_step(state, vqts[i], pulse, mask, keys[i], "pretrained")
            float(loss)
            if i >= warmup:
                times.append(time.perf_counter() - t0)
    step_s = float(np.median(times)) / steps_per_call
    flops = 3.0 * 2.0 * batch * encoder_fwd_flops(t_frames)
    return step_s * 1e3, flops / step_s / 1e12


def bench_infer_latency(n_iters: int = 6, warmup: int = 2) -> float:
    """End-to-end ONE-file latency (reference sample_script.py shape): one
    10 s clip through separation-free VQT + fused twin encoders + host DBN
    decode. Distinct clips per timed iteration (relay dedup)."""
    import jax

    from zeronotesamba_tpu.decode import decode as decode_fn

    pipeline, mparams = _device_pipeline("bf16")
    n_samp = int(CLIP_S * SR)
    keys = jax.random.split(jax.random.PRNGKey(7), 2 * (warmup + n_iters))
    clips = [jax.random.normal(k, (1, n_samp), dtype=np.float32) for k in keys]
    jax.block_until_ready(clips)
    times = []
    for i in range(warmup + n_iters):
        t0 = time.perf_counter()
        out = pipeline(mparams, clips[2 * i], clips[2 * i + 1])
        act = np.asarray(out[0])
        decode_fn(act, "dbn", fps=62.5)
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def bench_roundtrip_overhead(n_iters: int = 20, warmup: int = 5) -> float:
    """Fixed per-execute overhead of the tunneled TPU runtime: median wall
    time of a trivial jitted program on distinct (8,) inputs with a 4-byte
    host read. The chip is idle for nearly all of it (~34 ms measured,
    results/profile_train_step.json), so the ``*_mfu_net`` rails report MFU
    with this fixed cost removed — the on-chip number a non-tunneled
    deployment would see."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    xs = [jnp.full((8,), float(i)) for i in range(warmup + n_iters)]
    jax.block_until_ready(xs)
    times = []
    for i, x in enumerate(xs):
        t0 = time.perf_counter()
        float(f(x)[0])
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


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


def _init_backend(attempts: int = None, attempt_timeout_s: float = None, backoff_s: float = None):
    """Bring the JAX backend up with bounded retries (VERDICT r3 weak #1).

    The axon relay occasionally refuses/hangs backend init: ``jax.devices()``
    was observed hanging >7 min, which cost the whole round-3 bench artifact
    (BENCH_r03.json rc=1). Each attempt runs in a daemon thread so a hung init
    can't wedge the process; on repeated failure we return None and the caller
    emits a partial JSON line instead of dying with a traceback. Timings are
    env-tunable (ZNS_BENCH_INIT_{ATTEMPTS,TIMEOUT_S,BACKOFF_S}) so the
    failure path itself can be exercised quickly during an outage.
    """
    if attempts is None:
        attempts = int(os.environ.get("ZNS_BENCH_INIT_ATTEMPTS", "3"))
    if attempt_timeout_s is None:
        attempt_timeout_s = float(os.environ.get("ZNS_BENCH_INIT_TIMEOUT_S", "300"))
    if backoff_s is None:
        backoff_s = float(os.environ.get("ZNS_BENCH_INIT_BACKOFF_S", "90"))
    result: dict = {}

    def attempt():
        try:
            import jax

            result["kind"] = jax.devices()[0].device_kind
        except Exception as e:  # noqa: BLE001 — any init failure is retryable
            result["error"] = f"{type(e).__name__}: {e}"[:200]

    execs = int(os.environ.get("ZNS_BENCH_REEXEC", "0"))
    for i in range(attempts):
        result.clear()
        th = threading.Thread(target=attempt, daemon=True)
        th.start()
        th.join(attempt_timeout_s)
        if result.get("kind"):
            return result["kind"]
        err = result.get("error", f"jax.devices() hung >{attempt_timeout_s:.0f}s")
        print(f"[bench] backend init attempt {i + 1}/{attempts} (exec {execs + 1}) failed: {err}",
              file=sys.stderr)
        if th.is_alive():
            # A wedged init thread holds process-global backend locks, so
            # same-process retries would just block on them. Give the relay
            # time to recover, then re-exec for a clean client state (up to
            # attempts total execs — outages observed here last minutes).
            if execs < attempts - 1:
                time.sleep(backoff_s)
                os.environ["ZNS_BENCH_REEXEC"] = str(execs + 1)
                os.execv(sys.executable, [sys.executable] + sys.argv)
            break
        if i < attempts - 1:
            time.sleep(backoff_s)
    return None


def _stage(out: dict, name: str, fn, retries: int = 1, backoff_s: float = 60.0):
    """Run one bench stage; on failure retry once, then record the error in
    the JSON instead of raising (a partial artifact beats rc=1)."""
    for i in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            err = f"{type(e).__name__}: {e}"[:200]
            print(f"[bench] stage {name} attempt {i + 1} failed: {err}", file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            if i < retries:
                time.sleep(backoff_s)
    out[f"{name}_error"] = err
    return None


def main():
    out = {
        "metric": "vqt_encoder_throughput",
        "value": None,
        "unit": "audio_min/s/chip",
        "vs_baseline": None,
    }
    kind = _init_backend()
    if kind is None:
        # CPU baseline needs no TPU backend — salvage at least that rail.
        out["error"] = "jax backend init failed after retries"
        cpu_tput = _stage(out, "cpu_baseline", bench_cpu_baseline)
        if cpu_tput:
            out["cpu_baseline_audio_min_s"] = round(cpu_tput, 3)
        print(json.dumps(out))
        return

    peak = _PEAK_TFLOPS.get(kind, 275.0)
    out["device"] = kind
    flops_clip = pipeline_flops_per_clip()
    out["flops_per_clip_g"] = round(flops_clip / 1e9, 1)

    # MFU for every variant is reported against the ORIGINAL model's analytic
    # FLOPs (useful work) — bf16_s2d executes ~1.4x FLOPs on conv2's zero
    # taps, which counts as overhead, not throughput.
    results = {}
    for variant in ("f32", "bf16", "bf16_s2d"):
        results[variant] = _stage(out, variant, lambda v=variant: bench_device(v))
    variants = ("f32", "bf16", "bf16_s2d")
    if any(results.get(v) for v in variants):
        best_variant = max((v for v in variants if results.get(v)), key=lambda v: results[v])
        tput = results[best_variant]
        clips_per_s = tput * 60.0 / CLIP_S
        tflops = flops_clip * clips_per_s / 1e12
        out.update({
            "value": round(tput, 3),
            "variant": best_variant,
            "tflops": round(tflops, 2),
            "mfu": round(tflops / peak, 4),
        })
        for v in variants:
            if results.get(v):
                out[f"{v}_audio_min_s"] = round(results[v], 3)
    cpu_tput = _stage(out, "cpu_baseline", bench_cpu_baseline)
    if cpu_tput:
        out["cpu_baseline_audio_min_s"] = round(cpu_tput, 3)
        if out["value"]:
            out["vs_baseline"] = round(out["value"] / cpu_tput, 2)

    # Train-step rails (VERDICT r2 missing #4): fwd+bwd throughput, f32 and
    # the mixed-precision bf16 path (VERDICT r3 next #3). Each rail is
    # independent so one failure can't erase the others. ``*_mfu_net`` strips
    # the measured fixed relay round-trip (chip idle) from the step time.
    ov = _stage(out, "roundtrip_overhead", bench_roundtrip_overhead)
    if ov:
        out["roundtrip_overhead_ms"] = round(ov, 2)

    def mfu_net(ms: float, tf: float) -> float:
        return round(tf * ms / (ms - ov) / peak, 4) if ov and ms > 2 * ov else None

    p = _stage(out, "pretext_train", bench_pretext_train)
    if p:
        p_ms, p_tf = p
        out.update({
            "pretext_step_ms_b16": round(p_ms, 2),
            "pretext_train_tflops": round(p_tf, 2),
            "pretext_train_mfu": round(p_tf / peak, 4),
        })
    pb = _stage(out, "pretext_train_bf16", lambda: bench_pretext_train(dtype="bfloat16"))
    if pb:
        pb_ms, pb_tf = pb
        out.update({
            "pretext_step_ms_b16_bf16": round(pb_ms, 2),
            "pretext_train_mfu_bf16": round(pb_tf / peak, 4),
        })
        if mfu_net(pb_ms, pb_tf):
            out["pretext_train_mfu_bf16_net"] = mfu_net(pb_ms, pb_tf)
    # Multi-step dispatch rail: lax.scan over 8 optimizer steps per executed
    # program amortizes the fixed relay round-trip 8x at the reference batch
    # (train/pretext.make_staged_train_step steps_per_call; numerics pinned
    # by tests/test_train.py::test_pretext_multistep_scan_matches_sequential).
    pk = _stage(out, "pretext_train_bf16_k8",
                lambda: bench_pretext_train(dtype="bfloat16", steps_per_call=8,
                                            n_iters=6, warmup=2))
    if pk:
        pk_ms, pk_tf = pk
        out.update({
            "pretext_step_ms_b16_bf16_k8": round(pk_ms, 2),
            "pretext_train_mfu_bf16_k8": round(pk_tf / peak, 4),
        })
    # Best-known-config rail: bf16 + 8-step dispatch + conv2 space-to-depth
    # (models/encoder.fold_conv_freq2 — exact numerics, schedule only). MFU
    # still counts the ORIGINAL model's useful FLOPs.
    pbest = _stage(out, "pretext_train_best",
                   lambda: bench_pretext_train(dtype="bfloat16", steps_per_call=8,
                                               freq_s2d=(1,), n_iters=6, warmup=2))
    if pbest:
        pbest_ms, pbest_tf = pbest
        out.update({
            "pretext_step_ms_b16_best": round(pbest_ms, 2),
            "pretext_train_mfu_best": round(pbest_tf / peak, 4),
        })
    # Large-batch rail: batch 64 amortizes the fixed tunnel round-trip 4x
    # (the production configuration for reference-scale banks).
    pb64 = _stage(out, "pretext_train_bf16_b64", lambda: bench_pretext_train(batch=64, dtype="bfloat16", n_iters=6, warmup=2))
    if pb64:
        pb64_ms, pb64_tf = pb64
        out.update({
            "pretext_step_ms_b64_bf16": round(pb64_ms, 2),
            "pretext_train_mfu_b64_bf16": round(pb64_tf / peak, 4),
        })
        if mfu_net(pb64_ms, pb64_tf):
            out["pretext_train_mfu_b64_bf16_net"] = mfu_net(pb64_ms, pb64_tf)
    s = _stage(out, "supervised_train", bench_supervised_train)
    if s:
        s_ms, s_tf = s
        out.update({
            "supervised_step_ms_b8x768": round(s_ms, 2),
            "supervised_train_tflops": round(s_tf, 2),
            "supervised_train_mfu": round(s_tf / peak, 4),
        })
    sb = _stage(out, "supervised_train_bf16", lambda: bench_supervised_train(dtype="bfloat16"))
    if sb:
        sb_ms, sb_tf = sb
        out.update({
            "supervised_step_ms_b8x768_bf16": round(sb_ms, 2),
            "supervised_train_mfu_bf16": round(sb_tf / peak, 4),
        })
        if mfu_net(sb_ms, sb_tf):
            out["supervised_train_mfu_bf16_net"] = mfu_net(sb_ms, sb_tf)
    # Supervised multi-step dispatch rail (train/supervised
    # .make_multistep_train_step; parity pinned by tests/test_train.py
    # ::test_supervised_multistep_scan_matches_sequential).
    sk = _stage(out, "supervised_train_bf16_k8",
                lambda: bench_supervised_train(dtype="bfloat16", steps_per_call=8,
                                               n_iters=6, warmup=2))
    if sk:
        sk_ms, sk_tf = sk
        out.update({
            "supervised_step_ms_b8x768_bf16_k8": round(sk_ms, 2),
            "supervised_train_mfu_bf16_k8": round(sk_tf / peak, 4),
        })
    lat = _stage(out, "infer_latency", bench_infer_latency)
    if lat:
        out["infer_latency_ms_1clip"] = round(lat, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the driver must always get a JSON line
        print(json.dumps({
            "metric": "vqt_encoder_throughput", "value": None,
            "unit": "audio_min/s/chip", "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
