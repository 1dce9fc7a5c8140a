"""Profile the pretext train step: where do 167 ms go? (VERDICT r4 next #2)

Round 4 showed the fwd+bwd step is NOT MXU-bound: bf16 bought only 3-6%
(pretext MFU 0.365 -> 0.377 vs 0.728 inference). This probe decomposes the
step with targeted ablations instead of a jax.profiler trace (the axon relay
tunnels executions; on-host traces don't see the chip):

  1. relay round-trip overhead (trivial program, distinct inputs)
  2. baseline staged step, bf16, B=16 x 313 frames (the bench rail)
  3. forward-only loss (no grad, no optimizer)
  4. full step with dropout disabled (RNG + mask cost)
  5. full step with 'rbg' hardware-RNG dropout keys (threefry cost)
  6. batch scaling B=32/64 (fixed-overhead amortization + tiling)
  7. per-conv fwd+bwd microbench at train shapes (which conv's backward
     underuses the MXU)

Writes results/profile_train_step.json incrementally (relay-wedge safe).
Every timed call uses never-before-executed inputs (the relay dedup-serves
identical (executable, args) pairs) and a tiny host read to force execution.

Usage: python tools/probe_train_mfu.py [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT_PATH = "results/profile_train_step.json"
PEAK_TFLOPS = 197.0  # v5e bf16; overwritten from the live device kind below


def _write(out: dict):
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as fh:
        json.dump(out, fh, indent=2)


def _median_ms(fn, n_iters: int, warmup: int = 2) -> float:
    times = []
    for i in range(warmup + n_iters):
        t0 = time.perf_counter()
        fn(i)
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3


def probe_overhead(n_iters: int) -> float:
    """Fixed cost of one execute round-trip through the relay: a trivial
    program on distinct 32-byte inputs, result read back to host."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    xs = [jnp.full((8,), float(i)) for i in range(n_iters + 4)]
    jax.block_until_ready(xs)
    float(f(xs[-1])[0])  # compile
    return _median_ms(lambda i: float(f(xs[i])[0]), n_iters)


def _staged_step_ms(n_iters: int, batch: int, crop: int, dropout: float,
                    grad: bool, rng_impl: str = None) -> float:
    """One configurable timing of the staged pretext step (bench rail twin)."""
    import jax
    import jax.numpy as jnp

    from zeronotesamba_tpu.train.pretext import (
        PretextConfig, init_pretext_state, make_staged_train_step, sample_shifts,
    )

    cfg = PretextConfig(batch_size=batch, crop_frames=crop, compute_dtype="bfloat16",
                        dropout_rate=dropout)
    state = init_pretext_state(cfg, jax.random.PRNGKey(0))
    if grad:
        step = make_staged_train_step(cfg)
    else:
        # Forward-only: the same multi-track loss, no grad, no update.
        from zeronotesamba_tpu.losses.ntxent import ntxent
        from zeronotesamba_tpu.train.pretext import _forward

        @jax.jit
        def fwd_loss(params, bank, track_idx, starts, rng):
            item = jax.lax.dynamic_index_in_dim(bank, track_idx, 0, keepdims=False)
            batch_ = jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(item, s, cfg.crop_frames, axis=2)
            )(starts)
            anchors = batch_[:, 0, :, :, None]
            positives = batch_[:, 1, :, :, None]
            a_emb, p_emb = _forward(state.apply_fn, params, anchors, positives,
                                    cfg.task, True, rng)
            loss, _, _ = ntxent(a_emb, p_emb, cfg.temperature)
            return loss

    bank_frames = 2 * crop
    bank = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 96, bank_frames), dtype=np.float32)
    jax.block_until_ready(bank)
    rng = np.random.default_rng(2)
    # Typed key (jax.random.key): PRNGKey returns raw legacy data that loses
    # a non-default impl; the typed form threads 'rbg' through split/fold_in.
    key = jax.random.key(3, impl=rng_impl) if rng_impl else jax.random.PRNGKey(3)
    keys = jax.random.split(key, n_iters + 4)

    def run(i):
        nonlocal state
        starts = jnp.asarray(sample_shifts(bank_frames, batch, crop, rng))
        if grad:
            state, loss, _, _ = step(state, bank, jnp.int32(i % 4), starts, keys[i])
        else:
            loss = fwd_loss(state.params, bank, jnp.int32(i % 4), starts, keys[i])
        float(loss)

    return _median_ms(run, n_iters, warmup=3)


def probe_per_conv(n_iters: int, overhead_ms: float, batch: int = 16, t: int = 313,
                   n_inner: int = 4):
    """fwd+bwd of each conv layer alone at its in-training shape, bf16.

    Reports achieved TFLOP/s against the 3x-fwd model per layer — the layer
    whose fraction-of-peak is lowest is where the backward pass loses the
    chip. Input height follows the pool plan (96/96/32/32/8/8/1/1).

    The round-4 version timed ONE conv per relay round-trip, so for the small
    layers the ~30 ms fixed overhead dominated and the reported pct_peak was
    an artifact (conv1 read '0.1% of peak' while being on-chip free). Fixed:
    each timed call scans the conv fwd+bwd ``n_inner`` times on-device over
    distinct input slices, the measured overhead is subtracted, and the
    remainder is divided by ``n_inner`` — per-layer ON-CHIP ms. A distinct
    scalar argument per call defeats the relay's (executable, args) dedup."""
    import jax
    import jax.numpy as jnp

    from zeronotesamba_tpu.models.encoder import CONV_SPECS, POOL_AFTER

    rows = []
    h, cin = 96, 1
    key = jax.random.PRNGKey(0)
    for i, (cout, (kh, kw)) in enumerate(CONV_SPECS):
        key, kw_key, kx = jax.random.split(key, 3)
        w = jax.random.normal(kw_key, (kh, kw, cin, cout), dtype=jnp.bfloat16) * 0.05

        def conv_loss(w_, xs_, s0):
            def body(acc, x_):
                y = jax.lax.conv_general_dilated(
                    x_, w_, window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                return acc + jnp.sum(jax.nn.relu(y).astype(jnp.float32)), 0

            acc, _ = jax.lax.scan(body, s0, xs_)
            return acc

        vg = jax.jit(jax.value_and_grad(conv_loss, argnums=(0, 1)))
        # Device-generated inputs (a host upload at these shapes would take
        # minutes through the ~1 MB/s relay link).
        xs = jax.jit(lambda k: jax.random.normal(
            k, (n_inner, batch, h, t, cin), dtype=jnp.bfloat16))(kx)
        jax.block_until_ready(xs)

        def run(j, vg=vg, xs=xs, w=w):
            loss, _ = vg(w, xs, jnp.float32(j))
            float(loss)

        ms = _median_ms(run, n_iters, warmup=2)
        onchip_ms = max(ms - overhead_ms, 1e-3) / n_inner
        flops = 3.0 * 2.0 * kh * kw * cin * cout * h * t * batch
        tf = flops / (onchip_ms / 1e3) / 1e12
        rows.append({
            "layer": f"conv{i + 1}", "shape": f"{kh}x{kw} {cin}->{cout} @h{h}",
            "call_ms": round(ms, 2), "onchip_ms": round(onchip_ms, 2),
            "tflops": round(tf, 1),
            "pct_peak": round(100.0 * tf / PEAK_TFLOPS, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
        if i in POOL_AFTER:
            h //= POOL_AFTER[i]
        cin = cout
    return rows


def main():
    global PEAK_TFLOPS
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--per-conv-only", action="store_true",
                    help="refresh only the per_conv_bwd table in the existing "
                         "profile JSON (keeps the committed step timings)")
    args = ap.parse_args()

    import jax

    from bench import _PEAK_TFLOPS, encoder_fwd_flops

    kind = jax.devices()[0].device_kind
    PEAK_TFLOPS = _PEAK_TFLOPS.get(kind, 197.0)

    if args.per_conv_only:
        with open(OUT_PATH) as fh:
            out = json.load(fh)
        overhead = probe_overhead(args.iters)
        out["per_conv_bwd"] = probe_per_conv(args.iters, overhead)
        _write(out)
        print(json.dumps(out["per_conv_bwd"]))
        return

    out = {"device": kind, "peak_tflops_bf16": PEAK_TFLOPS, "batch": 16, "crop": 313}

    def mfu(ms, batch, crop, mult=3.0):
        fl = mult * 2.0 * batch * encoder_fwd_flops(crop)
        return round(fl / (ms / 1e3) / 1e12 / PEAK_TFLOPS, 4)

    out["roundtrip_overhead_ms"] = round(probe_overhead(args.iters), 2)
    _write(out)

    base = _staged_step_ms(args.iters, 16, 313, 0.1, grad=True)
    out["step_ms"] = round(base, 2)
    out["step_mfu"] = mfu(base, 16, 313)
    # MFU net of the fixed relay round-trip (the on-chip ceiling at B=16).
    net = base - out["roundtrip_overhead_ms"]
    out["step_mfu_net_overhead"] = mfu(net, 16, 313)
    _write(out)

    fwd = _staged_step_ms(args.iters, 16, 313, 0.1, grad=False)
    out["fwd_only_ms"] = round(fwd, 2)
    out["fwd_only_mfu"] = mfu(fwd, 16, 313, mult=1.0)
    _write(out)

    nodrop = _staged_step_ms(args.iters, 16, 313, 0.0, grad=True)
    out["no_dropout_step_ms"] = round(nodrop, 2)
    out["dropout_cost_ms"] = round(base - nodrop, 2)
    _write(out)

    rbg = _staged_step_ms(args.iters, 16, 313, 0.1, grad=True, rng_impl="rbg")
    out["rbg_dropout_step_ms"] = round(rbg, 2)
    _write(out)

    for b in (32, 64):
        ms = _staged_step_ms(max(4, args.iters // 2), b, 313, 0.1, grad=True)
        out[f"step_ms_b{b}"] = round(ms, 2)
        out[f"step_mfu_b{b}"] = mfu(ms, b, 313)
        _write(out)

    out["per_conv_bwd"] = probe_per_conv(args.iters, out["roundtrip_overhead_ms"])
    _write(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
