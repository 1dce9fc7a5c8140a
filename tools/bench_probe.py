"""Perf decomposition probe: where does the pipeline's time go?

Times each stage of the bench pipeline separately with the same dedup-proof
methodology as bench.py (fresh device-generated inputs per timed call, tiny
host read to force execution):

- VQT front-end alone: XLA path vs fused Pallas path
- twin encoder alone: f32 vs bfloat16 compute dtype
- full pipeline variants, batch sweep

Usage:  python tools/bench_probe.py [--iters 6] [--batches 48,96]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CLIP_S = 10.0
SR = 16000
N_FRAMES = 626


def _timed(fn, make_args, n_iters, warmup=2):
    import jax

    args_list = [make_args(i) for i in range(warmup + n_iters)]
    jax.block_until_ready(args_list)

    def run(i):
        # Force real execution with a 4-byte host read of ONE element —
        # np.asarray(full output) would time the ~MB/s relay download of the
        # whole array instead of the kernel (measured: +300 ms on a
        # (48, 96, 626) VQT output).
        out = fn(*args_list[i])
        out = out[0] if isinstance(out, (tuple, list)) else out
        float(out.reshape(-1)[0])

    for i in range(warmup):
        run(i)
    t0 = time.perf_counter()
    for i in range(warmup, warmup + n_iters):
        run(i)
    return (time.perf_counter() - t0) / n_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batches", default="48")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from zeronotesamba_tpu.models.encoder import FusedDownstream
    from zeronotesamba_tpu.ops.filterbank import XQTParams
    from zeronotesamba_tpu.ops.vqt import log_xqt
    from zeronotesamba_tpu.ops.pallas.vqt_kernel import log_xqt_pallas

    params_x = XQTParams()
    n_samp = int(CLIP_S * SR)
    key = jax.random.PRNGKey(7)
    results = {}

    for batch in [int(b) for b in args.batches.split(",")]:
        kiter = iter(jax.random.split(key, 512).tolist() if False else range(10_000))

        def sig_batch(i, salt=0):
            k = jax.random.fold_in(key, i * 1000003 + salt + batch)
            return jax.random.normal(k, (batch, n_samp), dtype=np.float32)

        # Front-end alone (each timed independently; a variant that fails to
        # compile reports the error instead of killing the probe).
        def _try(fn, salt):
            try:
                t = _timed(fn, lambda i: (sig_batch(i, salt),), args.iters)
                print(json.dumps({"partial": {"salt": salt, "ms": round(t * 1e3, 1)}}), flush=True)
                return t
            except Exception as e:
                print(f"variant failed: {type(e).__name__}: {e}"[:300], flush=True)
                return None

        f_xla = jax.jit(lambda s: log_xqt(s, params_x))
        f_pal = jax.jit(lambda s: log_xqt_pallas(s, params_x))
        f_fus = jax.jit(lambda s: log_xqt_pallas(s, params_x, fused_cascade=True))
        t_xla = _try(f_xla, 1)
        t_pal = _try(f_pal, 2)
        t_fus = _try(f_fus, 5)

        # Encoder alone (precomputed VQT-shaped input).
        def vqt_batch(i, salt):
            k = jax.random.fold_in(key, i * 999983 + salt + batch)
            return jax.random.normal(k, (batch, 96, N_FRAMES, 1), dtype=np.float32)

        out = {}
        for dname, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            model = FusedDownstream(compute_dtype=dtype)
            mp = jax.jit(model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 96, N_FRAMES, 1)), jnp.zeros((1, 96, N_FRAMES, 1))
            )
            f_enc = jax.jit(lambda p, a, b: model.apply(p, a, b))
            t_enc = _timed(f_enc, lambda i: (mp, vqt_batch(i, 3), vqt_batch(i, 4)), args.iters)
            out[f"enc_{dname}_ms"] = round(t_enc * 1e3, 1)

        ms = lambda t: round(t * 1e3, 1) if t else None
        out["vqt_xla_ms"] = ms(t_xla)
        out["vqt_pallas_ms"] = ms(t_pal)
        out["vqt_pallas_fused_cascade_ms"] = ms(t_fus)
        audio_min = batch * CLIP_S / 60.0
        out["note"] = "x2 streams for pipeline share"
        if t_xla:
            out["pipe_equiv_audio_min_s_f32"] = round(audio_min / (2 * t_xla + out["enc_f32_ms"] / 1e3), 2)
        results[f"batch{batch}"] = out

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
