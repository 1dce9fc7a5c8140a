"""Fused Pallas TPU kernel for the VQT filterbank stage.

Fuses, per octave, what the XLA path (ops/vqt.py) runs as conv -> square ->
add -> sqrt -> (later) log with HBM roundtrips between them:

    frames(signal) @ [cos|sin] bank -> magnitude -> log(. + eps)

in one VMEM-resident pass. Frames are gathered on the XLA side (im2col with
overlap factor W/hop — see _octave_kernel for why in-kernel framing was
abandoned); the filterbank matmul maps to the MXU
((1024, 256) x (256, 128)) and magnitude + log run on the VPU over the same
tile. TPU tiling constraints shape the layout: last dims padded to the 128
lane width (the 24 live bank columns are zero-padded to 128).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zeronotesamba_tpu.ops.filterbank import XQTParams, octave_kernel_bank

BANK_PAD = 128  # bank columns padded from 2*bpo=24 to the lane width


def _octave_kernel(x_ref, bank_ref, out_ref, *, bpo: int, log_eps: float):
    """One program: frames @ bank -> |.| -> log, all VMEM-resident.

    x_ref:    (TILE_M, w)         pre-gathered frame rows
    bank_ref: (w, BANK_PAD)       [cos(12) | sin(12) | zeros]
    out_ref:  (TILE_M, BANK_PAD)  log-mags in cols [0, bpo)

    The frame matrix is gathered on the XLA side (an im2col with overlap
    factor w/hop): an earlier revision assembled frames IN-KERNEL from
    hop-wide span rows via `x_ref[:, pl.ds(k, TILE_T), :]` inside a
    fori_loop, which silently mis-lowers on real TPUs for hop in [8, 128]
    (dynamic sublane offsets on lane-padded refs corrupt the last ~59 frames
    of a 626-frame tile set; interpret mode agrees with XLA, hardware does
    not). Static-shape gather + one plain (TILE_M, w) x (w, BANK_PAD) MXU
    matmul has no such hazard and the duplicated-read HBM cost (~w/hop x
    the signal, <= 5 MB per 10 s clip) is noise next to the encoder.
    """
    # HIGHEST: full f32 via multi-pass MXU — the log epilogue amplifies
    # bf16 matmul error unacceptably in low-magnitude cells.
    resp = jnp.dot(
        x_ref[:, :], bank_ref[:, :],
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    re = resp[:, :bpo]
    im = resp[:, bpo : 2 * bpo]
    mag = jnp.sqrt(re * re + im * im + 1e-30)
    logmag = jnp.log(mag + log_eps)
    out_ref[:, :] = jnp.concatenate(
        [logmag, jnp.zeros((resp.shape[0], BANK_PAD - bpo), jnp.float32)], axis=1
    )


TILE_M = 1024  # frame rows per program: (1024, 256) @ (256, 128) per step


def octave_log_xqt_pallas(
    sig: jnp.ndarray,  # (B, >= (n_frames-1)*hop + w) signal, frame 0 at offset 0
    bank: jnp.ndarray,  # (w, BANK_PAD) float32
    *,
    hop: int,
    w: int,
    n_frames: int,
    bpo: int = 12,
    log_eps: float = 1e-9,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, L) -> (B, n_frames, bpo) log magnitudes for one octave."""
    b = sig.shape[0]
    need = (n_frames - 1) * hop + w
    if sig.shape[1] < need:
        sig = jnp.pad(sig, ((0, 0), (0, need - sig.shape[1])))
    # XLA-side frame gather (see kernel docstring for why not in-kernel).
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(w)[None, :]).reshape(-1)
    frames = jnp.take(sig, idx, axis=1).reshape(b * n_frames, w)
    m = frames.shape[0]
    m_pad = ((m + TILE_M - 1) // TILE_M) * TILE_M
    if m_pad != m:
        frames = jnp.pad(frames, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_octave_kernel, bpo=bpo, log_eps=log_eps),
        out_shape=jax.ShapeDtypeStruct((m_pad, BANK_PAD), jnp.float32),
        grid=(m_pad // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, BANK_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, BANK_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frames, bank)
    return out[:m].reshape(b, n_frames, BANK_PAD)[:, :, :bpo]


# ---------------------------------------------------------------------------
# Fused decimation cascade (VERDICT r1 task 9): all 7 half-band decimation
# levels in ONE Pallas kernel, intermediate levels VMEM-resident.
#
# Layout trick that makes the cascade Mosaic-expressible: the signal is
# stored as (R, w) rows of w samples. Decimating by 2 maps row r of the
# w-wide input onto row r of the (w/2)-wide output (sample counts halve,
# row counts stay FIXED), so level s+1 row r depends only on level-s rows
# r-J..r+J (J = ceil-ish of taps/2/w) — a sum of SHIFTED CONTIGUOUS row
# slices times banded constant matrices:
#
#     Y = sum_j X[J+j : J+j+R] @ D_j,   D_j[i, l] = taps[j*w + i - 2l + c]
#
# No stride-2 row/lane access (the classic TPU decimation obstacle) ever
# appears; every term is an MXU matmul. Widths run 256 -> 128 -> ... -> 2.
#
# Boundary semantics: the XLA path (ops/vqt._decimate2) reflect-pads every
# level by taps//2 = 40. Instead of reproducing reflection in-kernel, the
# fused path reflect-pads the FULL-RATE signal twice as generously
# (2 * (w//2+1) << dec_max) and lets level edges read zero pad rows: edge
# corruption propagates inward at most depth* = taps//2 * (1 + 1/2 + ...)
# <= 80 samples at any level, while every sample the octave framing consumes
# sits >= (2*pad>>dec) - 128 >= 130 samples inside — so all CONSUMED samples
# are bit-comparable (f32 HIGHEST matmuls) to the XLA path.
# ---------------------------------------------------------------------------

_CASCADE_W0 = 256  # level-0 row width; must equal XQTParams.hop


@functools.lru_cache(maxsize=4)
def _cascade_mats(n_levels: int, w0: int = _CASCADE_W0) -> Tuple[Tuple[np.ndarray, ...], ...]:
    """Per-level stacked shift matrices: level s -> (2J+1, w_in, w_in//2)."""
    from zeronotesamba_tpu.ops.filterbank import halfband_decimation_filter

    taps = halfband_decimation_filter().astype(np.float64)
    c = len(taps) // 2
    out = []
    for s in range(n_levels):
        w_in = w0 >> s
        w_out = w_in // 2
        jmax = (c + w_in - 1) // w_in + 1
        mats = np.zeros((2 * jmax + 1, w_in, w_out), np.float64)
        for j in range(-jmax, jmax + 1):
            for i in range(w_in):
                for l in range(w_out):
                    t = j * w_in + i - 2 * l + c
                    if 0 <= t < len(taps):
                        mats[j + jmax, i, l] = taps[t]
        out.append(mats.astype(np.float32))
    return tuple(out)


def _cascade_kernel(x_ref, *refs, n_levels: int, r_rows: int):
    """One batch row: (1, R, 256) -> levels 1..n (1, R, 256 >> s)."""
    d_refs, out_refs = refs[:n_levels], refs[n_levels:]
    x = x_ref[0]
    for s in range(n_levels):
        mats = d_refs[s]
        jmax = (mats.shape[0] - 1) // 2
        xp = jnp.pad(x, ((jmax, jmax), (0, 0)))
        y = None
        for jj in range(mats.shape[0]):
            term = jax.lax.dot(
                xp[jj : jj + r_rows, :], mats[jj],
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
            y = term if y is None else y + term
        out_refs[s][0] = y
        x = y


def _cascade_vmem_levels(r: int, n_levels: int, budget_bytes: int = 10 << 20) -> int:
    """How many cascade levels fit the per-program scoped-VMEM budget.

    Mosaic's scoped stack reuses buffers across levels but keeps a level's
    inputs (= the previous level's outputs) live while computing it, so the
    binding constraint is the cost of ADJACENT level pairs, not the sum over
    all levels. Arrays pad their minor dim to the 128 lane width, so the
    narrow deep levels — whose shift count (2*jmax+1) also grows as the row
    width shrinks past the 81-tap support — are the expensive ones.
    Compile-measured at r=883 (10 s clip, inside the full log_xqt_pallas
    program): depth 7 allocates 21.2 MB and depth 6 still 16.2 MB against
    the 16 MB scoped limit — both fail; depth 5 compiles. The 10 MB pairwise
    budget picks depth 5 there and scales the choice with r for longer
    signals (the surrounding program contributes ~1-2 MB of its own scoped
    allocations, hence the margin below the hardware's 16 MB).
    """
    lane = 128
    c = 40  # taps // 2 for the 81-tap half-band filter

    def level_bytes(s: int) -> int:
        w_in = _CASCADE_W0 >> s
        jmax = (c + w_in - 1) // w_in + 1
        n_terms = 2 * jmax + 1
        xp = (r + 2 * jmax) * max(w_in, lane)
        terms = (n_terms + 1) * r * lane  # each shifted dot + the y accumulator
        return 4 * (xp + terms)

    prev = 0
    for s in range(n_levels):
        cur = level_bytes(s)
        if prev + cur > budget_bytes:
            return s
        prev = cur
    return n_levels


def decimation_cascade_pallas(
    x: jnp.ndarray, n_levels: int, *, interpret: bool = False
) -> Tuple[jnp.ndarray, ...]:
    """(B, L) padded signal (L % 256 == 0) -> tuple of (B, L >> s) levels.

    Level s is the signal decimated s times (s = 1..n_levels). Caller is
    responsible for the generous-pad boundary contract described above.
    Raises if the requested depth exceeds the scoped-VMEM budget for this
    signal length — use log_xqt_pallas(fused_cascade=True), which caps the
    fused depth via _cascade_vmem_levels and chains the rest on XLA.
    """
    b, length = x.shape
    if length % _CASCADE_W0 != 0:
        raise ValueError("cascade input length must be a multiple of 256")
    r = length // _CASCADE_W0
    if not interpret and _cascade_vmem_levels(r, n_levels) < n_levels:
        raise ValueError(
            f"decimation cascade of {n_levels} levels at {r} rows exceeds the "
            "scoped-VMEM budget; reduce levels (see _cascade_vmem_levels)"
        )
    xr = x.reshape(b, r, _CASCADE_W0)
    mats = _cascade_mats(n_levels)

    out = pl.pallas_call(
        functools.partial(_cascade_kernel, n_levels=n_levels, r_rows=r),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, r, _CASCADE_W0 >> (s + 1)), jnp.float32) for s in range(n_levels)
        ),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, r, _CASCADE_W0), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec(m.shape, (lambda i: (0, 0, 0)), memory_space=pltpu.VMEM)
            for m in mats
        ],
        out_specs=tuple(
            pl.BlockSpec((1, r, _CASCADE_W0 >> (s + 1)), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for s in range(n_levels)
        ),
        interpret=interpret,
    )(xr, *(jnp.asarray(m) for m in mats))
    return tuple(o.reshape(b, length >> (s + 1)) for s, o in enumerate(out))


@functools.lru_cache(maxsize=8)
def _banks_f32(params: XQTParams) -> Tuple[np.ndarray, ...]:
    bank = octave_kernel_bank(params)  # (n_oct, W, bpo) complex
    conj = np.conj(bank)
    out = []
    for j in range(params.n_octaves):
        stacked = np.concatenate([conj[j].real, conj[j].imag], axis=1).astype(np.float32)
        padded = np.zeros((params.window_len, BANK_PAD), np.float32)
        padded[:, : stacked.shape[1]] = stacked
        out.append(padded)
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("params", "interpret", "fused_cascade"))
def log_xqt_pallas(
    y: jnp.ndarray,
    params: XQTParams = XQTParams(),
    *,
    interpret: bool = False,
    fused_cascade: bool = False,
) -> jnp.ndarray:
    """Batched log-VQT with the fused Pallas filterbank stage.

    ``fused_cascade=False``: the decimation cascade runs on XLA (tiny strided
    convs); each octave's framing+matmul+magnitude+log is one Pallas kernel.
    ``fused_cascade=True``: the leading decimation levels additionally run as
    ONE Pallas kernel with VMEM-resident intermediates
    (decimation_cascade_pallas rationale above) — as many levels as fit the
    per-program scoped-VMEM budget for this signal length
    (_cascade_vmem_levels; ~3 of 7 for 10 s clips) — and the narrow deep
    levels (negligible FLOPs) chain through the XLA decimator. Both match
    ops.vqt.log_xqt to float32 accumulation accuracy on every consumed
    sample.
    """
    from zeronotesamba_tpu.ops.vqt import _conv_constants, _decimate2, _reflect_pad_last

    if y.ndim != 2:
        raise ValueError("expects (batch, samples)")
    banks = _banks_f32(params)
    _, dec_kern = _conv_constants(params)
    dec_kern = jnp.asarray(dec_kern)
    n_frames = params.num_frames(y.shape[-1])
    w = params.window_len
    bpo = params.bins_per_octave
    dec_max = params.n_octaves - 1
    pad = (w // 2 + 1) << dec_max
    if fused_cascade and params.hop == _CASCADE_W0:
        # Double reflect pad + trailing zeros to a 256 multiple: consumed
        # samples stay identical (reflect content is local), edge-corruption
        # depth (<= 2*taps//2) stays inside the extra margin (>= pad>>dec-128).
        pad2 = 2 * pad
        x0 = _reflect_pad_last(y.astype(jnp.float32)[:, None, :], pad2)[:, 0, :]
        total = ((x0.shape[-1] + _CASCADE_W0 - 1) // _CASCADE_W0) * _CASCADE_W0
        x0 = jnp.pad(x0, ((0, 0), (0, total - x0.shape[-1])))
        n_fused = min(dec_max, _cascade_vmem_levels(total // _CASCADE_W0, dec_max))
        levels = (x0,)
        if n_fused > 0:
            levels += decimation_cascade_pallas(x0, n_fused, interpret=interpret)
        # Deep narrow levels (negligible FLOPs) chain on the XLA decimator.
        # Both paths share the taps; boundary conventions differ only inside
        # the corrupted pad margin, which no octave frame consumes.
        for _ in range(dec_max - n_fused):
            nxt = _decimate2(levels[-1][:, None, :], dec_kern)[:, 0, :]
            levels = levels + (nxt,)
        octaves = []
        for j in range(params.n_octaves - 1, -1, -1):
            dec = params.n_octaves - 1 - j
            hop_j = params.hop >> dec
            offset = (pad2 >> dec) - w // 2
            span_needed = (n_frames - 1) * hop_j + w
            sig = levels[dec][:, offset : offset + span_needed]
            res = octave_log_xqt_pallas(
                sig, jnp.asarray(banks[j]), hop=hop_j, w=w, n_frames=n_frames, bpo=bpo,
                log_eps=params.log_eps, interpret=interpret,
            )
            octaves.append(jnp.swapaxes(res, 1, 2))
        return jnp.concatenate(octaves[::-1], axis=1)

    x = _reflect_pad_last(y.astype(jnp.float32)[:, None, :], pad)
    octaves = []
    for j in range(params.n_octaves - 1, -1, -1):
        dec = params.n_octaves - 1 - j
        hop_j = params.hop >> dec
        pad_j = pad >> dec
        offset = pad_j - w // 2
        span_needed = (n_frames - 1) * hop_j + w
        sig = x[:, 0, offset : offset + span_needed]
        res = octave_log_xqt_pallas(
            sig, jnp.asarray(banks[j]), hop=hop_j, w=w, n_frames=n_frames, bpo=bpo,
            log_eps=params.log_eps, interpret=interpret,
        )  # (B, T, bpo)
        octaves.append(jnp.swapaxes(res, 1, 2))  # (B, bpo, T)
        if j > 0:
            x = _decimate2(x, dec_kern)
    return jnp.concatenate(octaves[::-1], axis=1)
