"""On-device (JAX/lax.scan) DBN Viterbi — batched beat decoding on TPU.

Third backend for the DBN decoder (numpy reference in decode/dbn.py, native
C++ in csrc/): the forward max-product recursion runs as a ``lax.scan`` over
frames with the within-beat advance expressed as a roll (beat-position chains
are contiguous, so state s's predecessor is s-1 except at chain heads), and
only the (T, n_intervals) tempo-transition argmax choices return to the host
for backtracking. ``vmap`` batches whole song buckets through one decode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zeronotesamba_tpu.decode.dbn import DBNBeatDecoderConfig, _argmax_per_run, _state_space


@functools.partial(jax.jit, static_argnames=("cfg",))
def _viterbi_scan(log_act: jnp.ndarray, log_nact: jnp.ndarray, cfg: DBNBeatDecoderConfig):
    """(T,) obs log-probs -> (final_v (S,), first_choice (T, n_int))."""
    intervals, firsts, lasts, positions, _, log_trans, is_beat = _state_space(cfg)
    n_states = positions.size
    firsts_j = jnp.asarray(firsts)
    lasts_j = jnp.asarray(lasts)
    log_trans_j = jnp.asarray(log_trans)
    is_beat_j = jnp.asarray(is_beat)

    def step(v, obs):
        la, lna = obs
        cand = v[lasts_j][:, None] + log_trans_j  # (from, to)
        fc = jnp.argmax(cand, axis=0).astype(jnp.int16)
        first_vals = jnp.max(cand, axis=0)
        v_new = jnp.roll(v, 1).at[firsts_j].set(first_vals)
        v_new = v_new + jnp.where(is_beat_j, la, lna)
        # Per-frame best state: lets a batched decode backtrack each song
        # from ITS final valid frame (exact vs per-song decoding).
        return v_new, (fc, jnp.argmax(v_new).astype(jnp.int32))

    v0 = jnp.full(n_states, -jnp.log(float(n_states)), dtype=jnp.float32)
    v_final, (fcs, bests) = jax.lax.scan(
        step, v0, (log_act.astype(jnp.float32), log_nact.astype(jnp.float32))
    )
    return v_final, fcs, bests


def viterbi_path_device(activations: np.ndarray, cfg: DBNBeatDecoderConfig = DBNBeatDecoderConfig()) -> np.ndarray:
    """Device forward pass + host backtrack -> state path (T,)."""
    act = np.asarray(activations, dtype=np.float64).ravel()
    eps = np.spacing(1)
    log_act = np.log(act + eps)
    log_nact = np.log((1.0 - act) / (cfg.observation_lambda - 1) + eps)
    v_final, fcs, _ = _viterbi_scan(jnp.asarray(log_act), jnp.asarray(log_nact), cfg)
    return _backtrack(int(np.argmax(np.asarray(v_final))), np.asarray(fcs), cfg)


def _backtrack(start_state: int, fcs: np.ndarray, cfg: DBNBeatDecoderConfig) -> np.ndarray:
    intervals, firsts, lasts, positions, _, _, _ = _state_space(cfg)
    n_frames = fcs.shape[0]
    path = np.empty(n_frames, dtype=np.int64)
    s = start_state
    first_to_int = {int(f): i for i, f in enumerate(firsts)}
    for t in range(n_frames - 1, -1, -1):
        path[t] = s
        fi = first_to_int.get(s)
        s = int(lasts[fcs[t, fi]]) if fi is not None else s - 1
    return path


def decode_beats_device(
    activations: np.ndarray, cfg: DBNBeatDecoderConfig = DBNBeatDecoderConfig()
) -> np.ndarray:
    """Beat times via the on-device Viterbi (equivalent to decode_beats)."""
    act = np.asarray(activations, dtype=np.float64).ravel()
    if act.size == 0:
        return np.empty(0)
    _, _, _, positions, _, _, is_beat = _state_space(cfg)
    path = viterbi_path_device(act, cfg)
    beat_range = is_beat[path]
    if cfg.correct:
        frames = _argmax_per_run(beat_range, act)
    else:
        frames = np.nonzero(np.diff(positions[path]) < 0)[0] + 1
    return frames / cfg.fps


def decode_beats_batch_device(
    activations: np.ndarray,
    n_frames: list,
    cfg: DBNBeatDecoderConfig = DBNBeatDecoderConfig(),
) -> list:
    """Batched decode: (B, T_pad) activations + per-song valid lengths.

    The scan is vmapped so a whole padded bucket decodes in one device call.
    Each song backtracks from the per-frame best state at ITS final valid
    frame over fcs[:nf], which makes the result exactly equal to a per-song
    decode of the unpadded activation.
    """
    acts = np.asarray(activations, dtype=np.float64)
    eps = np.spacing(1)
    masked = acts.copy()
    for b, nf in enumerate(n_frames):
        masked[b, nf:] = 0.0
    log_act = np.log(masked + eps)
    log_nact = np.log((1.0 - masked) / (cfg.observation_lambda - 1) + eps)

    v_final, fcs, bests = jax.vmap(lambda a, n: _viterbi_scan(a, n, cfg))(
        jnp.asarray(log_act), jnp.asarray(log_nact)
    )
    fcs = np.asarray(fcs)
    bests = np.asarray(bests)

    _, _, _, positions, _, _, is_beat = _state_space(cfg)
    out = []
    for b, nf in enumerate(n_frames):
        if nf <= 0:
            # Guard: bests[b, -1] would backtrack from the last PADDED frame.
            out.append(np.zeros(0, dtype=np.float64))
            continue
        path = _backtrack(int(bests[b, nf - 1]), fcs[b, :nf], cfg)
        beat_range = is_beat[path]
        if cfg.correct:
            frames = _argmax_per_run(beat_range, masked[b, :nf])
        else:
            frames = np.nonzero(np.diff(positions[path]) < 0)[0] + 1
        out.append(frames / cfg.fps)
    return out
