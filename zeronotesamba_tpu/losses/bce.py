"""Masked binary cross-entropy for beat-pulse supervision.

The reference trains downstream models with torch BCELoss on one full song
per step (loader.py:16, epochs.py:48-79). The TPU engine instead trains on
length-bucketed batches with a frame mask, so the loss must reduce only over
valid frames — mean semantics per song match the reference's unmasked mean.
"""

from __future__ import annotations

import jax.numpy as jnp


import jax


def _masked_mean(ll: jnp.ndarray, mask: jnp.ndarray | None):
    if mask is None:
        return jnp.mean(ll)
    m = mask.astype(jnp.float32)
    return jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_bce(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None, eps: float = 1e-7):
    """Probability-space BCE (evaluation/reporting; train on logits instead).

    pred/target: (B, T) with pred in (0, 1); mask: (B, T) of {0,1} or None.
    """
    p = jnp.clip(pred.astype(jnp.float32), eps, 1.0 - eps)
    t = target.astype(jnp.float32)
    ll = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    return _masked_mean(ll, mask)


def masked_bce_logits(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    pos_weight: float | jnp.ndarray = 1.0,
):
    """Numerically stable logits-space BCE: bounded loss AND bounded gradient
    (sigmoid(l) - t). Probability-space formulations either freeze saturated
    units (clipped log kills gradients) or overflow (1/p gradients -> NaN).

    ``pos_weight`` scales the positive-class term (torch BCEWithLogitsLoss
    semantics: loss = -[w*t*log s(l) + (1-t)*log(1-s(l))], mean over valid
    frames). Beat pulses are ~90% zeros; at w=1 the all-zeros constant is a
    strong attractor whose loss plateau stalls roughly half of demo-scale
    training runs for 20+ epochs (the round-2 fold-collapse pathology).
    Balancing the classes (w ~= 1/positive-rate) removes the attractor's
    advantage. w=1 is exact reference parity (loader.py:16 BCELoss).
    """
    l = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    # -log s(l) = softplus(-l); -log(1-s(l)) = softplus(l), evaluated stably.
    softplus = lambda z: jnp.maximum(z, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(z)))
    ll = pos_weight * t * softplus(-l) + (1.0 - t) * softplus(l)
    return _masked_mean(ll, mask)


def masked_bce_twin_logits(
    anc_logits: jnp.ndarray,
    pos_logits: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    reduction: str = "max",
    pos_weight: float | jnp.ndarray = 1.0,
):
    """Stable BCE for the fused downstream model from per-stream logits.

    max fusion: sigmoid(max(la, lb)) == max(sigmoid(la), sigmoid(lb)), so the
    fused BCE is exactly the logits BCE of the elementwise max.
    mean fusion: p = (s(la)+s(lb))/2; log p and log(1-p) evaluate stably via
    log-sigmoid + logaddexp.
    ``pos_weight``: see masked_bce_logits.
    """
    if reduction == "max":
        return masked_bce_logits(jnp.maximum(anc_logits, pos_logits), target, mask, pos_weight)
    la, lb = anc_logits.astype(jnp.float32), pos_logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    log2 = jnp.log(2.0)
    logp = jnp.logaddexp(jax.nn.log_sigmoid(la), jax.nn.log_sigmoid(lb)) - log2
    log1mp = jnp.logaddexp(jax.nn.log_sigmoid(-la), jax.nn.log_sigmoid(-lb)) - log2
    ll = -(pos_weight * t * logp + (1.0 - t) * log1mp)
    return _masked_mean(ll, mask)
