"""Vectorized NT-Xent contrastive loss (local and cross-device global).

Semantics match the reference's NTXent (zeroNoteSamba/models/loss_functions.py:7-55)
exactly, minus its O(B) python loop and per-item host syncs:

- similarity  = cosine(anchor_i, positive_j) / temperature
- loss_i      = -log( exp(s_ii) / sum_j exp(s_ij) )   (denominator includes j=i;
                negatives are the other *positives* only; not symmetrized)
- returns (mean loss, mean positive cosine, mean negative cosine)

``ntxent_global`` extends the negative set across a device mesh by
all-gathering the positives over a named axis — the TPU-native replacement
for the reference's 2-GPU model split (pretext.py:24-25,197-200): data
parallelism with a global similarity matrix, collectives over ICI.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    # torch.nn.CosineSimilarity(eps=1e-8) clamps the norm, not the value.
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)


def ntxent(
    anchors: jnp.ndarray, positives: jnp.ndarray, temperature: float = 0.25
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, D) x (B, D) -> (mean loss, mean pos cosine, mean neg cosine)."""
    a = _normalize(anchors.astype(jnp.float32))
    p = _normalize(positives.astype(jnp.float32))
    sim = a @ p.T  # (B, B) cosine similarities
    logits = sim / temperature
    losses = -(jnp.diag(logits) - jax.nn.logsumexp(logits, axis=1))
    b = sim.shape[0]
    pos_cos = jnp.mean(jnp.diag(sim))
    neg_cos = (jnp.sum(sim) - jnp.sum(jnp.diag(sim))) / (b * (b - 1))
    return jnp.mean(losses), pos_cos, neg_cos


def ntxent_global(
    anchors: jnp.ndarray,
    positives: jnp.ndarray,
    temperature: float = 0.25,
    axis_name: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NT-Xent over the global batch inside shard_map/pmap.

    Each device holds a local (b, D) shard; positives are all-gathered over
    ``axis_name`` so every anchor sees all B_global negatives. The returned
    loss is the mean over global anchors (identical on every device after the
    built-in psum), so gradients match a single-device global-batch run.
    """
    a = _normalize(anchors.astype(jnp.float32))
    p = _normalize(positives.astype(jnp.float32))
    p_all = jax.lax.all_gather(p, axis_name, axis=0, tiled=True)  # (B_global, D)
    n_dev = jax.lax.psum(1, axis_name)
    b_local = a.shape[0]
    b_global = b_local * n_dev
    my = jax.lax.axis_index(axis_name)
    offset = my * b_local

    logits = (a @ p_all.T) / temperature  # (b_local, B_global)
    row = jnp.arange(b_local)
    pos_logit = logits[row, offset + row]
    losses = -(pos_logit - jax.nn.logsumexp(logits, axis=1))

    sim = logits * temperature
    pos_cos_sum = jnp.sum(sim[row, offset + row])
    neg_cos_sum = (jnp.sum(sim) - pos_cos_sum) / (b_global - 1)
    loss = jax.lax.pmean(jnp.mean(losses), axis_name)
    pos_cos = jax.lax.psum(pos_cos_sum, axis_name) / b_global
    neg_cos = jax.lax.psum(neg_cos_sum, axis_name) / b_global
    return loss, pos_cos, neg_cos
