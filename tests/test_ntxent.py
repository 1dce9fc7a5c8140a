"""NT-Xent: vectorized implementation vs the reference's per-anchor loop, and
cross-device global loss vs single-device equivalent."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from zeronotesamba_tpu.losses.ntxent import ntxent, ntxent_global


def _reference_loop(anchors, poss, temperature):
    """Direct numpy re-statement of the reference loss semantics
    (zeroNoteSamba/models/loss_functions.py:24-55)."""

    def cos(a, b):
        na = np.linalg.norm(a, axis=-1)
        nb = np.linalg.norm(b, axis=-1)
        return (a * b).sum(-1) / np.maximum(na * nb, 1e-8)

    b = anchors.shape[0]
    losses = np.zeros(b)
    pos_cos = 0.0
    neg_cos = 0.0
    for i in range(b):
        sims = cos(anchors[i : i + 1], poss)  # (b,)
        pos_cos += sims[i]
        neg_cos += (sims.sum() - sims[i]) / (b - 1)
        num = np.exp(sims[i] / temperature)
        den = np.exp(sims / temperature).sum()
        losses[i] = -np.log(num / den)
    return losses.mean(), pos_cos / b, neg_cos / b


def test_matches_reference_loop(rng):
    a = rng.standard_normal((16, 313)).astype(np.float32)
    p = (a + 0.5 * rng.standard_normal((16, 313))).astype(np.float32)
    loss, pc, nc = ntxent(jnp.asarray(a), jnp.asarray(p), 0.25)
    rl, rpc, rnc = _reference_loop(a, p, 0.25)
    np.testing.assert_allclose(float(loss), rl, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(pc), rpc, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(nc), rnc, rtol=1e-3, atol=1e-3)


def test_perfect_alignment_low_loss(rng):
    a = rng.standard_normal((8, 64)).astype(np.float32)
    loss_same, pc, _ = ntxent(jnp.asarray(a), jnp.asarray(a), 0.25)
    b = rng.standard_normal((8, 64)).astype(np.float32)
    loss_rand, _, _ = ntxent(jnp.asarray(a), jnp.asarray(b), 0.25)
    assert float(pc) > 0.999
    assert float(loss_same) < float(loss_rand)


def test_global_matches_local(rng):
    n_dev = jax.device_count()
    assert n_dev == 8, "tests expect the 8-device CPU mesh from conftest"
    b_local, d = 4, 32
    a = rng.standard_normal((n_dev * b_local, d)).astype(np.float32)
    p = rng.standard_normal((n_dev * b_local, d)).astype(np.float32)

    ref_loss, ref_pc, ref_nc = ntxent(jnp.asarray(a), jnp.asarray(p), 0.25)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    f = jax.jit(
        jax.shard_map(
            lambda aa, pp: ntxent_global(aa, pp, 0.25, "data"),
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P(), P(), P()),
        )
    )
    loss, pc, nc = f(jnp.asarray(a), jnp.asarray(p))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(pc), float(ref_pc), rtol=1e-5)
    np.testing.assert_allclose(float(nc), float(ref_nc), rtol=1e-4)


def test_global_gradients_match(rng):
    n_dev = jax.device_count()
    b_local, d = 2, 16
    a = rng.standard_normal((n_dev * b_local, d)).astype(np.float32)
    p = rng.standard_normal((n_dev * b_local, d)).astype(np.float32)

    g_ref = jax.grad(lambda x: ntxent(x, jnp.asarray(p), 0.25)[0])(jnp.asarray(a))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    loss_fn = jax.shard_map(
        lambda aa, pp: ntxent_global(aa, pp, 0.25, "data")[0],
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P(),
    )
    g = jax.jit(jax.grad(lambda x: loss_fn(x, jnp.asarray(p))))(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)
