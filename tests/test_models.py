"""Encoder/head architecture parity vs an independently-built torch oracle.

The torch model below is constructed from the architecture *specification*
(SURVEY.md §2: 8 convs, channel plan 1-64-64-128-128-256-256-128-128, odd
kernels, freq-only pools 3/4/8 after convs 2/4/6, ReLU+Dropout, 1x1 head +
sigmoid) purely as a numerical test oracle for the Flax implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from zeronotesamba_tpu.models.encoder import (
    CONV_SPECS,
    POOL_AFTER,
    DSCNN,
    Encoder,
    FusedDownstream,
    TwinPretext,
)


def _build_torch_trunk():
    layers = []
    cin = 1
    mods = {}
    for i, (cout, k) in enumerate(CONV_SPECS):
        conv = tnn.Conv2d(cin, cout, k, padding=(k[0] // 2, k[1] // 2))
        mods[f"conv{i + 1}"] = conv
        cin = cout
    return mods


def _torch_forward(mods, head_w, head_b, x):
    h = torch.from_numpy(x)  # (B, 1, F, T)
    for i in range(len(CONV_SPECS)):
        h = mods[f"conv{i + 1}"](h)
        if i in POOL_AFTER:
            w = POOL_AFTER[i]
            h = tnn.functional.max_pool2d(h, (w, 1))
        h = tnn.functional.relu(h)
    h = h.squeeze(2)  # (B, 128, T)
    logits = tnn.functional.conv1d(h, head_w, head_b)
    return torch.sigmoid(logits).squeeze(1)


@pytest.fixture(scope="module")
def dscnn_and_params():
    model = DSCNN()
    x = jnp.zeros((1, 96, 64, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_param_count_matches_reference(dscnn_and_params):
    _, params = dscnn_and_params
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # Reference DS_CNN parameter count, computed from models/models.py:7-103:
    # sum over convs of (kh*kw*cin*cout + cout) plus the 1x1 head (128*1+1).
    expected = 0
    cin = 1
    for cout, (kh, kw) in CONV_SPECS:
        expected += kh * kw * cin * cout + cout
        cin = cout
    expected += 128 + 1
    assert n == expected


def test_encoder_output_shape(dscnn_and_params):
    model, params = dscnn_and_params
    x = jnp.zeros((2, 96, 313, 1))
    out = model.apply(params, x)
    assert out.shape == (2, 313)
    emb = model.apply(params, x, method=DSCNN.embed)
    assert emb.shape == (2, 313, 128)


def test_forward_matches_torch_oracle(dscnn_and_params, rng):
    model, params = dscnn_and_params
    mods = _build_torch_trunk()

    p = params["params"]
    with torch.no_grad():
        for i in range(len(CONV_SPECS)):
            w = np.asarray(p["encoder"][f"conv{i + 1}"]["kernel"])  # (kh,kw,cin,cout)
            b = np.asarray(p["encoder"][f"conv{i + 1}"]["bias"])
            mods[f"conv{i + 1}"].weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1).copy()))
            mods[f"conv{i + 1}"].bias.copy_(torch.from_numpy(b.copy()))
        hw = np.asarray(p["head"]["proj"]["kernel"])  # (128, 1)
        hb = np.asarray(p["head"]["proj"]["bias"])
        head_w = torch.from_numpy(hw.T[:, :, None].copy())  # (1, 128, 1)
        head_b = torch.from_numpy(hb.copy())

    x = rng.standard_normal((2, 1, 96, 64)).astype(np.float32)
    with torch.no_grad():
        # The torch oracle replicates the reference net, which consumes raw
        # inputs; our Encoder standardizes internally, so pre-standardize here.
        x_std = (x - (-6.0)) / 5.0
        ref = _torch_forward(mods, head_w, head_b, x_std.astype(np.float32)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_twin_and_fused(rng):
    x = jnp.asarray(rng.standard_normal((1, 96, 32, 1)).astype(np.float32))
    twin = TwinPretext()
    tp = twin.init(jax.random.PRNGKey(1), x, x)
    a, b = twin.apply(tp, x, x)
    # Independent weights: anchor and positive outputs differ on same input.
    assert not np.allclose(np.asarray(a), np.asarray(b))

    fused = FusedDownstream()
    fp = fused.init(jax.random.PRNGKey(2), x, x)
    out = fused.apply(fp, x, x)
    anc, pos = fused.apply(fp, x, x, method=lambda m, a_, p_: m.pretext(a_, p_))
    np.testing.assert_allclose(np.asarray(out), np.maximum(np.asarray(anc), np.asarray(pos)), atol=1e-7)

    fused_mean = FusedDownstream(reduction="mean")
    out_m = fused_mean.apply(fp, x, x)
    np.testing.assert_allclose(np.asarray(out_m), (np.asarray(anc) + np.asarray(pos)) / 2, atol=1e-7)


def test_dropout_active_in_train_mode(dscnn_and_params):
    model, params = dscnn_and_params
    x = jnp.ones((1, 96, 32, 1))
    o1 = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    o3 = model.apply(params, x)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    assert np.allclose(np.asarray(o3), np.asarray(model.apply(params, x)))


def test_torch_default_init_statistics():
    # Weights must follow U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (torch Conv2d default).
    model = Encoder(weight_init="torch")
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 96, 32, 1)))
    w1 = np.asarray(params["params"]["conv1"]["kernel"])  # (3, 11, 1, 64)
    bound = 1.0 / np.sqrt(3 * 11 * 1)
    assert np.abs(w1).max() <= bound + 1e-7
    assert np.abs(w1).max() > bound * 0.9
    assert abs(np.mean(w1)) < 0.02


def test_freq_s2d_conv_matches_unfolded(rng):
    """fold_conv_freq2 == the plain SAME conv, same params: the space-to-depth
    fold is a schedule change (128-wide MXU occupancy), never a model change.
    Covers the production fold (conv2's 7x13) plus kh=3/5 and odd/even edge
    interactions on random data, and the full Encoder with freq_s2d=(1,)."""
    from zeronotesamba_tpu.models.encoder import Encoder, fold_conv_freq2

    g = np.random.default_rng(11)
    for kh, kw, cin, cout, hgt in [(7, 13, 64, 64, 96), (3, 5, 4, 8, 12), (5, 3, 2, 6, 8)]:
        x = jnp.asarray(g.standard_normal((2, hgt, 9, cin)).astype(np.float32))
        w = jnp.asarray(g.standard_normal((kh, kw, cin, cout)).astype(np.float32) * 0.1)
        b = jnp.asarray(g.standard_normal((cout,)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = fold_conv_freq2(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)

    x = jnp.asarray(rng.standard_normal((1, 96, 24, 1)).astype(np.float32))
    plain = Encoder()
    params = plain.init(jax.random.PRNGKey(0), x)
    folded = Encoder(freq_s2d=(1,))
    # Identical param trees: checkpoints are interchangeable across the flag.
    assert jax.tree.structure(folded.init(jax.random.PRNGKey(0), x)) == jax.tree.structure(params)
    np.testing.assert_allclose(
        np.asarray(folded.apply(params, x)), np.asarray(plain.apply(params, x)),
        atol=2e-4, rtol=1e-4)
