"""Torch checkpoint interop: reference state_dict <-> Flax params round trip."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from zeronotesamba_tpu.models.encoder import CONV_SPECS, FusedDownstream, TwinPretext
from zeronotesamba_tpu.models.torch_compat import (
    fused_params_from_torch,
    twin_params_from_torch,
    twin_params_to_torch,
)


def _random_reference_state_dict(rng):
    """Synthesize a Pretext_CNN-layout state_dict (keys per loader.py:22-27)."""
    sd = {}
    for prefix in ("anchor.", "postve."):
        cin = 1
        for i, (cout, (kh, kw)) in enumerate(CONV_SPECS, start=1):
            sd[f"{prefix}pretrained.cv{i}.weight"] = torch.from_numpy(
                rng.standard_normal((cout, cin, kh, kw)).astype(np.float32)
            )
            sd[f"{prefix}pretrained.cv{i}.bias"] = torch.from_numpy(
                rng.standard_normal(cout).astype(np.float32)
            )
            cin = cout
        sd[f"{prefix}fc1.weight"] = torch.from_numpy(rng.standard_normal((1, 128, 1)).astype(np.float32))
        sd[f"{prefix}fc1.bias"] = torch.from_numpy(rng.standard_normal(1).astype(np.float32))
    return sd


def test_twin_roundtrip(rng):
    sd = _random_reference_state_dict(rng)
    params = twin_params_from_torch(sd)
    back = twin_params_to_torch(params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k].numpy(), atol=0)


def test_converted_params_apply(rng):
    sd = _random_reference_state_dict(rng)
    twin = TwinPretext()
    params = twin_params_from_torch(sd)
    x = jnp.asarray(rng.standard_normal((1, 96, 32, 1)).astype(np.float32))
    a, p = twin.apply(params, x, x)
    assert a.shape == p.shape == (1, 32)

    fused = FusedDownstream()
    fparams = fused_params_from_torch(sd)
    out = fused.apply(fparams, x, x)
    np.testing.assert_allclose(np.asarray(out), np.maximum(np.asarray(a), np.asarray(p)), atol=1e-6)
