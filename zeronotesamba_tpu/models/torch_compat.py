"""Torch checkpoint interop: load/export reference-format state dicts.

The reference ships ``models/saved/{shift,clmr}_pret_cnn_16.pth`` (torch
state_dicts of Pretext_CNN / DS_CNN; loader.py:22-50). These converters map
those key layouts onto this framework's Flax trees so a reference user's
retrained checkpoints carry over:

- ``cv{1..8}.weight`` (cout, cin, kh, kw) <-> ``conv{i}.kernel`` (kh, kw, cin, cout)
- ``fc1.weight`` (1, 128, 1)              <-> ``head.proj.kernel`` (128, 1)
- Pretext_CNN prefixes ``anchor.`` / ``postve.`` <-> TwinPretext submodules.

Weights are plain arrays; loading uses ``torch.load`` when available and
falls back to a zipfile/pickle reader otherwise.
"""

from __future__ import annotations

import gzip
import io
from typing import Any, Dict, Mapping

import numpy as np

_N_CONVS = 8


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _dscnn_branch(sd: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Reference DS_CNN keys (optionally under ``prefix``) -> DSCNN params."""
    enc = {}
    for i in range(1, _N_CONVS + 1):
        w = _to_np(sd[f"{prefix}pretrained.cv{i}.weight"])  # (cout, cin, kh, kw)
        b = _to_np(sd[f"{prefix}pretrained.cv{i}.bias"])
        enc[f"conv{i}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    hw = _to_np(sd[f"{prefix}fc1.weight"])  # (1, 128, 1)
    hb = _to_np(sd[f"{prefix}fc1.bias"])
    head = {"proj": {"kernel": hw[:, :, 0].T, "bias": hb}}
    return {"encoder": enc, "head": head}


def dscnn_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """DS_CNN state_dict -> {'params': ...} for models.DSCNN."""
    return {"params": _dscnn_branch(sd)}


def twin_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Pretext_CNN state_dict -> {'params': ...} for models.TwinPretext."""
    return {"params": {"anchor": _dscnn_branch(sd, "anchor."), "postve": _dscnn_branch(sd, "postve.")}}


def fused_params_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Pretext_CNN state_dict -> {'params': ...} for models.FusedDownstream
    (the reference loads the pretext checkpoint into Down_CNN.pretext,
    loader.py:22-27)."""
    return {"params": {"pretext": twin_params_from_torch(sd)["params"]}}


def _branch_to_torch(branch: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    sd = {}
    for i in range(1, _N_CONVS + 1):
        k = np.asarray(branch["encoder"][f"conv{i}"]["kernel"])
        sd[f"{prefix}pretrained.cv{i}.weight"] = k.transpose(3, 2, 0, 1)
        sd[f"{prefix}pretrained.cv{i}.bias"] = np.asarray(branch["encoder"][f"conv{i}"]["bias"])
    hk = np.asarray(branch["head"]["proj"]["kernel"])  # (128, 1)
    sd[f"{prefix}fc1.weight"] = hk.T[:, :, None]
    sd[f"{prefix}fc1.bias"] = np.asarray(branch["head"]["proj"]["bias"])
    return sd


def twin_params_to_torch(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    p = params["params"] if "params" in params else params
    if "pretext" in p:
        p = p["pretext"]
    out = {}
    out.update(_branch_to_torch(p["anchor"], "anchor."))
    out.update(_branch_to_torch(p["postve"], "postve."))
    return out


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a .pth / .pth.gz state_dict (CPU)."""
    data: Any
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as fh:
            buf = io.BytesIO(fh.read())
    else:
        buf = path  # torch.load handles paths directly
    import torch

    sd = torch.load(buf, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return dict(sd)
