"""Convert reference (PyTorch) DeepCLR checkpoints to this framework.

The reference ships ``weights.tar`` torch state dicts (git-LFS; the public
snapshot carries pointers only, so retraining is the standard parity path —
this converter exists for users who hold the real files).

Name mapping (reference sources):
  _cloud_layers.{k}._sa{j}.mlps.{s}.layer{i}.conv.{weight,bias}
      -> cloud_features/sa{j}/scale{s}_{w,b}{i}        (Conv2d 1x1 -> (in,out))
  _merge_layers.0._embedding._conv._sequential.{i}._sequential.0.*
      -> merge/mlp/dense_{i}                           (Conv1d 1 -> (in,out))
  _merge_layers.1.conv._sequential.{i}._sequential.0.*
      -> output/conv/dense_{i}
  _merge_layers.1.linear._sequential.{i}._sequential.0.*
      -> output/linear/dense_{i}
  _merge_layers.1.output.{weight,bias}
      -> output/output
  _loss_layer._sx /._sq -> loss_module/sx, loss_module/sq

Sequential indices are compacted in order (torch Dropout modules shift the
raw indices; only weight-bearing entries count).
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

__all__ = ["convert_torch_state_dict", "load_torch_checkpoint"]


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _dense_from_conv(w) -> np.ndarray:
    """torch conv (out, in, *ones) -> flax dense kernel (in, out)."""
    w = _to_numpy(w)
    w = w.reshape(w.shape[0], w.shape[1])
    return w.T.copy()


def _ordered(entries: Dict[int, np.ndarray]) -> list:
    return [entries[k] for k in sorted(entries)]


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"],
                             strict: bool = False) -> Dict:
    """torch DeepCLR state dict -> flax params pytree (this framework).

    ``strict`` raises if any state-dict entry is not consumed by the name
    map — the regression anchor against silent renames (use with
    weight-only dicts; full checkpoints carry optimizer entries).
    """
    params: Dict = {}
    consumed = set()

    def section(d, *keys):
        for k in keys:
            d = d.setdefault(k, {})
        return d

    # --- set abstraction stages ------------------------------------------
    sa_re = re.compile(
        r"_cloud_layers\.\d+\._sa(\d+)\.mlps\.(\d+)\.layer(\d+)\.conv\.(weight|bias)"
    )
    for key, value in state_dict.items():
        m = sa_re.fullmatch(key)
        if not m:
            continue
        stage, scale, layer, kind = m.groups()
        consumed.add(key)
        sa = section(params, "cloud_features", f"sa{stage}")
        if kind == "weight":
            sa[f"scale{scale}_w{layer}"] = _dense_from_conv(value)
        else:
            sa[f"scale{scale}_b{layer}"] = _to_numpy(value)

    # --- generic sequential MLP sections ---------------------------------
    def collect_seq(prefix: str):
        weights, biases = {}, {}
        pat = re.compile(
            re.escape(prefix) + r"\._sequential\.(\d+)\._sequential\.0\.(weight|bias)"
        )
        for key, value in state_dict.items():
            m = pat.fullmatch(key)
            if not m:
                continue
            idx, kind = int(m.group(1)), m.group(2)
            consumed.add(key)
            if kind == "weight":
                weights[idx] = _dense_from_conv(value)
            else:
                biases[idx] = _to_numpy(value)
        return _ordered(weights), _ordered(biases)

    def fill_mlp(target: Dict, weights, biases):
        for i, (w, b) in enumerate(zip(weights, biases)):
            target[f"dense_{i}"] = {"kernel": w, "bias": b}

    w, b = collect_seq("_merge_layers.0._embedding._conv")
    if w:
        fill_mlp(section(params, "merge", "mlp"), w, b)

    w, b = collect_seq("_merge_layers.1.conv")
    if w:
        fill_mlp(section(params, "output", "conv"), w, b)

    w, b = collect_seq("_merge_layers.1.linear")
    if w:
        fill_mlp(section(params, "output", "linear"), w, b)

    if "_merge_layers.1.output.weight" in state_dict:
        consumed.update(("_merge_layers.1.output.weight",
                         "_merge_layers.1.output.bias"))
        section(params, "output")["output"] = {
            "kernel": _to_numpy(state_dict["_merge_layers.1.output.weight"]).T.copy(),
            "bias": _to_numpy(state_dict["_merge_layers.1.output.bias"]),
        }

    # --- learned loss weights --------------------------------------------
    for t_name, name in (("_loss_layer._sx", "sx"), ("_loss_layer._sq", "sq")):
        if t_name in state_dict:
            consumed.add(t_name)
            section(params, "loss_module")[name] = _to_numpy(state_dict[t_name])

    if strict:
        unconsumed = sorted(set(state_dict) - consumed)
        if unconsumed:
            raise ValueError(
                "unrecognized reference state-dict entries (name map out of "
                f"date?): {unconsumed}"
            )
    return params


def load_torch_checkpoint(path: str) -> Dict:
    """Load a reference weights.tar / ckpt.tar and convert to flax params.

    Reads the torch zipfile format directly (models/torch_io.py) — no torch
    required; falls back to torch.load for pre-zipfile legacy archives.
    """
    import zipfile

    if zipfile.is_zipfile(path):
        from .torch_io import read_torch_checkpoint

        data = read_torch_checkpoint(path)
    else:  # pragma: no cover - legacy (pre-torch-1.6) pickle format
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model_state_dict" in data:
        data = data["model_state_dict"]
    return convert_torch_state_dict(data)
