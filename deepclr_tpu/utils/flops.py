"""Analytic FLOP accounting for the DeepCLR forward pass + MFU helpers.

``model_flops_per_pair`` counts the *algorithmic* forward FLOPs of one
cloud-pair registration under the reference's semantics (nsample-capped
balls, k-NN motion embedding, exact MLP widths — reference call stack:
/root/reference/deepclr/models/deepclr.py:488-521 and SURVEY.md §3.2).
This is the useful-work numerator for MFU: executed FLOPs on TPU are higher
(all-in-radius supersets, lane-packing block-diagonal padding), so MFU here
answers "how close is the delivered registration rate to what the chip's
peak could theoretically sustain on the minimum math".

Peak numbers are per-chip dense bf16 TFLOP/s from Google's published specs.
"""
from __future__ import annotations

from typing import Dict

import jax

__all__ = ["model_flops_per_pair", "peak_flops_per_chip", "mfu"]

# dense bf16 peak per chip, FLOP/s
_PEAKS: Dict[str, float] = {
    "v2": 22.5e12,
    "v3": 123e12,
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def _mlp_macs(rows: int, dims) -> int:
    return sum(rows * dims[i] * dims[i + 1] for i in range(len(dims) - 1))


def _plain(cfg):
    """Config tree -> plain nested dict (accepts dicts unchanged)."""
    if isinstance(cfg, dict):
        return cfg
    if hasattr(cfg, "to_dict"):
        return cfg.to_dict()
    return dict(cfg)


def model_flops_per_pair(model_cfg, num_points: int = 16384) -> float:
    """Algorithmic forward FLOPs (multiply+add = 2 FLOPs) for ONE pair."""
    cfg = _plain(model_cfg)
    params = _plain(cfg["params"])
    feat_dim = int(cfg.get("input_dim", 3)) - 3

    macs = 0
    cf = _plain(_plain(params["cloud_features"])["params"])
    n = num_points
    out_feat = 0
    for stage in range(len(cf["npoint"])):
        p = int(cf["npoint"][stage])
        cin = feat_dim if stage == 0 else out_feat
        out_feat = 0
        for ns, widths in zip(cf["nsamples"][stage], cf["mlps"][stage]):
            # SharedMLP over the grouped (P, nsample) tensor: every layer
            # (incl. layer 1) runs once per (center, sample)
            macs += _mlp_macs(p * int(ns), [3 + cin] + list(widths))
            out_feat += widths[-1]
        n = p
    macs *= 2  # two clouds encoded per pair

    # motion embedding: kNN distances + per-(center, k-neighbor) MLP
    mg = _plain(_plain(params["merge"])["params"])
    k = int(mg["k"])
    merge_mlp = list(mg["mlp"])
    p = n
    macs += p * p * 3  # kNN cross-term distances (template x source)
    macs += _mlp_macs(p * k, [3 + out_feat * 2] + merge_mlp)

    # output head: conv MLP over P motion features + global max + FC stack
    out = _plain(_plain(params["output"])["params"])
    macs += _mlp_macs(p, [3 + merge_mlp[-1]] + list(out["mlp"]))
    macs += _mlp_macs(1, list(out["linear"]))
    macs += list(out["linear"])[-1] * 8  # final label layer (dual quat)

    return 2.0 * macs


def peak_flops_per_chip() -> float:
    """Dense bf16 peak of the attached chip (fallback: v5e)."""
    kind = ""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover
        pass
    for name, peak in sorted(_PEAKS.items(), key=lambda kv: -len(kv[0])):
        if name in kind:
            return peak
    return _PEAKS["v5e"]


def mfu(pairs_per_sec: float, model_cfg, num_points: int = 16384) -> float:
    """Model FLOPs utilization: delivered algorithmic FLOP/s over peak."""
    return (pairs_per_sec * model_flops_per_pair(model_cfg, num_points)
            / peak_flops_per_chip())
