"""Weight-import shims: torch state-dicts -> avr_tpu Flax variables.

Test-side / migration tooling (SURVEY.md §7 step 2): lets users bring
(a) ImageNet-pretrained torchvision ResNet weights for the spatial encoder
and (b) full reference-model checkpoints, for numerical-parity testing and
warm starts.  Torch tensors must be converted offline to ``.npz``
(``np.savez(path, **{k: v.numpy() for k, v in sd.items()})``) since this
environment is torch-CPU-only and zero-egress.

Conventions translated:
  * conv weights OIHW -> HWIO,
  * linear weights (out, in) -> (in, out),
  * BatchNorm weight/bias/running_mean/running_var ->
    scale/bias (params) + mean/var (batch_stats),
  * torch LSTMCell weight_ih/hh (4H, D) -> w_ih/hh (D, 4H).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = ["import_torchvision_resnet", "import_lstm_cell", "import_resnetfc"]


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def _bn(sd: Mapping[str, np.ndarray], prefix: str):
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}
    return params, stats


def import_torchvision_resnet(
    sd: Mapping[str, np.ndarray],
    blocks_per_stage=(3, 4, 6, 3),
    num_layers: int = 4,
) -> Dict[str, Any]:
    """Convert a torchvision resnet18/34 state-dict to a ResNetTrunk
    variables dict ``{"params": ..., "batch_stats": ...}``.

    Use ``blocks_per_stage=(2, 2, 2, 2)`` for resnet18.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")

    for stage in range(num_layers - 1):
        for blk in range(blocks_per_stage[stage]):
            t = f"layer{stage + 1}.{blk}"
            name = f"layer{stage + 1}_block{blk}"
            p: Dict[str, Any] = {
                "conv1": {"kernel": _conv(sd[f"{t}.conv1.weight"])},
                "conv2": {"kernel": _conv(sd[f"{t}.conv2.weight"])},
            }
            s: Dict[str, Any] = {}
            p["bn1"], s["bn1"] = _bn(sd, f"{t}.bn1")
            p["bn2"], s["bn2"] = _bn(sd, f"{t}.bn2")
            if f"{t}.downsample.0.weight" in sd:
                p["down_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                p["down_bn"], s["down_bn"] = _bn(sd, f"{t}.downsample.1")
            params[name] = p
            stats[name] = s

    return {"params": params, "batch_stats": stats}


def import_lstm_cell(sd: Mapping[str, np.ndarray], prefix: str = "lstm") -> Dict[str, Any]:
    """torch nn.LSTMCell -> MarchLSTMCell params."""
    return {
        "w_ih": _lin(sd[f"{prefix}.weight_ih"]),
        "w_hh": _lin(sd[f"{prefix}.weight_hh"]),
        "b_ih": sd[f"{prefix}.bias_ih"],
        "b_hh": sd[f"{prefix}.bias_hh"],
    }


def import_resnetfc(
    sd: Mapping[str, np.ndarray], prefix: str, n_blocks: int, n_lin_z: int
) -> Dict[str, Any]:
    """Reference ResnetFC state-dict subtree -> our ResnetFC params."""

    def lin(name):
        return {
            "kernel": _lin(sd[f"{prefix}.{name}.weight"]),
            "bias": sd[f"{prefix}.{name}.bias"],
        }

    params: Dict[str, Any] = {"lin_in": lin("lin_in"), "lin_out": lin("lin_out")}
    for i in range(n_blocks):
        blk = {
            "fc_0": lin(f"blocks.{i}.fc_0"),
            "fc_1": lin(f"blocks.{i}.fc_1"),
        }
        if f"{prefix}.blocks.{i}.shortcut.weight" in sd:
            blk["shortcut"] = {
                "kernel": _lin(sd[f"{prefix}.blocks.{i}.shortcut.weight"])
            }
        params[f"block_{i}"] = blk
    for i in range(n_lin_z):
        params[f"lin_z_{i}"] = lin(f"lin_z.{i}")
    return params
