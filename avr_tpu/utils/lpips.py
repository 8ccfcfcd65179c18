"""LPIPS perceptual distance (VGG-16 backbone) in JAX.

The reference evaluates LPIPS(net="vgg") at test time (reference
``test.py:24,63``).  Pretrained VGG-16 + LPIPS linear-head weights cannot
be downloaded in this zero-egress environment, so this module implements
the full computation and loads weights from a local ``.npz`` archive
converted offline, e.g.::

    # offline, with torch+lpips installed:
    #   m = lpips.LPIPS(net='vgg')
    #   np.savez('lpips_vgg.npz', **{k: v.numpy() for k, v in m.state_dict().items()})

Keys expected (torch LPIPS state-dict names): ``net.slice{1..5}.{i}.weight
/ .bias`` for the VGG convs and ``lin{0..4}.model.1.weight`` for the
calibration 1x1 convs, plus the normalization ``scaling_layer.shift/scale``
buffers.

Computation (matching the LPIPS paper / implementation): VGG features at
relu1_2, relu2_2, relu3_3, relu4_3, relu5_3, unit-normalized across
channels, squared differences, 1x1 calibrated, spatially averaged, summed.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["LPIPS"]

# torchvision VGG16 conv layer indices per slice (features module indices).
_VGG_SLICES = [
    [0, 2],  # conv1_1, conv1_2        -> relu1_2
    [5, 7],  # conv2_1, conv2_2        -> relu2_2
    [10, 12, 14],  # conv3_x           -> relu3_3
    [17, 19, 21],  # conv4_x           -> relu4_3
    [24, 26, 28],  # conv5_x           -> relu5_3
]


class LPIPS:
    """Callable LPIPS distance. Inputs are NHWC images in [-1, 1]."""

    def __init__(self, weights_path: str = None):
        if weights_path is None or not os.path.exists(weights_path or ""):
            raise FileNotFoundError(
                "LPIPS needs a local VGG weight archive (no network egress to "
                "download one). Convert torch lpips.LPIPS(net='vgg') weights "
                "to .npz and pass its path."
            )
        raw = dict(np.load(weights_path))
        # scripts/make_lpips_weights.py --random marks its archives: the
        # random-VGG distance is a useful *relative* perceptual score
        # (LPIPS paper Table 5) but must never be read as published LPIPS —
        # the evaluator reports it under 'lpips_rand' instead of 'lpips'.
        self.calibrated = "_uncalibrated" not in raw
        self.shift = jnp.asarray(raw["scaling_layer.shift"]).reshape(1, 1, 1, 3)
        self.scale = jnp.asarray(raw["scaling_layer.scale"]).reshape(1, 1, 1, 3)
        self.convs: List[List[Dict[str, jnp.ndarray]]] = []
        for s, layer_ids in enumerate(_VGG_SLICES):
            slice_convs = []
            for li, layer_id in enumerate(layer_ids):
                # torch conv weight (out, in, kh, kw) -> HWIO
                w = raw[f"net.slice{s + 1}.{layer_id}.weight"].transpose(2, 3, 1, 0)
                b = raw[f"net.slice{s + 1}.{layer_id}.bias"]
                slice_convs.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
            self.convs.append(slice_convs)
        self.lins = [
            jnp.asarray(raw[f"lin{s}.model.1.weight"][:, :, 0, 0].T)  # (C, 1)
            for s in range(5)
        ]
        self._fn = jax.jit(self._distance)

    def _features(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = (x - self.shift) / self.scale
        feats = []
        for s, slice_convs in enumerate(self.convs):
            if s > 0:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            for conv in slice_convs:
                x = jax.lax.conv_general_dilated(
                    x, conv["w"], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                x = jax.nn.relu(x + conv["b"])
            feats.append(x)
        return feats

    def _distance(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for s in range(5):
            na = fa[s] / jnp.sqrt(
                jnp.sum(fa[s] ** 2, axis=-1, keepdims=True) + 1e-10
            )
            nb = fb[s] / jnp.sqrt(
                jnp.sum(fb[s] ** 2, axis=-1, keepdims=True) + 1e-10
            )
            diff = (na - nb) ** 2  # (B, H, W, C)
            cal = jnp.einsum("bhwc,co->bhwo", diff, self.lins[s])
            total = total + jnp.mean(cal, axis=(1, 2, 3))
        return total

    def __call__(self, a, b) -> np.ndarray:
        """LPIPS distance between NHWC [-1,1] image batches."""
        return np.asarray(self._fn(jnp.asarray(a), jnp.asarray(b)))
