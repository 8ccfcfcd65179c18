"""ResNet backbone trunk (NHWC, Flax) for the pixel-aligned encoder.

A from-scratch Flax implementation of the torchvision ResNet-18/34 trunk
the reference uses as its conditioning backbone
(``/root/reference/models.py:227-313``).  Only the pieces the encoder
consumes exist: stem + the four residual stages, returning *all* stage
feature maps so the spatial encoder can build its multi-scale latent.

TPU-first choices: NHWC layout throughout (XLA's preferred conv layout),
configurable compute dtype (bf16 compute / fp32 params), and a pluggable
norm (batch / group / instance / none — reference
``utils.py:136-157``).  BatchNorm running statistics live in the standard
Flax ``batch_stats`` collection; pass ``train=True`` plus
``mutable=['batch_stats']`` to update them, or freeze with ``train=False``
(the reference's ``stop_encoder_grad``/eval escape hatch,
reference ``train.py:279-281``).

ImageNet-pretrained weights cannot be downloaded in this environment; use
``avr_tpu.models.torch_import.load_torchvision_resnet`` to convert a
locally provided torchvision state-dict when pretraining parity is needed.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ResNetTrunk", "RESNET_STAGES", "make_norm"]

# (blocks per stage, channels per stage)
RESNET_STAGES = {
    "resnet18": ((2, 2, 2, 2), (64, 128, 256, 512)),
    "resnet34": ((3, 4, 6, 3), (64, 128, 256, 512)),
}


def make_norm(norm_type: str, dtype: Any = jnp.float32) -> Callable[..., nn.Module]:
    """Normalization factory mirroring the reference's get_norm_layer."""
    if norm_type == "batch":
        def factory(train: bool, name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=dtype, name=name,
            )
    elif norm_type == "group":
        def factory(train: bool, name: str):
            return nn.GroupNorm(num_groups=32, dtype=dtype, name=name)
    elif norm_type == "instance":
        def factory(train: bool, name: str):
            return nn.GroupNorm(group_size=1, dtype=dtype, use_bias=False,
                                use_scale=False, name=name)
    elif norm_type == "none":
        def factory(train: bool, name: str):
            return lambda x: x
    else:
        raise NotImplementedError(f"normalization layer [{norm_type}] is not found")
    return factory


class BasicBlock(nn.Module):
    """3x3-3x3 residual block with optional strided 1x1 projection."""

    features: int
    strides: int = 1
    norm_type: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = make_norm(self.norm_type, self.dtype)
        y = nn.Conv(
            self.features, (3, 3), strides=self.strides, padding=((1, 1), (1, 1)),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(norm(train, "bn1")(y))
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = norm(train, "bn2")(y)

        if self.strides != 1 or x.shape[-1] != self.features:
            x = nn.Conv(
                self.features, (1, 1), strides=self.strides, use_bias=False,
                dtype=self.dtype, name="down_conv",
            )(x)
            x = norm(train, "down_bn")(x)
        return nn.relu(y + x)


class ResNetTrunk(nn.Module):
    """Stem + residual stages; returns per-stage feature maps.

    ``num_layers`` follows the reference convention (models.py:233): stage
    outputs [stem, layer1, ..., layer{num_layers-1}] are returned, so
    ``num_layers=4`` yields channel sum 64+64+128+256 = 512.
    """

    backbone: str = "resnet34"
    num_layers: int = 4
    use_first_pool: bool = True
    norm_type: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        blocks_per_stage, channels = RESNET_STAGES[self.backbone]
        norm = make_norm(self.norm_type, self.dtype)

        x = nn.Conv(
            64, (7, 7), strides=2, padding=((3, 3), (3, 3)), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(norm(train, "bn1")(x))
        feats = [x]

        for stage in range(self.num_layers - 1):
            if stage == 0 and self.use_first_pool:
                x = nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
                )
            for blk in range(blocks_per_stage[stage]):
                strides = 2 if (stage > 0 and blk == 0) else 1
                x = BasicBlock(
                    channels[stage], strides=strides, norm_type=self.norm_type,
                    dtype=self.dtype, name=f"layer{stage + 1}_block{blk}",
                )(x, train=train)
            feats.append(x)
        return feats

    @staticmethod
    def latent_size(backbone: str, num_layers: int) -> int:
        _, channels = RESNET_STAGES[backbone]
        return 64 + sum(channels[: num_layers - 1])
