"""Image encoders producing the conditioning latents.

TPU-native counterparts of the reference encoders
(``/root/reference/models.py:89-405``):

  * :class:`SpatialEncoder` — pixel-aligned multi-scale CNN latent: ResNet
    trunk stages upsampled (bilinear, align-corners) to the stem resolution
    and channel-concatenated, with the ``latent_scaling`` constant used for
    align-corners-correct uv normalization (reference models.py:295-328).
    The per-point bilinear *index* gather itself lives in
    ``avr_tpu.ops.grid_sample`` and is applied by the field, keeping the
    encoder a pure image -> latent map.
  * :class:`ImageEncoder` — global ResNet vector latent (models.py:344-405).
  * :class:`ConvEncoder` — the experimental U-Net-style custom backbone
    (models.py:89-176), with reflect same-padding and a broadcast global
    bottleneck.

All encoders are NHWC and functional: ``(B, H, W, 3) -> latent``.
"""

from __future__ import annotations

import math
from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from avr_tpu.models.resnet import ResNetTrunk, make_norm
from avr_tpu.ops.resize import resize_bilinear_align_corners

__all__ = ["SpatialEncoder", "ImageEncoder", "ConvEncoder"]


class SpatialEncoder(nn.Module):
    """Pixel-aligned spatial encoder.

    Returns ``(latent, latent_scaling)`` where ``latent`` is
    ``(B, H', W', latent_size)`` (H' = H/2 for the default trunk) and
    ``latent_scaling = [2*W'/(W'-1), 2*H'/(H'-1)]`` (reference
    models.py:326-328), the constant that maps pixel-space uv to
    align-corners grid coordinates as ``uv * (latent_scaling / image_size)
    - 1``.
    """

    backbone: str = "resnet34"
    num_layers: int = 4
    use_first_pool: bool = True
    norm_type: str = "batch"
    feature_scale: float = 1.0
    use_custom_resnet: bool = False
    dtype: Any = jnp.float32

    @property
    def latent_size(self) -> int:
        if self.use_custom_resnet:
            return 128
        return ResNetTrunk.latent_size(self.backbone, self.num_layers)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.feature_scale != 1.0:
            import jax

            B, H, W, C = x.shape
            new_hw = (int(H * self.feature_scale), int(W * self.feature_scale))
            method = "bilinear" if self.feature_scale > 1.0 else "linear"
            x = jax.image.resize(x, (B, *new_hw, C), method=method)

        if self.use_custom_resnet:
            latent = ConvEncoder(norm_type="group", dtype=self.dtype, name="model")(
                x, train=train
            )
        else:
            feats = ResNetTrunk(
                backbone=self.backbone,
                num_layers=self.num_layers,
                use_first_pool=self.use_first_pool,
                norm_type=self.norm_type,
                dtype=self.dtype,
                name="model",
            )(x, train=train)
            hw = feats[0].shape[1:3]
            feats = [resize_bilinear_align_corners(f, hw) for f in feats]
            # the resize einsum accumulates in fp32; store the latent in the
            # compute dtype (halves the HBM traffic of every field query)
            latent = jnp.concatenate(feats, axis=-1).astype(self.dtype)

        Hl, Wl = latent.shape[1:3]
        latent_scaling = jnp.asarray(
            [2.0 * Wl / (Wl - 1), 2.0 * Hl / (Hl - 1)], jnp.float32
        )
        return latent, latent_scaling

    @classmethod
    def from_conf(cls, conf, **kwargs):
        backbone = conf.get_string("backbone", "resnet34")
        return cls(
            backbone="resnet34" if backbone == "custom" else backbone,
            use_custom_resnet=backbone == "custom",
            num_layers=conf.get_int("num_layers", 4),
            use_first_pool=conf.get_bool("use_first_pool", True),
            feature_scale=conf.get_float("feature_scale", 1.0),
            **kwargs,
        )


class ImageEncoder(nn.Module):
    """Global image encoder: full ResNet trunk -> mean pool -> optional fc."""

    backbone: str = "resnet34"
    latent_size: int = 128
    norm_type: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        feats = ResNetTrunk(
            backbone=self.backbone, num_layers=5, use_first_pool=True,
            norm_type=self.norm_type, dtype=self.dtype, name="model",
        )(x, train=train)
        h = jnp.mean(feats[-1], axis=(1, 2))  # global average pool -> (B, 512)
        if self.latent_size != 512:
            h = nn.Dense(self.latent_size, dtype=self.dtype, name="fc")(h)
        return h

    @classmethod
    def from_conf(cls, conf, **kwargs):
        return cls(
            backbone=conf.get_string("backbone", "resnet34"),
            latent_size=conf.get_int("latent_size", 128),
            **kwargs,
        )


def _same_pad(
    x: jnp.ndarray, kernel_size: int, stride: int, mode: str = "reflect"
) -> jnp.ndarray:
    """TF-style SAME padding before a VALID conv (reference utils.py:159-216)."""
    H, W = x.shape[1:3]
    out_h = math.ceil(H / stride)
    out_w = math.ceil(W / stride)
    pad_h = max((out_h - 1) * stride + kernel_size - H, 0)
    pad_w = max((out_w - 1) * stride + kernel_size - W, 0)
    top, left = pad_h // 2, pad_w // 2
    pads = ((0, 0), (top, pad_h - top), (left, pad_w - left), (0, 0))
    return jnp.pad(x, pads, mode=mode)


def _same_unpad_deconv(x: jnp.ndarray, kernel_size: int, stride: int) -> jnp.ndarray:
    """Crop a VALID transposed-conv output back to SAME geometry."""
    h_scaled = (x.shape[1] - 1) * stride
    w_scaled = (x.shape[2] - 1) * stride
    out_h = math.ceil(h_scaled / stride)
    out_w = math.ceil(w_scaled / stride)
    pad_h = max((out_h - 1) * stride + kernel_size - h_scaled, 0)
    pad_w = max((out_w - 1) * stride + kernel_size - w_scaled, 0)
    top, left = pad_h // 2, pad_w // 2
    bottom, right = pad_h - top, pad_w - left
    return x[:, top : x.shape[1] - bottom, left : x.shape[2] - right]


class ConvEncoder(nn.Module):
    """Experimental simple conv encoder (reference models.py:89-176).

    Downsampling stack with group-norm and reflect same-padding, a global
    4x4-stride-4 bottleneck broadcast back over space, and skip-connected
    transposed-conv upsampling.  Output has 128 channels at full input
    resolution (matching the reference's ``dims = [128]``).
    """

    dim_in: int = 3
    norm_type: str = "group"
    use_leaky_relu: bool = True
    use_skip_conn: bool = True
    n_down_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = make_norm(self.norm_type, self.dtype)
        act = nn.leaky_relu if self.use_leaky_relu else nn.relu

        first, mid, last = 64, 128, 128

        x = _same_pad(x, 7, 2)
        x = nn.Conv(first, (7, 7), strides=2, padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv_in")(x)
        x = act(norm(train, "norm_in")(x))

        inters = []
        chnls = first
        for i in range(self.n_down_layers):
            x = _same_pad(x, 3, 2)
            x = nn.Conv(2 * chnls, (3, 3), strides=2, padding="VALID", use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = act(norm(train, f"norm{i}")(x))
            inters.append(x)
            chnls *= 2

        x = _same_pad(x, 4, 4)
        x = nn.Conv(mid, (4, 4), strides=4, padding="VALID", use_bias=False,
                    dtype=self.dtype, name="conv_mid")(x)
        x = act(norm(train, "norm_mid")(x))
        # broadcast the global bottleneck over the deepest spatial grid
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = jnp.broadcast_to(
            x, (x.shape[0], *inters[-1].shape[1:3], x.shape[-1])
        )

        for i in reversed(range(self.n_down_layers)):
            if self.use_skip_conn:
                x = jnp.concatenate([x, inters[i]], axis=-1)
            x = nn.ConvTranspose(
                inters[i].shape[-1] // 2 if i > 0 else first,
                (3, 3), strides=(2, 2), padding="VALID", use_bias=False,
                dtype=self.dtype, name=f"deconv{i}",
            )(x)
            x = _same_unpad_deconv(x, 3, 2)
            x = act(norm(train, f"denorm{i}")(x))

        x = nn.ConvTranspose(last, (3, 3), strides=(2, 2), padding="VALID",
                             use_bias=True, dtype=self.dtype, name="deconv_last")(x)
        x = _same_unpad_deconv(x, 3, 2)
        return x
