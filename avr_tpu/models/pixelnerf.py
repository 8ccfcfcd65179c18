"""Image-conditioned PixelNeRF radiance field (functional, TPU-first).

Counterpart of the reference's ``NewPixelNeRFNet``
(``/root/reference/models.py:609-910``), re-designed around JAX's
functional model: the reference's stateful ``encode()``-then-``forward()``
pattern (it mutates ``self.latent/poses/focal/c``; reference
models.py:682-737) becomes an explicit immutable :class:`Conditioning`
pytree returned by :meth:`PixelNeRFNet.encode` and threaded into every
:meth:`PixelNeRFNet.query` call.  This is what makes the whole render
differentiable-and-jittable end to end, and lets conditioning be donated /
sharded across the mesh like any other array.

Numerical conventions pinned for parity (SURVEY.md §3.2/§3.5):

  * world->cam poses stored as ``[R^T | -R^T t]`` 3x4 (models.py:705-707),
  * focal with **fy negated** (models.py:723); principal point defaults to
    the image center (models.py:726-727),
  * the point feature is the *rotated-only* xyz when ``normalize_z`` is on
    (models.py:760-771),
  * perspective projection ``uv = -xy/z * focal + c`` (models.py:799-805),
  * query pipeline order: z-feature -> [code if not use_code_viewdirs] ->
    concat rotated viewdirs -> [code if use_code_viewdirs] (models.py:773-793),
  * ``return_features`` early-exits with the bilinear latent for the LSTM
    ray-marcher (models.py:822-823),
  * outputs ``sigmoid(rgb)`` / ``relu(sigma)`` (models.py:856-862).

Shapes are explicit throughout: queries are ``(SB, B, 3)`` world points,
the source-view axis NS is materialized as a real axis (never flattened
away), and the big decoder matmuls see ``(SB, NS, B, d)`` contractions that
map straight onto the MXU with ``B`` free to shard across the ``rays`` mesh
axis.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from avr_tpu.models.code import PositionalEncoding
from avr_tpu.models.encoder import ImageEncoder, SpatialEncoder
from avr_tpu.models.mlp import ResnetFC
from avr_tpu.ops.grid_sample import grid_sample_2d

__all__ = ["Conditioning", "ModelConfig", "MLPConfig", "EncoderConfig", "CodeConfig",
           "PixelNeRFNet", "make_model"]


# ---------------------------------------------------------------------------
# Static configuration tree (constructed from the HOCON conf; the dataclasses
# are hashable so they can live on Flax modules).
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CodeConfig:
    num_freqs: int = 6
    freq_factor: float = 1.5
    include_input: bool = True

    @classmethod
    def from_conf(cls, conf):
        return cls(
            num_freqs=conf.get_int("num_freqs", 6),
            freq_factor=conf.get_float("freq_factor", 3.141592653589793),
            include_input=conf.get_bool("include_input", True),
        )


@dataclass(frozen=True)
class MLPConfig:
    type: str = "resnet"
    n_blocks: int = 5
    d_hidden: int = 512
    beta: float = 0.0
    combine_layer: int = 1000
    combine_type: str = "average"
    use_spade: bool = False

    @classmethod
    def from_conf(cls, conf):
        return cls(
            type=conf.get_string("type", "resnet"),
            n_blocks=conf.get_int("n_blocks", 5),
            d_hidden=conf.get_int("d_hidden", 128),
            beta=conf.get_float("beta", 0.0),
            combine_layer=conf.get_int("combine_layer", 1000),
            combine_type=conf.get_string("combine_type", "average"),
            use_spade=conf.get_bool("use_spade", False),
        )


@dataclass(frozen=True)
class EncoderConfig:
    backbone: str = "resnet34"
    pretrained: bool = True
    num_layers: int = 4
    use_first_pool: bool = True
    feature_scale: float = 1.0
    norm_type: str = "batch"

    @classmethod
    def from_conf(cls, conf):
        return cls(
            backbone=conf.get_string("backbone", "resnet34"),
            pretrained=conf.get_bool("pretrained", True),
            num_layers=conf.get_int("num_layers", 4),
            use_first_pool=conf.get_bool("use_first_pool", True),
            feature_scale=conf.get_float("feature_scale", 1.0),
        )


@dataclass(frozen=True)
class ModelConfig:
    use_encoder: bool = True
    use_global_encoder: bool = False
    use_xyz: bool = True
    normalize_z: bool = True
    use_code: bool = True
    use_code_viewdirs: bool = False
    use_viewdirs: bool = True
    stop_encoder_grad: bool = False
    bn: bool = False
    # "xla": take_along_axis gather; "pallas": VMEM-resident MXU one-hot
    # kernel (TPU only); "auto": pallas on TPU backends, xla elsewhere.
    # Pallas wins +18% end-to-end on v5e (the scatter-free backward; PERF.md).
    gather_impl: str = "auto"
    # Fused Pallas decoder kernel (avr_tpu/ops/pallas/resnetfc.py):
    # "never" | "auto" (TPU backends only) | "always" (tests: CPU interpret).
    # v2 (bf16 wgrad operands, pre-transposed weights) beats XLA by ~10%
    # device-time at benchmark shapes (PERF.md), so on by default on TPU.
    fused_mlp: str = "auto"
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    code: CodeConfig = field(default_factory=CodeConfig)
    mlp_coarse: MLPConfig = field(default_factory=MLPConfig)
    mlp_fine: Optional[MLPConfig] = field(default_factory=MLPConfig)
    global_encoder_backbone: str = "resnet34"
    global_latent_size: int = 128

    @classmethod
    def from_conf(cls, conf, stop_encoder_grad: bool = False, bn: bool = False):
        """Build from the ``model`` conf subtree (reference models.py:609-680)."""
        use_global = conf.get_bool("use_global_encoder", False)
        mlp_fine_conf = conf.get("mlp_fine")
        mlp_fine = None
        if mlp_fine_conf is not None and mlp_fine_conf.get_string("type", "resnet") != "empty":
            mlp_fine = MLPConfig.from_conf(mlp_fine_conf)
        return cls(
            use_encoder=conf.get_bool("use_encoder", True),
            use_global_encoder=use_global,
            use_xyz=conf.get_bool("use_xyz", False),
            normalize_z=conf.get_bool("normalize_z", True),
            use_code=conf.get_bool("use_code", False),
            use_code_viewdirs=conf.get_bool("use_code_viewdirs", True),
            use_viewdirs=conf.get_bool("use_viewdirs", False),
            stop_encoder_grad=stop_encoder_grad,
            bn=bn,
            encoder=EncoderConfig.from_conf(conf["encoder"]),
            code=CodeConfig.from_conf(conf["code"]) if conf.get_bool("use_code", False) else CodeConfig(),
            mlp_coarse=MLPConfig.from_conf(conf["mlp_coarse"]),
            mlp_fine=mlp_fine,
            global_encoder_backbone=(
                conf["global_encoder"].get_string("backbone", "resnet34")
                if use_global and "global_encoder" in conf else "resnet34"
            ),
            global_latent_size=(
                conf["global_encoder"].get_int("latent_size", 128)
                if use_global and "global_encoder" in conf else 128
            ),
        )


# ---------------------------------------------------------------------------
# Conditioning: the immutable "encoded source views" pytree.
# ---------------------------------------------------------------------------


@struct.dataclass
class Conditioning:
    """Everything a field query needs about the encoded source views.

    ``B = SB * NS`` source views are flattened along the leading axis of
    every array here, exactly mirroring the reference's cached buffers.
    """

    latent: jnp.ndarray  # (B, H', W', C) pixel-aligned feature maps
    latent_scaling: jnp.ndarray  # (2,) align-corners uv scale
    poses: jnp.ndarray  # (B, 3, 4) world->cam [R^T | -R^T t]
    focal: jnp.ndarray  # (Bf, 2) [fx, -fy]; Bf in {1, B}
    c: jnp.ndarray  # (Bc, 2) principal point, pixels
    image_shape: jnp.ndarray  # (2,) [W, H] of the encoded images
    global_latent: Optional[jnp.ndarray] = None  # (B, Lg) if enabled
    num_views: int = struct.field(pytree_node=False, default=1)


# ---------------------------------------------------------------------------
# The field.
# ---------------------------------------------------------------------------


class PixelNeRFNet(nn.Module):
    """PixelNeRF radiance field: pixel-aligned CNN conditioning + FC-ResNet."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @property
    def latent_size(self) -> int:
        from avr_tpu.models.resnet import ResNetTrunk

        if self.cfg.encoder.backbone == "custom":
            return 128
        return ResNetTrunk.latent_size(
            self.cfg.encoder.backbone, self.cfg.encoder.num_layers
        )

    @property
    def d_in(self) -> int:
        """Point-feature width fed to the decoder (reference models.py:644-655)."""
        cfg = self.cfg
        d_in = 3 if cfg.use_xyz else 1
        if cfg.use_viewdirs and cfg.use_code_viewdirs:
            d_in += 3
        if cfg.use_code and d_in > 0:
            code = PositionalEncoding(
                num_freqs=cfg.code.num_freqs, d_in=d_in,
                freq_factor=cfg.code.freq_factor,
                include_input=cfg.code.include_input,
            )
            d_in = code.d_out
        if cfg.use_viewdirs and not cfg.use_code_viewdirs:
            d_in += 3
        return d_in

    @property
    def d_latent(self) -> int:
        d = self.latent_size if self.cfg.use_encoder else 0
        if self.cfg.use_global_encoder:
            d += self.cfg.global_latent_size
        return d

    def setup(self):
        cfg = self.cfg
        if cfg.use_encoder:
            self.encoder = SpatialEncoder(
                backbone="resnet34" if cfg.encoder.backbone == "custom" else cfg.encoder.backbone,
                use_custom_resnet=cfg.encoder.backbone == "custom",
                num_layers=cfg.encoder.num_layers,
                use_first_pool=cfg.encoder.use_first_pool,
                feature_scale=cfg.encoder.feature_scale,
                norm_type=cfg.encoder.norm_type,
                dtype=self.dtype,
            )
        if cfg.use_global_encoder:
            self.global_encoder = ImageEncoder(
                backbone=cfg.global_encoder_backbone,
                latent_size=cfg.global_latent_size,
                dtype=self.dtype,
            )
        code_d_in = 3 if cfg.use_xyz else 1
        if cfg.use_viewdirs and cfg.use_code_viewdirs:
            code_d_in += 3
        if cfg.use_code:
            self.code = PositionalEncoding(
                num_freqs=cfg.code.num_freqs, d_in=code_d_in,
                freq_factor=cfg.code.freq_factor,
                include_input=cfg.code.include_input,
            )

        def _make_mlp(mc: MLPConfig, name: str):
            if mc.type == "mlp":
                # working implementation of the reference's dead type=mlp
                # path (reference models.py:18-21 references an undefined
                # ImplicitNet); see avr_tpu/models/implicit.py
                from avr_tpu.models.implicit import ImplicitNet

                return ImplicitNet(
                    d_in=self.d_in, d_out=4, n_layers=mc.n_blocks,
                    d_hidden=mc.d_hidden, d_latent=self.d_latent,
                    beta=mc.beta, combine_layer=mc.combine_layer,
                    combine_type=mc.combine_type, dtype=self.dtype, name=name,
                )
            if mc.type != "resnet":
                raise NotImplementedError(f"Unsupported MLP type {mc.type!r}")
            # Fold the positional encoding and the sigmoid/relu output split
            # into the decoder (in-kernel on the fused path): the module
            # then takes *raw* [point-feature | viewdirs] inputs and returns
            # activated (rgb, sigma).  See _query's fused-head branch.
            code_spec = None
            if cfg.use_code:
                from avr_tpu.ops.pallas.resnetfc import CodeSpec

                d_base = 3 if cfg.use_xyz else 1
                if cfg.use_viewdirs and cfg.use_code_viewdirs:
                    code_spec = CodeSpec(
                        num_freqs=cfg.code.num_freqs,
                        freq_factor=cfg.code.freq_factor,
                        include_input=cfg.code.include_input,
                        d_coded=d_base + 3, d_pass=0,
                    )
                else:
                    code_spec = CodeSpec(
                        num_freqs=cfg.code.num_freqs,
                        freq_factor=cfg.code.freq_factor,
                        include_input=cfg.code.include_input,
                        d_coded=d_base,
                        d_pass=3 if cfg.use_viewdirs else 0,
                    )
            return ResnetFC(
                d_in=self.d_in, d_out=4, n_blocks=mc.n_blocks,
                d_latent=self.d_latent, d_hidden=mc.d_hidden, bn=cfg.bn,
                beta=mc.beta, combine_layer=mc.combine_layer,
                combine_type=mc.combine_type, use_spade=mc.use_spade,
                fused=cfg.fused_mlp, code_spec=code_spec,
                activate_out=code_spec is not None,
                dtype=self.dtype, name=name,
            )

        self.mlp_coarse = _make_mlp(cfg.mlp_coarse, "mlp_coarse")
        self.mlp_fine = (
            _make_mlp(cfg.mlp_fine, "mlp_fine") if cfg.mlp_fine is not None else None
        )

    # -- conditioning pass --------------------------------------------------

    def encode(
        self,
        images: jnp.ndarray,  # (SB, NS, H, W, 3) in [-1, 1], NHWC
        poses: jnp.ndarray,  # (SB, NS, 4, 4) cam2world
        focal: jnp.ndarray,  # () | (2,) | (B,) | (B, 2)
        c: Optional[jnp.ndarray] = None,  # None | () | (2,) | (B,) | (B, 2)
        train: bool = False,
    ) -> Conditioning:
        """Encode source views into an immutable :class:`Conditioning`."""
        SB, NS, H, W, _ = images.shape
        flat_images = images.reshape(SB * NS, H, W, 3)
        flat_poses = poses.reshape(SB * NS, 4, 4)

        latent, latent_scaling = self.encoder(flat_images, train=train)

        rot = jnp.swapaxes(flat_poses[:, :3, :3], 1, 2)  # R^T
        trans = -jnp.einsum("bij,bj->bi", rot, flat_poses[:, :3, 3],
                            precision="highest")
        w2c = jnp.concatenate([rot, trans[..., None]], axis=-1)  # (B, 3, 4)

        image_shape = jnp.asarray([W, H], jnp.float32)

        focal = jnp.asarray(focal, jnp.float32)
        if focal.ndim == 0:
            focal = jnp.broadcast_to(focal, (1, 2))
        elif focal.ndim == 1:
            focal = jnp.broadcast_to(focal[:, None], (focal.shape[0], 2))
        focal = focal * jnp.asarray([1.0, -1.0], jnp.float32)

        if c is None:
            cc = (image_shape * 0.5)[None, :]
        else:
            cc = jnp.asarray(c, jnp.float32)
            if cc.ndim == 0:
                cc = jnp.broadcast_to(cc, (1, 2))
            elif cc.ndim == 1 and cc.shape[0] == 2:
                cc = cc[None, :]
            elif cc.ndim == 1:
                cc = jnp.broadcast_to(cc[:, None], (cc.shape[0], 2))

        global_latent = None
        if self.cfg.use_global_encoder:
            global_latent = self.global_encoder(flat_images, train=train)

        return Conditioning(
            latent=latent,
            latent_scaling=latent_scaling,
            poses=w2c,
            focal=focal,
            c=cc,
            image_shape=image_shape,
            global_latent=global_latent,
            num_views=NS,
        )

    # -- per-point field query ----------------------------------------------

    def __call__(
        self,
        cond: Conditioning,
        xyz: jnp.ndarray,  # (SB, B, 3) world-space query points
        viewdirs: Optional[jnp.ndarray] = None,  # (SB, B, 3)
        coarse: bool = True,
        return_features: bool = False,
        train: bool = False,
    ) -> jnp.ndarray:
        """Query (r, g, b, sigma) at world points.

        Returns ``(SB, B, 4)`` — or the pixel-aligned latent
        ``(SB, NS, B, latent)`` when ``return_features`` (the ray-marcher's
        feature path; the NS axis is mean-pooled by the caller when needed).
        """
        cfg = self.cfg
        SB, B, _ = xyz.shape
        NS = cond.num_views

        # Profiler scope names mirror the reference's record_function
        # boundaries (models.py:71,255,455,548,749) for like-for-like traces.
        with jax.named_scope("model_inference"):
            return self._query(cond, xyz, viewdirs, coarse, return_features, train)

    def _query(self, cond, xyz, viewdirs, coarse, return_features, train):
        cfg = self.cfg
        SB, B, _ = xyz.shape
        NS = cond.num_views

        poses = cond.poses.reshape(SB, NS, 3, 4)
        R = poses[..., :3]  # (SB, NS, 3, 3)
        t = poses[..., 3]  # (SB, NS, 3)

        # World -> each source view's camera space.
        xyz_rot = jnp.einsum("snij,sbj->snbi", R, xyz, precision="highest")
        xyz_cam = xyz_rot + t[:, :, None, :]  # (SB, NS, B, 3)

        # Point feature (raw).
        if cfg.use_xyz:
            raw_feature = xyz_rot if cfg.normalize_z else xyz_cam
        else:
            src = xyz_rot if cfg.normalize_z else xyz_cam
            raw_feature = -src[..., 2:3]

        # The decoder owns the positional encoding + output activation when
        # it carries a code_spec (in-kernel on the fused path): feed it the
        # raw [feature | viewdirs] lanes.  Static decision — same params
        # either way, the encoding just changes *where* it is computed.
        mlp = self.mlp_coarse if (coarse or self.mlp_fine is None) else self.mlp_fine
        fused_head = getattr(mlp, "code_spec", None) is not None

        vd = None
        if cfg.use_viewdirs:
            assert viewdirs is not None
            vd = jnp.einsum("snij,sbj->snbi", R, viewdirs, precision="highest")

        if fused_head:
            z_feature = (
                jnp.concatenate([raw_feature, vd], axis=-1)
                if cfg.use_viewdirs else raw_feature
            )
        else:
            z_feature = raw_feature
            if cfg.use_code and not cfg.use_code_viewdirs:
                with jax.named_scope("positional_enc"):
                    z_feature = self.code(z_feature)
            if cfg.use_viewdirs:
                z_feature = jnp.concatenate([z_feature, vd], axis=-1)
            if cfg.use_code and cfg.use_code_viewdirs:
                with jax.named_scope("positional_enc"):
                    z_feature = self.code(z_feature)

        latent = None
        if cfg.use_encoder:
            impl = cfg.gather_impl
            if impl == "auto":
                impl = (
                    "pallas"
                    if jax.default_backend() not in ("cpu", "gpu")
                    else "xla"
                )
            with jax.named_scope("encoder_index"):
                if impl == "pallas_proj":
                    # projected windowed kernel: the whole world->cam ->
                    # perspective -> grid chain runs in VMEM.  Measured
                    # net-SLOWER than 'pallas' at benchmark shapes (+1.8
                    # ms/step: the projection's VPU divides serialize with
                    # the one-hot contraction, while the XLA uv fusions
                    # overlap) — kept selectable, not the default (PERF.md).
                    from avr_tpu.ops.pallas.gather import (
                        gather_bilinear_projected,
                    )
                    from avr_tpu.ops.pallas.march import pack_projection

                    proj = pack_projection(
                        cond.poses, cond.focal, cond.c,
                        cond.latent_scaling, cond.image_shape,
                    )  # (SB * NS, 16)
                    pts = jnp.broadcast_to(
                        xyz[:, None], (SB, NS, B, 3)
                    ).reshape(SB * NS, B, 3)
                    latent = gather_bilinear_projected(
                        cond.latent, pts, proj
                    ).reshape(SB, NS, B, -1)
                elif impl == "pallas":
                    # windowed kernel over the XLA-computed grid: identical
                    # semantics to grid_sample_2d; block-row coherence
                    # (ray-sorted band queries) cuts the one-hot
                    # contraction up to 4x (see gather.py)
                    from avr_tpu.ops.pallas.gather import (
                        gather_bilinear_windowed,
                    )

                    uv = -xyz_cam[..., :2] / xyz_cam[..., 2:3]
                    focal = cond.focal.reshape(-1, 2)
                    cc = cond.c.reshape(-1, 2)
                    if focal.shape[0] > 1:
                        focal = focal.reshape(SB, NS, 1, 2)
                    if cc.shape[0] > 1:
                        cc = cc.reshape(SB, NS, 1, 2)
                    uv = uv * focal + cc
                    scale = cond.latent_scaling / cond.image_shape
                    grid = uv * scale - 1.0
                    latent = gather_bilinear_windowed(
                        cond.latent, grid.reshape(SB * NS, B, 2)
                    ).reshape(SB, NS, B, -1)
                else:
                    # Perspective projection into each source view (pixels).
                    uv = -xyz_cam[..., :2] / xyz_cam[..., 2:3]  # (SB,NS,B,2)
                    focal = cond.focal.reshape(-1, 2)
                    cc = cond.c.reshape(-1, 2)
                    if focal.shape[0] > 1:
                        focal = focal.reshape(SB, NS, 1, 2)
                    if cc.shape[0] > 1:
                        cc = cc.reshape(SB, NS, 1, 2)
                    uv = uv * focal + cc
                    scale = cond.latent_scaling / cond.image_shape
                    grid = uv * scale - 1.0
                    latent = grid_sample_2d(
                        cond.latent, grid.reshape(SB * NS, B, 2)
                    ).reshape(SB, NS, B, -1)

            if cfg.stop_encoder_grad:
                latent = jax.lax.stop_gradient(latent)

        if return_features:
            return latent  # (SB, NS, B, latent)

        z = latent
        if cfg.use_global_encoder:
            g = cond.global_latent.reshape(SB, NS, 1, -1)
            g = jnp.broadcast_to(g, (SB, NS, B, g.shape[-1]))
            z = g if z is None else jnp.concatenate([g, z], axis=-1)

        with jax.named_scope("resnetfc_infer"):
            out = mlp(z_feature, z, train=train)  # (SB, B, 4)

        if fused_head:
            # the module applied sigmoid(rgb)/relu(sigma) itself
            return out.astype(jnp.float32)
        rgb = nn.sigmoid(out[..., :3])
        sigma = nn.relu(out[..., 3:4])
        # Outputs in fp32 regardless of compute dtype: the compositing
        # integral accumulates in full precision.
        return jnp.concatenate([rgb, sigma], axis=-1).astype(jnp.float32)

    # -- initialization helper ----------------------------------------------

    def init_all(
        self,
        images: jnp.ndarray,
        poses: jnp.ndarray,
        focal: jnp.ndarray,
        c: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Conditioning:
        """Touch every parameter (encoder + code + both MLPs) in one pass.

        Use as ``variables = net.init(key, images, poses, focal, c,
        method=net.init_all)`` so a single variables dict covers both
        :meth:`encode` and :meth:`__call__`.
        """
        cond = self.encode(images, poses, focal, c, train=train)
        SB = images.shape[0]
        xyz = jnp.zeros((SB, 1, 3), jnp.float32)
        vd = jnp.zeros((SB, 1, 3), jnp.float32) if self.cfg.use_viewdirs else None
        self(cond, xyz, vd, coarse=True, train=train)
        if self.mlp_fine is not None:
            self(cond, xyz, vd, coarse=False, train=train)
        return cond


def make_model(conf, stop_encoder_grad: bool = False, bn: bool = False,
               dtype: Any = jnp.float32) -> PixelNeRFNet:
    """Factory from the ``model`` conf subtree (reference models.py:9-16)."""
    model_type = conf.get_string("type", "pixelnerf")
    if model_type != "pixelnerf":
        raise NotImplementedError(f"Unsupported model type {model_type!r}")
    cfg = ModelConfig.from_conf(conf, stop_encoder_grad=stop_encoder_grad, bn=bn)
    return PixelNeRFNet(cfg=cfg, dtype=dtype)
