"""Top-level model: radiance field + renderer as one Flax module.

Counterpart of the reference ``RadFieldAndRenderer``
(``/root/reference/models.py:913-960``): a single parameter tree covering
the PixelNeRF field and (for the marching renderers) the LSTM cell + step
head, so checkpointing/restore covers the whole system exactly like the
reference's combined ``state_dict``.

Renderer selection is by config dataclass type (constructed via
``renderer_config_from_conf`` which mirrors the reference's name-prefix
dispatch, reference train.py:268-273).  The ``render`` method is pure:
``(variables, cond, rays, rng) -> RenderOutput`` and jits/differentiates
end-to-end, with conditioning produced once per batch by ``encode``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from avr_tpu.models.pixelnerf import Conditioning, ModelConfig, PixelNeRFNet
from avr_tpu.ops.permute import permutation_take
from avr_tpu.renderers.adaptive import render_adaptive
from avr_tpu.renderers.base import (
    AdaptiveRendererConfig,
    RaymarcherConfig,
    RendererConfig,
    RenderOutput,
    VolumeRendererConfig,
)
from avr_tpu.renderers.lstm import MarchLSTMCell
from avr_tpu.renderers.raymarch import render_raymarcher
from avr_tpu.renderers.volume import render_volume

__all__ = ["RadFieldRenderer"]


class RadFieldRenderer(nn.Module):
    model_cfg: ModelConfig
    renderer_cfg: RendererConfig
    dtype: Any = jnp.float32
    # Rematerialize field queries in the backward pass: trades ~1/3 more
    # FLOPs for O(n_samples) less activation memory, enabling much larger
    # ray batches per chip (jax.checkpoint over the field closure).
    remat_field: bool = False
    # Fully-fused Pallas LSTM march (avr_tpu/ops/pallas/march.py):
    # "never" | "auto" (TPU backends; NS >= 1, early-stop supported) |
    # "always" (also on CPU via interpret mode, for tests).
    fused_march: str = "auto"
    # Fused Pallas band compositing (avr_tpu/ops/pallas/integrate.py):
    # same "never" | "auto" | "always" convention.  Rejected as default
    # after two measured attempts: round 2's ray-major kernel was ~neutral
    # (the feeding relayout paid back the win) and round 3's point-major
    # rewrite — which consumes the decoder output with NO relayout and is
    # exact to 6e-7 on device — still measured ~4 ms/step slower end to
    # end (grid overhead + boundary layouts vs ~2 ms of already-optimal
    # XLA fusions; PERF.md round 3).  Kept selectable for bigger n.
    fused_integral: str = "never"

    @property
    def has_marcher(self) -> bool:
        return isinstance(self.renderer_cfg, (RaymarcherConfig, AdaptiveRendererConfig))

    def setup(self):
        self.net = PixelNeRFNet(cfg=self.model_cfg, dtype=self.dtype)
        if self.has_marcher:
            self.lstm = MarchLSTMCell(
                hidden_size=self.renderer_cfg.hidden_size, dtype=self.dtype
            )
            self.out_layer = nn.Dense(1, dtype=self.dtype, name="out_layer")

    # ------------------------------------------------------------------
    def encode(
        self,
        images: jnp.ndarray,
        poses: jnp.ndarray,
        focal: jnp.ndarray,
        c: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Conditioning:
        return self.net.encode(images, poses, focal, c, train=train)

    def render(
        self,
        cond: Conditioning,
        xy_pix: jnp.ndarray,  # (SB, R, 2)
        intrinsics: jnp.ndarray,  # (SB, 3, 3)
        cam2world: jnp.ndarray,  # (SB, R, 4, 4)
        key: jax.Array,
        train: bool = False,
    ) -> RenderOutput:
        cfg = self.renderer_cfg
        # Force lazy child setup() now: the marching renderers first touch
        # self.net/self.lstm inside a lax.scan body, where Flax cannot
        # assign submodules.
        _ = self.net.mlp_coarse
        if self.has_marcher:
            _ = self.lstm, self.out_layer

        # remat during init would create params inside the checkpoint trace
        if self.remat_field and not self.is_initializing():
            f_coarse = jax.checkpoint(
                lambda xyz, vd: self.net(cond, xyz, viewdirs=vd, coarse=True, train=train)
            )
            f_fine = jax.checkpoint(
                lambda xyz, vd: self.net(cond, xyz, viewdirs=vd, coarse=False, train=train)
            )

            def field(xyz, viewdirs, coarse):
                return f_coarse(xyz, viewdirs) if coarse else f_fine(xyz, viewdirs)

        else:

            def field(xyz, viewdirs, coarse):
                return self.net(cond, xyz, viewdirs=viewdirs, coarse=coarse, train=train)

        if isinstance(cfg, VolumeRendererConfig):
            return render_volume(
                cfg, key, field, xy_pix, intrinsics, cam2world,
                sort_key_fn=self._maybe_sort_key(cond),
            )

        def features(xyz, viewdirs):
            return self.net(
                cond, xyz, viewdirs=viewdirs, return_features=True, train=train
            )

        if self.remat_field and not self.is_initializing():
            # the march's per-step gathered latents are the dominant scan
            # residual; recompute them in the backward instead of storing
            features = jax.checkpoint(features)

        def cell(v, state):
            # keep the scan carry fp32 regardless of compute dtype
            h, c_ = self.lstm(v, state)
            return h.astype(jnp.float32), c_.astype(jnp.float32)

        def step_head(h):
            return self.out_layer(h)

        march_fn = self._maybe_fused_march(cond, cfg)

        if isinstance(cfg, RaymarcherConfig):
            return render_raymarcher(
                cfg, key, field, features, cell, step_head,
                xy_pix, intrinsics, cam2world, march_fn=march_fn,
            )
        if isinstance(cfg, AdaptiveRendererConfig):
            return render_adaptive(
                cfg, key, field, features, cell, step_head,
                xy_pix, intrinsics, cam2world, march_fn=march_fn,
                sort_key_fn=self._maybe_sort_key(cond),
                fused_integral=self.fused_integral,
            )
        raise NotImplementedError(f"Unknown renderer config {type(cfg)}")

    def _maybe_sort_key(self, cond: Conditioning):
        """Locality key for the adaptive band: the marched point's row in
        the source view, so ray-sorted band queries hit the windowed
        gather's fast path.  Only worth it when the Pallas gather runs."""
        import jax as _jax

        import os as _os

        impl = self.model_cfg.gather_impl
        if impl == "auto":
            impl = (
                "pallas"
                if _jax.default_backend() not in ("cpu", "gpu")
                else "xla"
            )
        # AVR_SORT=0 disables the locality sort independently of the gather
        # impl (A/B knob: previously only BENCH_GATHER=xla could turn the
        # sort off, conflating the two effects).  Trace-time-bound: the env
        # var is read while the step is being traced, so flipping it after a
        # step has compiled has no effect on the cached program — A/B
        # harnesses must rebuild the model/step per variant (ab_vr_tpu.py
        # does).
        if (
            impl != "pallas"
            or self.is_initializing()
            or _os.environ.get("AVR_SORT", "1") == "0"
        ):
            return None

        from avr_tpu.ops.pallas.march import pack_projection

        proj = pack_projection(
            cond.poses, cond.focal, cond.c, cond.latent_scaling,
            cond.image_shape,
        )  # (SB * NS, 16); sort rays by their row in the FIRST source view
        proj = proj.reshape(-1, cond.num_views, 16)[:, 0]

        def sort_key(coords):  # (SB, R, 3) -> (SB, R) source-view row
            R = proj[:, :9].reshape(-1, 3, 3)
            t = proj[:, 9:12]
            cam = jnp.einsum("sij,srj->sri", R, coords) + t[:, None, :]
            gy = -(cam[..., 1] / cam[..., 2]) * proj[:, None, 13] + proj[:, None, 15]
            return gy

        return sort_key

    def _maybe_fused_march(self, cond: Conditioning, cfg):
        """Build the fused-march closure when the config allows it, else None.

        The fused kernel covers the march with pixel-aligned conditioning
        (NS >= 1, multi-view features mean-pool in-kernel; early-stop
        masking with whole-block skip).  Everything else falls back to the
        ``lax.scan`` path.
        """
        if (
            self.fused_march == "never"
            or self.is_initializing()
            or not self.has_marcher
            or not self.model_cfg.use_encoder
            or 2 * cfg.hidden_size + 4 > 128
        ):
            return None
        import jax as _jax

        backend = _jax.default_backend()
        if self.fused_march != "always" and backend in ("cpu", "gpu"):
            return None

        from avr_tpu.ops.pallas.march import fused_lstm_march, pack_projection

        NS = cond.num_views
        lstm_params = self.lstm.variables["params"]
        out_params = self.out_layer.variables["params"]
        latent = cond.latent  # (SB * NS, H', W', C)
        latent = latent.reshape((-1, NS) + latent.shape[1:])
        if self.model_cfg.stop_encoder_grad:
            latent = jax.lax.stop_gradient(latent)
        proj = pack_projection(
            cond.poses, cond.focal, cond.c, cond.latent_scaling,
            cond.image_shape,
        ).reshape(-1, NS, 16)
        proj0 = proj[:, 0]  # first view, for the ray sort below
        compute_dtype = self.dtype

        def march_fn(k, ros, rds):
            # drawn 2D (matches renderers/raymarch.py): trailing-1 layouts
            # run the RNG chain slowly on the VPU; _normal_2d dispatches the
            # sharding-invariant RaySeeds hash too
            from avr_tpu.ops.sampling import _normal_2d

            init_distance = cfg.init_distance_mean + (
                cfg.init_distance_std
                * _normal_2d(k, ros.shape[:2], jnp.float32)[..., None]
            )
            coords0 = ros + rds * init_distance

            # Sort rays by the initial point's first-source-view row so the
            # kernel's per-step windowed gather sees row-coherent blocks
            # (rays drift along themselves, so coherence survives the
            # march).  Pure permutation: outputs are un-permuted below.
            R = proj0[:, :9].reshape(-1, 3, 3)
            t = proj0[:, 9:12]
            cam = jnp.einsum("sij,srj->sri", R, coords0) + t[:, None, :]
            key_row = -(cam[..., 1] / cam[..., 2]) * proj0[:, None, 13] + (
                proj0[:, None, 15]
            )
            order = jnp.argsort(key_row, axis=-1)
            inv = jnp.argsort(order, axis=-1)
            # scatter-free permutation (VJP is a gather by the other index)
            take = permutation_take

            coords = fused_lstm_march(
                proj, take(coords0, order, inv), take(rds, order, inv), latent,
                lstm_params["w_ih"], lstm_params["w_hh"],
                lstm_params["b_ih"] + lstm_params["b_hh"],
                out_params["kernel"], out_params["bias"],
                steps=cfg.raymarch_steps, grad_clamp=cfg.grad_clamp,
                early_stop_eps=getattr(cfg, "early_stop_eps", 0.0),
                compute_dtype=compute_dtype, interpret=backend == "cpu",
            )
            return take(coords, inv, order)

        return march_fn

    def __call__(
        self, model_input: Dict[str, jnp.ndarray], cond: Conditioning,
        key: jax.Array, train: bool = False,
    ) -> RenderOutput:
        """Dict-driven forward matching the reference wrapper's input contract."""
        return self.render(
            cond,
            model_input["x_pix"],
            model_input["intrinsics"],
            model_input["cam2world"],
            key,
            train=train,
        )

    # ------------------------------------------------------------------
    def init_all(
        self,
        images: jnp.ndarray,
        poses: jnp.ndarray,
        focal: jnp.ndarray,
        c: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> RenderOutput:
        """Touch every parameter: encode + a 1-ray render."""
        cond = self.encode(images, poses, focal, c, train=train)
        SB = images.shape[0]
        if self.has_marcher:
            # Create the marcher's parameters *outside* the lax.scan march
            # loop: param creation inside a scan body would leak tracers at
            # init time (the scan body must be pure once tracing starts).
            v0 = jnp.zeros((SB, 1, self.net.latent_size), jnp.float32)
            h0 = jnp.zeros((SB, 1, self.renderer_cfg.hidden_size), jnp.float32)
            h1, _ = self.lstm(v0, (h0, h0))
            self.out_layer(h1)
        # off-center pixel: keeps ray-direction x bounded away from 0 for the
        # adaptive renderer's along-ray distance recovery during init
        xy_pix = jnp.full((SB, 1, 2), 0.25, jnp.float32)
        intrinsics = jnp.broadcast_to(
            jnp.asarray(
                [[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]], jnp.float32
            ),
            (SB, 3, 3),
        )
        cam2world = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (SB, 1, 4, 4))
        # Make sure the fine MLP exists in the tree even for marching
        # renderers whose coarse path wouldn't otherwise touch it.
        out = self.render(
            cond, xy_pix, intrinsics, cam2world, jax.random.PRNGKey(0), train=train
        )
        if self.net.mlp_fine is not None and isinstance(
            self.renderer_cfg, RaymarcherConfig
        ):
            self.net(cond, jnp.zeros((SB, 1, 3)), jnp.zeros((SB, 1, 3)), coarse=False)
        return out
