"""Capture a jax.profiler trace of the full train step on the real chip.

Writes an xplane trace under --out (default /tmp/avr_trace); analyze with
``python -m avr_tpu.profiling.analyze <out>`` (device-op breakdown).
Knobs via env: BENCH_FUSED_MLP, BENCH_GATHER ("xla"|"pallas"|"auto").
"""
import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, jax.numpy as jnp, optax, dataclasses
jax.config.update("jax_default_prng_impl", os.environ.get("BENCH_PRNG", "rbg"))
from avr_tpu.config import parse_conf
from avr_tpu.models.pixelnerf import ModelConfig
from avr_tpu.models.wrapper import RadFieldRenderer
from avr_tpu.renderers.base import (
    AdaptiveRendererConfig, RaymarcherConfig, VolumeRendererConfig,
)
from avr_tpu.training import LossParams, create_train_state, make_train_step

SB, NS, SIDE = 4, 1, 128
R = int(os.environ.get("BENCH_RAYS", 4096))
conf = parse_conf(_os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "conf", "default_mv.conf"))
model_cfg = dataclasses.replace(ModelConfig.from_conf(conf["model"]),
                                fused_mlp=os.environ.get("BENCH_FUSED_MLP", "auto"),
                                gather_impl=os.environ.get("BENCH_GATHER", "auto"))
RENDERER = os.environ.get("BENCH_RENDERER", "avr")
if RENDERER == "vr":
    renderer_cfg = VolumeRendererConfig.from_conf(conf["normal_renderer"])
    loss_mode = "both"
elif RENDERER == "raymarcher":
    renderer_cfg = RaymarcherConfig.from_conf(conf["raymarcher"])
    loss_mode = "coarse"
else:
    renderer_cfg = AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"])
    loss_mode = "both"
model = RadFieldRenderer(model_cfg=model_cfg,
                         renderer_cfg=renderer_cfg,
                         dtype=jnp.bfloat16, remat_field=os.environ.get("BENCH_REMAT", "0") == "1",
                         fused_march=os.environ.get("BENCH_FUSED_MARCH", "auto"),
                         fused_integral=os.environ.get("BENCH_FUSED_INTEGRAL", "auto"))
rng = np.random.default_rng(0)
images = jnp.asarray(rng.normal(size=(SB, NS, SIDE, SIDE, 3)).astype(np.float32))
c2w = np.eye(4, dtype=np.float32) @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
c2w[2, 3] = 1.3
poses = jnp.asarray(np.broadcast_to(c2w, (SB, NS, 4, 4)).copy())
focal = jnp.float32(1.09375 * SIDE)
c = jnp.asarray([SIDE / 2.0, SIDE / 2.0], jnp.float32)
xy = jnp.asarray(rng.uniform(0.05, 0.95, size=(SB, R, 2)).astype(np.float32))
K = jnp.broadcast_to(jnp.asarray([[1.09375, 0, 0.5], [0, 1.09375, 0.5], [0, 0, 1]], jnp.float32), (SB, 3, 3))
rays_c2w = jnp.broadcast_to(jnp.asarray(c2w), (SB, R, 4, 4))
gt = jnp.asarray(rng.uniform(size=(SB, R, 3)).astype(np.float32))
model_input = {"x_pix": xy, "cam2world": rays_c2w, "intrinsics": K}
variables = model.init(jax.random.PRNGKey(0), images, poses, focal, c, method=model.init_all)
tx = optax.adam(1e-4)
state = create_train_state(variables, tx)
step = make_train_step(model, tx, LossParams(loss_mode=loss_mode), ray_chunks=int(os.environ.get("BENCH_RAY_CHUNKS", "1")))
key = jax.random.PRNGKey(0)
for i in range(3):
    key, sub = jax.random.split(key)
    state, metrics = step(state, images, poses, focal, c, model_input, gt, sub)
float(np.asarray(metrics["loss"]))
out_dir = os.environ.get("TRACE_OUT", "/tmp/avr_trace")
jax.profiler.start_trace(out_dir)
for i in range(3):
    key, sub = jax.random.split(key)
    state, metrics = step(state, images, poses, focal, c, model_input, gt, sub)
float(np.asarray(metrics["loss"]))
jax.profiler.stop_trace()
print("trace written to", out_dir)
