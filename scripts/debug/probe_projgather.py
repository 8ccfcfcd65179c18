"""Isolate the on-device projected-gather divergence: full-map windows vs
in-kernel reduced windows vs projection math."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from avr_tpu.ops.pallas import gather as G
from avr_tpu.ops.pallas.march import pack_projection
from avr_tpu.ops.grid_sample import grid_sample_2d

rng = np.random.default_rng(5)
B, H, W, C, N = 2, 64, 64, 128, 2048
feats = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
poses = []
for b in range(B):
    Q, _ = np.linalg.qr(np.eye(3) + 0.1 * rng.normal(size=(3, 3)))
    t = np.array([0.05, -0.03, 1.2 + 0.05 * b])
    poses.append(np.concatenate([Q, t[:, None]], 1))
poses = jnp.asarray(np.stack(poses).astype(np.float32))
focal = jnp.asarray([[70.0, -70.0]] * B, jnp.float32)
cc = jnp.asarray([[32.0, 32.0]] * B, jnp.float32)
scale = jnp.asarray([2.0 * W / (W - 1), 2.0 * H / (H - 1)], jnp.float32)
img = jnp.asarray([float(W), float(H)], jnp.float32)
proj = pack_projection(poses, focal, cc, scale, img)
pts = jnp.asarray((0.4 * rng.normal(size=(B, N, 3))).astype(np.float32))

cam = jnp.einsum("bij,bnj->bni", poses[:, :, :3], pts) + poses[:, None, :, 3]
uv = -cam[..., :2] / cam[..., 2:3] * focal[:, None] + cc[:, None]
grid = uv * (scale / img)[None, None] - 1.0
ref = grid_sample_2d(feats, grid)

# 1. current kernel
out1 = jax.jit(lambda f, p: G.gather_bilinear_projected(f, p, proj))(feats, pts)
print("projected(in-kernel windows):", float(jnp.max(jnp.abs(out1 - ref))))

# 2. projection only: feed the in-kernel-projected grid through the OLD
#    windowed kernel by projecting outside (sanity: old kernel passes)
out2 = jax.jit(lambda f, g: G.gather_bilinear_windowed(f, g))(feats, grid)
print("windowed(grid outside):      ", float(jnp.max(jnp.abs(out2 - ref))))

# 3. kernel with full-map windows (monkeypatch _inkernel_window)
orig = G._inkernel_window
def full_window(gy, H_, wr_):
    return jnp.int32(0), jnp.int32(H_ // wr_)
G._inkernel_window = full_window
try:
    out3 = jax.jit(lambda f, p: G.gather_bilinear_projected(f, p, proj))(feats, pts)
    print("projected(full windows):     ", float(jnp.max(jnp.abs(out3 - ref))))
finally:
    G._inkernel_window = orig
