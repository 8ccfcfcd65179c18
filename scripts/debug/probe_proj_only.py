"""Minimal kernel: output the in-kernel projected grid, compare to XLA."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from avr_tpu.ops.pallas.gather import _proj_grid
from avr_tpu.ops.pallas.march import pack_projection

rng = np.random.default_rng(5)
B, N = 2, 512
H = W = 64
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

def kernel(proj_ref, pts_ref, out_ref):
    b = pl.program_id(0)
    gx, gy, camx, camy, camz = _proj_grid(proj_ref, b, pts_ref[0])
    out_ref[0] = jnp.concatenate(
        [gx[:, None], gy[:, None], camx[:, None], camy[:, None], camz[:, None]],
        axis=1)

def run(pr, p):
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, N, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, 5), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, 5), jnp.float32),
    )(pr, p)

out = jax.jit(run)(proj, pts)

cam = jnp.einsum("bij,bnj->bni", poses[:, :, :3], pts) + poses[:, None, :, 3]
uv = -cam[..., :2] / cam[..., 2:3] * focal[:, None] + cc[:, None]
grid = uv * (scale / img)[None, None] - 1.0
ref = jnp.concatenate([grid, cam], axis=-1)
d = np.abs(np.asarray(out) - np.asarray(ref))
print("per-column max diff:", d.reshape(-1, 5).max(0))
print("kernel row0:", np.asarray(out)[0, 0])
print("ref    row0:", np.asarray(ref)[0, 0])

# worst-row analysis vs float64 numpy truth
o = np.asarray(out); r = np.asarray(ref)
P64 = np.asarray(poses, np.float64); F64 = np.asarray(focal, np.float64)
C64 = np.asarray(cc, np.float64); S64 = np.asarray(scale, np.float64) / np.asarray(img, np.float64)
pts64 = np.asarray(pts, np.float64)
cam64 = np.einsum("bij,bnj->bni", P64[:, :, :3], pts64) + P64[:, None, :, 3]
grid64 = (-cam64[..., :2] / cam64[..., 2:3] * F64[:, None] + C64[:, None]) * S64 - 1.0
bad = np.unravel_index(np.argmax(np.abs(o[..., 1] - r[..., 1])), o[..., 1].shape)
print("worst gy at", bad)
print("kernel:", o[bad])
print("xla   :", r[bad])
print("f64   :", np.concatenate([grid64[bad], cam64[bad]]))
print("pts   :", pts64[bad])
