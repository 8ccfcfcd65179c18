"""Device-resident dataset: batch sampling inside the jitted train step.

Motivation (round-5 wall-clock finding): at production ray batches the
host-driven pipeline costs ~40-60 ms/step of fixed overhead — per-step
argument upload (source images + per-ray poses ≈ 1-2 MB over the device
link) plus host-side numpy gathers — which caps training at ~46 k rays/s
while the pure device step sustains 227 k (bench shapes).  The reference
has the same structure on GPU (train.py:52-108: host DataLoader + .cuda()
per step) but PCIe hides it; through a TPU relay it dominates.

This module uploads the *entire* scene set to HBM once (SRN-scale car
sets at 128^2 are ~150 MB per 64 instances; a fits-in-HBM check guards
misuse) and reproduces the sampling semantics of the host pipeline
(``training/loop.py::assemble_step_inputs``) as pure XLA gathers keyed by
the step key:

  * instances:  uniform with replacement per step (host: epoch
    permutation without replacement — same marginal distribution, no
    epoch boundary; documented divergence),
  * source views: uniform with replacement over ALL NV views (host:
    uniform over the epoch's ``samples_per_instance`` view subset —
    same marginal distribution),
  * rays: uniform over ``NV * sl^2`` (view, pixel) pairs — identical to
    the host path (reference train.py:71-78, uniform mode; bbox mode is
    host-only and rejected here),
  * gt in [0, 1] via the same 0.5*x+0.5 rescale (train.py:85).

Everything a step needs is then two scalars up the wire (the state is
donated in place, the key is 8 bytes): zero per-step host work.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from avr_tpu.data.dataset import SceneClassDataset

__all__ = ["DeviceDataset", "build_device_dataset", "make_device_sampler"]

_HBM_BUDGET_BYTES = 4 * 1024**3  # refuse silly uploads; SRN cars @128^2 fits


class DeviceDataset(NamedTuple):
    """All scenes resident on device.  Shapes:

    images:     (Ni, NV, sl^2, 3) float32 in [-1, 1]
    poses:      (Ni, NV, 4, 4)    cam2world (OpenCV, pose-flip applied)
    intrinsics: (Ni, 3, 3)        normalized (dataset.py convention)
    x_pix:      (sl^2, 2)         the [0,1) pixel grid (shared)
    focal, c:   scalars / (2,)    pixel-unit focal + principal point
                                  (host path takes scene 0's values,
                                  loop.py::select_source_views)
    """

    images: jnp.ndarray
    poses: jnp.ndarray
    intrinsics: jnp.ndarray
    x_pix: jnp.ndarray
    focal: jnp.ndarray
    c: jnp.ndarray

    @property
    def num_instances(self) -> int:
        return self.images.shape[0]

    @property
    def num_views(self) -> int:
        return self.images.shape[1]

    @property
    def sidelength(self) -> int:
        return int(round(float(np.sqrt(self.images.shape[2]))))


def build_device_dataset(dset: SceneClassDataset) -> DeviceDataset:
    """Read every (instance, view) once on host and upload to device."""
    insts = dset.all_instances
    # ragged view counts truncate to the common minimum (uniform sampling
    # over a rectangular array needs a fixed NV)
    nv = min(len(inst) for inst in insts)
    first = insts[0][0]
    sl2 = first["images"].shape[0]
    n_bytes = len(insts) * nv * sl2 * 3 * 4
    if n_bytes > _HBM_BUDGET_BYTES:
        raise ValueError(
            f"device_data: dataset needs {n_bytes/1e9:.1f} GB on device "
            f"(> {_HBM_BUDGET_BYTES/1e9:.0f} GB budget) — use the host "
            "pipeline"
        )
    images = np.empty((len(insts), nv, sl2, 3), np.float32)
    poses = np.empty((len(insts), nv, 4, 4), np.float32)
    intrinsics = np.empty((len(insts), 3, 3), np.float32)
    for i, inst in enumerate(insts):
        for v in range(nv):
            obs = inst[v]
            images[i, v] = obs["images"]
            poses[i, v] = obs["cam2world"]
        intrinsics[i] = obs["intrinsics"]
    return DeviceDataset(
        images=jnp.asarray(images),
        poses=jnp.asarray(poses),
        intrinsics=jnp.asarray(intrinsics),
        x_pix=jnp.asarray(first["x_pix"]),
        focal=jnp.asarray(first["focal"]),
        c=jnp.asarray(first["c"]),
    )


def make_device_sampler(
    data: DeviceDataset,
    batch_size: int,
    ray_batch_size: int,
    num_source_views: int = 1,
):
    """Return ``sample(key) -> (src_images, src_poses, focal, c,
    model_input, gt)`` — the train step's input tuple, built entirely on
    device (jit-traceable; used inside the fused step)."""
    Ni, NV = data.num_instances, data.num_views
    sl = data.sidelength
    sl2 = sl * sl
    SB, R, NS = batch_size, ray_batch_size, num_source_views

    def sample(key: jax.Array) -> Tuple:
        k_inst, k_src, k_ray = jax.random.split(key, 3)
        inst = jax.random.randint(k_inst, (SB,), 0, Ni)
        src_idx = jax.random.randint(k_src, (SB, NS), 0, NV)
        flat = jax.random.randint(k_ray, (SB, R), 0, NV * sl2)
        view = flat // sl2
        pix = flat % sl2

        src_images = data.images[inst[:, None], src_idx].reshape(
            SB, NS, sl, sl, 3
        )
        src_poses = data.poses[inst[:, None], src_idx]
        c2w = data.poses[inst[:, None], view]  # (SB, R, 4, 4)
        x_pix = data.x_pix[pix]  # (SB, R, 2)
        gt = data.images[inst[:, None], view, pix] * 0.5 + 0.5
        model_input = {
            "x_pix": x_pix,
            "cam2world": c2w,
            "intrinsics": data.intrinsics[inst],
        }
        return (src_images, src_poses, data.focal, data.c, model_input, gt)

    return sample
