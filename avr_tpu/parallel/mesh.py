"""Device mesh + sharding rules — the framework's parallelism layer.

The reference has no distributed code at all (single hardcoded ``cuda:0``,
SURVEY.md §2b); this layer is the new first-class TPU-native component.

Parallelism plan (scaling-book style: pick a mesh, annotate shardings, let
XLA insert collectives):

  * mesh axes ``("data", "rays")`` over the slice.  ``data`` shards scenes
    (the SB axis — across hosts / DCN when multi-host), ``rays`` shards the
    per-scene ray batch (the renderer's analogue of sequence/context
    parallelism — per-ray work is embarrassingly parallel in the forward,
    so no ring machinery is needed; ICI traffic is only the gradient
    all-reduce).
  * parameters and optimizer state are fully replicated; conditioning
    follows ``data``; the gradient ``psum`` is inserted by XLA and
    overlapped with the backward pass through the compositing chain by the
    latency-hiding scheduler.
  * source-view feature volumes replicate across ``rays`` (every ray reads
    all views' latents through its projected gather) and shard across
    ``data`` with their scenes.

Multi-host: call :func:`jax.distributed.initialize` before building the
mesh; per-host data loading shards instances via
``SceneClassDataset(shard_index, num_shards)``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharding",
    "ray_sharding",
    "shard_train_inputs",
]


def make_mesh(
    mesh_shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "rays"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the 2D ``(data, rays)`` mesh over the available devices.

    Default shape puts every device on the ``rays`` axis (pure ray
    parallelism — the right default for single-host slices where SB is
    small); pass ``mesh_shape=(D, R)`` to split.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (1, n)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh shape {mesh_shape} != #devices {n}")
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (scenes) over ``data``, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def ray_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 over ``data`` and axis 1 (rays) over ``rays``."""
    return NamedSharding(mesh, P("data", "rays", *([None] * (ndim - 2))))


def shard_train_inputs(
    mesh: Mesh,
    src_images,
    src_poses,
    focal,
    c,
    model_input: Dict,
    gt,
):
    """Device-put one train step's inputs with the mesh's sharding plan.

    Multi-process: every host's input pipeline assembles a full
    global-batch-shaped step (deterministically — the per-step RNG is
    ``(seed, global step)`` on every host), but with its *own* dataset
    shard's instances in the rows; each host then materializes only the
    shards its local devices own (``jax.make_array_from_callback``), so
    the rows of the global batch owned by host h carry host h's data.
    ``jax.device_put`` cannot be used here: it asserts the value is
    identical on every process, which per-host data deliberately is not.
    """
    if jax.process_count() > 1:
        import numpy as _np

        def put(arr, sharding):
            arr = _np.asarray(arr)
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx]
            )

    else:
        put = jax.device_put
    src_images = put(src_images, batch_sharding(mesh, 5))
    src_poses = put(src_poses, batch_sharding(mesh, 4))
    focal = put(focal, replicated(mesh))
    c = put(c, replicated(mesh))
    model_input = {
        "x_pix": put(model_input["x_pix"], ray_sharding(mesh, 3)),
        "cam2world": put(model_input["cam2world"], ray_sharding(mesh, 4)),
        "intrinsics": put(model_input["intrinsics"], batch_sharding(mesh, 3)),
    }
    gt = put(gt, ray_sharding(mesh, 3))
    return src_images, src_poses, focal, c, model_input, gt
