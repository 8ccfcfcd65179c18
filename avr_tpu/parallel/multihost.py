"""Multi-host runtime helpers.

One call sets up a multi-host TPU job (``jax.distributed.initialize``) and
the rest of the framework is already multi-host ready:

  * per-host data: ``SceneClassDataset(shard_index=process_index,
    num_shards=process_count)`` strides instances across hosts,
  * the sharded train step (``make_sharded_train_step``) runs the same
    SPMD program on every host; gradients all-reduce over ICI/DCN,
  * checkpoints (Orbax) are multi-host safe,
  * :func:`gather_metrics` averages host-local scalars across processes
    for logging, and :func:`assemble_eval_image` collects a rays-sharded
    full-image render onto every host.

Single-process runs are no-ops throughout, so the same driver script works
from a dev box to a pod slice.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax

__all__ = [
    "initialize",
    "process_index",
    "process_count",
    "is_primary",
    "gather_metrics",
    "assemble_eval_image",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op when single-process).

    With TPU pod metadata available all arguments are auto-detected; pass
    them explicitly for manual clusters.

    Fail-loud contract: when a multi-process job was *requested* — an
    explicit ``num_processes > 1``, an explicit ``coordinator_address``,
    or coordinator env configuration (``JAX_COORDINATOR_ADDRESS``) — any
    initialization failure raises.  Silently proceeding single-process
    there would train N independent models while logging normally.  Only
    the bare auto-detect path on a host with no cluster metadata (the
    dev-box case) degrades to single-process.
    """
    if num_processes is not None and num_processes <= 1:
        return
    import os

    multi_requested = (
        (num_processes is not None and num_processes > 1)
        or coordinator_address is not None
        or bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:  # already initialized / 1-proc
        if "already" not in str(e).lower() and multi_requested:
            raise


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def gather_metrics(metrics: Dict[str, float]) -> Dict[str, float]:
    """Mean of host-local scalar metrics across processes."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils

    keys = sorted(metrics.keys())
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    summed = multihost_utils.process_allgather(local).mean(axis=0)
    return {k: float(summed[i]) for i, k in enumerate(keys)}


def assemble_eval_image(sharded_rgb) -> np.ndarray:
    """Materialize a (possibly rays-sharded) render on every host.

    Reshards to fully-replicated over the array's mesh — an all-gather
    over ICI/DCN under jit — after which every host's addressable shards
    hold the complete image and ``np.asarray`` succeeds everywhere.  The
    same code path runs single-process (testable on the virtual mesh) and
    multi-host.
    """
    sharding = getattr(sharded_rgb, "sharding", None)
    if (
        isinstance(sharding, jax.sharding.NamedSharding)
        and not sharding.is_fully_replicated
    ):
        rep = jax.sharding.NamedSharding(
            sharding.mesh, jax.sharding.PartitionSpec()
        )
        sharded_rgb = jax.jit(lambda x: x, out_shardings=rep)(sharded_rgb)
    return np.asarray(sharded_rgb)
