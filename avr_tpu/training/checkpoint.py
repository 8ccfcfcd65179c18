"""Checkpoint save/restore (Orbax-backed, epoch-tagged).

Counterpart of the reference's ``torch.save(state_dict)`` flow
(``/root/reference/models.py:894-960``, ``train.py:168-171,277-278``) with
the same epoch-tagged naming scheme
(``{root}/checkpoints/experiments/{name}_epoch{e}``), upgraded the TPU way:

  * the *whole* :class:`TrainState` is saved — params, BatchNorm stats and
    optimizer state — so resume is exact (the reference restarts Adam on
    resume; saving opt state is flag-gated off to mirror that if desired),
  * storage is Orbax/TensorStore: sharded-array aware, multi-host safe.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from avr_tpu.training.state import TrainState

__all__ = ["checkpoint_path", "save_checkpoint", "restore_checkpoint"]


def checkpoint_path(root_dir: str, name: str, epoch) -> str:
    """Epoch-tagged checkpoint directory.  ``epoch`` is an int for the
    regular per-epoch saves, or the string ``"best"`` for the best-val
    checkpoint ``{name}_best`` (fit's best-val-PSNR selection)."""
    tag = f"epoch{epoch}" if not isinstance(epoch, str) else epoch
    return os.path.join(
        os.path.abspath(root_dir), "checkpoints", "experiments", f"{name}_{tag}"
    )


def save_checkpoint(
    root_dir: str, name: str, epoch, state: TrainState,
    include_opt_state: bool = True,
) -> str:
    """Save a train state; returns the checkpoint directory path."""
    path = checkpoint_path(root_dir, name, epoch)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats or {},
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    if include_opt_state:
        payload["opt_state"] = state.opt_state
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(
    root_dir: str, name: str, epoch: int, state: TrainState, strict: bool = False
) -> TrainState:
    """Restore into an existing (template) state.

    Missing pieces (e.g. a checkpoint saved without optimizer state) keep
    the template's values, mirroring the reference's ``strict=False`` load.
    """
    path = checkpoint_path(root_dir, name, epoch)
    if not os.path.exists(path):
        if strict:
            raise FileNotFoundError(path)
        import warnings

        warnings.warn(f"{path} does not exist, not loaded!! Model stays initialized.")
        return state
    # Restore against a template so container types (optax NamedTuples,
    # custom pytree nodes) come back with their original structure instead
    # of raw dicts.
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats or {},
        "opt_state": state.opt_state,
    }
    if state.ema_params is not None:
        template["ema_params"] = state.ema_params
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(path, item=template)
        except (ValueError, KeyError):
            # Template mismatch.  Only *optimizer-state* structure drift is
            # forgivable (checkpoint saved without opt state, or with a
            # different optimizer wrapper than the template's — e.g. plain
            # Adam vs make_optimizer's apply_if_finite): restore raw, drop
            # the opt state (the reference restarts Adam on resume anyway,
            # reference train.py:277-278) and validate that the
            # optimizer-independent pieces still match the template, so a
            # wrong-model or corrupted checkpoint raises here instead of
            # silently partial-restoring and failing downstream.
            restored = ckptr.restore(path)
            restored.pop("opt_state", None)
            for piece in ("params", "batch_stats"):
                if piece not in restored or restored[piece] is None:
                    continue
                if not template.get(piece):
                    continue
                t_struct = jax.tree_util.tree_structure(template[piece])
                r_struct = jax.tree_util.tree_structure(restored[piece])
                if t_struct != r_struct:
                    raise ValueError(
                        f"{path}: checkpoint {piece!r} structure does not "
                        f"match the model (checkpoint {r_struct} vs template "
                        f"{t_struct}) — wrong model/config for this "
                        "checkpoint?"
                    )
            import warnings

            warnings.warn(
                f"{path}: optimizer state structure does not match the "
                "template (different optimizer wrapper or checkpoint saved "
                "without opt state); restoring params/batch_stats/step and "
                "keeping a fresh optimizer init."
            )
    replacements = {}
    keys = ("step", "params", "batch_stats", "opt_state") + (
        ("ema_params",) if state.ema_params is not None else ()
    )
    for key in keys:
        if key in restored and restored[key] is not None:
            replacements[key] = restored[key]
    if "batch_stats" in replacements and not replacements["batch_stats"]:
        replacements["batch_stats"] = state.batch_stats
    if state.ema_params is not None and "ema_params" not in replacements:
        # EMA requested but the checkpoint predates it: seed the average
        # from the restored params rather than keeping the template's init
        import jax.numpy as jnp

        replacements["ema_params"] = jax.tree.map(
            jnp.array, replacements.get("params", state.params)
        )
    return state.replace(**replacements)
