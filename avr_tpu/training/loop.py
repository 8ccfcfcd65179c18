"""Training driver: the ``fit`` loop.

Counterpart of the reference ``fit`` (``/root/reference/train.py:13-173``):
per step pick a random source view per scene, encode, sample a ray batch
(uniform or foreground-bbox), one fused optimizer step; periodic loss
prints, full-image validation renders with PSNR/SSIM, epoch-tagged
checkpoints.  Host-side work (data, ray index sampling) stays numpy; the
step itself is one jitted XLA program (``avr_tpu.training.step``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from avr_tpu.data.dataset import SceneClassDataset
from avr_tpu.data.sampling import gather_rays
from avr_tpu.training.checkpoint import save_checkpoint
from avr_tpu.training.loss import LossParams, loss_fn
from avr_tpu.training.state import TrainState
from avr_tpu.training.step import make_encode_fn, make_render_fn, make_train_step
from avr_tpu.utils.logging import MetricsLogger
from avr_tpu.utils.metrics import get_metrics
from avr_tpu.data.dataset import pixel_grid

__all__ = ["FitConfig", "fit", "render_full_image", "select_source_views"]


@dataclasses.dataclass
class FitConfig:
    epochs: int = 50
    batch_size: int = 4
    ray_batch_size: int = 512
    with_bbox: bool = False
    steps_print: int = 5
    steps_val: int = 50
    epochs_save: int = 10
    starting_epoch: int = 0
    num_source_views: int = 1
    render_chunk: int = 4096
    save_root: Optional[str] = None
    run_name: str = "run"
    seed: int = 0


def select_source_views(
    rng: np.random.Generator, batch: Dict[str, np.ndarray], ns: int,
    fixed_idx: Optional[List[int]] = None,
):
    """Pick NS source views per scene; returns encode() inputs.

    Mirrors reference train.py:60-68 (random views, scalar focal/c taken
    from the first scene's first selected view).
    """
    images = batch["images"]  # (SB, NV, sl2, 3)
    SB, NV, sl2, _ = images.shape
    sl = int(np.sqrt(sl2))
    if fixed_idx is not None:
        src_idx = np.broadcast_to(np.asarray(fixed_idx)[None, :], (SB, ns))
    else:
        src_idx = rng.integers(0, NV, size=(SB, ns))

    take = lambda arr: np.take_along_axis(
        arr, src_idx.reshape(SB, ns, *([1] * (arr.ndim - 2))), axis=1
    )
    src_images = take(images).reshape(SB, ns, sl, sl, 3)
    src_poses = take(batch["cam2world"])  # (SB, ns, 4, 4)
    # scalar focal / (2,) principal point from the first scene's first
    # selected view (reference train.py:65-66)
    focal = batch["focal"][0, src_idx[0, 0]]
    c = batch["c"][0, src_idx[0, 0]]
    return (
        jnp.asarray(src_images),
        jnp.asarray(src_poses),
        jnp.asarray(focal),
        jnp.asarray(c),
    )


def render_full_image(
    render_fn: Callable,
    variables,
    cond,
    intrinsics: jnp.ndarray,  # (SB, 3, 3)
    cam2world: jnp.ndarray,  # (SB, 4, 4) one pose per scene
    sl: int,
    key: jax.Array,
    chunk: int = 4096,
):
    """Render a full ``sl x sl`` image in fixed-size ray chunks.

    Chunking keeps device memory bounded at full-image eval (sl^2 rays);
    every chunk reuses one compiled program.
    """
    SB = intrinsics.shape[0]
    xy = jnp.asarray(pixel_grid(sl, sl).reshape(1, sl * sl, 2))
    xy = jnp.broadcast_to(xy, (SB, sl * sl, 2))
    c2w = jnp.broadcast_to(cam2world[:, None], (SB, sl * sl, 4, 4))

    total = sl * sl
    pieces = []
    for start in range(0, total, chunk):
        end = min(start + chunk, total)
        pad = chunk - (end - start)
        sl_xy = xy[:, start:end]
        sl_c2w = c2w[:, start:end]
        if pad:
            sl_xy = jnp.pad(sl_xy, ((0, 0), (0, pad), (0, 0)), mode="edge")
            sl_c2w = jnp.pad(sl_c2w, ((0, 0), (0, pad), (0, 0), (0, 0)), mode="edge")
        out = render_fn(variables, cond, sl_xy, intrinsics, sl_c2w, key)
        pieces.append(jax.tree.map(lambda x: None if x is None else x[:, : end - start],
                                   out, is_leaf=lambda x: x is None))
    return jax.tree.map(
        lambda *xs: None if xs[0] is None else jnp.concatenate(xs, axis=1),
        *pieces,
        is_leaf=lambda x: x is None,
    )


def fit(
    model,
    state: TrainState,
    tx,
    train_dset: SceneClassDataset,
    val_dset: Optional[SceneClassDataset],
    loss_params: LossParams,
    cfg: FitConfig,
    logger: Optional[MetricsLogger] = None,
):
    """Train; returns (state, mean epoch losses)."""
    logger = logger or MetricsLogger()
    rng = np.random.default_rng(cfg.seed)
    key = jax.random.PRNGKey(cfg.seed)

    train_step = make_train_step(model, tx, loss_params)
    render_fn = make_render_fn(model)
    encode_fn = make_encode_fn(model)

    fine = loss_params.loss_mode != "coarse"
    mean_losses = []
    epoch = cfg.starting_epoch
    step = 0
    t_last = time.time()
    rays_done = 0

    for _ in range(cfg.epochs):
        epoch += 1
        losses = []
        for batch in train_dset.batches(cfg.batch_size, shuffle=True):
            src_images, src_poses, focal, c = select_source_views(
                rng, batch, cfg.num_source_views
            )
            model_input, gt = gather_rays(
                rng, batch, cfg.ray_batch_size, with_bbox=cfg.with_bbox
            )
            key, sub = jax.random.split(key)
            state, metrics = train_step(
                state, src_images, src_poses, focal, c,
                {k: jnp.asarray(v) for k, v in model_input.items()},
                jnp.asarray(gt), sub,
            )
            step += 1
            rays_done += gt.shape[0] * gt.shape[1]

            if step % cfg.steps_print == 0:
                loss_val = float(metrics["loss"])
                dt = time.time() - t_last
                logger.log(
                    "train", epoch=epoch, step=step, loss=loss_val,
                    grad_norm=float(metrics["grad_norm"]),
                    rays_per_s=rays_done / max(dt, 1e-9),
                )
                t_last = time.time()
                rays_done = 0
                losses.append(loss_val)

            if val_dset is not None and step % cfg.steps_val == 0:
                val_batch = next(val_dset.batches(1, shuffle=True))
                psnr_v, ssim_v, val_loss = validate(
                    model, state, encode_fn, render_fn, val_batch, loss_params,
                    cfg.render_chunk,
                )
                logger.log(
                    "val", epoch=epoch, step=step, loss=val_loss,
                    psnr=psnr_v, ssim=ssim_v,
                )

        if losses:
            mean_losses.append(float(np.mean(losses)))
        if cfg.save_root is not None and epoch % cfg.epochs_save == 0:
            path = save_checkpoint(cfg.save_root, cfg.run_name, epoch, state)
            logger.log("checkpoint", epoch=epoch, path=path)

    return state, mean_losses


def validate(
    model, state: TrainState, encode_fn, render_fn, val_batch,
    loss_params: LossParams, chunk: int = 4096, src_view: int = 0,
    target_view: int = 1,
):
    """Full-image validation render of one held-out view (train.py:126-162)."""
    images = val_batch["images"]
    SB, NV, sl2, _ = images.shape
    sl = int(np.sqrt(sl2))
    rng = np.random.default_rng(0)
    src_images, src_poses, focal, c = select_source_views(
        rng, val_batch, 1, fixed_idx=[src_view]
    )
    variables = state.variables()
    cond = encode_fn(variables, src_images, src_poses, focal, c)

    tv = min(target_view, NV - 1)
    intr = jnp.asarray(val_batch["intrinsics"][:, tv])
    c2w = jnp.asarray(val_batch["cam2world"][:, tv])
    out = render_full_image(
        render_fn, variables, cond, intr, c2w, sl, jax.random.PRNGKey(0), chunk
    )
    gt = 0.5 * images[:, tv] + 0.5
    psnr_v, ssim_v = get_metrics(out, gt, fine=loss_params.loss_mode != "coarse")
    val_loss = float(loss_fn(out, jnp.asarray(gt), loss_params))
    return psnr_v, ssim_v, val_loss
