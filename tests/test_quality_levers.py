"""Quality-stabilizer levers: params-EMA, best-val checkpoints,
opacity-weighted depth consistency.

Round-3 measurement (PERF.md): the adaptive renderer's val PSNR swings
+-7 dB between consecutive 250-step evals while its train loss is smooth —
tiny parameter motion flips whether whole scenes' epsilon-bands land
on-surface.  These levers stabilize evaluation (EMA), stop the A/B from
evaluating end-of-run noise (best-val checkpoint), and give the marcher a
direct depth gradient when the photometric one goes flat (consistency
loss).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from avr_tpu.renderers.base import AdaptiveRendererConfig, RenderOutput
from avr_tpu.training import (
    FitConfig,
    LossParams,
    create_train_state,
    fit,
    loss_fn,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)
from tests.test_training import _init_state, _make_model, h5path  # noqa: F401


def _tiny_step_args(rng, SB=2, R=16, side=32):
    images = jnp.asarray(rng.normal(size=(SB, 1, side, side, 3)).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32) @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(
        np.float32
    )
    c2w[2, 3] = 1.3
    poses = jnp.asarray(np.broadcast_to(c2w, (SB, 1, 4, 4)).copy())
    model_input = {
        "x_pix": jnp.asarray(rng.uniform(0.1, 0.9, (SB, R, 2)).astype(np.float32)),
        "intrinsics": jnp.broadcast_to(
            jnp.asarray([[1.09, 0, 0.5], [0, 1.09, 0.5], [0, 0, 1]], jnp.float32),
            (SB, 3, 3),
        ),
        "cam2world": jnp.broadcast_to(jnp.asarray(c2w), (SB, R, 4, 4)),
    }
    gt = jnp.asarray(rng.uniform(size=(SB, R, 3)).astype(np.float32))
    return (images, poses, jnp.float32(35.0), jnp.asarray([16.0, 16.0]),
            model_input, gt, jax.random.PRNGKey(7))


def test_ema_tracks_params_and_checkpoints():
    model = _make_model(AdaptiveRendererConfig(raymarch_steps=2, n_coarse=4))
    tx = optax.adam(1e-2)
    images = jnp.zeros((2, 1, 32, 32, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (2, 1, 4, 4))
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, jnp.float32(35.0),
        jnp.asarray([16.0, 16.0]), method=model.init_all,
    )
    state = create_train_state(variables, tx, ema=True)
    assert state.ema_params is not None
    # at init the EMA equals the params
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step = make_train_step(model, tx, LossParams(loss_mode="both"),
                           donate=False, ema_decay=0.5)
    args = _tiny_step_args(np.random.default_rng(0))
    s1, _ = step(state, *args)
    s2, _ = step(s1, *args)

    # ema = 0.5*ema + 0.5*params each step -> lags params but moves
    p0 = jax.tree.leaves(state.params)
    p2 = jax.tree.leaves(s2.params)
    e2 = jax.tree.leaves(s2.ema_params)
    moved = changed = 0
    for a0, a2, m2 in zip(p0, p2, e2):
        if np.allclose(np.asarray(a0), np.asarray(a2)):
            continue
        changed += 1
        # EMA strictly between init and current params elementwise-mean
        d_full = np.abs(np.asarray(a2) - np.asarray(a0)).mean()
        d_ema = np.abs(np.asarray(m2) - np.asarray(a0)).mean()
        if 0 < d_ema < d_full:
            moved += 1
    assert changed > 0 and moved > changed // 2

    # eval_variables prefers the EMA
    assert s2.eval_variables()["params"] is s2.ema_params


def test_ema_checkpoint_roundtrip(tmp_path):
    model = _make_model(AdaptiveRendererConfig(raymarch_steps=2, n_coarse=4))
    tx = optax.adam(1e-3)
    state = _init_state(model, tx)
    state = create_train_state({"params": state.params}, tx, ema=True)
    state = state.replace(
        ema_params=jax.tree.map(lambda x: x + 0.25, state.ema_params)
    )
    save_checkpoint(str(tmp_path), "ema", 1, state)
    template = create_train_state({"params": state.params}, tx, ema=True)
    restored = restore_checkpoint(str(tmp_path), "ema", 1, template)
    for a, b in zip(
        jax.tree.leaves(state.ema_params), jax.tree.leaves(restored.ema_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_pre_ema_checkpoint_seeds_ema_from_params(tmp_path):
    """Resuming an ema run from a checkpoint that predates EMA seeds the
    average from the restored params (not the template's fresh init)."""
    model = _make_model(AdaptiveRendererConfig(raymarch_steps=2, n_coarse=4))
    tx = optax.adam(1e-3)
    state = _init_state(model, tx)  # no EMA
    state = state.replace(params=jax.tree.map(lambda x: x + 1.0, state.params))
    save_checkpoint(str(tmp_path), "noeema", 1, state)
    template = create_train_state(
        {"params": jax.tree.map(lambda x: x * 0.0, state.params)}, tx, ema=True
    )
    with pytest.warns(UserWarning):
        restored = restore_checkpoint(str(tmp_path), "noeema", 1, template)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.ema_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_fit_saves_best_val_checkpoint(tmp_path, h5path):  # noqa: F811
    from avr_tpu.data.dataset import SceneClassDataset
    import os

    model = _make_model(AdaptiveRendererConfig(raymarch_steps=2, n_coarse=4))
    tx = optax.adam(1e-4)
    state = _init_state(model, tx)
    dset = SceneClassDataset(h5path, img_sidelength=32, samples_per_instance=2)
    cfg = FitConfig(
        epochs=4, batch_size=2, ray_batch_size=64, steps_print=1, steps_val=2,
        epochs_save=10**9, save_root=str(tmp_path), run_name="bestrun",
        render_chunk=256,
    )
    fit(model, state, tx, dset, dset, LossParams(loss_mode="both"), cfg)
    best = os.path.join(
        str(tmp_path), "checkpoints", "experiments", "bestrun_best"
    )
    assert os.path.isdir(best), "no best-val checkpoint written"


def test_depth_consistency_loss_value_and_gradient():
    SB, R = 1, 4
    rgb = jnp.zeros((SB, R, 3))
    d_marched = jnp.asarray([[0.9, 1.1, 1.0, 1.4]]).reshape(SB, R, 1)
    d_integral = jnp.asarray([[1.0, 1.0, 1.0, 1.0]]).reshape(SB, R, 1)
    acc = jnp.asarray([[1.0, 0.5, 0.0, 0.0]]).reshape(SB, R, 1)

    params = LossParams(loss_mode="coarse", depth_consistency=2.0)
    gt = jnp.zeros((SB, R, 3))

    def f(dm):
        out = RenderOutput(rgb, rgb, dm, d_integral, acc)
        return loss_fn(out, gt, params)

    base = LossParams(loss_mode="coarse")
    out0 = RenderOutput(rgb, rgb, d_marched, d_integral, acc)
    extra = float(f(d_marched) - loss_fn(out0, gt, base))
    # 2.0 * mean(acc * err^2): errs (0.1, 0.1, 0, 0.4), acc (1, .5, 0, 0)
    expect = 2.0 * np.mean([1.0 * 0.01, 0.5 * 0.01, 0.0, 0.0])
    np.testing.assert_allclose(extra, expect, rtol=1e-5)

    g = jax.grad(f)(d_marched)
    g = np.asarray(g).ravel()
    assert g[0] != 0 and g[1] != 0  # opacity-carrying rays pull the marcher
    assert g[2] == 0 and g[3] == 0  # empty bands contribute nothing


def test_depth_consistency_requires_acc():
    out = RenderOutput(
        jnp.zeros((1, 4, 3)), jnp.zeros((1, 4, 3)), jnp.zeros((1, 4, 1)),
        jnp.zeros((1, 4, 1)), None,
    )
    with pytest.raises(ValueError, match="acc"):
        loss_fn(out, jnp.zeros((1, 4, 3)),
                LossParams(loss_mode="both", depth_consistency=1.0))


def test_adaptive_render_produces_acc():
    from tests.test_renderers import shell_field, _rays
    from avr_tpu.renderers.adaptive import render_adaptive

    xy, K, c2w = _rays(R=8)
    field = shell_field(1.2, 0.05, 500.0, (0.8, 0.3, 0.1), (0.0, 0.0, 1.3))

    # minimal stand-ins for the march pieces: fixed-distance march
    cfg = AdaptiveRendererConfig(raymarch_steps=1, n_coarse=6, epsilon=0.3)
    out = render_adaptive(
        cfg, jax.random.PRNGKey(0), field, None, None, None, xy, K, c2w,
        march_fn=lambda key, ros, rds: ros + 1.2 * rds,
    )
    assert out.acc is not None and out.acc.shape == out.depth_fine.shape
    a = np.asarray(out.acc)
    assert np.all(a >= -1e-5) and np.all(a <= 1.0 + 1e-5)
    assert a.max() > 0.5  # bands centered on the shell actually hit it
