"""Training-loop tests: smoke training on the synthetic dataset.

The must-pass bar: a tiny model trained for a few dozen steps on the
synthetic sphere scenes must *reduce the loss* and produce a finite
full-image validation render.  Checkpoint round-trips restore exactly.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from avr_tpu.config import parse_conf_string
from avr_tpu.data.dataset import SceneClassDataset
from avr_tpu.models.pixelnerf import ModelConfig
from avr_tpu.models.wrapper import RadFieldRenderer
from avr_tpu.renderers.base import AdaptiveRendererConfig, VolumeRendererConfig
from avr_tpu.training import (
    FitConfig,
    LossParams,
    create_train_state,
    fit,
    restore_checkpoint,
    save_checkpoint,
    validate,
    make_encode_fn,
    make_render_fn,
)
from avr_tpu.data.synthetic import write_synthetic_hdf5
from tests.test_models import MODEL_CONF


@pytest.fixture(scope="module")
def h5path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "train.hdf5"
    return write_synthetic_hdf5(str(path), num_instances=3, num_views=6, side=32)


def _make_model(renderer_cfg):
    conf = parse_conf_string(MODEL_CONF)["model"]
    cfg = ModelConfig.from_conf(conf)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    return RadFieldRenderer(model_cfg=cfg, renderer_cfg=renderer_cfg)


def _init_state(model, tx, sb=2, ns=1, side=32):
    images = jnp.zeros((sb, ns, side, side, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (sb, ns, 4, 4))
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, jnp.float32(35.0),
        jnp.asarray([16.0, 16.0]), method=model.init_all,
    )
    return create_train_state(variables, tx)


def test_smoke_training_reduces_loss(h5path):
    model = _make_model(VolumeRendererConfig(n_coarse=12, n_fine=6, n_fine_depth=3))
    tx = optax.adam(5e-4)
    state = _init_state(model, tx)
    dset = SceneClassDataset(h5path, img_sidelength=32, samples_per_instance=4)
    cfg = FitConfig(
        epochs=16, batch_size=2, ray_batch_size=128, steps_print=1,
        steps_val=10**9, epochs_save=10**9,
    )
    state, losses = fit(
        model, state, tx, dset, None, LossParams(loss_mode="both"), cfg
    )
    assert len(losses) >= 8
    early = np.mean(losses[:3])
    late = np.mean(losses[-3:])
    assert np.isfinite(late)
    assert late < early, f"loss did not decrease: {early} -> {late}"


def test_validation_full_image(h5path):
    model = _make_model(AdaptiveRendererConfig(raymarch_steps=2, n_coarse=4))
    tx = optax.adam(1e-4)
    state = _init_state(model, tx)
    dset = SceneClassDataset(h5path, img_sidelength=32, samples_per_instance=2)
    batch = next(dset.batches(1))
    psnr_v, ssim_v, val_loss = validate(
        model, state, make_encode_fn(model), make_render_fn(model), batch,
        LossParams(loss_mode="both"), chunk=256,
    )
    assert np.isfinite(psnr_v) and np.isfinite(val_loss)
    assert -1.0 <= ssim_v <= 1.0


def test_checkpoint_roundtrip(tmp_path, h5path):
    model = _make_model(VolumeRendererConfig(n_coarse=4, n_fine=2, n_fine_depth=1))
    tx = optax.adam(1e-4)
    state = _init_state(model, tx)
    save_checkpoint(str(tmp_path), "ckpt_test", 3, state)

    # perturb, then restore
    perturbed = state.replace(
        params=jax.tree.map(lambda x: x + 1.0, state.params),
        step=state.step + 100,
    )
    restored = restore_checkpoint(str(tmp_path), "ckpt_test", 3, perturbed)
    orig_leaves = jax.tree.leaves(state.params)
    rest_leaves = jax.tree.leaves(restored.params)
    for a, b in zip(orig_leaves, rest_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_restore_missing_checkpoint_warns_not_crashes(tmp_path):
    model = _make_model(VolumeRendererConfig(n_coarse=4, n_fine=2, n_fine_depth=1))
    tx = optax.adam(1e-4)
    state = _init_state(model, tx)
    with pytest.warns(UserWarning):
        out = restore_checkpoint(str(tmp_path), "missing", 0, state)
    assert out is state


def test_restore_optimizer_drift_keeps_params_and_warns(tmp_path):
    """A checkpoint saved with a different optimizer wrapper restores
    params/step (fresh opt init) with an explicit warning — the reference
    restarts Adam on resume anyway (train.py:277-278)."""
    from avr_tpu.training import make_optimizer

    model = _make_model(VolumeRendererConfig(n_coarse=4, n_fine=2, n_fine_depth=1))
    state = _init_state(model, optax.adam(1e-4))
    save_checkpoint(str(tmp_path), "drift", 1, state)

    tx2 = make_optimizer(1e-4)  # apply_if_finite wrapper: different opt tree
    template = _init_state(model, tx2).replace(
        params=jax.tree.map(lambda x: x + 1.0, state.params)
    )
    with pytest.warns(UserWarning, match="optimizer state"):
        restored = restore_checkpoint(str(tmp_path), "drift", 1, template)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # opt state keeps the template's fresh apply_if_finite structure
    assert type(restored.opt_state) is type(template.opt_state)


def test_restore_wrong_model_checkpoint_raises(tmp_path):
    """A wrong-model checkpoint must raise, not silently partial-restore:
    the fallback path only forgives *optimizer-state* drift and validates
    the params structure against the template (ADVICE round 3)."""
    from avr_tpu.training import make_optimizer

    model_a = _make_model(VolumeRendererConfig(n_coarse=4, n_fine=2, n_fine_depth=1))
    state_a = _init_state(model_a, optax.adam(1e-4))
    save_checkpoint(str(tmp_path), "wrongmodel", 1, state_a)

    # different params structure (decoder-less raymarcher model) AND a
    # different optimizer wrapper, so the template restore fails and the
    # fallback path must notice the params mismatch
    from avr_tpu.renderers.base import RaymarcherConfig

    model_b = _make_model(RaymarcherConfig(raymarch_steps=2))
    template = _init_state(model_b, make_optimizer(1e-4))
    with pytest.raises(ValueError, match="structure does not match"):
        restore_checkpoint(str(tmp_path), "wrongmodel", 1, template)


def test_ray_chunked_step_matches_unchunked(monkeypatch):
    """ray_chunks=N accumulates to the same update as the monolithic step.

    The chunked step draws per-chunk RNG, so the samplers are pinned to
    shape-independent constants; per-ray work is otherwise independent and
    the grads must agree up to fp32 summation order
    (avr_tpu/training/step.py ray_chunks)."""
    import jax.numpy as jnp
    from avr_tpu.training import make_train_step

    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape=(), dtype=jnp.float32, **kw: jnp.full(shape, 0.43, dtype),
    )
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32, **kw: jnp.zeros(shape, dtype),
    )

    model = _make_model(VolumeRendererConfig(n_coarse=6, n_fine=4, n_fine_depth=2))
    tx = optax.adam(5e-4)
    state0 = _init_state(model, tx)

    rng = np.random.default_rng(5)
    SB, R, side = 2, 16, 32
    images = jnp.asarray(rng.normal(size=(SB, 1, side, side, 3)).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32) @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    c2w[2, 3] = 1.3
    poses = jnp.asarray(np.broadcast_to(c2w, (SB, 1, 4, 4)).copy())
    focal = jnp.float32(35.0)
    c = jnp.asarray([16.0, 16.0])
    model_input = {
        "x_pix": jnp.asarray(rng.uniform(0.1, 0.9, (SB, R, 2)).astype(np.float32)),
        "intrinsics": jnp.broadcast_to(
            jnp.asarray([[1.09, 0, 0.5], [0, 1.09, 0.5], [0, 0, 1]], jnp.float32),
            (SB, 3, 3),
        ),
        "cam2world": jnp.broadcast_to(jnp.asarray(c2w), (SB, R, 4, 4)),
    }
    gt = jnp.asarray(rng.uniform(size=(SB, R, 3)).astype(np.float32))
    args = (images, poses, focal, c, model_input, gt, jax.random.PRNGKey(7))

    outs = {}
    for chunks in (1, 4):
        step = make_train_step(
            model, tx, LossParams(loss_mode="both"), donate=False,
            ray_chunks=chunks,
        )
        new_state, metrics = step(state0, *args)
        outs[chunks] = (new_state, metrics)

    l1 = float(outs[1][1]["loss"])
    l4 = float(outs[4][1]["loss"])
    np.testing.assert_allclose(l4, l1, rtol=1e-5)
    leaves1 = jax.tree.leaves(outs[1][0].params)
    leaves4 = jax.tree.leaves(outs[4][0].params)
    # chunked and unchunked differ by fp32 summation order, and Adam's
    # 1/sqrt(v) amplifies that for near-zero grads — observed worst case
    # ~3e-4 relative on 1/9408 elements (ordering-dependent XLA fusion
    # made this flake at 2e-4).  A real accumulation bug (wrong scale,
    # missing chunk) is orders of magnitude larger.
    for a, b in zip(leaves1, leaves4):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5
        )


def test_volume_sort_key_is_pure_permutation(monkeypatch):
    """render_volume with a point-level sort_key_fn returns identical
    outputs: the permutation is applied before the field query and
    inverted after (renderers/volume.py _query)."""
    import jax.numpy as jnp
    from avr_tpu.renderers.volume import render_volume
    from tests.test_renderers import shell_field, _rays

    xy, K, c2w = _rays(R=16)
    field = shell_field(1.2, 0.05, 500.0, (0.8, 0.3, 0.1), (0.0, 0.0, 1.3))
    cfg = VolumeRendererConfig(n_coarse=8, n_fine=4, n_fine_depth=2)

    base = render_volume(cfg, jax.random.PRNGKey(3), field, xy, K, c2w)
    sorted_out = render_volume(
        cfg, jax.random.PRNGKey(3), field, xy, K, c2w,
        sort_key_fn=lambda pts: pts[..., 1] * 7.0 + pts[..., 0],
    )
    for a, b in zip(base, sorted_out):
        if a is None:
            assert b is None
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nonfinite_batch_skips_update_and_training_survives():
    """make_optimizer reproduces the reference NaN-guard *semantics*.

    The reference rebinds a NaN loss to the float 1e-6
    (/root/reference/utils.py:372-373), which detaches the torch graph:
    a NaN batch steps nothing and training continues.  A jnp.where loss
    guard alone cannot do that (0 * NaN = NaN flows into the params), so
    the production optimizer skips non-finite updates instead.  A NaN
    batch must (a) leave params AND Adam moments bitwise unchanged,
    (b) bump the notfinite counter, and (c) not poison the next step.
    """
    from avr_tpu.training import make_optimizer, make_train_step

    model = _make_model(VolumeRendererConfig(n_coarse=4, n_fine=2, n_fine_depth=0))
    tx = make_optimizer(1e-3)
    state0 = _init_state(model, tx)
    # make the raw sigma exactly +1 everywhere: at init relu(sigma_raw) is
    # dead (pure white background -> ALL grads exactly zero), and a mere
    # bias shift is swamped by the untrained latent features' magnitude
    params = jax.tree.map(lambda x: x, state0.params)  # shallow copy
    for head in ("mlp_coarse", "mlp_fine"):
        lin = params["net"][head]["lin_out"]
        lin["kernel"] = jnp.zeros_like(lin["kernel"])
        lin["bias"] = jnp.asarray([0.0, 0.0, 0.0, 1.0], lin["bias"].dtype)
    state0 = state0.replace(params=params)
    step = make_train_step(model, tx, LossParams(loss_mode="both"), donate=False)

    rng = np.random.default_rng(3)
    SB, R, side = 2, 8, 32
    images = jnp.asarray(rng.normal(size=(SB, 1, side, side, 3)).astype(np.float32))
    c2w = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
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
    gt_good = jnp.asarray(rng.uniform(size=(SB, R, 3)).astype(np.float32))
    gt_bad = gt_good.at[0, 0, 0].set(jnp.nan)  # NaN loss -> NaN grads
    args = lambda gt: (
        images, poses, jnp.float32(35.0), jnp.asarray([16.0, 16.0]),
        model_input, gt, jax.random.PRNGKey(7),
    )

    state1, m1 = step(state0, *args(gt_bad))
    # loss reported through the reference guard; update skipped entirely
    np.testing.assert_allclose(float(m1["loss"]), 1e-6, rtol=1e-6)
    assert int(m1["notfinite"]) == 1
    for a, b in zip(jax.tree.leaves(state0.params), jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state2, m2 = step(state1, *args(gt_good))
    assert int(m2["notfinite"]) == 1  # total count, not consecutive
    assert np.isfinite(float(m2["loss"])) and float(m2["loss"]) > 1e-5
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)
        )
    )
    assert changed, "good batch after a skipped one must update params"
    assert all(
        np.isfinite(np.asarray(p)).all() for p in jax.tree.leaves(state2.params)
    )


def test_chunked_call_step_matches_monolithic(monkeypatch):
    """The N+2-dispatch chunked step (make_chunked_call_train_step) equals
    the monolithic ray_chunks scan step up to fp32 summation order (same
    per-chunk RNG streams, same accumulate-then-pullback math)."""
    import jax.numpy as jnp
    from avr_tpu.training import make_chunked_call_train_step, make_train_step

    monkeypatch.setattr(
        jax.random, "uniform",
        lambda key, shape=(), dtype=jnp.float32, **kw: jnp.full(shape, 0.43, dtype),
    )
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32, **kw: jnp.zeros(shape, dtype),
    )

    model = _make_model(VolumeRendererConfig(n_coarse=6, n_fine=4, n_fine_depth=2))
    tx = optax.adam(5e-4)
    state0 = _init_state(model, tx)
    # sigma alive (see test_nonfinite_batch_skips_update...): dead relu at
    # init makes every grad exactly zero and the comparison vacuous
    params = jax.tree.map(lambda x: x, state0.params)
    for head in ("mlp_coarse", "mlp_fine"):
        lin = params["net"][head]["lin_out"]
        lin["kernel"] = jnp.zeros_like(lin["kernel"])
        lin["bias"] = jnp.asarray([0.0, 0.0, 0.0, 1.0], lin["bias"].dtype)
    state0 = state0.replace(params=params)

    rng = np.random.default_rng(5)
    SB, R, side = 2, 16, 32
    images = jnp.asarray(rng.normal(size=(SB, 1, side, side, 3)).astype(np.float32))
    c2w = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
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
    args = (images, poses, jnp.float32(35.0), jnp.asarray([16.0, 16.0]),
            model_input, gt, jax.random.PRNGKey(7))

    scan_step = make_train_step(
        model, tx, LossParams(loss_mode="both"), donate=False, ray_chunks=4
    )
    call_step = make_chunked_call_train_step(
        model, tx, LossParams(loss_mode="both"), ray_chunks=4
    )
    s_scan, m_scan = scan_step(state0, *args)
    s_call, m_call = call_step(state0, *args)

    np.testing.assert_allclose(
        float(m_call["loss"]), float(m_scan["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_scan.params), jax.tree.leaves(s_call.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5
        )


def test_make_optimizer_schedules():
    """Cosine needs total_steps; warmup starts at lr/10; decay ends low."""
    from avr_tpu.training import make_optimizer

    with pytest.raises(ValueError):
        make_optimizer(1e-4, schedule="cosine")
    with pytest.raises(ValueError):
        make_optimizer(1e-4, schedule="nope")

    tx = make_optimizer(1e-3, schedule="cosine", total_steps=100)
    params = {"w": jnp.zeros(4)}
    s = tx.init(params)
    g = {"w": jnp.ones(4)}
    u0, s = tx.update(g, s, params)
    # step 0: warmup start = lr/10 (adam update magnitude ~= current lr)
    np.testing.assert_allclose(float(-u0["w"][0]), 1e-4, rtol=0.1)
    for _ in range(99):
        u, s = tx.update(g, s, params)
    # cosine end: lr/20
    np.testing.assert_allclose(float(-u["w"][0]), 5e-5, rtol=0.2)


def test_skip_nonfinite_by_norm_matches_apply_if_finite():
    """The grad-norm-gated guard (round-4 default) takes the same
    skip/apply decisions as optax.apply_if_finite and produces identical
    updates when applying."""
    from avr_tpu.training.state import skip_nonfinite_by_norm

    params = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([[3.0]])}
    g_good = {"a": jnp.asarray([0.1, -0.2]), "b": jnp.asarray([[0.3]])}
    g_nan = {"a": jnp.asarray([0.1, jnp.nan]), "b": jnp.asarray([[0.3]])}
    g_inf = {"a": jnp.asarray([0.1, -0.2]), "b": jnp.asarray([[jnp.inf]])}

    tx_norm = skip_nonfinite_by_norm(optax.adam(1e-2))
    tx_ref = optax.apply_if_finite(optax.adam(1e-2), 1000)
    s_n, s_r = tx_norm.init(params), tx_ref.init(params)

    for g, should_skip in ((g_good, False), (g_nan, True), (g_inf, True),
                           (g_good, False)):
        u_n, s_n = tx_norm.update(g, s_n, params)
        u_r, s_r = tx_ref.update(g, s_r, params)
        for a, b in zip(jax.tree.leaves(u_n), jax.tree.leaves(u_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8)
        if should_skip:
            for leaf in jax.tree.leaves(u_n):
                assert not np.any(np.asarray(leaf)), "skip must zero updates"
    assert int(s_n.total_notfinite) == 2
    assert int(s_r.total_notfinite) == 2
