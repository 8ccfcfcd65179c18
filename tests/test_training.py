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
