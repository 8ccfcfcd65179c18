"""Driver-level mesh training + deterministic resume (VERDICT items 1, 9).

The production surface is ``cli.train`` / ``fit`` — these tests drive mesh
training through that path on the 8-device virtual CPU mesh and pin:

  * ``--mesh D,R`` reaches the sharded step (params stay fully replicated
    across the mesh, loss finite),
  * checkpoint-resume reproduces the original run bitwise (per-step RNG
    from (seed, global step), per-epoch data order from (seed, epoch)).
"""

import dataclasses
import os

import numpy as np
import jax
import optax
import pytest

from avr_tpu.config import parse_conf_string
from avr_tpu.data.dataset import SceneClassDataset
from avr_tpu.data.synthetic import write_synthetic_hdf5
from avr_tpu.models.pixelnerf import ModelConfig
from avr_tpu.models.wrapper import RadFieldRenderer
from avr_tpu.renderers.base import VolumeRendererConfig
from avr_tpu.training import (
    FitConfig,
    LossParams,
    create_train_state,
    fit,
    restore_checkpoint,
    save_checkpoint,
)
from tests.test_models import MODEL_CONF

TINY_CONF = MODEL_CONF + """
normal_renderer {
    near = 0.8
    far = 1.8
    n_coarse = 6
    n_fine = 3
    n_fine_depth = 2
    depth_std = 0.01
    white_back = True
}
raymarcher { num_feature_channels = 96 raymarch_steps = 2 }
adaptive_renderer {
    near = 0.8
    far = 1.8
    epsilon = 0.15
    n_coarse = 4
    num_feature_channels = 96
    raymarch_steps = 2
    white_back = True
}
"""


@pytest.fixture(scope="module")
def h5path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "mesh.hdf5"
    return write_synthetic_hdf5(str(path), num_instances=4, num_views=4, side=32)


def _make_model():
    conf = parse_conf_string(MODEL_CONF)["model"]
    cfg = ModelConfig.from_conf(conf)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    return RadFieldRenderer(
        model_cfg=cfg,
        renderer_cfg=VolumeRendererConfig(n_coarse=6, n_fine=3, n_fine_depth=2),
    )


def _init_state(model, tx, sb=2, ns=1, side=32):
    import jax.numpy as jnp

    images = jnp.zeros((sb, ns, side, side, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (sb, ns, 4, 4))
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, jnp.float32(35.0),
        jnp.asarray([16.0, 16.0]), method=model.init_all,
    )
    return create_train_state(variables, tx)


def test_cli_train_with_mesh_replicates_params(tmp_path, h5path):
    """python -m avr_tpu.cli.train --mesh 2,4 trains on the virtual mesh."""
    from avr_tpu.cli.train import main

    conf_path = tmp_path / "tiny.conf"
    conf_path.write_text(TINY_CONF)
    root = tmp_path / "run"
    os.makedirs(root / "logs", exist_ok=True)

    state = main([
        "--root_dir", str(root), "--loss_mode", "both",
        "--renderer", "VR_meshtest", "--starting_epoch", "0",
        "--data", str(h5path), "--sl", "16", "--batch_size", "2",
        "--ray_batch_size", "32", "--epochs", "1", "--epochs_save", "100",
        "--steps_val", "1000000", "--steps_print", "1",
        "--samples_per_instance", "2", "--norm_type", "group",
        "--mesh", "2,4", "--conf", str(conf_path),
    ])

    leaves = jax.tree.leaves(state.params)
    assert leaves, "no params"
    for leaf in leaves:
        assert leaf.sharding.is_fully_replicated
    assert int(state.step) == 2  # 4 instances / batch 2 = 2 steps
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # the training log landed (primary-host logging path)
    log = root / "logs" / "VR_meshtest.jsonl"
    assert log.exists() and "loss" in log.read_text()


def test_fit_mesh_divisibility_validation(h5path):
    from avr_tpu.parallel import make_mesh

    model = _make_model()
    tx = optax.adam(1e-4)
    state = _init_state(model, tx)
    dset = SceneClassDataset(h5path, img_sidelength=32, samples_per_instance=2)
    mesh = make_mesh((2, 4))
    with pytest.raises(ValueError, match="ray_batch_size"):
        fit(model, state, tx, dset, None, LossParams(),
            FitConfig(epochs=1, batch_size=2, ray_batch_size=30), mesh=mesh)


def test_fit_deterministic_checkpoint_resume(tmp_path, h5path):
    """Train 8 steps; separately train 4, checkpoint, restore, train 4 more:
    the resumed losses must equal the original run's bitwise."""
    tx = optax.adam(5e-4)
    dset = SceneClassDataset(h5path, img_sidelength=32, samples_per_instance=2)
    base = FitConfig(
        epochs=4, batch_size=2, ray_batch_size=64, steps_print=1,
        steps_val=10**9, epochs_save=10**9, seed=11,
    )

    # full run: 4 epochs x 2 steps
    model = _make_model()
    state = _init_state(model, tx)
    _, losses_full = fit(model, state, tx, dset, None, LossParams(), base)
    assert len(losses_full) == 4

    # half run + checkpoint
    model2 = _make_model()
    state2 = _init_state(model2, tx)
    state2, losses_a = fit(
        model2, state2, tx, dset, None, LossParams(),
        dataclasses.replace(base, epochs=2),
    )
    assert int(state2.step) == 4
    save_checkpoint(str(tmp_path), "resume_test", 2, state2)

    # restore into a fresh template and continue
    model3 = _make_model()
    template = _init_state(model3, tx)
    restored = restore_checkpoint(str(tmp_path), "resume_test", 2, template)
    assert int(restored.step) == 4
    _, losses_b = fit(
        model3, restored, tx, dset, None, LossParams(),
        dataclasses.replace(base, epochs=2),
    )

    np.testing.assert_array_equal(
        np.asarray(losses_a + losses_b), np.asarray(losses_full)
    )


def test_fit_prefetch_off_matches_on(h5path):
    """cfg.prefetch=0 (synchronous) and the threaded default produce the
    same loss stream."""
    tx = optax.adam(5e-4)
    dset = SceneClassDataset(h5path, img_sidelength=32, samples_per_instance=2)
    cfg = FitConfig(
        epochs=2, batch_size=2, ray_batch_size=64, steps_print=1,
        steps_val=10**9, epochs_save=10**9, seed=7,
    )
    model = _make_model()
    _, losses_pre = fit(
        model, _init_state(model, tx), tx, dset, None, LossParams(), cfg
    )
    model2 = _make_model()
    _, losses_sync = fit(
        model2, _init_state(model2, tx), tx, dset, None, LossParams(),
        dataclasses.replace(cfg, prefetch=0),
    )
    np.testing.assert_array_equal(np.asarray(losses_pre), np.asarray(losses_sync))
