"""Device-resident dataset mode (avr_tpu/data/device.py).

The sampler must reproduce the host pipeline's batch *contents* exactly
for given indices (gathers are just indexing) and its distributions
(uniform over instances / views / (view, pixel) ray ids — reference
train.py:60-78 semantics), and fit() must train end to end with it.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from avr_tpu.data.dataset import SceneClassDataset
from avr_tpu.data.device import build_device_dataset, make_device_sampler
from avr_tpu.data.synthetic import write_synthetic_hdf5


@pytest.fixture(scope="module")
def h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("dd") / "train.hdf5"
    write_synthetic_hdf5(str(path), num_instances=6, num_views=5, side=16,
                         seed=0)
    return str(path)


@pytest.fixture(scope="module")
def dd(h5):
    dset = SceneClassDataset(h5, samples_per_instance=3)
    return build_device_dataset(dset), dset


def test_shapes_and_ranges(dd):
    data, dset = dd
    assert data.images.shape == (6, 5, 256, 3)
    assert data.poses.shape == (6, 5, 4, 4)
    assert data.intrinsics.shape == (6, 3, 3)
    assert data.x_pix.shape == (256, 2)
    # images stored in the dataset's [-1, 1] convention
    assert float(jnp.min(data.images)) >= -1.0 - 1e-6
    assert float(jnp.max(data.images)) <= 1.0 + 1e-6


def test_device_arrays_match_host_observations(dd):
    """The uploaded arrays are exactly the host dataset's observations."""
    data, dset = dd
    inst = dset.all_instances[3]
    obs = inst[2]
    np.testing.assert_array_equal(np.asarray(data.images[3, 2]), obs["images"])
    np.testing.assert_array_equal(np.asarray(data.poses[3, 2]), obs["cam2world"])
    np.testing.assert_array_equal(
        np.asarray(data.intrinsics[3]), obs["intrinsics"]
    )
    np.testing.assert_array_equal(np.asarray(data.x_pix), obs["x_pix"])


def test_sampler_batch_is_consistent_indexing(dd):
    """Every field of a sampled batch equals manual indexing of the device
    arrays at the same (instance, view, pixel) draws — i.e. the sampler is
    pure gathering, with gt rescaled to [0, 1] like the host path."""
    data, _ = dd
    SB, R, NS = 2, 64, 2
    sample = make_device_sampler(data, SB, R, num_source_views=NS)
    key = jax.random.PRNGKey(11)
    src_images, src_poses, focal, c, model_input, gt = jax.jit(sample)(key)

    assert src_images.shape == (SB, NS, 16, 16, 3)
    assert src_poses.shape == (SB, NS, 4, 4)
    assert model_input["x_pix"].shape == (SB, R, 2)
    assert model_input["cam2world"].shape == (SB, R, 4, 4)
    assert model_input["intrinsics"].shape == (SB, 3, 3)
    assert gt.shape == (SB, R, 3)
    assert float(jnp.min(gt)) >= 0.0 and float(jnp.max(gt)) <= 1.0

    # recover the draws by matching gt against the images table: for each
    # ray, cam2world must belong to the same (instance, view) whose image
    # produced the gt pixel
    images = np.asarray(data.images)
    poses = np.asarray(data.poses)
    gt_np = np.asarray(gt)
    c2w_np = np.asarray(model_input["cam2world"])
    x_pix_np = np.asarray(model_input["x_pix"])
    grid = np.asarray(data.x_pix)
    for s in range(SB):
        for r in range(0, R, 7):
            raw = gt_np[s, r] * 2.0 - 1.0
            # pixel id from x_pix (grid rows are unique)
            pix = int(np.argmin(np.abs(grid - x_pix_np[s, r]).sum(-1)))
            hits = np.argwhere(
                np.all(np.abs(images[:, :, pix] - raw) < 1e-6, axis=-1)
            )
            assert len(hits) >= 1
            # at least one hit's pose matches the ray's cam2world
            ok = any(
                np.allclose(poses[i, v], c2w_np[s, r], atol=1e-7)
                for i, v in hits
            )
            assert ok, f"ray ({s},{r}): cam2world does not match gt's view"


def test_sampler_covers_all_instances_views_pixels(dd):
    data, _ = dd
    sample = make_device_sampler(data, 4, 128, num_source_views=1)
    seen_pix = np.zeros(256, bool)
    seen_src = set()
    for i in range(40):
        src_images, _, _, _, mi, _ = sample(jax.random.PRNGKey(i))
        grid = np.asarray(data.x_pix)
        xp = np.asarray(mi["x_pix"]).reshape(-1, 2)
        ids = np.argmin(
            np.abs(grid[None] - xp[:, None]).sum(-1), axis=1
        )
        seen_pix[ids] = True
        seen_src.add(float(jnp.sum(src_images)))
    assert seen_pix.all(), "some pixels never sampled in 20k draws"
    assert len(seen_src) > 30, "source-view draws look degenerate"


def test_fit_device_data_trains(dd, tmp_path):
    """fit(device_data=True) runs end to end and losses stay finite."""
    import dataclasses

    from avr_tpu.config import parse_conf_string
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig
    from avr_tpu.training import (
        FitConfig, LossParams, create_train_state, fit,
    )
    from tests.test_models import MODEL_CONF

    data, dset = dd
    conf = parse_conf_string(MODEL_CONF)["model"]
    cfg = ModelConfig.from_conf(conf)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    model = RadFieldRenderer(
        model_cfg=cfg,
        renderer_cfg=AdaptiveRendererConfig(raymarch_steps=2, n_coarse=4),
    )
    side = 16
    images = jnp.zeros((1, 1, side, side, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, jnp.float32(side),
        jnp.asarray([side / 2, side / 2], jnp.float32),
        method=model.init_all,
    )
    tx = optax.adam(1e-4)
    state = create_train_state(variables, tx)
    fit_cfg = FitConfig(
        epochs=2, batch_size=2, ray_batch_size=32, steps_print=1,
        steps_val=1000, device_data=True, prefetch=0,
    )
    state, losses = fit(
        model, state, tx, dset, None, LossParams(loss_mode="both"), fit_cfg
    )
    assert np.isfinite(losses).all()
    assert int(state.step) == 2 * max(dset.num_instances // 2, 1)


def test_fit_device_data_rejects_bbox_and_mesh(dd):
    from avr_tpu.training import FitConfig, LossParams, fit
    from avr_tpu.parallel import make_mesh

    data, dset = dd
    with pytest.raises(ValueError, match="bbox"):
        fit(None, None, None, dset, None, LossParams(),
            FitConfig(device_data=True, with_bbox=True))
    with pytest.raises(ValueError, match="single-chip"):
        fit(None, None, None, dset, None, LossParams(),
            FitConfig(device_data=True), mesh=make_mesh((2, 4)))
