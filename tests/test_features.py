"""Tests for remat, early-termination marching, and the prefetch pipeline."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from avr_tpu.config import parse_conf_string
from avr_tpu.data.dataset import SceneClassDataset
from avr_tpu.data.prefetch import PrefetchPipeline
from avr_tpu.data.synthetic import write_synthetic_hdf5
from avr_tpu.models.pixelnerf import ModelConfig
from avr_tpu.models.wrapper import RadFieldRenderer
from avr_tpu.renderers.base import AdaptiveRendererConfig, VolumeRendererConfig
from avr_tpu.renderers.raymarch import lstm_march
from avr_tpu.utils.geometry import get_world_rays
from tests.test_models import MODEL_CONF, _encode_inputs
from tests.test_renderers import _rays


def _model(renderer_cfg, **kw):
    conf = parse_conf_string(MODEL_CONF)["model"]
    cfg = ModelConfig.from_conf(conf)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    return RadFieldRenderer(model_cfg=cfg, renderer_cfg=renderer_cfg, **kw)


def test_remat_matches_non_remat(rng):
    rcfg = VolumeRendererConfig(n_coarse=8, n_fine=4, n_fine_depth=2)
    m0 = _model(rcfg, remat_field=False)
    m1 = _model(rcfg, remat_field=True)
    images, poses, focal, c = _encode_inputs(rng, H=32, W=32)
    variables = m0.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=m0.init_all
    )
    xy, K, c2w = _rays(R=8)
    key = jax.random.PRNGKey(1)

    def loss(m, v):
        cond = m.apply(v, images, poses, focal, c, method=m.encode)
        out = m.apply(v, cond, xy, K, c2w, key, method=m.render)
        return jnp.mean(out.rgb_fine**2)

    l0, g0 = jax.value_and_grad(lambda v: loss(m0, v))(variables)
    l1, g1 = jax.value_and_grad(lambda v: loss(m1, v))(variables)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_early_stop_freezes_converged_rays():
    xy, K, c2w = _rays(R=8)
    ros, rds = get_world_rays(xy, K, c2w)

    def features(xyz, viewdirs):
        return jnp.zeros((1, 1, xyz.shape[1], 4), jnp.float32)

    calls = {"n": 0}

    def cell(v, state):
        return state

    # head that always proposes a tiny step -> all rays converge at step 1
    def tiny_head(h):
        return jnp.full(h.shape[:-1] + (1,), 1e-4, jnp.float32)

    kwargs = dict(steps=6, hidden_size=4, init_mean=1.0, init_std=0.0)
    frozen = lstm_march(
        jax.random.PRNGKey(0), features, cell, tiny_head, ros, rds,
        early_stop_eps=1e-2, **kwargs,
    )
    free = lstm_march(
        jax.random.PRNGKey(0), features, cell, tiny_head, ros, rds,
        early_stop_eps=0.0, **kwargs,
    )
    d_frozen = np.asarray(jnp.sum((frozen - ros) * rds, -1))
    d_free = np.asarray(jnp.sum((free - ros) * rds, -1))
    # frozen: the converging first step still moves (1e-4), then the ray is
    # frozen for the remaining 5 steps; free: all 6 steps move
    np.testing.assert_allclose(d_frozen, 1.0 + 1e-4, atol=1e-6)
    np.testing.assert_allclose(d_free, 1.0 + 6e-4, atol=1e-6)


def test_early_stop_zero_is_reference_exact(rng):
    # eps=0 must produce bit-identical coords to the original path
    xy, K, c2w = _rays(R=4)
    ros, rds = get_world_rays(xy, K, c2w)

    def features(xyz, viewdirs):
        return jnp.broadcast_to(
            jnp.sum(xyz, axis=-1, keepdims=True), (1, xyz.shape[1], 4)
        )[None]

    from avr_tpu.renderers.lstm import MarchLSTMCell

    cellm = MarchLSTMCell(hidden_size=4)
    cp = cellm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 4)),
        (jnp.zeros((1, 4, 4)), jnp.zeros((1, 4, 4))),
    )
    cell = lambda v, s: cellm.apply(cp, v, s)
    head = lambda h: jnp.sum(h, -1, keepdims=True) * 0.05
    out = lstm_march(
        jax.random.PRNGKey(1), features, cell, head, ros, rds,
        steps=4, hidden_size=4, early_stop_eps=0.0,
    )
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.fixture(scope="module")
def h5path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "pf.hdf5"
    return write_synthetic_hdf5(str(path), num_instances=3, num_views=4, side=32)


def test_prefetch_pipeline_yields_all_batches(h5path):
    dset = SceneClassDataset(h5path, img_sidelength=32, samples_per_instance=2)
    pipe = PrefetchPipeline(dset, batch_size=1, ray_batch_size=32)
    items = list(pipe.epoch(epoch_seed=0, start_step=7))
    assert len(items) == 3
    assert [gstep for gstep, _ in items] == [7, 8, 9]
    src_images, src_poses, focal, c, model_input, gt = items[0][1]
    assert src_images.shape == (1, 1, 32, 32, 3)
    assert model_input["x_pix"].shape == (1, 32, 2)
    assert gt.shape == (1, 32, 3)


def test_prefetch_pipeline_matches_synchronous_assembly(h5path):
    """The threaded stream must be bitwise identical to synchronous assembly
    (deterministic per-step RNG from (seed, global step))."""
    from avr_tpu.training.loop import assemble_step_inputs, step_rng

    dset = SceneClassDataset(h5path, img_sidelength=32, samples_per_instance=2)
    pipe = PrefetchPipeline(dset, batch_size=1, ray_batch_size=32, seed=3)
    got = list(pipe.epoch(epoch_seed=5, start_step=10))

    want_batches = list(dset.batches(1, shuffle=True, epoch_seed=5))
    assert len(got) == len(want_batches)
    for (gstep, inputs), batch, i in zip(got, want_batches, range(len(got))):
        assert gstep == 10 + i
        want = assemble_step_inputs(step_rng(3, gstep), batch, 32)
        for a, b in zip(inputs, want):
            if isinstance(a, dict):
                for k in a:
                    np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
            else:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prefetch_pipeline_skip_resumes_stream(h5path):
    dset = SceneClassDataset(h5path, img_sidelength=32, samples_per_instance=2)
    pipe = PrefetchPipeline(dset, batch_size=1, ray_batch_size=32)
    full = list(pipe.epoch(epoch_seed=1, start_step=0))
    tail = list(pipe.epoch(epoch_seed=1, start_step=0, skip=2))
    assert [g for g, _ in tail] == [g for g, _ in full[2:]]
    np.testing.assert_array_equal(
        np.asarray(tail[0][1][5]), np.asarray(full[2][1][5])
    )


def test_prefetch_pipeline_propagates_errors(h5path):
    dset = SceneClassDataset(h5path, img_sidelength=32, samples_per_instance=2)
    pipe = PrefetchPipeline(dset, batch_size=1, ray_batch_size=32)

    def boom(batch, gstep):
        raise RuntimeError("boom")

    pipe._assemble = boom
    with pytest.raises(RuntimeError, match="boom"):
        list(pipe.epoch(epoch_seed=0))
