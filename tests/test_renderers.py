"""Renderer tests: analytic-field goldens, LSTM march mechanics, wrapper.

The strongest checks use an *analytic* radiance field (no network): a
closed-form density/colour whose expected render is computable, so the
whole ray->sample->integrate pipeline is validated end to end without
model weights.  Property tests mirror the reference's debug-mode
consistency check (dense grid vs adaptive band, reference
renderers.py:524-545).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avr_tpu.config import parse_conf_string
from avr_tpu.models.pixelnerf import ModelConfig
from avr_tpu.models.wrapper import RadFieldRenderer
from avr_tpu.renderers.base import (
    AdaptiveRendererConfig,
    RaymarcherConfig,
    VolumeRendererConfig,
    renderer_config_from_conf,
)
from avr_tpu.renderers.lstm import MarchLSTMCell, clamp_grad
from avr_tpu.renderers.raymarch import lstm_march
from avr_tpu.renderers.volume import render_volume
from avr_tpu.renderers.adaptive import render_adaptive
from avr_tpu.utils.geometry import get_world_rays
from tests.test_models import MODEL_CONF, _encode_inputs


# --------------------------- analytic fields ------------------------------


def constant_field(sigma_val, rgb_val):
    def field(xyz, viewdirs, coarse):
        SB, N, _ = xyz.shape
        rgb = jnp.broadcast_to(jnp.asarray(rgb_val, jnp.float32), (SB, N, 3))
        sig = jnp.full((SB, N, 1), sigma_val, jnp.float32)
        return jnp.concatenate([rgb, sig], axis=-1)

    return field


def shell_field(center_dist, thickness, sigma_val, rgb_val, origin):
    """Opaque spherical shell at |x - origin| = center_dist."""

    def field(xyz, viewdirs, coarse):
        SB, N, _ = xyz.shape
        r = jnp.linalg.norm(xyz - jnp.asarray(origin, jnp.float32), axis=-1)
        inside = (jnp.abs(r - center_dist) < thickness).astype(jnp.float32)
        sig = (sigma_val * inside)[..., None]
        rgb = jnp.broadcast_to(jnp.asarray(rgb_val, jnp.float32), (SB, N, 3))
        return jnp.concatenate([rgb, sig], axis=-1)

    return field


def _rays(SB=1, R=16, H=8, W=8):
    from avr_tpu.utils.geometry import get_opencv_pixel_coordinates

    rng = np.random.default_rng(1)
    xy = np.asarray(get_opencv_pixel_coordinates(H, W)).reshape(-1, 2)
    sel = rng.choice(xy.shape[0], size=R, replace=False)
    xy = jnp.asarray(np.broadcast_to(xy[sel], (SB, R, 2)).copy())
    K = jnp.broadcast_to(
        jnp.asarray([[1.09375, 0, 0.5], [0, 1.09375, 0.5], [0, 0, 1]], jnp.float32),
        (SB, 3, 3),
    )
    c2w = np.eye(4, dtype=np.float32) @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(
        np.float32
    )
    c2w[2, 3] = 1.3
    c2w = jnp.broadcast_to(jnp.asarray(c2w), (SB, R, 4, 4))
    return xy, K, c2w


# --------------------------- volume renderer ------------------------------


def test_volume_renderer_empty_scene_is_white():
    cfg = VolumeRendererConfig()
    xy, K, c2w = _rays()
    out = render_volume(cfg, jax.random.PRNGKey(0), constant_field(0.0, 0.3), xy, K, c2w)
    np.testing.assert_allclose(np.asarray(out.rgb_coarse), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rgb_fine), 1.0, atol=1e-5)


def test_volume_renderer_opaque_shell_color_and_depth():
    cfg = VolumeRendererConfig()
    xy, K, c2w = _rays()
    origin = (0.0, 0.0, 1.3)  # camera center: shell at ray-distance 1.2
    field = shell_field(1.2, 0.05, 500.0, (0.2, 0.5, 0.7), origin)
    out = render_volume(cfg, jax.random.PRNGKey(0), field, xy, K, c2w)
    got = np.asarray(out.rgb_fine)
    np.testing.assert_allclose(got, np.broadcast_to([0.2, 0.5, 0.7], got.shape), atol=0.02)
    # camera-z depth = 1.2 * |rd_z-component in cam frame| <= 1.2
    d = np.asarray(out.depth_fine)
    assert np.all(d < 1.25) and np.all(d > 1.0)


def test_volume_renderer_grads_flow_to_field():
    cfg = VolumeRendererConfig(n_coarse=8, n_fine=4, n_fine_depth=2)
    xy, K, c2w = _rays(R=4)

    def loss(s):
        out = render_volume(
            cfg, jax.random.PRNGKey(0), constant_field(s, 0.3), xy, K, c2w
        )
        return jnp.mean(out.rgb_fine**2)

    g = jax.grad(loss)(jnp.float32(1.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_renderer_name_dispatch():
    conf = parse_conf_string(
        """
        normal_renderer { near = 0.8
                          far = 1.8
                          n_coarse = 64
                          n_fine = 32
                          n_fine_depth = 16
                          depth_std = 0.01
                          white_back = True }
        raymarcher { num_feature_channels = 512
                     raymarch_steps = 10 }
        adaptive_renderer { num_feature_channels = 512
                            raymarch_steps = 10
                            epsilon = 0.15
                            n_coarse = 20
                            white_back = True }
        """
    )
    assert isinstance(renderer_config_from_conf(conf, "VR_run1"), VolumeRendererConfig)
    assert isinstance(
        renderer_config_from_conf(conf, "Raymarcher_a"), RaymarcherConfig
    )
    cfg = renderer_config_from_conf(conf, "AVR_run1")
    assert isinstance(cfg, AdaptiveRendererConfig)
    assert cfg.epsilon == 0.15 and cfg.n_coarse == 20


# ------------------------------ LSTM cell ---------------------------------


def test_lstm_cell_matches_torch(rng):
    import torch

    H, D = 16, 32
    cell = MarchLSTMCell(hidden_size=H)
    x = rng.normal(size=(4, D)).astype(np.float32)
    h = rng.normal(size=(4, H)).astype(np.float32)
    c = rng.normal(size=(4, H)).astype(np.float32)
    params = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), (jnp.asarray(h), jnp.asarray(c)))
    h2, c2 = cell.apply(params, jnp.asarray(x), (jnp.asarray(h), jnp.asarray(c)))

    tcell = torch.nn.LSTMCell(D, H)
    p = params["params"]
    with torch.no_grad():
        tcell.weight_ih.copy_(torch.from_numpy(np.asarray(p["w_ih"]).T))
        tcell.weight_hh.copy_(torch.from_numpy(np.asarray(p["w_hh"]).T))
        tcell.bias_ih.copy_(torch.from_numpy(np.asarray(p["b_ih"])))
        tcell.bias_hh.copy_(torch.from_numpy(np.asarray(p["b_hh"])))
        th, tc = tcell(torch.from_numpy(x), (torch.from_numpy(h), torch.from_numpy(c)))
    np.testing.assert_allclose(np.asarray(h2), th.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), tc.numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_forget_gate_bias_init():
    cell = MarchLSTMCell(hidden_size=8)
    params = cell.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4)), (jnp.zeros((1, 8)), jnp.zeros((1, 8)))
    )
    for name in ("b_ih", "b_hh"):
        b = np.asarray(params["params"][name])
        np.testing.assert_allclose(b[8:16], 1.0)  # forget-gate quarter
        np.testing.assert_allclose(b[:8], 0.0)
        np.testing.assert_allclose(b[16:], 0.0)


def test_clamp_grad():
    g = jax.grad(lambda x: jnp.sum(clamp_grad(x, 10.0) * 100.0))(jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(g), 10.0)
    g = jax.grad(lambda x: jnp.sum(clamp_grad(x, 10.0) * 2.0))(jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(g), 2.0)


def test_lstm_march_moves_along_ray():
    """March steps must move points strictly along the ray direction."""
    xy, K, c2w = _rays(R=8)
    ros, rds = get_world_rays(xy, K, c2w)

    def features(xyz, viewdirs):
        return jnp.ones((1, 1, xyz.shape[1], 8), jnp.float32)

    cell = MarchLSTMCell(hidden_size=4)
    cparams = cell.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8)),
        (jnp.zeros((1, 8, 4)), jnp.zeros((1, 8, 4))),
    )

    def cell_fn(v, state):
        return cell.apply(cparams, v, state)

    def step_head(h):
        return jnp.sum(h, axis=-1, keepdims=True) * 0.1

    coords = lstm_march(
        jax.random.PRNGKey(1), features, cell_fn, step_head, ros, rds,
        steps=5, hidden_size=4,
    )
    # final coords lie on the ray: (coords - ro) parallel to rd
    diff = np.asarray(coords - ros)
    rd = np.asarray(rds)
    cross = np.cross(diff, rd)
    np.testing.assert_allclose(cross, 0.0, atol=1e-5)


# --------------------------- adaptive renderer ----------------------------


def test_adaptive_band_vs_dense_grid_consistency():
    """Adaptive epsilon-band render must match a dense 64-sample render when
    the march lands on the surface (the reference's debug-mode check)."""
    xy, K, c2w = _rays(R=8)
    ros, rds = get_world_rays(xy, K, c2w)
    origin = (0.0, 0.0, 1.3)
    field = shell_field(1.2, 0.05, 500.0, (0.8, 0.3, 0.1), origin)

    # march that lands exactly at distance 1.2: features/cell drive nothing,
    # but init distance is forced by zero std + mean 1.2
    def features(xyz, viewdirs):
        return jnp.zeros((1, 1, xyz.shape[1], 8), jnp.float32)

    def cell_fn(v, state):
        return state  # frozen

    def step_head(h):
        return jnp.zeros(h.shape[:-1] + (1,), jnp.float32)

    cfg = AdaptiveRendererConfig(
        epsilon=0.15, n_coarse=20, white_back=True,
        init_distance_mean=1.2, init_distance_std=0.0, raymarch_steps=3,
        hidden_size=8,
    )
    out = render_adaptive(
        cfg, jax.random.PRNGKey(0), field, features, cell_fn, step_head, xy, K, c2w
    )

    vr = VolumeRendererConfig(n_coarse=64, n_fine=32, n_fine_depth=16)
    dense = render_volume(vr, jax.random.PRNGKey(1), field, xy, K, c2w)

    np.testing.assert_allclose(
        np.asarray(out.rgb_fine), np.asarray(dense.rgb_fine), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(out.depth_fine), np.asarray(dense.depth_fine), atol=0.05
    )


# ------------------------- combined wrapper -------------------------------


def _wrapper(renderer_cfg):
    conf = parse_conf_string(MODEL_CONF)["model"]
    cfg = ModelConfig.from_conf(conf)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    return RadFieldRenderer(model_cfg=cfg, renderer_cfg=renderer_cfg)


@pytest.mark.parametrize(
    "renderer_cfg",
    [
        VolumeRendererConfig(n_coarse=8, n_fine=4, n_fine_depth=2),
        RaymarcherConfig(raymarch_steps=3),
        AdaptiveRendererConfig(raymarch_steps=3, n_coarse=5),
    ],
    ids=["volume", "raymarcher", "adaptive"],
)
def test_wrapper_end_to_end(rng, renderer_cfg):
    model = _wrapper(renderer_cfg)
    images, poses, focal, c = _encode_inputs(rng, H=32, W=32)
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=model.init_all
    )
    cond = model.apply(variables, images, poses, focal, c, method=model.encode)
    xy, K, c2w = _rays(R=8)
    out = model.apply(
        variables, cond, xy, K, c2w, jax.random.PRNGKey(2), method=model.render
    )
    assert out.rgb_coarse.shape == (1, 8, 3)
    assert out.depth_fine.shape == (1, 8, 1)
    if isinstance(renderer_cfg, RaymarcherConfig):
        assert out.rgb_fine is None
    else:
        assert out.rgb_fine.shape == (1, 8, 3)
    for leaf in [out.rgb_coarse, out.depth_fine]:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_wrapper_render_jits_and_differentiates(rng):
    model = _wrapper(AdaptiveRendererConfig(raymarch_steps=2, n_coarse=4))
    images, poses, focal, c = _encode_inputs(rng, H=32, W=32)
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=model.init_all
    )
    xy, K, c2w = _rays(R=4)

    @jax.jit
    def loss_fn(variables, key):
        cond = model.apply(variables, images, poses, focal, c, method=model.encode)
        out = model.apply(variables, cond, xy, K, c2w, key, method=model.render)
        return jnp.mean(out.rgb_fine**2) + jnp.mean(out.rgb_coarse**2)

    g = jax.jit(jax.grad(loss_fn))(variables, jax.random.PRNGKey(1))
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_adaptive_sort_key_is_pure_permutation():
    """render_adaptive with a locality sort_key_fn returns identical
    outputs: the band jitter is drawn before sorting, per-ray work is
    independent, and outputs are un-permuted."""
    xy, K, c2w = _rays(R=16)
    origin = (0.0, 0.0, 1.3)
    field = shell_field(1.2, 0.05, 500.0, (0.8, 0.3, 0.1), origin)

    def features(xyz, viewdirs):
        return jnp.zeros((1, 1, xyz.shape[1], 8), jnp.float32)

    def cell_fn(v, state):
        return state

    def step_head(h):
        return jnp.zeros(h.shape[:-1] + (1,), jnp.float32)

    cfg = AdaptiveRendererConfig(
        epsilon=0.15, n_coarse=6, white_back=True,
        init_distance_mean=1.2, init_distance_std=0.05, raymarch_steps=2,
        hidden_size=8,
    )
    base = render_adaptive(
        cfg, jax.random.PRNGKey(0), field, features, cell_fn, step_head,
        xy, K, c2w,
    )
    sorted_out = render_adaptive(
        cfg, jax.random.PRNGKey(0), field, features, cell_fn, step_head,
        xy, K, c2w, sort_key_fn=lambda coords: coords[..., 1],
    )
    for a, b in [(base.rgb_fine, sorted_out.rgb_fine),
                 (base.depth_fine, sorted_out.depth_fine),
                 (base.rgb_coarse, sorted_out.rgb_coarse)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_adaptive_fused_integral_matches_unfused():
    """The fused Pallas band compositing (ops/pallas/integrate.py) must
    reproduce render_adaptive's unfused output — values and grads through
    the whole render (band z gradient included)."""
    import numpy as np

    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig

    rng = np.random.default_rng(0)
    SB, NS, SIDE, R = 1, 1, 16, 12
    mcfg = ModelConfig(
        use_encoder=True, use_xyz=True, use_code=True, use_viewdirs=True,
    )
    rcfg = AdaptiveRendererConfig(raymarch_steps=2, n_coarse=20)

    def mk(fi):
        return RadFieldRenderer(
            model_cfg=mcfg, renderer_cfg=rcfg, fused_integral=fi,
            fused_march="never",
        )

    images = jnp.asarray(rng.normal(size=(SB, NS, SIDE, SIDE, 3)).astype(np.float32))
    poses = jnp.broadcast_to(jnp.eye(4), (SB, NS, 4, 4)).at[:, :, 2, 3].set(1.3)
    focal = jnp.float32(14.0)
    xy = jnp.asarray(rng.uniform(0.2, 0.8, size=(SB, R, 2)).astype(np.float32))
    K = jnp.broadcast_to(
        jnp.asarray([[0.875, 0, 0.5], [0, 0.875, 0.5], [0, 0, 1]], jnp.float32),
        (SB, 3, 3),
    )
    c2w = jnp.broadcast_to(poses[:, 0], (SB, R, 4, 4))

    variables = mk("never").init(
        jax.random.PRNGKey(0), images, poses, focal, None,
        method=RadFieldRenderer.init_all,
    )

    def run(fi, v):
        def f(m):
            cond = m.encode(images, poses, focal, None)
            return m.render(cond, xy, K, c2w, jax.random.PRNGKey(3))
        return mk(fi).apply(v, method=f)

    o_ref = run("never", variables)
    o_fus = run("always", variables)
    np.testing.assert_allclose(np.asarray(o_fus.rgb_fine),
                               np.asarray(o_ref.rgb_fine), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o_fus.depth_fine),
                               np.asarray(o_ref.depth_fine), atol=1e-5, rtol=1e-5)

    def loss(fi, v):
        out = run(fi, v)
        return jnp.mean(out.rgb_fine ** 2) + jnp.mean(out.depth_fine ** 2)

    g_ref = jax.grad(lambda v: loss("never", v))(variables)
    g_fus = jax.grad(lambda v: loss("always", v))(variables)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=5e-4)
