"""End-to-end render AND gradient parity against the LIVE PyTorch reference.

VERDICT round-2 items 1-3: the component-level oracle tests
(``test_reference_oracle.py``) are forward-only and stop at module
boundaries.  These tests close the top of the verification pyramid:

  * **Gradient parity** — torch autograd through the reference's
    ``volume_integral`` (renderers.py:69-119) and ``ResnetFC``
    (models.py:473-606) vs ``jax.grad`` on ours, weights copied
    (the north star's d-loss/d-density, d-loss/d-color,
    d-loss/d-encoder-features allclose targets).
  * **SpatialEncoder forward oracle** — the multi-scale
    upsample+concat trunk incl. BatchNorm eval semantics and
    ``latent_scaling`` (models.py:276-329) vs ours with identical
    (stub-torchvision) weights.
  * **Full-composition parity** — ``RadFieldAndRenderer.forward``
    (models.py:913-929) with each of the three renderers
    (renderers.py:133/313/380) executed against
    ``RadFieldRenderer.render`` with copied weights and identical
    injected randomness, plus end-to-end gradients through the whole
    chain (encoder features, decoder weights, LSTM weights).

Randomness strategy is the same as the component oracles: both sides'
samplers are monkeypatched to consume the same queued fixed arrays, so
the math around the randomness is deterministic.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax.core import unfreeze

from _reference_loader import load

from avr_tpu.config import parse_conf_string
from avr_tpu.models.pixelnerf import ModelConfig
from avr_tpu.models.torch_import import (
    import_lstm_cell,
    import_resnetfc,
    import_torchvision_resnet,
)
from avr_tpu.models.wrapper import RadFieldRenderer
from avr_tpu.renderers.base import (
    AdaptiveRendererConfig,
    RaymarcherConfig,
    VolumeRendererConfig,
)
from avr_tpu.utils.geometry import get_opencv_pixel_coordinates

REF = load()
CPU = torch.device("cpu")

# Shared model conf (our HOCON-subset Conf object is API-compatible with the
# pyhocon tree the reference factories consume: get_bool/get_int/get_float/
# get_string/__getitem__), so BOTH sides are built from this single source.
CONF_TEXT = """
model {
    use_encoder = True
    use_xyz = True
    normalize_z = True
    use_code = True
    code { num_freqs = 6
           freq_factor = 1.5
           include_input = True }
    use_viewdirs = True
    use_code_viewdirs = False
    mlp_coarse { type = resnet
                 n_blocks = 3
                 d_hidden = 32
                 combine_layer = 1000
                 combine_type = average }
    mlp_fine { type = resnet
               n_blocks = 3
               d_hidden = 32
               combine_layer = 1000
               combine_type = average }
    encoder { type = spatial
              backbone = resnet18
              pretrained = False
              num_layers = 2 }
}
"""

N_BLOCKS = 3
COMBINE_LAYER = 1000
NUM_ENC_LAYERS = 2
BLOCKS_PER_STAGE = (2, 2, 2, 2)  # resnet18
LATENT = 128  # 64 (stem) + 64 (layer1)


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


# ---------------------------------------------------------------------------
# RNG queues (both frameworks served the same arrays, in call order)
# ---------------------------------------------------------------------------


def _queue_torch(monkeypatch, rand_like=(), rand=(), randn_like=(), normal_=()):
    ql = [_t(a) for a in rand_like]
    qr = [_t(a) for a in rand]
    qn = [_t(a) for a in randn_like]
    qi = [np.asarray(a, np.float32) for a in normal_]
    if ql:
        monkeypatch.setattr(torch, "rand_like", lambda t: ql.pop(0).reshape(t.shape))
    if qr:
        monkeypatch.setattr(
            torch, "rand", lambda *s, **kw: qr.pop(0).reshape(*s)
        )
    if qn:
        monkeypatch.setattr(
            torch, "randn_like", lambda t: qn.pop(0).reshape(t.shape)
        )
    if qi:
        # torch.zeros(...).normal_(mean, std) — the marcher's init distance
        # (reference renderers.py:322/413); serve mean + std * queued
        def fake_normal_(self, mean=0.0, std=1.0):
            a = qi.pop(0)
            with torch.no_grad():
                self.copy_(_t(mean + std * a).reshape(self.shape))
            return self

        monkeypatch.setattr(torch.Tensor, "normal_", fake_normal_)


def _queue_jax(monkeypatch, uniform=(), normal=()):
    qu = [np.asarray(a, np.float32) for a in uniform]
    qn = [np.asarray(a, np.float32) for a in normal]
    if qu:

        def fake_uniform(key, shape=(), dtype=jnp.float32, **kw):
            a = qu.pop(0)
            assert int(np.prod(a.shape)) == int(np.prod(shape)), (a.shape, shape)
            return jnp.asarray(a.reshape(shape), dtype)

        monkeypatch.setattr(jax.random, "uniform", fake_uniform)
    if qn:

        def fake_normal(key, shape=(), dtype=jnp.float32, **kw):
            a = qn.pop(0)
            assert int(np.prod(a.shape)) == int(np.prod(shape)), (a.shape, shape)
            return jnp.asarray(a.reshape(shape), dtype)

        monkeypatch.setattr(jax.random, "normal", fake_normal)


# ---------------------------------------------------------------------------
# Model pair construction: reference modules + ours with copied weights
# ---------------------------------------------------------------------------


def _ref_renderer(rcfg):
    if isinstance(rcfg, VolumeRendererConfig):
        return REF.renderers.VolumeRenderer(
            near=rcfg.near, far=rcfg.far, n_coarse=rcfg.n_coarse,
            n_fine=rcfg.n_fine, n_fine_depth=rcfg.n_fine_depth,
            depth_std=rcfg.depth_std, white_back=rcfg.white_back,
        )
    if isinstance(rcfg, RaymarcherConfig):
        return REF.renderers.Raymarcher(
            num_feature_channels=rcfg.num_feature_channels,
            raymarch_steps=rcfg.raymarch_steps,
        )
    return REF.renderers.AdaptiveVolumeRenderer(
        num_feature_channels=rcfg.num_feature_channels,
        raymarch_steps=rcfg.raymarch_steps, epsilon=rcfg.epsilon,
        n_coarse=rcfg.n_coarse, white_back=rcfg.white_back,
    )


def _copy_weights(ref_wrapper, variables, has_marcher):
    """Reference state-dict -> our variables, via the torch_import shims."""
    variables = unfreeze(variables)
    net_sd = {k: v.detach().numpy() for k, v in ref_wrapper.rf.state_dict().items()}

    enc_sd = {
        k[len("encoder.model."):]: v
        for k, v in net_sd.items()
        if k.startswith("encoder.model.")
    }
    enc = import_torchvision_resnet(
        enc_sd, blocks_per_stage=BLOCKS_PER_STAGE, num_layers=NUM_ENC_LAYERS
    )
    variables["params"]["net"]["encoder"]["model"] = enc["params"]
    variables["batch_stats"]["net"]["encoder"]["model"] = enc["batch_stats"]

    n_lin_z = min(COMBINE_LAYER, N_BLOCKS)
    for name in ("mlp_coarse", "mlp_fine"):
        variables["params"]["net"][name] = import_resnetfc(
            net_sd, name, n_blocks=N_BLOCKS, n_lin_z=n_lin_z
        )

    if has_marcher:
        rend_sd = {
            k: v.detach().numpy()
            for k, v in ref_wrapper.renderer.state_dict().items()
        }
        variables["params"]["lstm"] = import_lstm_cell(rend_sd, "lstm")
        variables["params"]["out_layer"] = {
            "kernel": rend_sd["out_layer.weight"].T,
            "bias": rend_sd["out_layer.bias"],
        }
    return variables


def _make_pair(rcfg, rng, SB=2, H=32, W=32):
    """Build (ref RadFieldAndRenderer, our RadFieldRenderer+variables, inputs)."""
    conf = parse_conf_string(CONF_TEXT)["model"]

    torch.manual_seed(0)
    ref_net = REF.models.NewPixelNeRFNet(conf, stop_encoder_grad=False, bn=False)
    ref_rend = _ref_renderer(rcfg)
    ref_wrapper = REF.models.RadFieldAndRenderer(ref_net, ref_rend)
    ref_wrapper.eval()  # BatchNorm in eval mode (running stats)

    cfg = ModelConfig.from_conf(conf)
    model = RadFieldRenderer(model_cfg=cfg, renderer_cfg=rcfg)

    images = rng.uniform(-1.0, 1.0, (SB, 1, H, W, 3)).astype(np.float32)
    c2w = np.eye(4, dtype=np.float32) @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(
        np.float32
    )
    c2w[2, 3] = 1.3
    poses = np.broadcast_to(c2w, (SB, 1, 4, 4)).copy()
    focal = np.float32(1.09375 * W)
    c = np.asarray([[W / 2.0, H / 2.0]], np.float32)  # (1, 2): same on both sides

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(poses),
        focal, jnp.asarray(c), method=model.init_all,
    )
    variables = _copy_weights(ref_wrapper, variables, model.has_marcher)

    # rays: random pixels of an 8x8 grid, per-ray c2w as in training.
    # Pixels on the principal axis column (x == cx) give ray directions with
    # rd_x == 0, where the reference's along-ray distance recovery
    # (renderers.py:490, (coords_x - ro_x) / rd_x) NaNs — an implicit
    # reference precondition, pinned by
    # test_adaptive_rd_x_zero_is_a_reference_defect below.
    xy = np.asarray(get_opencv_pixel_coordinates(8, 8)).reshape(-1, 2)
    xy = xy[np.abs(xy[:, 0] - 0.5) > 1e-3]
    sel = np.random.default_rng(7).choice(xy.shape[0], size=6, replace=False)
    R = sel.shape[0]
    xy = np.broadcast_to(xy[sel], (SB, R, 2)).copy()
    K = np.broadcast_to(
        np.asarray(
            [[1.09375, 0, 0.5], [0, 1.09375, 0.5], [0, 0, 1]], np.float32
        ),
        (SB, 3, 3),
    ).copy()
    c2w_rays = np.broadcast_to(c2w, (SB, R, 4, 4)).copy()

    inputs = dict(images=images, poses=poses, focal=focal, c=c, xy=xy, K=K,
                  c2w=c2w_rays)
    return ref_wrapper, model, variables, inputs


def _ref_encode(ref_wrapper, inputs):
    images_t = _t(inputs["images"]).permute(0, 1, 4, 2, 3)  # NHWC -> NCHW
    ref_wrapper.rf.encode(
        images_t, _t(inputs["poses"]), torch.tensor(float(inputs["focal"])),
        c=_t(inputs["c"]),
    )


def _our_encode(model, variables, inputs):
    return model.apply(
        variables, jnp.asarray(inputs["images"]), jnp.asarray(inputs["poses"]),
        inputs["focal"], jnp.asarray(inputs["c"]), method=model.encode,
    )


def _renderer_noise(rcfg, rng, SB, R):
    """Draw the shared fixed random arrays for one forward, in call order.

    Returns (torch_kwargs, jax_kwargs) for _queue_torch/_queue_jax.
    """
    if isinstance(rcfg, VolumeRendererConfig):
        jc = rng.uniform(0, 1, (SB, R, rcfg.n_coarse)).astype(np.float32)
        n_if = rcfg.n_fine - rcfg.n_fine_depth
        u = rng.uniform(0, 1, (SB, R, n_if)).astype(np.float32)
        jf = rng.uniform(0, 1, (SB, R, n_if)).astype(np.float32)
        nd = rng.normal(0, 1, (SB, R, rcfg.n_fine_depth)).astype(np.float32)
        return (
            dict(rand_like=[jc, jf], rand=[u], randn_like=[nd]),
            dict(uniform=[jc, u, jf], normal=[nd]),
        )
    init = rng.normal(0, 1, (SB, R)).astype(np.float32)
    if isinstance(rcfg, RaymarcherConfig):
        return dict(normal_=[init]), dict(normal=[init])
    band = rng.uniform(0, 1, (SB, R, rcfg.n_coarse)).astype(np.float32)
    return (
        dict(normal_=[init], rand_like=[band]),
        dict(normal=[init], uniform=[band]),
    )


RENDERERS = [
    VolumeRendererConfig(n_coarse=8, n_fine=6, n_fine_depth=3),
    RaymarcherConfig(num_feature_channels=LATENT, raymarch_steps=3),
    AdaptiveRendererConfig(
        num_feature_channels=LATENT, raymarch_steps=3, n_coarse=5,
        epsilon=0.15, white_back=True,
    ),
]
RENDERER_IDS = ["volume", "raymarcher", "adaptive"]


# ---------------------------------------------------------------------------
# SpatialEncoder forward oracle (VERDICT round-2 missing #3)
# ---------------------------------------------------------------------------


def test_spatial_encoder_matches_reference(rng):
    """Multi-scale trunk parity (reference models.py:276-329): ResNet34
    stages, align-corners bilinear upsample, channel concat, BatchNorm eval
    semantics, and the latent_scaling constant — identical weights."""
    from avr_tpu.models.encoder import SpatialEncoder

    torch.manual_seed(1)
    ref_enc = REF.models.SpatialEncoder(
        backbone="resnet34", pretrained=False, num_layers=4
    )
    ref_enc.eval()

    B, H, W = 2, 64, 64
    images = rng.uniform(-1.0, 1.0, (B, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref_enc(_t(images).permute(0, 3, 1, 2)).numpy()  # (B, C, H', W')
    want_scaling = ref_enc.latent_scaling.numpy()

    enc = SpatialEncoder(backbone="resnet34", num_layers=4)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(images))
    sd = {k: v.detach().numpy() for k, v in ref_enc.model.state_dict().items()}
    imported = import_torchvision_resnet(sd, blocks_per_stage=(3, 4, 6, 3),
                                         num_layers=4)
    variables = unfreeze(variables)
    variables["params"]["model"] = imported["params"]
    variables["batch_stats"]["model"] = imported["batch_stats"]

    got, got_scaling = enc.apply(variables, jnp.asarray(images), train=False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))  # NHWC -> NCHW

    assert got.shape == want.shape == (B, 512, H // 2, W // 2)
    np.testing.assert_allclose(got_scaling, want_scaling, rtol=1e-6)
    # fp32 conv stacks across frameworks: compare with a scale-aware atol
    np.testing.assert_allclose(
        got, want, rtol=1e-4, atol=1e-4 * float(np.abs(want).max())
    )


# ---------------------------------------------------------------------------
# Gradient parity: volume_integral (d-density / d-color / d-z)
# ---------------------------------------------------------------------------


def test_volume_integral_gradients_match_reference(rng):
    """The north star's d-loss/d-density and d-loss/d-color targets through
    the compositing chain (reference renderers.py:69-119), both white_back
    settings, depth path included."""
    from avr_tpu.ops.integrate import volume_integral

    SB, R, n = 2, 9, 12
    z_np = np.sort(rng.uniform(0.8, 1.8, (SB, R, n)).astype(np.float32), axis=-1)
    sig_np = np.abs(rng.normal(0.0, 4.0, (SB, R, n, 1))).astype(np.float32)
    rad_np = rng.uniform(0.0, 1.0, (SB, R, n, 3)).astype(np.float32)
    gt = rng.uniform(0.0, 1.0, (SB, R, 3)).astype(np.float32)

    for white_back in (True, False):
        z_t = _t(z_np).requires_grad_(True)
        sig_t = _t(sig_np).requires_grad_(True)
        rad_t = _t(rad_np).requires_grad_(True)
        rgb_t, depth_t, _ = REF.renderers.volume_integral(
            z_t, sig_t, rad_t, white_back=white_back
        )
        loss_t = ((rgb_t - _t(gt)) ** 2).mean() + depth_t.mean()
        loss_t.backward()

        def loss_j(z, sig, rad):
            rgb, depth, _ = volume_integral(z, sig, rad, white_back=white_back)
            return jnp.mean((rgb - jnp.asarray(gt)) ** 2) + jnp.mean(depth)

        gz, gs, gr = jax.grad(loss_j, argnums=(0, 1, 2))(
            jnp.asarray(z_np), jnp.asarray(sig_np), jnp.asarray(rad_np)
        )
        for got, want, name in (
            (gz, z_t.grad, "d_z"),
            (gs, sig_t.grad, "d_density"),
            (gr, rad_t.grad, "d_color"),
        ):
            want = want.numpy()
            np.testing.assert_allclose(
                np.asarray(got), want, rtol=1e-4,
                atol=1e-6 * max(1.0, float(np.abs(want).max())),
                err_msg=f"{name} white_back={white_back}",
            )


# ---------------------------------------------------------------------------
# Gradient parity: ResnetFC decoder (d-params and d-latent)
# ---------------------------------------------------------------------------


def test_resnetfc_gradients_match_reference(rng):
    """d-loss/d-(decoder weights) and d-loss/d-(latent features) through the
    reference ResnetFC (models.py:473-606), weights copied.  The gradient
    state-dict is converted with the SAME import shims as the weights, so
    every layout transpose is pinned on the backward too."""
    from avr_tpu.models.mlp import ResnetFC

    SB, B = 2, 10
    d_in, d_latent, d_hidden, n_blocks = 9, 24, 32, 5

    torch.manual_seed(0)
    ref_mlp = REF.models.ResnetFC(
        d_in, d_out=4, n_blocks=n_blocks, d_latent=d_latent, d_hidden=d_hidden,
        combine_layer=1000, combine_type="average",
    )

    x_np = rng.normal(0.0, 1.0, (SB, 1, B, d_in)).astype(np.float32)
    z_np = rng.normal(0.0, 1.0, (SB, 1, B, d_latent)).astype(np.float32)
    gt = rng.normal(0.0, 1.0, (SB, B, 4)).astype(np.float32)

    zx = np.concatenate([z_np, x_np], axis=-1).reshape(SB * B, d_latent + d_in)
    zx_t = _t(zx).requires_grad_(True)
    out_t = ref_mlp(zx_t, combine_inner_dims=(1, B)).reshape(SB, B, 4)
    loss_t = ((out_t - _t(gt)) ** 2).mean()
    loss_t.backward()

    mlp = ResnetFC(
        d_in=d_in, d_out=4, n_blocks=n_blocks, d_latent=d_latent,
        d_hidden=d_hidden, combine_layer=1000, combine_type="average",
        fused="never",
    )
    sd = {f"mlp.{k}": v.detach().numpy() for k, v in ref_mlp.state_dict().items()}
    params = import_resnetfc(sd, "mlp", n_blocks=n_blocks, n_lin_z=n_blocks)

    def loss_j(params, x, z):
        out = mlp.apply({"params": params}, x, z).reshape(SB, B, 4)
        return jnp.mean((out - jnp.asarray(gt)) ** 2)

    gp, gx, gz = jax.grad(loss_j, argnums=(0, 1, 2))(
        params, jnp.asarray(x_np), jnp.asarray(z_np)
    )

    # input grads: reference sees d/d[z|x] on the concatenated input
    gzx = np.asarray(zx_t.grad).reshape(SB, 1, B, d_latent + d_in)
    np.testing.assert_allclose(
        np.asarray(gz), gzx[..., :d_latent], rtol=1e-4, atol=1e-7,
        err_msg="d_latent_features",
    )
    np.testing.assert_allclose(
        np.asarray(gx), gzx[..., d_latent:], rtol=1e-4, atol=1e-7, err_msg="d_x"
    )

    # parameter grads: convert the torch grad dict with the weight shims
    # (the reference's ResnetBlockFC instantiates bn_0/bn_1 modules even with
    # bn off — unused, so their grads are None; models.py:456-460)
    grad_sd = {
        f"mlp.{k}": p.grad.detach().numpy()
        for k, p in ref_mlp.named_parameters()
        if p.grad is not None
    }
    want_gp = import_resnetfc(grad_sd, "mlp", n_blocks=n_blocks, n_lin_z=n_blocks)
    flat_got = jax.tree_util.tree_leaves_with_path(gp)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want_gp))
    assert len(flat_got) == len(flat_want) > 0
    for path, got in flat_got:
        want = np.asarray(flat_want[path])
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-4,
            atol=1e-6 * max(1.0, float(np.abs(want).max())),
            err_msg=f"param grad {path}",
        )


# ---------------------------------------------------------------------------
# Full composition: RadFieldAndRenderer vs RadFieldRenderer, all renderers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rcfg", RENDERERS, ids=RENDERER_IDS)
def test_full_render_matches_reference(rng, rcfg, monkeypatch):
    """The whole reference pipeline (models.py:913-929 composed with
    renderers.py:133/313/380) executed live vs our wrapper, weights copied,
    randomness injected identically on both sides."""
    ref_wrapper, model, variables, inputs = _make_pair(rcfg, rng)
    SB, R = inputs["xy"].shape[:2]

    _ref_encode(ref_wrapper, inputs)
    cond = _our_encode(model, variables, inputs)

    t_noise, j_noise = _renderer_noise(rcfg, rng, SB, R)
    model_input_t = {
        "x_pix": _t(inputs["xy"]),
        "intrinsics": _t(inputs["K"]),
        "cam2world": _t(inputs["c2w"]),
    }
    _queue_torch(monkeypatch, **t_noise)
    with torch.no_grad():
        want = ref_wrapper(model_input_t)

    _queue_jax(monkeypatch, **j_noise)
    got = model.apply(
        variables, cond, jnp.asarray(inputs["xy"]), jnp.asarray(inputs["K"]),
        jnp.asarray(inputs["c2w"]), jax.random.PRNGKey(0), method=model.render,
    )

    pairs = [
        ("rgb_coarse", got.rgb_coarse, want[0]),
        ("depth_fine", got.depth_fine, want[3]),
    ]
    if not isinstance(rcfg, RaymarcherConfig):
        pairs.append(("rgb_fine", got.rgb_fine, want[1]))
    for name, g, w in pairs:
        w = np.asarray(w.detach()).reshape(np.asarray(g).shape)
        np.testing.assert_allclose(
            np.asarray(g), w, rtol=1e-3,
            atol=2e-4 * max(1.0, float(np.abs(w).max())),
            err_msg=f"{type(rcfg).__name__}.{name}",
        )


def test_adaptive_rd_x_zero_is_a_reference_defect(rng, monkeypatch):
    """Pin the one deliberate deviation in the adaptive composition: for a
    ray with rd_x == 0 the reference's along-ray distance recovery
    ((coords_x - ro_x) / rd_x, renderers.py:490) produces NaN; ours uses the
    equivalent-but-robust projection <coords - ro, rd> (adaptive.py) and
    stays finite."""
    rcfg = RENDERERS[2]
    ref_wrapper, model, variables, inputs = _make_pair(rcfg, rng)
    # principal-axis pixel: x == cx == 0.5 -> rd_x == 0 after unproject
    SB = inputs["xy"].shape[0]
    inputs["xy"] = np.broadcast_to(
        np.asarray([0.5, 0.25], np.float32), (SB, 1, 2)
    ).copy()
    inputs["c2w"] = inputs["c2w"][:, :1]
    R = 1

    _ref_encode(ref_wrapper, inputs)
    cond = _our_encode(model, variables, inputs)
    t_noise, j_noise = _renderer_noise(rcfg, rng, SB, R)
    _queue_torch(monkeypatch, **t_noise)
    with torch.no_grad():
        want = ref_wrapper(
            {
                "x_pix": _t(inputs["xy"]),
                "intrinsics": _t(inputs["K"]),
                "cam2world": _t(inputs["c2w"]),
            }
        )
    _queue_jax(monkeypatch, **j_noise)
    got = model.apply(
        variables, cond, jnp.asarray(inputs["xy"]), jnp.asarray(inputs["K"]),
        jnp.asarray(inputs["c2w"]), jax.random.PRNGKey(0), method=model.render,
    )
    assert np.isnan(np.asarray(want[1].detach())).any()  # reference: NaN
    assert np.isfinite(np.asarray(got.rgb_fine)).all()  # ours: finite
    # and the coarse path (marched point query) still agrees exactly
    np.testing.assert_allclose(
        np.asarray(got.rgb_coarse),
        np.asarray(want[0].detach()).reshape(np.asarray(got.rgb_coarse).shape),
        rtol=1e-3, atol=2e-4,
    )


@pytest.mark.parametrize("rcfg", RENDERERS, ids=RENDERER_IDS)
def test_full_render_gradients_match_reference(rng, rcfg, monkeypatch):
    """End-to-end gradient parity through the full composition: the north
    star's d-loss/d-encoder-features target, plus decoder and LSTM weight
    grads (covering the march backward with the ±10 hidden-state clamp,
    reference renderers.py:427-428, and the fine sampler's weight
    detachment, renderers.py:36).  The raymarcher arm exercises the pure
    march composition (reference renderers.py:292-358): coarse-only loss,
    grads through the LSTM/out_layer and the feature-mode field queries."""
    ref_wrapper, model, variables, inputs = _make_pair(rcfg, rng)
    SB, R = inputs["xy"].shape[:2]
    gt = rng.uniform(0.0, 1.0, (SB, R, 3)).astype(np.float32)

    # --- reference: autograd, with the encoder latent's grad retained -----
    _ref_encode(ref_wrapper, inputs)
    ref_wrapper.rf.encoder.latent.retain_grad()
    t_noise, j_noise = _renderer_noise(rcfg, rng, SB, R)
    _queue_torch(monkeypatch, **t_noise)
    out_t = ref_wrapper(
        {
            "x_pix": _t(inputs["xy"]),
            "intrinsics": _t(inputs["K"]),
            "cam2world": _t(inputs["c2w"]),
        }
    )
    loss_t = ((out_t[0] - _t(gt)) ** 2).mean()
    if out_t[1] is not None:  # the raymarcher renders coarse-only
        loss_t = loss_t + ((out_t[1] - _t(gt)) ** 2).mean()
    loss_t.backward()
    want_dlatent = ref_wrapper.rf.encoder.latent.grad.numpy()  # (B, C, H', W')

    # --- ours: jax.grad wrt (latent, params) -------------------------------
    cond = _our_encode(model, variables, inputs)
    np.testing.assert_allclose(
        np.transpose(np.asarray(cond.latent), (0, 3, 1, 2)),
        ref_wrapper.rf.encoder.latent.detach().numpy(),
        rtol=1e-4, atol=1e-4,
        err_msg="encoded latents diverged before the gradient check",
    )

    xy, K, c2w = (jnp.asarray(inputs[k]) for k in ("xy", "K", "c2w"))
    stats = {"batch_stats": variables["batch_stats"]}

    def loss_j(latent, params):
        out = model.apply(
            {"params": params, **stats}, cond.replace(latent=latent),
            xy, K, c2w, jax.random.PRNGKey(0), method=model.render,
        )
        loss = jnp.mean((out.rgb_coarse - jnp.asarray(gt)) ** 2)
        if out.rgb_fine is not None:
            loss = loss + jnp.mean((out.rgb_fine - jnp.asarray(gt)) ** 2)
        return loss

    _queue_jax(monkeypatch, **j_noise)
    d_latent, d_params = jax.grad(loss_j, argnums=(0, 1))(
        cond.latent, variables["params"]
    )

    got_dlatent = np.transpose(np.asarray(d_latent), (0, 3, 1, 2))
    np.testing.assert_allclose(
        got_dlatent, want_dlatent, rtol=2e-3,
        atol=1e-5 * max(1e-30, float(np.abs(want_dlatent).max())),
        err_msg="d-loss/d-encoder-features",
    )

    # decoder + marcher weight grads, via the same import shims
    ref_grads = {
        k: (p.grad.detach().numpy() if p.grad is not None else None)
        for k, p in ref_wrapper.named_parameters()
    }

    def check(got, want, name):
        want = np.asarray(want)
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=2e-3,
            atol=1e-5 * max(1e-30, float(np.abs(want).max())),
            err_msg=f"param grad {name}",
        )

    # the raymarcher's only decoder query is the final coarse one
    # (reference renderers.py:346-348); its fine MLP never runs, so torch
    # leaves those .grad as None — compare only the coarse decoder there
    mlp_names = (
        ("mlp_coarse",)
        if isinstance(rcfg, RaymarcherConfig)
        else ("mlp_coarse", "mlp_fine")
    )
    for mlp_name in mlp_names:
        check(
            d_params["net"][mlp_name]["lin_out"]["kernel"],
            ref_grads[f"rf.{mlp_name}.lin_out.weight"].T,
            f"{mlp_name}.lin_out",
        )
        check(
            d_params["net"][mlp_name]["block_0"]["fc_0"]["kernel"],
            ref_grads[f"rf.{mlp_name}.blocks.0.fc_0.weight"].T,
            f"{mlp_name}.block_0.fc_0",
        )
        check(
            d_params["net"][mlp_name]["lin_z_0"]["kernel"],
            ref_grads[f"rf.{mlp_name}.lin_z.0.weight"].T,
            f"{mlp_name}.lin_z_0",
        )
    if isinstance(rcfg, RaymarcherConfig):
        # untouched fine decoder: zero grads on our side too
        assert not np.any(np.asarray(d_params["net"]["mlp_fine"]["lin_out"]["kernel"]))
    if isinstance(rcfg, (AdaptiveRendererConfig, RaymarcherConfig)):
        check(
            d_params["lstm"]["w_ih"],
            ref_grads["renderer.lstm.weight_ih"].T,
            "lstm.w_ih",
        )
        check(
            d_params["out_layer"]["kernel"],
            ref_grads["renderer.out_layer.weight"].T,
            "out_layer",
        )
