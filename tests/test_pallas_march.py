"""Parity: fused Pallas LSTM march vs the unfused jnp/scan math.

Runs the kernel in interpret mode on CPU (conftest pins the CPU backend)
with fp32 compute so values and every gradient (latent, coords0, rds, LSTM
weights, step head) must match the plain-jnp reference march tightly,
including the reference's hidden-cotangent clamp (renderers.py:335-336).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avr_tpu.ops.grid_sample import grid_sample_2d
from avr_tpu.ops.pallas.march import fused_lstm_march, pack_projection
from avr_tpu.renderers.lstm import clamp_grad

B, R, H, W, C, HID, STEPS = 2, 40, 8, 8, 32, 16, 3


def _inputs(seed=0, ns=1):
    rng = np.random.default_rng(seed)
    feat = jnp.asarray(rng.normal(size=(B, ns, H, W, C)).astype(np.float32))

    # world->cam rotations: small rotations around z + identity-ish
    def rot(a):
        ca, sa = np.cos(a), np.sin(a)
        return np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]], np.float32)

    angles = rng.uniform(-0.25, 0.25, size=(B, ns))
    Rm = np.stack([[rot(a) for a in row] for row in angles])  # (B, ns, 3, 3)
    t = rng.uniform(-0.05, 0.05, size=(B, ns, 3)).astype(np.float32)
    t[..., 2] += 1.3
    poses = np.concatenate([Rm, t[..., None]], axis=-1).reshape(B * ns, 3, 4)

    focal = jnp.asarray([[40.0, -38.0]], np.float32)  # fy negated convention
    c = jnp.asarray([[32.0, 31.0]], np.float32)
    latent_scaling = jnp.asarray([2.0 * (W - 1) / W, 2.0 * (H - 1) / H],
                                 jnp.float32) * jnp.asarray([W, H], jnp.float32) / jnp.asarray([W, H], jnp.float32)
    # keep it simple: latent_scaling as the model computes it
    latent_scaling = jnp.asarray(
        [2.0 * W / 64.0, 2.0 * H / 64.0], jnp.float32
    )
    image_shape = jnp.asarray([64.0, 64.0], jnp.float32)

    ros = jnp.asarray(rng.normal(scale=0.05, size=(B, R, 3)).astype(np.float32))
    rds = rng.normal(size=(B, R, 3)).astype(np.float32)
    rds = rds / np.linalg.norm(rds, axis=-1, keepdims=True)
    # point roughly toward the cameras' +z
    rds[..., 2] = np.abs(rds[..., 2]) + 0.5
    rds = rds / np.linalg.norm(rds, axis=-1, keepdims=True)
    rds = jnp.asarray(rds)
    d0 = jnp.asarray(rng.normal(loc=0.8, scale=0.05, size=(B, R, 1)).astype(np.float32))
    coords0 = ros + rds * d0

    wih = jnp.asarray(rng.normal(scale=0.1, size=(C, 4 * HID)).astype(np.float32))
    whh = jnp.asarray(rng.normal(scale=0.3, size=(HID, 4 * HID)).astype(np.float32))
    bias = jnp.asarray(rng.normal(scale=0.1, size=(4 * HID,)).astype(np.float32))
    wout = jnp.asarray(rng.normal(scale=0.5, size=(HID, 1)).astype(np.float32))
    bout = jnp.asarray([0.01], np.float32)

    proj = pack_projection(
        jnp.asarray(poses), focal, c, latent_scaling, image_shape
    ).reshape(B, ns, 16)
    return dict(
        feat=feat, poses=jnp.asarray(poses), focal=focal, c=c,
        latent_scaling=latent_scaling, image_shape=image_shape,
        coords0=coords0, rds=rds, wih=wih, whh=whh, bias=bias, wout=wout,
        bout=bout, proj=proj,
    )


def _ref_march(feat, poses, focal, c, latent_scaling, image_shape, coords0,
               rds, wih, whh, bias, wout, bout, grad_clamp=10.0,
               early_stop_eps=0.0):
    """Plain-jnp march with the model's exact projection + gather math.

    ``feat`` is (B, NS, H, W, C); per-step features mean-pool over NS
    (raymarch.py's scan-path semantics)."""
    ns = feat.shape[1]
    Rm = poses[:, :3, :3].reshape(B, ns, 3, 3)
    t = poses[:, :3, 3].reshape(B, ns, 3)
    scale = latent_scaling / image_shape
    fg = jnp.broadcast_to(focal, (B * ns, 2)) * scale[None, :]
    cg = jnp.broadcast_to(c, (B * ns, 2)) * scale[None, :] - 1.0
    fg = fg.reshape(B, ns, 2)
    cg = cg.reshape(B, ns, 2)

    def features(coords):
        cam = jnp.einsum("bvij,bnj->bvni", Rm, coords) + t[:, :, None, :]
        g = -cam[..., :2] / cam[..., 2:3] * fg[:, :, None, :] + cg[:, :, None, :]
        v = grid_sample_2d(
            feat.reshape(B * ns, H, W, C), g.reshape(B * ns, -1, 2)
        ).reshape(B, ns, -1, C)
        return jnp.mean(v, axis=1)

    h = jnp.zeros((B, R, HID), jnp.float32)
    cc = jnp.zeros((B, R, HID), jnp.float32)
    active = jnp.ones((B, R, 1), jnp.float32)
    coords = coords0
    for _ in range(STEPS):
        v = features(coords)
        gates = v @ wih + h @ whh + bias
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(cc)
        h = clamp_grad(h, grad_clamp)
        s = h @ wout + bout
        if early_stop_eps > 0.0:
            s = s * active
            converged = jnp.abs(s) < early_stop_eps
            active = active * (1.0 - converged.astype(jnp.float32))
        coords = coords + rds * s
    return coords


def _fused(inp, grad_clamp=10.0, early_stop_eps=0.0):
    return fused_lstm_march(
        inp["proj"], inp["coords0"], inp["rds"], inp["feat"],
        inp["wih"], inp["whh"], inp["bias"], inp["wout"], inp["bout"],
        steps=STEPS, grad_clamp=grad_clamp, early_stop_eps=early_stop_eps,
        compute_dtype=jnp.float32, interpret=True,
    )


@pytest.mark.parametrize("ns", [1, 2, 3])
def test_fused_march_values_match_reference(ns):
    inp = _inputs(ns=ns)
    got = _fused(inp)
    want = _ref_march(
        inp["feat"], inp["poses"], inp["focal"], inp["c"],
        inp["latent_scaling"], inp["image_shape"], inp["coords0"],
        inp["rds"], inp["wih"], inp["whh"], inp["bias"], inp["wout"],
        inp["bout"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("grad_clamp,ns", [(10.0, 1), (0.02, 1), (10.0, 2)])
def test_fused_march_grads_match_reference(grad_clamp, ns):
    """All cotangents match, including through a *binding* hidden clamp."""
    inp = _inputs(1, ns=ns)
    probe = jnp.asarray(
        np.random.default_rng(7).normal(size=(B, R, 3)).astype(np.float32)
    )

    diff_names = ["feat", "coords0", "rds", "wih", "whh", "bias", "wout",
                  "bout"]

    def loss_fused(*diff):
        d = dict(inp)
        d.update(dict(zip(diff_names, diff)))
        return jnp.sum(_fused(d, grad_clamp) * probe)

    def loss_ref(*diff):
        d = dict(inp)
        d.update(dict(zip(diff_names, diff)))
        return jnp.sum(
            _ref_march(
                d["feat"], d["poses"], d["focal"], d["c"],
                d["latent_scaling"], d["image_shape"], d["coords0"],
                d["rds"], d["wih"], d["whh"], d["bias"], d["wout"],
                d["bout"], grad_clamp=grad_clamp,
            )
            * probe
        )

    args = tuple(inp[n] for n in diff_names)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    for name, a, b in zip(diff_names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )


@pytest.mark.parametrize("wr", [4, 16, 64])
def test_fused_march_window_rows_invariant(wr):
    """Values and grads are identical for every gather-window height.

    ``window_rows`` is a pure performance knob (fewer/wider vs more/narrower
    one-hot contractions per march step); any wr-dependent numeric change
    would mean a window covers the wrong feature rows.  wr=64 == whole map
    (single window, the degenerate exact case)."""
    inp = _inputs()
    probe = jnp.asarray(
        np.random.default_rng(3).normal(size=(B, R, 3)).astype(np.float32)
    )

    def loss(feat, coords0, wr=wr):
        d = dict(inp, feat=feat, coords0=coords0)
        return jnp.sum(
            fused_lstm_march(
                d["proj"], d["coords0"], d["rds"], d["feat"], d["wih"],
                d["whh"], d["bias"], d["wout"], d["bout"], steps=STEPS,
                compute_dtype=jnp.float32, interpret=True, window_rows=wr,
            )
            * probe
        )

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(
        inp["feat"], inp["coords0"]
    )
    val64, grads64 = jax.value_and_grad(
        lambda f, c: loss(f, c, wr=64), argnums=(0, 1)
    )(inp["feat"], inp["coords0"])
    np.testing.assert_allclose(float(val), float(val64), rtol=1e-6)
    for a, b in zip(grads, grads64):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_march_padding_ignores_tail():
    """Results are independent of the _BLK padding (rays not mult of 512)."""
    inp = _inputs(2)
    out = _fused(inp)
    assert out.shape == (B, R, 3)
    assert np.isfinite(np.asarray(out)).all()


# --------------- wrapper integration: fused vs scan march ------------------


def test_wrapper_fused_march_matches_scan_march():
    """Full adaptive render + grads: fused-march wrapper == scan-march one.

    Both paths share the same PRNG stream (the fused path reproduces the
    init-distance draw bit-for-bit), so outputs and parameter gradients must
    agree to fp32 tolerance.
    """
    import dataclasses

    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig
    from avr_tpu.config import parse_conf_string
    from tests.test_models import MODEL_CONF, _encode_inputs
    from tests.test_renderers import _rays

    conf = parse_conf_string(MODEL_CONF)["model"]
    cfg = ModelConfig.from_conf(conf)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    rcfg = AdaptiveRendererConfig(raymarch_steps=3, n_coarse=4)

    rng = np.random.default_rng(3)
    images, poses, focal, c = _encode_inputs(rng, H=32, W=32)
    xy, K, c2w = _rays(R=6)

    outs, grads = [], []
    for fused in ("never", "always"):
        model = RadFieldRenderer(
            model_cfg=cfg, renderer_cfg=rcfg, fused_march=fused
        )
        variables = model.init(
            jax.random.PRNGKey(0), images, poses, focal, c,
            method=model.init_all,
        )

        def loss_fn(variables):
            cond = model.apply(
                variables, images, poses, focal, c, method=model.encode
            )
            out = model.apply(
                variables, cond, xy, K, c2w, jax.random.PRNGKey(2),
                method=model.render,
            )
            return (
                jnp.mean(out.rgb_fine**2) + jnp.mean(out.rgb_coarse**2),
                out,
            )

        (loss, out), g = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        outs.append(out)
        grads.append(g)

    np.testing.assert_allclose(
        np.asarray(outs[0].rgb_fine), np.asarray(outs[1].rgb_fine),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(outs[0].depth_fine), np.asarray(outs[1].depth_fine),
        rtol=1e-4, atol=1e-5,
    )
    flat0 = jax.tree_util.tree_leaves_with_path(grads[0])
    flat1 = jax.tree.leaves(grads[1])
    assert len(flat0) == len(flat1)
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_wrapper_fused_march_matches_scan_march_multiview():
    """NS=2 sources: the fused march's in-kernel cross-view mean pool must
    match the scan path (render values; parameter grads to fp32 tolerance)."""
    import dataclasses

    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig
    from avr_tpu.config import parse_conf_string
    from tests.test_models import MODEL_CONF, _encode_inputs
    from tests.test_renderers import _rays

    conf = parse_conf_string(MODEL_CONF)["model"]
    cfg = ModelConfig.from_conf(conf)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    rcfg = AdaptiveRendererConfig(raymarch_steps=3, n_coarse=4)

    rng = np.random.default_rng(5)
    images, poses, focal, c = _encode_inputs(rng, NS=2, H=32, W=32)
    # make the second view genuinely different (small z-rotation + shift)
    a = 0.2
    rot = np.eye(4, dtype=np.float32)
    rot[:3, :3] = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
        np.float32,
    )
    poses = np.array(poses, copy=True)
    poses[:, 1] = poses[:, 1] @ rot
    poses = jnp.asarray(poses)
    xy, K, c2w = _rays(R=6)

    outs, grads = [], []
    for fused in ("never", "always"):
        model = RadFieldRenderer(
            model_cfg=cfg, renderer_cfg=rcfg, fused_march=fused
        )
        variables = model.init(
            jax.random.PRNGKey(0), images, poses, focal, c,
            method=model.init_all,
        )

        def loss_fn(variables):
            cond = model.apply(
                variables, images, poses, focal, c, method=model.encode
            )
            out = model.apply(
                variables, cond, xy, K, c2w, jax.random.PRNGKey(2),
                method=model.render,
            )
            return (
                jnp.mean(out.rgb_fine**2) + jnp.mean(out.rgb_coarse**2),
                out,
            )

        (loss, out), g = jax.value_and_grad(loss_fn, has_aux=True)(variables)
        outs.append(out)
        grads.append(g)

    np.testing.assert_allclose(
        np.asarray(outs[0].rgb_fine), np.asarray(outs[1].rgb_fine),
        rtol=1e-4, atol=1e-5,
    )
    flat0 = jax.tree_util.tree_leaves_with_path(grads[0])
    flat1 = jax.tree.leaves(grads[1])
    assert len(flat0) == len(flat1)
    for (path, a), b in zip(flat0, flat1):
        # atol 5e-5: the march is a chaotic recurrence, so f32
        # accumulation-order noise between the fused kernel and the scan
        # path grows with the draw; 1e-5 was marginal under the rbg PRNG.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.parametrize("eps", [0.05, 0.3])
def test_fused_march_early_stop_matches_reference(eps):
    """early_stop_eps > 0: masked-lane freezing (and the whole-block skip)
    must reproduce the scan path's values AND gradients exactly."""
    inp = _inputs(4)
    got = _fused(inp, early_stop_eps=eps)
    want = _ref_march(
        inp["feat"], inp["poses"], inp["focal"], inp["c"],
        inp["latent_scaling"], inp["image_shape"], inp["coords0"],
        inp["rds"], inp["wih"], inp["whh"], inp["bias"], inp["wout"],
        inp["bout"], early_stop_eps=eps,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # the threshold must actually bind for the small-eps case: some rays
    # frozen (differ from eps=0), some marched to a different endpoint
    free = _ref_march(
        inp["feat"], inp["poses"], inp["focal"], inp["c"],
        inp["latent_scaling"], inp["image_shape"], inp["coords0"],
        inp["rds"], inp["wih"], inp["whh"], inp["bias"], inp["wout"],
        inp["bout"],
    )
    assert not np.allclose(np.asarray(want), np.asarray(free))

    probe = jnp.asarray(
        np.random.default_rng(9).normal(size=(B, R, 3)).astype(np.float32)
    )
    diff_names = ["feat", "coords0", "rds", "wih", "whh", "bias", "wout",
                  "bout"]

    def loss_fused(*diff):
        d = dict(inp)
        d.update(dict(zip(diff_names, diff)))
        return jnp.sum(_fused(d, early_stop_eps=eps) * probe)

    def loss_ref(*diff):
        d = dict(inp)
        d.update(dict(zip(diff_names, diff)))
        return jnp.sum(
            _ref_march(
                d["feat"], d["poses"], d["focal"], d["c"],
                d["latent_scaling"], d["image_shape"], d["coords0"],
                d["rds"], d["wih"], d["whh"], d["bias"], d["wout"],
                d["bout"], early_stop_eps=eps,
            )
            * probe
        )

    args = tuple(inp[n] for n in diff_names)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    for name, a, b in zip(diff_names, g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}",
        )
