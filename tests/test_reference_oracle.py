"""Golden tests against the ACTUAL PyTorch reference code.

VERDICT round-1 item 3: every other parity test re-derives the reference
math; these import `/root/reference/{utils,renderers,models}.py` (via
``_reference_loader``, torch-CPU + module stubs) and execute the reference
functions themselves as the oracle.  If either side's math drifts, these
fail.

Randomness: torch and JAX RNG streams differ, so stochastic functions are
compared by monkeypatching BOTH sides' samplers to the same fixed arrays
(the math around the randomness is then deterministic).  Deterministic
functions are compared directly.

Oracle surfaces pinned here (reference locations):
  * sample_coarse / sample_fine / sample_depth   renderers.py:4-66
  * volume_integral                              renderers.py:69-119
  * get_world_rays / unproject / pixel grid /
    depth_from_world                             utils.py:219-361
  * loss_fn                                      utils.py:364-377
  * PositionalEncoding                           models.py:41-87
  * ResnetBlockFC / ResnetFC (weights imported
    through models.torch_import)                 models.py:407-606
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from _reference_loader import load

from avr_tpu.models.code import PositionalEncoding
from avr_tpu.models.mlp import ResnetFC
from avr_tpu.models.torch_import import import_resnetfc
from avr_tpu.ops.integrate import volume_integral
from avr_tpu.ops.sampling import sample_coarse, sample_depth, sample_fine
from avr_tpu.renderers.base import RenderOutput
from avr_tpu.training.loss import LossParams, loss_fn
from avr_tpu.utils import geometry

REF = load()
CPU = torch.device("cpu")


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _queue_uniform(monkeypatch, arrays):
    """Make jax.random.uniform return the given arrays in order."""
    queue = [jnp.asarray(a, dtype=jnp.float32) for a in arrays]

    def fake_uniform(key, shape=(), dtype=jnp.float32, **kw):
        # the samplers draw in a flat 2D layout and reshape (VPU-friendly
        # RNG, ops/sampling.py); linear order is identical, so serve the
        # queued array reshaped to whatever layout was requested
        a = queue.pop(0)
        assert int(np.prod(a.shape)) == int(np.prod(shape)), (a.shape, shape)
        return a.reshape(shape).astype(dtype)

    monkeypatch.setattr(jax.random, "uniform", fake_uniform)


# ---------------------------------------------------------------------------
# Samplers (shared fixed jitter on both sides)
# ---------------------------------------------------------------------------


def test_sample_coarse_matches_reference(rng, monkeypatch):
    SB, R, n = 2, 7, 9
    near = rng.uniform(0.5, 0.9, (SB, R)).astype(np.float32)
    far = rng.uniform(1.4, 1.9, (SB, R)).astype(np.float32)
    jitter = rng.uniform(0.0, 1.0, (SB, R, n)).astype(np.float32)

    monkeypatch.setattr(torch, "rand_like", lambda t: _t(jitter))
    want = REF.renderers.sample_coarse(_t(near), _t(far), n, CPU).numpy()

    _queue_uniform(monkeypatch, [jitter])
    got = np.asarray(sample_coarse(jax.random.PRNGKey(0), near, far, n))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # the (caller-unused) infinity tail path too (renderers.py:16-19)
    monkeypatch.setattr(torch, "rand_like", lambda t: _t(jitter))
    want_inf = REF.renderers.sample_coarse(_t(near), _t(far), n, CPU, infinity=2.5).numpy()
    _queue_uniform(monkeypatch, [jitter])
    got_inf = np.asarray(
        sample_coarse(jax.random.PRNGKey(0), near, far, n, infinity=2.5)
    )
    np.testing.assert_allclose(got_inf, want_inf, rtol=1e-6, atol=1e-6)


def test_sample_fine_matches_reference(rng, monkeypatch):
    SB, R, n_coarse, n_fine = 2, 5, 8, 6
    near = rng.uniform(0.5, 0.9, (SB, R)).astype(np.float32)
    far = rng.uniform(1.4, 1.9, (SB, R)).astype(np.float32)
    weights = rng.uniform(0.0, 1.0, (SB, R, n_coarse, 1)).astype(np.float32)
    u = rng.uniform(0.0, 1.0, (SB, R, n_fine)).astype(np.float32)
    jitter = rng.uniform(0.0, 1.0, (SB, R, n_fine)).astype(np.float32)

    monkeypatch.setattr(torch, "rand", lambda *s, **kw: _t(u))
    monkeypatch.setattr(torch, "rand_like", lambda t: _t(jitter))
    want = REF.renderers.sample_fine(_t(near), _t(far), n_fine, _t(weights), CPU).numpy()

    _queue_uniform(monkeypatch, [u, jitter])
    got = np.asarray(
        sample_fine(jax.random.PRNGKey(0), near, far, n_fine, weights)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_sample_depth_matches_reference(rng, monkeypatch):
    SB, R, n = 2, 5, 4
    depth = rng.uniform(0.8, 1.6, (SB, R, 1)).astype(np.float32)
    noise = rng.normal(0.0, 1.0, (SB, R, n)).astype(np.float32)

    monkeypatch.setattr(torch, "randn_like", lambda t: _t(noise))
    want = REF.renderers.sample_depth(_t(depth), n, 0.01).numpy()

    monkeypatch.setattr(
        jax.random, "normal", lambda key, shape, dtype=jnp.float32: jnp.asarray(noise)
    )
    got = np.asarray(sample_depth(jax.random.PRNGKey(0), depth, n, 0.01))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # pin the behaviour-as-written: the mean really is dropped
    np.testing.assert_allclose(want, noise * 0.01, rtol=1e-6)


# ---------------------------------------------------------------------------
# Volume integral (fully deterministic)
# ---------------------------------------------------------------------------


def test_volume_integral_matches_reference(rng):
    SB, R, n = 2, 11, 16
    z_vals = np.sort(rng.uniform(0.8, 1.8, (SB, R, n)).astype(np.float32), axis=-1)
    sigmas = np.abs(rng.normal(0.0, 4.0, (SB, R, n, 1))).astype(np.float32)
    radiances = rng.uniform(0.0, 1.0, (SB, R, n, 3)).astype(np.float32)

    for white_back in (True, False):
        want_rgb, want_depth, want_w = REF.renderers.volume_integral(
            _t(z_vals), _t(sigmas), _t(radiances), white_back=white_back
        )
        got_rgb, got_depth, got_w = volume_integral(
            jnp.asarray(z_vals), jnp.asarray(sigmas), jnp.asarray(radiances),
            white_back=white_back,
        )
        np.testing.assert_allclose(np.asarray(got_rgb), want_rgb.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_depth), want_depth.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Geometry / rays (fully deterministic)
# ---------------------------------------------------------------------------


def _random_pose(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = q.astype(np.float32)
    c2w[:3, 3] = rng.normal(0.0, 1.0, 3).astype(np.float32)
    return c2w


def test_pixel_grid_matches_reference():
    for (h, w) in ((8, 8), (16, 16)):
        want = REF.utils.get_opencv_pixel_coordinates(h, w).numpy()
        got = np.asarray(geometry.get_opencv_pixel_coordinates(h, w))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_unproject_matches_reference(rng):
    N = 13
    xy = rng.uniform(0.0, 1.0, (1, N, 2)).astype(np.float32)
    z = rng.uniform(0.5, 2.0, (1, N, 1)).astype(np.float32)
    K = np.array([[[1.2, 0.0, 0.5], [0.0, 1.1, 0.5], [0.0, 0.0, 1.0]]], np.float32)
    want = REF.utils.unproject(_t(xy), _t(z), _t(K)).numpy()
    got = np.asarray(geometry.unproject(jnp.asarray(xy), jnp.asarray(z), jnp.asarray(K)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_world_rays_and_depth_match_reference(rng):
    SB, N = 2, 9
    xy = rng.uniform(0.0, 1.0, (SB, N, 2)).astype(np.float32)
    K = np.broadcast_to(
        np.array([[1.4, 0.0, 0.5], [0.0, -1.4, 0.5], [0.0, 0.0, 1.0]], np.float32),
        (SB, 3, 3),
    ).copy()
    c2w = np.stack(
        [np.stack([_random_pose(rng) for _ in range(N)]) for _ in range(SB)]
    )  # (SB, N, 4, 4) per-ray poses, as in training

    want_ro, want_rd = REF.utils.get_world_rays(_t(xy), _t(K), _t(c2w))
    got_ro, got_rd = geometry.get_world_rays(
        jnp.asarray(xy), jnp.asarray(K), jnp.asarray(c2w)
    )
    np.testing.assert_allclose(np.asarray(got_ro), want_ro.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_rd), want_rd.numpy(), rtol=1e-5, atol=1e-5)

    pts = rng.normal(0.0, 1.0, (SB, N, 3)).astype(np.float32)
    want_d = REF.utils.depth_from_world(_t(pts), _t(c2w)).numpy()
    got_d = np.asarray(geometry.depth_from_world(jnp.asarray(pts), jnp.asarray(c2w)))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Loss (deterministic; NaN guard included)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["coarse", "fine", "both"])
@pytest.mark.parametrize("depth_reg", [False, True])
def test_loss_fn_matches_reference(rng, mode, depth_reg):
    SB, R = 2, 17
    rgb_c = rng.uniform(0, 1, (SB, R, 3)).astype(np.float32)
    rgb_f = rng.uniform(0, 1, (SB, R, 3)).astype(np.float32)
    # depths outside [0.5, 2.0] on purpose so the hinge is active
    depth = rng.uniform(0.1, 2.6, (SB, R, 1)).astype(np.float32)
    gt = rng.uniform(0, 1, (SB, R, 3)).astype(np.float32)

    want = REF.utils.loss_fn(
        (_t(rgb_c), _t(rgb_f), _t(depth), _t(depth)), _t(gt), (mode, depth_reg)
    )
    want = float(want) if not torch.is_tensor(want) else float(want.item())

    out = RenderOutput(
        rgb_coarse=jnp.asarray(rgb_c), rgb_fine=jnp.asarray(rgb_f),
        depth_coarse=jnp.asarray(depth), depth_fine=jnp.asarray(depth),
    )
    got = float(loss_fn(out, jnp.asarray(gt),
                        LossParams(loss_mode=mode, depth_regularization=depth_reg)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_loss_fn_nan_guard_matches_reference():
    SB, R = 1, 4
    nan_img = np.full((SB, R, 3), np.nan, np.float32)
    gt = np.zeros((SB, R, 3), np.float32)
    depth = np.ones((SB, R, 1), np.float32)
    want = REF.utils.loss_fn(
        (_t(nan_img), _t(nan_img), _t(depth), _t(depth)), _t(gt), ("both", False)
    )
    want = float(want) if not torch.is_tensor(want) else float(want.item())
    out = RenderOutput(jnp.asarray(nan_img), jnp.asarray(nan_img),
                       jnp.asarray(depth), jnp.asarray(depth))
    got = float(loss_fn(out, jnp.asarray(gt), LossParams(loss_mode="both")))
    assert want == 1e-6
    # ours guards in float32, so the sentinel is fp32(1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# Positional encoding (deterministic)
# ---------------------------------------------------------------------------


def test_positional_encoding_matches_reference(rng):
    B = 23
    x = rng.normal(0.0, 1.0, (B, 3)).astype(np.float32)
    for include_input in (True, False):
        ref_pe = REF.models.PositionalEncoding(
            num_freqs=6, d_in=3, freq_factor=1.5, include_input=include_input
        )
        with torch.no_grad():
            want = ref_pe(_t(x)).numpy()
        pe = PositionalEncoding(num_freqs=6, d_in=3, freq_factor=1.5,
                                include_input=include_input)
        got = np.asarray(pe.apply({}, jnp.asarray(x)))
        assert got.shape == want.shape == (B, ref_pe.d_out)
        # atol covers torch-vs-XLA fp32 sin ulp differences at large freq*x
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# ResnetFC decoder (weights copied from the live reference module)
# ---------------------------------------------------------------------------


def _import_ref_resnetfc(ref_mlp, n_blocks, combine_layer):
    sd = {f"mlp.{k}": v.detach().numpy() for k, v in ref_mlp.state_dict().items()}
    return import_resnetfc(
        sd, "mlp", n_blocks=n_blocks, n_lin_z=min(combine_layer, n_blocks)
    )


@pytest.mark.parametrize(
    "NS,combine_layer",
    [(1, 1000), (2, 3), (3, 3)],
    ids=["single-view", "mv2-combine3", "mv3-combine3"],
)
def test_resnetfc_matches_reference(rng, NS, combine_layer):
    """Full decoder parity vs the live reference module (models.py:473-606),
    including the multi-view mean-pool at combine_layer (models.py:579-581)."""
    SB, B = 2, 10
    d_in, d_latent, d_hidden, n_blocks = 9, 24, 32, 5

    torch.manual_seed(0)
    ref_mlp = REF.models.ResnetFC(
        d_in, d_out=4, n_blocks=n_blocks, d_latent=d_latent, d_hidden=d_hidden,
        combine_layer=combine_layer, combine_type="average",
    )

    x = rng.normal(0.0, 1.0, (SB, NS, B, d_in)).astype(np.float32)
    z = rng.normal(0.0, 1.0, (SB, NS, B, d_latent)).astype(np.float32)

    # reference consumes flat (SB*NS*B, d_latent + d_in), z first
    zx = np.concatenate([z, x], axis=-1).reshape(SB * NS * B, d_latent + d_in)
    with torch.no_grad():
        want = ref_mlp(_t(zx), combine_inner_dims=(NS, B)).numpy()
    want = want.reshape(SB, B, 4) if NS > 1 else want.reshape(SB, NS * B, 4)

    mlp = ResnetFC(
        d_in=d_in, d_out=4, n_blocks=n_blocks, d_latent=d_latent,
        d_hidden=d_hidden, combine_layer=combine_layer, combine_type="average",
        fused="never",
    )
    params = _import_ref_resnetfc(ref_mlp, n_blocks, combine_layer)
    got = np.asarray(mlp.apply({"params": params}, jnp.asarray(x), jnp.asarray(z)))
    assert got.shape == (SB, B * (NS if combine_layer >= n_blocks else 1), 4) or NS == 1
    np.testing.assert_allclose(got.reshape(want.shape), want, rtol=3e-5, atol=3e-6)


def test_reference_shortcut_block_is_a_dead_path():
    """Pin a reference defect: ResnetBlockFC with size_in != size_out cannot
    even be constructed — the shortcut is created with bias=False and the
    very next line calls init.constant_ on its (None) bias (reference
    models.py:449-451).  Every live call site uses equal sizes, so the
    working shortcut in our ResnetBlockFC is a deliberate repair, not a
    deviation that an oracle can check."""
    with pytest.raises(AttributeError):
        REF.models.ResnetBlockFC(size_in=12, size_out=20)
