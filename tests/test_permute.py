"""permutation_take: value + gradient parity with take_along_axis.

The op replaces the sort/unsort ``take_along_axis`` pairs in the
renderers; its whole point is that the VJP is a *gather* by the inverse
permutation instead of XLA's scatter-add.  Value and gradient must both
equal the take_along_axis reference exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from avr_tpu.ops.permute import permutation_take


def _ref_take(a, o):
    expanded = o.reshape(o.shape + (1,) * (a.ndim - o.ndim))
    return jnp.take_along_axis(a, expanded, axis=1)


def test_permutation_take_matches_take_along_axis():
    rng = np.random.default_rng(0)
    for shape in [(2, 7), (2, 7, 3), (3, 16, 4, 2)]:
        a = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        order = jnp.asarray(
            np.stack([rng.permutation(shape[1]) for _ in range(shape[0])])
        )
        inv = jnp.argsort(order, axis=-1)
        np.testing.assert_array_equal(
            np.asarray(permutation_take(a, order, inv)),
            np.asarray(_ref_take(a, order)),
        )
        # round trip is the identity
        np.testing.assert_array_equal(
            np.asarray(
                permutation_take(permutation_take(a, order, inv), inv, order)
            ),
            np.asarray(a),
        )


def test_permutation_take_gradient_is_inverse_gather():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(2, 9, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 9, 3)).astype(np.float32))
    order = jnp.asarray(np.stack([rng.permutation(9) for _ in range(2)]))
    inv = jnp.argsort(order, axis=-1)

    g_ours = jax.grad(lambda x: jnp.sum(permutation_take(x, order, inv) * w))(a)
    g_ref = jax.grad(lambda x: jnp.sum(_ref_take(x, order) * w))(a)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=0)

    # and no scatter appears in the compiled backward
    hlo = (
        jax.jit(jax.grad(lambda x: jnp.sum(permutation_take(x, order, inv) * w)))
        .lower(a)
        .compile()
        .as_text()
    )
    assert "scatter" not in hlo


def test_renderer_sorts_still_pure_permutations():
    """The wired-in call sites keep their bitwise-equality contracts."""
    from avr_tpu.renderers.base import VolumeRendererConfig
    from avr_tpu.renderers.volume import render_volume
    from tests.test_renderers import _rays, shell_field

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


def test_volume_sort_gradients_match_unsorted():
    """Gradients through the sorted VR path equal the unsorted path's.

    This is the property the scatter-free VJP must preserve: the sort is
    invisible to autodiff (pure permutation inside a sum-reduced loss).
    """
    from avr_tpu.renderers.base import VolumeRendererConfig
    from avr_tpu.renderers.volume import render_volume
    from tests.test_renderers import _rays

    xy, K, c2w = _rays(R=8)
    cfg = VolumeRendererConfig(n_coarse=6, n_fine=4, n_fine_depth=2)

    def loss(scale, sort):
        def field(pts, vd, coarse):
            d = jnp.linalg.norm(pts - jnp.asarray([0.0, 0.0, 1.3]), axis=-1)
            sigma = scale * jnp.exp(-((d - 1.0) ** 2) * 40.0)
            rgb = jax.nn.sigmoid(pts * scale)
            return jnp.concatenate([rgb, sigma[..., None]], axis=-1)

        out = render_volume(
            cfg, jax.random.PRNGKey(0), field, xy, K, c2w,
            sort_key_fn=(lambda pts: pts[..., 1] * 3.0 + pts[..., 2])
            if sort else None,
        )
        return jnp.sum(out.rgb_fine**2) + jnp.sum(out.rgb_coarse)

    g_plain = jax.grad(loss)(jnp.float32(2.0), False)
    g_sorted = jax.grad(loss)(jnp.float32(2.0), True)
    np.testing.assert_allclose(
        np.asarray(g_sorted), np.asarray(g_plain), rtol=1e-6
    )
