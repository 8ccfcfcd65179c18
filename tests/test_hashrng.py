"""Sharding-invariant per-ray RNG (avr_tpu.ops.hashrng).

The contract (VERDICT round-3 weak #6): with ``rng_mode='per_ray'`` the
training stream depends only on the *global* batch — GSPMD, shard_map,
the single-chip step, and any ray-chunking all consume bitwise-identical
sampler randomness, so mesh shape / step implementation no longer change
the training trajectory.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from avr_tpu.ops import hashrng
from avr_tpu.renderers.base import AdaptiveRendererConfig, VolumeRendererConfig
from avr_tpu.training import LossParams, create_train_state, make_train_step
from tests.test_parallel import _inputs, _make_model
from avr_tpu.parallel import make_mesh, make_sharded_train_step
from avr_tpu.parallel.mesh import shard_train_inputs


# ---------------------------------------------------------------------------
# hash primitives
# ---------------------------------------------------------------------------


def test_hash_uniform_range_and_determinism():
    rs = hashrng.derive(jax.random.PRNGKey(7), hashrng.global_ray_ids(4, 128))
    u1 = np.asarray(hashrng.hash_uniform(rs, (4, 128, 16)))
    u2 = np.asarray(hashrng.hash_uniform(rs, (4, 128, 16)))
    np.testing.assert_array_equal(u1, u2)
    assert u1.min() >= 0.0 and u1.max() < 1.0
    # crude uniformity: mean ~ 0.5, var ~ 1/12
    assert abs(u1.mean() - 0.5) < 0.01
    assert abs(u1.var() - 1.0 / 12.0) < 0.005


def test_hash_normal_moments():
    rs = hashrng.derive(jax.random.PRNGKey(3), hashrng.global_ray_ids(8, 256))
    z = np.asarray(hashrng.hash_normal(rs, (8, 256, 8)))
    assert np.isfinite(z).all()
    assert abs(z.mean()) < 0.02
    assert abs(z.std() - 1.0) < 0.02


def test_salts_and_keys_decorrelate():
    gids = hashrng.global_ray_ids(2, 512)
    rs = hashrng.derive(jax.random.PRNGKey(0), gids)
    u_a = np.asarray(hashrng.hash_uniform(rs.fold(1), (2, 512, 4)))
    u_b = np.asarray(hashrng.hash_uniform(rs.fold(2), (2, 512, 4)))
    assert np.abs(np.corrcoef(u_a.ravel(), u_b.ravel())[0, 1]) < 0.05
    rs2 = hashrng.derive(jax.random.PRNGKey(1), gids)
    u_c = np.asarray(hashrng.hash_uniform(rs2.fold(1), (2, 512, 4)))
    assert np.abs(np.corrcoef(u_a.ravel(), u_c.ravel())[0, 1]) < 0.05
    assert not np.allclose(u_a, u_b) and not np.allclose(u_a, u_c)


def test_split_any_matches_jax_split_on_keys():
    k = jax.random.PRNGKey(5)
    a, b = hashrng.split_any(k)
    wa, wb = jax.random.split(k)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(wa))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(wb))


def test_shard_ray_ids_match_global_iota():
    """The shard_map-side id reconstruction equals the GSPMD iota values."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh((2, 4))
    SB, R = 4, 64

    def body():
        return hashrng.shard_ray_ids(SB // 2, R // 4, "data", "rays")

    got = shard_map(
        body, mesh=mesh, in_specs=(), out_specs=P("data", "rays"),
        check_rep=False,
    )()
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(hashrng.global_ray_ids(SB, R))
    )


# ---------------------------------------------------------------------------
# step-implementation agreement with randomness ON
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "rcfg",
    [
        AdaptiveRendererConfig(raymarch_steps=2, n_coarse=4),
        VolumeRendererConfig(n_coarse=6, n_fine=4, n_fine_depth=2),
    ],
    ids=["adaptive", "volume"],
)
def test_step_impls_agree_with_randomness(rcfg):
    """Single-chip, GSPMD, and shard_map steps produce the same loss and
    update with full sampling randomness enabled (rng_mode='per_ray'):
    stratified jitter, importance u, depth randn, march init distance all
    hash global ray ids instead of per-step keys."""
    from avr_tpu.parallel import make_shardmap_train_step

    rng = np.random.default_rng(11)
    model = _make_model(rcfg)
    tx = optax.adam(1e-3)
    images, poses, focal, c, model_input, gt = _inputs(rng, SB=2, R=64)
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=model.init_all
    )
    key = jax.random.PRNGKey(3)
    lp = LossParams()

    s0 = create_train_state(variables, tx)
    step0 = make_train_step(model, tx, lp, donate=False, rng_mode="per_ray")
    s0b, m0 = step0(s0, images, poses, focal, c, model_input, gt, key)

    mesh = make_mesh((2, 4))
    args = shard_train_inputs(mesh, images, poses, focal, c, model_input, gt)

    sA = create_train_state(variables, tx)
    stepA = make_sharded_train_step(model, tx, lp, mesh, donate=False,
                                    rng_mode="per_ray")
    sA2, mA = stepA(sA, *args, key)

    sB = create_train_state(variables, tx)
    stepB = make_shardmap_train_step(model, tx, lp, mesh, donate=False,
                                     rng_mode="per_ray")
    sB2, mB = stepB(sB, *args, key)

    # the loss equality IS the identical-stream assertion; the params
    # comparison guards gross divergence only — grads differ by cross-shard
    # fp32 reduction order (fusion choices even vary with process history),
    # and Adam's rsqrt amplifies near-zero-grad elements (observed: one
    # element in 36k at 8e-5 abs)
    l0, lA, lB = (float(m["loss"]) for m in (m0, mA, mB))
    np.testing.assert_allclose(lA, l0, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(lB, l0, rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(sA2.params), jax.tree.leaves(s0b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)
    for a, b in zip(jax.tree.leaves(sB2.params), jax.tree.leaves(s0b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_ray_chunked_stream_equals_unchunked_per_ray():
    """rng_mode='per_ray' removes the chunked step's documented RNG
    deviation: chunks consume slices of the same global seed map."""
    rng = np.random.default_rng(2)
    model = _make_model(AdaptiveRendererConfig(raymarch_steps=2, n_coarse=4))
    tx = optax.adam(1e-3)
    images, poses, focal, c, model_input, gt = _inputs(rng, SB=2, R=64)
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=model.init_all
    )
    key = jax.random.PRNGKey(9)
    lp = LossParams()
    outs = []
    for chunks in (1, 4):
        s = create_train_state(variables, tx)
        step = make_train_step(model, tx, lp, donate=False,
                               ray_chunks=chunks, rng_mode="per_ray")
        s2, m = step(s, images, poses, focal, c, model_input, gt, key)
        outs.append((s2, float(m["loss"])))
    # identical streams -> losses agree tightly; params differ only by fp32
    # accumulation order, which Adam's rsqrt amplifies (same tolerance story
    # as test_ray_chunked_step_matches_unchunked)
    np.testing.assert_allclose(outs[1][1], outs[0][1], rtol=1e-6)
    for a, b in zip(
        jax.tree.leaves(outs[0][0].params), jax.tree.leaves(outs[1][0].params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)
