"""Mixed-precision (bf16 compute / f32 params) numerics tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax

from avr_tpu.config import parse_conf_string
from avr_tpu.models.pixelnerf import ModelConfig
from avr_tpu.models.wrapper import RadFieldRenderer
from avr_tpu.renderers.base import AdaptiveRendererConfig
from avr_tpu.training import LossParams, create_train_state, make_train_step
from tests.test_models import MODEL_CONF, _encode_inputs
from tests.test_renderers import _rays


def _model(dtype):
    conf = parse_conf_string(MODEL_CONF)["model"]
    cfg = ModelConfig.from_conf(conf)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    return RadFieldRenderer(
        model_cfg=cfg,
        renderer_cfg=AdaptiveRendererConfig(raymarch_steps=2, n_coarse=4),
        dtype=dtype,
    )


def test_bf16_render_close_to_f32(rng):
    m32 = _model(jnp.float32)
    m16 = _model(jnp.bfloat16)
    images, poses, focal, c = _encode_inputs(rng, H=32, W=32)
    variables = m32.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=m32.init_all
    )
    xy, K, c2w = _rays(R=16)
    key = jax.random.PRNGKey(3)

    def run(m):
        cond = m.apply(variables, images, poses, focal, c, method=m.encode)
        return m.apply(variables, cond, xy, K, c2w, key, method=m.render)

    out32 = run(m32)
    out16 = run(m16)
    # params are shared; bf16 compute must stay close and outputs are f32
    assert out16.rgb_fine.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out16.rgb_fine), np.asarray(out32.rgb_fine), atol=0.1
    )
    assert np.all(np.isfinite(np.asarray(out16.depth_fine)))


def test_bf16_train_step_params_stay_f32(rng):
    model = _model(jnp.bfloat16)
    images, poses, focal, c = _encode_inputs(rng, H=32, W=32)
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=model.init_all
    )
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32

    tx = optax.adam(1e-3)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, LossParams(), donate=False)
    xy, K, c2w = _rays(R=8)
    gt = jnp.asarray(rng.uniform(size=(1, 8, 3)).astype(np.float32))
    mi = {"x_pix": xy, "cam2world": c2w, "intrinsics": K}
    state2, m = step(state, images, poses, focal, c, mi, gt, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree.leaves(state2.params):
        assert leaf.dtype == jnp.float32
