"""type=mlp decoder path (ImplicitNet) tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from avr_tpu.config import parse_conf_string
from avr_tpu.models.implicit import ImplicitNet
from avr_tpu.models.pixelnerf import ModelConfig, PixelNeRFNet
from tests.test_models import MODEL_CONF, _encode_inputs


def test_implicit_net_shapes_and_combine(rng):
    net = ImplicitNet(d_in=5, d_out=4, n_layers=4, d_hidden=16, d_latent=7,
                      combine_layer=2, skip_in=(1,))
    x = jnp.asarray(rng.normal(size=(2, 3, 6, 5)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(2, 3, 6, 7)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, z)
    out = net.apply(variables, x, z)
    assert out.shape == (2, 6, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pixelnerf_with_mlp_decoder(rng):
    conf_text = MODEL_CONF.replace("type = resnet", "type = mlp")
    conf = parse_conf_string(conf_text)["model"]
    cfg = ModelConfig.from_conf(conf)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    net = PixelNeRFNet(cfg=cfg)
    images, poses, focal, c = _encode_inputs(rng)
    xyz = jnp.asarray(rng.normal(scale=0.3, size=(1, 5, 3)).astype(np.float32))
    vd = jnp.zeros((1, 5, 3))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=net.init_all
    )
    cond = net.apply(variables, images, poses, focal, c, method=net.encode)
    out = net.apply(variables, cond, xyz, vd)
    assert out.shape == (1, 5, 4)
    o = np.asarray(out)
    assert (o[..., :3] >= 0).all() and (o[..., 3] >= 0).all()
