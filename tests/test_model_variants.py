"""Coverage for the less-traveled model variants: global encoder, BN MLP,
custom conv encoder, no-viewdirs/z-only feature modes, SPADE injection."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avr_tpu.config import parse_conf_string
from avr_tpu.models.encoder import ConvEncoder, ImageEncoder
from avr_tpu.models.mlp import ResnetFC
from avr_tpu.models.pixelnerf import ModelConfig, PixelNeRFNet
from tests.test_models import _encode_inputs

GLOBAL_CONF = """
model {
    use_encoder = True
    use_global_encoder = True
    global_encoder { backbone = resnet18
                     latent_size = 32 }
    use_xyz = True
    use_code = True
    code { num_freqs = 2
           freq_factor = 1.5
           include_input = True }
    use_viewdirs = True
    use_code_viewdirs = False
    mlp_coarse { type = resnet
                 n_blocks = 2
                 d_hidden = 32
                 combine_layer = 1 }
    mlp_fine { type = empty }
    encoder { backbone = resnet18
              pretrained = False
              num_layers = 2 }
}
"""


def _net(conf_text, **over):
    conf = parse_conf_string(conf_text)["model"]
    cfg = ModelConfig.from_conf(conf, **over)
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    return PixelNeRFNet(cfg=cfg)


def test_global_encoder_concat_and_empty_fine(rng):
    net = _net(GLOBAL_CONF)
    assert net.cfg.use_global_encoder
    assert net.cfg.mlp_fine is None  # type = empty
    assert net.d_latent == net.latent_size + 32

    images, poses, focal, c = _encode_inputs(rng)
    xyz = jnp.asarray(rng.normal(scale=0.3, size=(1, 5, 3)).astype(np.float32))
    vd = jnp.zeros((1, 5, 3))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=net.init_all
    )
    cond = net.apply(variables, images, poses, focal, c, method=net.encode)
    assert cond.global_latent.shape == (1, 32)
    # coarse=False must fall back to mlp_coarse (mlp_fine empty)
    out = net.apply(variables, cond, xyz, vd, coarse=False)
    assert out.shape == (1, 5, 4)


def test_image_encoder_shapes():
    enc = ImageEncoder(backbone="resnet18", latent_size=64, norm_type="group")
    x = jnp.zeros((3, 64, 64, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (3, 64)


def test_conv_encoder_output_geometry():
    enc = ConvEncoder(norm_type="group")
    x = jnp.zeros((1, 64, 64, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    # full input resolution, 128 channels (reference dims = [128]; the
    # deconv stack upsamples back past the stem's stride-2)
    assert out.shape == (1, 64, 64, 128)


def test_bn_mlp_runs_and_updates_stats(rng):
    mlp = ResnetFC(d_in=4, d_out=4, n_blocks=2, d_latent=0, d_hidden=8, bn=True)
    x = jnp.asarray(rng.normal(size=(2, 1, 16, 4)).astype(np.float32))
    variables = mlp.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" in variables
    out, updates = mlp.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 16, 4)
    # stats moved away from init
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )


def test_spade_injection(rng):
    mlp = ResnetFC(
        d_in=4, d_out=4, n_blocks=2, d_latent=6, d_hidden=8, combine_layer=1,
        use_spade=True,
    )
    x = jnp.asarray(rng.normal(size=(1, 1, 8, 4)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(1, 1, 8, 6)).astype(np.float32))
    variables = mlp.init(jax.random.PRNGKey(0), x, z)
    assert "scale_z_0" in variables["params"]
    out = mlp.apply(variables, x, z)
    assert out.shape == (1, 8, 4)


def test_z_only_feature_mode(rng):
    conf_text = GLOBAL_CONF.replace("use_xyz = True", "use_xyz = False").replace(
        "use_global_encoder = True", "use_global_encoder = False"
    )
    net = _net(conf_text)
    # d_in: z(1) -> code(2 freqs: 1 + 2*2*1 = 5) -> +3 viewdirs = 8
    assert net.d_in == 8
    images, poses, focal, c = _encode_inputs(rng)
    xyz = jnp.asarray(rng.normal(scale=0.3, size=(1, 5, 3)).astype(np.float32))
    vd = jnp.zeros((1, 5, 3))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=net.init_all
    )
    cond = net.apply(variables, images, poses, focal, c, method=net.encode)
    out = net.apply(variables, cond, xyz, vd)
    assert out.shape == (1, 5, 4)


def test_gather_impl_auto_resolves_to_xla_on_cpu(rng):
    conf = parse_conf_string(GLOBAL_CONF)["model"]
    cfg = ModelConfig.from_conf(conf)
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, norm_type="group"),
        gather_impl="auto",
        use_global_encoder=False,
    )
    net = PixelNeRFNet(cfg=cfg)
    images, poses, focal, c = _encode_inputs(rng)
    xyz = jnp.asarray(rng.normal(scale=0.3, size=(1, 5, 3)).astype(np.float32))
    vd = jnp.zeros((1, 5, 3))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=net.init_all
    )
    cond = net.apply(variables, images, poses, focal, c, method=net.encode)
    out = net.apply(variables, cond, xyz, vd)  # would crash if pallas on cpu
    assert out.shape == (1, 5, 4)
