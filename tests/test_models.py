"""Model-layer tests: positional encoding, decoder MLP, encoders, field.

Oracles are pure numpy reimplementations of the math (not the reference
code), so wiring errors (injection points, combine layer, activation
order, output ordering) show up as numerical diffs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from avr_tpu.config import parse_conf_string
from avr_tpu.models.code import PositionalEncoding
from avr_tpu.models.mlp import ResnetFC
from avr_tpu.models.resnet import ResNetTrunk
from avr_tpu.models.encoder import SpatialEncoder
from avr_tpu.models.pixelnerf import ModelConfig, PixelNeRFNet, make_model
from avr_tpu.ops.resize import resize_bilinear_align_corners
from avr_tpu.ops.grid_sample import grid_sample_2d

MODEL_CONF = """
model {
    use_encoder = True
    use_xyz = True
    use_code = True
    code { num_freqs = 6
           freq_factor = 1.5
           include_input = True }
    use_viewdirs = True
    use_code_viewdirs = False
    mlp_coarse { type = resnet
                 n_blocks = 2
                 d_hidden = 32
                 combine_layer = 1
                 combine_type = average }
    mlp_fine { type = resnet
               n_blocks = 2
               d_hidden = 32
               combine_layer = 1
               combine_type = average }
    encoder { backbone = resnet18
              pretrained = False
              num_layers = 2 }
}
"""


# ------------------------- positional encoding ---------------------------


def test_positional_encoding_ordering_and_values(rng):
    d_in, F_ = 3, 2
    x = rng.normal(size=(5, d_in)).astype(np.float32)
    pe = PositionalEncoding(num_freqs=F_, d_in=d_in, freq_factor=1.5, include_input=True)
    out = np.asarray(pe.apply({}, jnp.asarray(x)))
    assert out.shape == (5, d_in + 2 * F_ * d_in)
    freqs = 1.5 * 2.0 ** np.arange(F_)
    want = [x]
    for k in range(2 * F_):
        f = freqs[k // 2]
        fn = np.sin if k % 2 == 0 else np.cos
        want.append(fn(x * f))
    want = np.concatenate(want, axis=-1)
    np.testing.assert_allclose(out, want, atol=1e-5)
    assert pe.d_out == out.shape[-1]


# ------------------------------ ResnetFC ---------------------------------


def _dense(p, name):
    k = np.asarray(p[name]["kernel"])
    b = np.asarray(p[name].get("bias", np.zeros(k.shape[1])))
    return k, b


def np_resnetfc(params, x, z, n_blocks, combine_layer):
    """Numpy oracle: (SB, NS, B, d) inputs, average combine."""
    relu = lambda a: np.maximum(a, 0)
    kin, bin_ = _dense(params, "lin_in")
    h = x @ kin + bin_
    combined = False
    for i in range(n_blocks):
        if i == combine_layer:
            h = h.mean(axis=1)
            combined = True
        if z is not None and i < combine_layer:
            kz, bz = _dense(params, f"lin_z_{i}")
            h = h + (z @ kz + bz)
        blk = params[f"block_{i}"]
        k0, b0 = _dense(blk, "fc_0")
        k1, b1 = _dense(blk, "fc_1")
        net = relu(h) @ k0 + b0
        dx = relu(net) @ k1 + b1
        h = h + dx
    if not combined:
        h = h.mean(axis=1)
    kout, bout = _dense(params, "lin_out")
    return relu(h) @ kout + bout


@pytest.mark.parametrize("ns,combine_layer", [(1, 1000), (2, 1), (3, 2)])
def test_resnetfc_matches_numpy_oracle(rng, ns, combine_layer):
    d_in, d_latent, d_hidden, n_blocks = 7, 11, 16, 3
    mlp = ResnetFC(
        d_in=d_in, d_out=4, n_blocks=n_blocks, d_latent=d_latent,
        d_hidden=d_hidden, combine_layer=combine_layer,
    )
    x = rng.normal(size=(2, ns, 5, d_in)).astype(np.float32)
    z = rng.normal(size=(2, ns, 5, d_latent)).astype(np.float32)
    params = mlp.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(z))
    got = np.asarray(mlp.apply(params, jnp.asarray(x), jnp.asarray(z)))
    want = np_resnetfc(params["params"], x, z, n_blocks, combine_layer)
    assert got.shape == (2, 5, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resnetfc_fresh_blocks_are_identity(rng):
    # fc_1 zero-init -> each residual block is the identity at init.
    mlp = ResnetFC(d_in=4, d_out=4, n_blocks=3, d_latent=0, d_hidden=8)
    x = jnp.asarray(rng.normal(size=(1, 1, 6, 4)).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(1), x)
    p = params["params"]
    for i in range(3):
        np.testing.assert_allclose(np.asarray(p[f"block_{i}"]["fc_1"]["kernel"]), 0.0)


# ----------------------------- resize op ---------------------------------


def test_resize_align_corners_matches_torch(rng):
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (11, 13)))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = F.interpolate(t, size=(11, 13), mode="bilinear", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_downscale_matches_torch(rng):
    x = rng.normal(size=(1, 16, 16, 2)).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (5, 9)))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = F.interpolate(t, size=(5, 9), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)


# --------------------------- ResNet trunk --------------------------------


def test_resnet_trunk_stage_shapes():
    trunk = ResNetTrunk(backbone="resnet18", num_layers=4, norm_type="group")
    x = jnp.zeros((1, 64, 64, 3))
    params = trunk.init(jax.random.PRNGKey(0), x)
    feats = trunk.apply(params, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 32, 32, 64),
        (1, 16, 16, 64),
        (1, 8, 8, 128),
        (1, 4, 4, 256),
    ]
    assert ResNetTrunk.latent_size("resnet34", 4) == 512
    assert ResNetTrunk.latent_size("resnet34", 5) == 1024


def test_spatial_encoder_latent_and_scaling():
    enc = SpatialEncoder(backbone="resnet18", num_layers=4, norm_type="group")
    x = jnp.zeros((2, 64, 64, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    latent, scaling = enc.apply(params, x)
    assert latent.shape == (2, 32, 32, 512)
    np.testing.assert_allclose(
        np.asarray(scaling), [2 * 32 / 31, 2 * 32 / 31], rtol=1e-6
    )


# ------------------------------ the field --------------------------------


def _tiny_model(**overrides):
    import dataclasses

    conf = parse_conf_string(MODEL_CONF)["model"]
    cfg = ModelConfig.from_conf(conf, **overrides)
    # group norm: no batch_stats bookkeeping needed in these tests
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    return PixelNeRFNet(cfg=cfg)


def _encode_inputs(rng, SB=1, NS=1, H=32, W=32):
    images = rng.normal(size=(SB, NS, H, W, 3)).astype(np.float32)
    # camera at +z looking at origin via the OpenCV flip convention
    c2w = np.eye(4, dtype=np.float32) @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    c2w[2, 3] = 1.3
    poses = np.broadcast_to(c2w, (SB, NS, 4, 4)).copy()
    focal = np.float32(1.09375 * W)
    c = np.asarray([W / 2, H / 2], np.float32)
    return jnp.asarray(images), jnp.asarray(poses), focal, jnp.asarray(c)


def test_field_query_shapes_and_ranges(rng):
    net = _tiny_model()
    images, poses, focal, c = _encode_inputs(rng)
    xyz = jnp.asarray(rng.normal(scale=0.3, size=(1, 17, 3)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(1, 17, 3)).astype(np.float32))

    variables = net.init(jax.random.PRNGKey(0), images, poses, focal, c, method=net.init_all)
    cond = net.apply(variables, images, poses, focal, c, method=net.encode)
    out = net.apply(variables, cond, xyz, vd)
    assert out.shape == (1, 17, 4)
    o = np.asarray(out)
    assert (o[..., :3] >= 0).all() and (o[..., :3] <= 1).all()  # sigmoid rgb
    assert (o[..., 3] >= 0).all()  # relu sigma

    feats = net.apply(variables, cond, xyz, vd, return_features=True)
    assert feats.shape == (1, 1, 17, net.latent_size)


def test_field_d_in_matches_reference_arithmetic():
    net = _tiny_model()
    # use_xyz(3) -> code(6 freqs, include_input): 3 + 2*6*3 = 39 -> +3 viewdirs = 42
    assert net.d_in == 42
    assert net.d_latent == net.latent_size


def test_field_projection_gathers_expected_latent(rng):
    """The uv->latent path must equal a hand-computed grid_sample call."""
    net = _tiny_model()
    images, poses, focal, c = _encode_inputs(rng, H=32, W=32)
    xyz = jnp.asarray(rng.normal(scale=0.3, size=(1, 9, 3)).astype(np.float32))
    vd = jnp.zeros((1, 9, 3))

    variables = net.init(jax.random.PRNGKey(0), images, poses, focal, c, method=net.init_all)
    cond = net.apply(variables, images, poses, focal, c, method=net.encode)
    feats = np.asarray(net.apply(variables, cond, xyz, vd, return_features=True))

    # hand-compute: rotate into cam space, project, normalize, gather
    w2c = np.asarray(cond.poses)[0]  # (3, 4)
    pts = np.asarray(xyz)[0]
    cam = pts @ w2c[:, :3].T + w2c[:, 3]
    uv = -cam[:, :2] / cam[:, 2:3]
    uv = uv * np.asarray(cond.focal)[0] + np.asarray(cond.c)[0]
    grid = uv * (np.asarray(cond.latent_scaling) / np.asarray(cond.image_shape)) - 1.0
    want = np.asarray(
        grid_sample_2d(cond.latent, jnp.asarray(grid[None]))
    )
    np.testing.assert_allclose(feats[0, 0], want[0], rtol=1e-4, atol=1e-5)


def test_multiview_query_pools_views(rng):
    net = _tiny_model()
    images, poses, focal, c = _encode_inputs(rng, NS=2)
    xyz = jnp.asarray(rng.normal(scale=0.3, size=(1, 5, 3)).astype(np.float32))
    vd = jnp.zeros((1, 5, 3))
    variables = net.init(jax.random.PRNGKey(0), images, poses, focal, c, method=net.init_all)
    cond = net.apply(variables, images, poses, focal, c, method=net.encode)
    out = net.apply(variables, cond, xyz, vd)
    assert out.shape == (1, 5, 4)
    feats = net.apply(variables, cond, xyz, vd, return_features=True)
    assert feats.shape == (1, 2, 5, net.latent_size)


def test_stop_encoder_grad_blocks_encoder_gradients(rng):
    for stop, expect_zero in [(True, True), (False, False)]:
        net = _tiny_model(stop_encoder_grad=stop)
        images, poses, focal, c = _encode_inputs(rng)
        xyz = jnp.asarray(rng.normal(scale=0.3, size=(1, 5, 3)).astype(np.float32))
        vd = jnp.zeros((1, 5, 3))

        def loss(variables):
            cond = net.apply(variables, images, poses, focal, c, method=net.encode)
            out = net.apply(variables, cond, xyz, vd)
            return jnp.sum(out ** 2)

        variables = net.init(jax.random.PRNGKey(0), images, poses, focal, c, method=net.init_all)
        g = jax.grad(loss)(variables)
        enc_norm = sum(
            float(jnp.sum(jnp.abs(x)))
            for x in jax.tree.leaves(g["params"]["encoder"])
        )
        if expect_zero:
            assert enc_norm == 0.0
        else:
            assert enc_norm > 0.0


def test_make_model_from_conf():
    conf = parse_conf_string(MODEL_CONF)
    net = make_model(conf["model"])
    assert isinstance(net, PixelNeRFNet)
    assert net.cfg.use_viewdirs and not net.cfg.use_code_viewdirs
