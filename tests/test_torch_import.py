"""Weight-import shim tests.

Strategy: synthesize a torch-style state-dict with the right shapes from a
freshly initialized Flax module (applying the inverse layout transforms),
run the importer, and require exact tree/array equality with the original
variables.  This pins both the name mapping and every layout transpose.
"""

import numpy as np
import jax
import jax.numpy as jnp

from avr_tpu.models.mlp import ResnetFC
from avr_tpu.models.resnet import ResNetTrunk
from avr_tpu.models.torch_import import (
    import_lstm_cell,
    import_resnetfc,
    import_torchvision_resnet,
)
from avr_tpu.renderers.lstm import MarchLSTMCell


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def test_resnet_trunk_import_roundtrip():
    trunk = ResNetTrunk(backbone="resnet18", num_layers=3, norm_type="batch")
    variables = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    # synthesize the torch-style dict via the inverse transforms
    sd = {}
    sd["conv1.weight"] = params["conv1"]["kernel"].transpose(3, 2, 0, 1)
    sd["bn1.weight"] = params["bn1"]["scale"]
    sd["bn1.bias"] = params["bn1"]["bias"]
    sd["bn1.running_mean"] = stats["bn1"]["mean"]
    sd["bn1.running_var"] = stats["bn1"]["var"]
    for stage in range(2):
        for blk in range(2):
            t = f"layer{stage + 1}.{blk}"
            name = f"layer{stage + 1}_block{blk}"
            p = params[name]
            s = stats[name]
            sd[f"{t}.conv1.weight"] = p["conv1"]["kernel"].transpose(3, 2, 0, 1)
            sd[f"{t}.conv2.weight"] = p["conv2"]["kernel"].transpose(3, 2, 0, 1)
            for bn, tbn in (("bn1", "bn1"), ("bn2", "bn2")):
                sd[f"{t}.{tbn}.weight"] = p[bn]["scale"]
                sd[f"{t}.{tbn}.bias"] = p[bn]["bias"]
                sd[f"{t}.{tbn}.running_mean"] = s[bn]["mean"]
                sd[f"{t}.{tbn}.running_var"] = s[bn]["var"]
            if "down_conv" in p:
                sd[f"{t}.downsample.0.weight"] = p["down_conv"]["kernel"].transpose(
                    3, 2, 0, 1
                )
                sd[f"{t}.downsample.1.weight"] = p["down_bn"]["scale"]
                sd[f"{t}.downsample.1.bias"] = p["down_bn"]["bias"]
                sd[f"{t}.downsample.1.running_mean"] = s["down_bn"]["mean"]
                sd[f"{t}.downsample.1.running_var"] = s["down_bn"]["var"]

    imported = import_torchvision_resnet(sd, blocks_per_stage=(2, 2, 2, 2), num_layers=3)

    got_p = _flatten(imported["params"])
    want_p = _flatten(params)
    assert set(got_p) == set(want_p)
    for k in want_p:
        np.testing.assert_allclose(got_p[k], want_p[k], err_msg=k)

    got_s = _flatten(imported["batch_stats"])
    want_s = _flatten(stats)
    assert set(got_s) == set(want_s)

    # imported variables must run through the trunk
    out = trunk.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        jnp.zeros((1, 32, 32, 3)),
    )
    assert len(out) == 3


def test_lstm_import_roundtrip(rng):
    cell = MarchLSTMCell(hidden_size=8)
    variables = cell.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16)), (jnp.zeros((1, 8)), jnp.zeros((1, 8)))
    )
    p = jax.tree.map(np.asarray, variables["params"])
    sd = {
        "lstm.weight_ih": p["w_ih"].T,
        "lstm.weight_hh": p["w_hh"].T,
        "lstm.bias_ih": p["b_ih"],
        "lstm.bias_hh": p["b_hh"],
    }
    imported = import_lstm_cell(sd)
    for k in p:
        np.testing.assert_allclose(imported[k], p[k], err_msg=k)


def test_resnetfc_import_roundtrip():
    mlp = ResnetFC(d_in=7, d_out=4, n_blocks=2, d_latent=11, d_hidden=16,
                   combine_layer=1)
    variables = mlp.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 3, 7)), jnp.zeros((1, 1, 3, 11))
    )
    p = jax.tree.map(np.asarray, variables["params"])

    sd = {}
    def put(name, d):
        sd[f"mlp.{name}.weight"] = d["kernel"].T
        sd[f"mlp.{name}.bias"] = d["bias"]

    put("lin_in", p["lin_in"])
    put("lin_out", p["lin_out"])
    for i in range(2):
        put(f"blocks.{i}.fc_0", p[f"block_{i}"]["fc_0"])
        put(f"blocks.{i}.fc_1", p[f"block_{i}"]["fc_1"])
    put("lin_z.0", p["lin_z_0"])

    imported = import_resnetfc(sd, "mlp", n_blocks=2, n_lin_z=1)
    got = _flatten(imported)
    want = _flatten(p)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], err_msg=k)
