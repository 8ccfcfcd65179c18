"""LPIPS-VGG verification against a torch oracle with random weights.

The environment ships no pretrained VGG/LPIPS weight archive (zero
egress), so these tests pin the *math* of ``avr_tpu/utils/lpips.py``
instead: random weights in the exact torch ``lpips.LPIPS(net='vgg')``
state-dict layout the converter expects, evaluated by an independent
torch implementation of the official LPIPS computation (the reference
evaluates LPIPS-VGG at test.py:24,63).  This covers both the weight
conversion (OIHW->HWIO transpose, buffer reshapes, key naming) and the
forward math (scaling layer, VGG slices, unit-normalize, calibrated
1x1, spatial average).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

# Tiny VGG-16-shaped plan: same slice structure / state-dict keys as the
# real net, small channel counts so the test runs in milliseconds.  The
# layer ids inside each slice are the torchvision `features` indices
# preserved by lpips's Sequential slicing.
_CHANS = [4, 8, 8, 16, 16]
_VGG_SLICES = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]


def _random_state(rng):
    """Random weights in the torch LPIPS state-dict layout."""
    state = {
        "scaling_layer.shift": rng.normal(size=(1, 3, 1, 1)).astype(np.float32),
        "scaling_layer.scale": rng.uniform(0.3, 0.7, size=(1, 3, 1, 1)).astype(
            np.float32
        ),
    }
    cin = 3
    for s, layer_ids in enumerate(_VGG_SLICES):
        cout = _CHANS[s]
        for lid in layer_ids:
            state[f"net.slice{s + 1}.{lid}.weight"] = (
                rng.normal(size=(cout, cin, 3, 3)).astype(np.float32) * 0.3
            )
            state[f"net.slice{s + 1}.{lid}.bias"] = (
                rng.normal(size=(cout,)).astype(np.float32) * 0.1
            )
            cin = cout
        # calibration heads are non-negative 1x1 convs in the real model
        state[f"lin{s}.model.1.weight"] = np.abs(
            rng.normal(size=(1, cout, 1, 1)).astype(np.float32)
        )
    return state


def _torch_lpips(state, a, b):
    """Official LPIPS computation in torch (NHWC [-1,1] numpy inputs)."""
    ta = torch.from_numpy(a).permute(0, 3, 1, 2)
    tb = torch.from_numpy(b).permute(0, 3, 1, 2)
    shift = torch.from_numpy(state["scaling_layer.shift"])
    scale = torch.from_numpy(state["scaling_layer.scale"])

    def feats(x):
        x = (x - shift) / scale
        out = []
        for s, layer_ids in enumerate(_VGG_SLICES):
            if s > 0:
                x = F.max_pool2d(x, 2)
            for lid in layer_ids:
                w = torch.from_numpy(state[f"net.slice{s + 1}.{lid}.weight"])
                bias = torch.from_numpy(state[f"net.slice{s + 1}.{lid}.bias"])
                x = F.relu(F.conv2d(x, w, bias, padding=1))
            out.append(x)
        return out

    fa, fb = feats(ta), feats(tb)
    total = torch.zeros(ta.shape[0])
    for s in range(5):
        # official normalize_tensor: eps added to the norm (not the sum)
        na = fa[s] / (fa[s].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = fb[s] / (fb[s].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        diff = (na - nb) ** 2
        w = torch.from_numpy(state[f"lin{s}.model.1.weight"])
        total = total + F.conv2d(diff, w).mean(dim=(1, 2, 3))
    return total.numpy()


@pytest.fixture(scope="module")
def weights_npz(tmp_path_factory):
    rng = np.random.default_rng(0)
    state = _random_state(rng)
    path = tmp_path_factory.mktemp("lpips") / "lpips_tiny.npz"
    np.savez(str(path), **state)
    return str(path), state


def test_lpips_matches_torch_oracle(weights_npz):
    path, state = weights_npz
    from avr_tpu.utils.lpips import LPIPS

    metric = LPIPS(path)
    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    got = metric(a, b)
    want = _torch_lpips(state, a, b)
    assert got.shape == (2,)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_zero_for_identical_and_symmetric(weights_npz):
    path, _ = weights_npz
    from avr_tpu.utils.lpips import LPIPS

    metric = LPIPS(path)
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(metric(a, a), 0.0, atol=1e-6)
    np.testing.assert_allclose(metric(a, b), metric(b, a), rtol=1e-5)
    assert metric(a, b)[0] > 0.0


def test_lpips_factory_and_eval_surface(weights_npz):
    """metrics.lpips_vgg loads the archive; the evaluation.py call pattern
    (lpips(pred*2-1, gt*2-1)[0], test.py:63) yields a finite scalar."""
    path, _ = weights_npz
    from avr_tpu.utils.metrics import lpips_vgg

    metric = lpips_vgg(path)
    rng = np.random.default_rng(3)
    pred = rng.uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, size=(1, 32, 32, 3)).astype(np.float32)
    val = float(metric(pred * 2 - 1, gt * 2 - 1)[0])
    assert np.isfinite(val) and val >= 0.0
