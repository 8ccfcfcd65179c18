"""Metric tests: PSNR closed-form, SSIM properties + hand-checked values."""

import numpy as np
import pytest

from avr_tpu.utils.metrics import psnr, ssim, get_metrics


def test_psnr_closed_form():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(psnr(a, b), 10 * np.log10(1.0 / 0.01), rtol=1e-6)
    assert psnr(a, a) == float("inf")


def test_ssim_identity_and_monotonicity(rng):
    x = rng.uniform(size=(32, 32, 3))
    assert abs(ssim(x, x) - 1.0) < 1e-9
    y1 = np.clip(x + rng.normal(scale=0.05, size=x.shape), 0, 1)
    y2 = np.clip(x + rng.normal(scale=0.3, size=x.shape), 0, 1)
    s1, s2 = ssim(x, y1), ssim(x, y2)
    assert 1.0 > s1 > s2


def test_ssim_matches_direct_computation(rng):
    """Cross-check the integral-image path against a naive sliding window."""
    x = rng.uniform(size=(12, 12)).astype(np.float64)
    y = rng.uniform(size=(12, 12)).astype(np.float64)
    win = 7
    NP = win * win
    cov_norm = NP / (NP - 1)
    K1, K2 = 0.01, 0.03
    C1, C2 = K1**2, K2**2
    vals = []
    for r in range(12 - win + 1):
        for c in range(12 - win + 1):
            wx = x[r : r + win, c : c + win]
            wy = y[r : r + win, c : c + win]
            ux, uy = wx.mean(), wy.mean()
            vx = cov_norm * (np.mean(wx * wx) - ux * ux)
            vy = cov_norm * (np.mean(wy * wy) - uy * uy)
            vxy = cov_norm * (np.mean(wx * wy) - ux * uy)
            vals.append(
                ((2 * ux * uy + C1) * (2 * vxy + C2))
                / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
            )
    np.testing.assert_allclose(ssim(x, y), np.mean(vals), rtol=1e-10)


def test_get_metrics_shapes(rng):
    sl = 16
    pred = rng.uniform(size=(2, sl * sl, 3)).astype(np.float32)
    gt = rng.uniform(size=(2, sl * sl, 3)).astype(np.float32)
    out = (pred, pred, None, None)
    p, s = get_metrics(out, gt, fine=True)
    assert np.isfinite(p) and -1 <= s <= 1
    # perfect prediction
    p2, s2 = get_metrics((gt, gt, None, None), gt)
    assert p2 == float("inf") and abs(s2 - 1.0) < 1e-9


def test_lpips_gate_raises_without_weights():
    from avr_tpu.utils.metrics import lpips_vgg

    with pytest.raises(FileNotFoundError):
        lpips_vgg(None)
