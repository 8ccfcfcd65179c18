"""Produce a local LPIPS-VGG weight archive for avr_tpu.utils.lpips.

The reference evaluates LPIPS(net='vgg') at test time
(/root/reference/test.py:24,63).  This environment has zero network
egress, so pretrained VGG-16 + LPIPS calibration weights cannot be
downloaded; two local-weights paths exist:

1. **Convert real weights** (the production recipe, run wherever the
   torch ``lpips`` package + internet exist)::

       # offline:
       #   import lpips, torch
       #   m = lpips.LPIPS(net='vgg')
       #   torch.save(m.state_dict(), 'lpips_vgg.pt')
       # then here:
       python scripts/make_lpips_weights.py --from_torch lpips_vgg.pt \
           --out lpips_vgg.npz

   The resulting archive is the calibrated metric — comparable to
   published LPIPS numbers.  (`tests/test_lpips.py` pins the converter +
   forward math against a torch oracle, so a converted archive is
   numerically trustworthy.)

2. **Deterministic random-VGG** (``--random``): He-init VGG-16 features
   with uniform non-negative calibration heads.  The LPIPS paper itself
   (Zhang et al. 2018, Table 5) reports that *randomly initialized*
   networks already correlate far better with human perceptual judgments
   than PSNR/SSIM — useful as a relative, self-consistent perceptual
   score when no pretrained weights can exist.  The archive carries an
   ``_uncalibrated`` marker and the evaluator reports it as
   ``lpips_rand`` so it can NEVER be mistaken for published LPIPS.

Usage examples::

    python scripts/make_lpips_weights.py --random --out /tmp/lpips_rand.npz
    python -m avr_tpu.cli.test ... --lpips_weights /tmp/lpips_rand.npz
"""

import argparse

import numpy as np

# torchvision VGG16 `features` conv indices per LPIPS slice, and each
# slice's output channels (the real VGG-16 plan)
_VGG_SLICES = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
_CHANS = [
    [64, 64],
    [128, 128],
    [256, 256, 256],
    [512, 512, 512],
    [512, 512, 512],
]
# official LPIPS ScalingLayer constants (public, from the paper's code)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32).reshape(1, 3, 1, 1)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32).reshape(1, 3, 1, 1)


def random_state(seed: int):
    rng = np.random.default_rng(seed)
    state = {
        "scaling_layer.shift": _SHIFT,
        "scaling_layer.scale": _SCALE,
        "_uncalibrated": np.asarray([1], np.int32),
        "_seed": np.asarray([seed], np.int32),
    }
    cin = 3
    for s, layer_ids in enumerate(_VGG_SLICES):
        for li, lid in enumerate(layer_ids):
            cout = _CHANS[s][li]
            fan_in = cin * 9
            w = rng.normal(0.0, np.sqrt(2.0 / fan_in), (cout, cin, 3, 3))
            state[f"net.slice{s + 1}.{lid}.weight"] = w.astype(np.float32)
            state[f"net.slice{s + 1}.{lid}.bias"] = np.zeros(cout, np.float32)
            cin = cout
        state[f"lin{s}.model.1.weight"] = np.full(
            (1, cin, 1, 1), 1.0 / cin, np.float32
        )
    return state


def convert_torch(path: str):
    import torch

    sd = torch.load(path, map_location="cpu")
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy().astype(np.float32)
    for k in ("scaling_layer.shift", "scaling_layer.scale"):
        if k not in out:
            raise ValueError(f"{path}: missing key {k} — not an LPIPS state dict?")
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--from_torch", type=str,
                   help="torch.save'd lpips.LPIPS(net='vgg') state dict")
    g.add_argument("--random", action="store_true",
                   help="deterministic random-VGG (uncalibrated; reported "
                        "as lpips_rand)")
    p.add_argument("--seed", type=int, default=0)
    opt = p.parse_args(argv)

    state = (
        convert_torch(opt.from_torch) if opt.from_torch
        else random_state(opt.seed)
    )
    np.savez(opt.out, **state)
    kind = "calibrated (converted)" if opt.from_torch else "UNCALIBRATED random-VGG"
    print(f"wrote {opt.out}: {kind}, {len(state)} arrays")


if __name__ == "__main__":
    main()
