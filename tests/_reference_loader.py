"""Import the actual PyTorch reference (/root/reference) as a golden oracle.

The reference's heavy deps (torchvision, skimage, lpips, gdown, dotmap,
pyhocon) are absent in this environment, but every use of them in the
modules we test is lazy — so module-level stubs are enough to import
``utils.py``, ``renderers.py`` and ``models.py`` and execute their math
directly with torch-CPU (VERDICT round-1 item 3).

The one non-lazy need is ``torchvision.models.resnet34`` inside
``SpatialEncoder.__init__`` (reference models.py:227): the stub provides a
from-scratch standard BasicBlock ResNet (public textbook architecture)
whose state-dict naming matches torchvision's, so the repo's
``import_torchvision_resnet`` shim consumes it unchanged.

Everything is installed/removed around the import so the rest of the test
suite never sees the stubs or the reference modules.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

_REF_DIR = "/root/reference"
_cache = None


def _make_torchvision_stub():
    import torch
    from torch import nn

    class BasicBlock(nn.Module):
        def __init__(self, c_in, c_out, stride=1, norm_layer=nn.BatchNorm2d):
            super().__init__()
            self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
            self.bn1 = norm_layer(c_out)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
            self.bn2 = norm_layer(c_out)
            if stride != 1 or c_in != c_out:
                self.downsample = nn.Sequential(
                    nn.Conv2d(c_in, c_out, 1, stride, bias=False), norm_layer(c_out)
                )
            else:
                self.downsample = None

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, layers, pretrained=False, norm_layer=nn.BatchNorm2d, **kw):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = norm_layer(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            chans = [64, 128, 256, 512]
            c_in = 64
            for i, (c, n) in enumerate(zip(chans, layers)):
                blocks = []
                for b in range(n):
                    stride = 2 if (b == 0 and i > 0) else 1
                    blocks.append(BasicBlock(c_in, c, stride, norm_layer))
                    c_in = c
                setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512, 1000)

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet18 = lambda **kw: ResNet([2, 2, 2, 2], **kw)
    tv_models.resnet34 = lambda **kw: ResNet([3, 4, 6, 3], **kw)
    tv.models = tv_models
    tv.datasets = types.ModuleType("torchvision.datasets")
    tv.transforms = types.ModuleType("torchvision.transforms")
    return {
        "torchvision": tv,
        "torchvision.models": tv_models,
        "torchvision.datasets": tv.datasets,
        "torchvision.transforms": tv.transforms,
    }


def _make_stubs():
    stubs = _make_torchvision_stub()

    sk = types.ModuleType("skimage")
    sk_metrics = types.ModuleType("skimage.metrics")
    sk_transform = types.ModuleType("skimage.transform")
    sk_transform.resize = None
    sk.metrics = sk_metrics
    sk.transform = sk_transform
    stubs.update(
        {"skimage": sk, "skimage.metrics": sk_metrics, "skimage.transform": sk_transform}
    )

    for name in ("lpips", "gdown"):
        stubs[name] = types.ModuleType(name)

    dotmap = types.ModuleType("dotmap")
    dotmap.DotMap = dict
    stubs["dotmap"] = dotmap

    pyhocon = types.ModuleType("pyhocon")
    pyhocon.ConfigFactory = object
    stubs["pyhocon"] = pyhocon
    return stubs


def load():
    """Import the reference modules once; returns (utils, renderers, models)."""
    global _cache
    if _cache is not None:
        return _cache

    os.environ.setdefault("MPLBACKEND", "Agg")
    stubs = _make_stubs()
    ref_names = ("utils", "renderers", "models", "dataset")
    saved = {}
    for name in list(stubs) + list(ref_names):
        if name in sys.modules:
            saved[name] = sys.modules.pop(name)
    sys.modules.update(stubs)
    sys.path.insert(0, _REF_DIR)
    try:
        utils = importlib.import_module("utils")
        renderers = importlib.import_module("renderers")
        models = importlib.import_module("models")
    finally:
        sys.path.remove(_REF_DIR)
        for name in list(stubs) + list(ref_names):
            sys.modules.pop(name, None)
        sys.modules.update(saved)

    _cache = types.SimpleNamespace(utils=utils, renderers=renderers, models=models)
    return _cache
