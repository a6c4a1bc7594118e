"""Flax ResNet backbone: conversion parity vs a torch mirror + HDF5 roundtrip.

torchvision is not installed in this environment, so the oracle is a
hand-written torch ResNet whose module names replicate torchvision's
``state_dict`` key scheme exactly (conv1 / bn1 / layerS.B.convN /
layerS.B.downsample.{0,1} / fc) — converting it exercises the same key
translation as a real torchvision checkpoint.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from navc_tpu.models.resnet import (  # noqa: E402
    IMAGENET_MEAN, IMAGENET_STD, ResNet, convert_torchvision_resnet,
    init_resnet, make_backbone)

STAGES = (1, 1, 1, 1)  # tiny resnet, bottleneck layout
WIDTH = 8


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(tnn.Module):
    """torchvision-v1 ResNet with identical state_dict keys."""

    def __init__(self, stages=STAGES, width=WIDTH):
        super().__init__()
        self.inplanes = width
        self.conv1 = tnn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        for s, n in enumerate(stages):
            planes = width * (2 ** s)
            stride = 1 if s == 0 else 2
            setattr(self, "layer%d" % (s + 1),
                    self._make_layer(planes, n, stride))
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(width * 8 * 4, 10)  # dropped by the converter

    def _make_layer(self, planes, blocks, stride):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self.inplanes, planes))
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, "layer%d" % (s + 1))(x)
        return self.avgpool(x).flatten(1)


def randomized_torch_model(seed=0):
    torch.manual_seed(seed)
    model = TorchResNet().eval()
    # randomize BN running stats so the conversion of batch_stats is exercised
    rng = np.random.RandomState(seed + 1)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (rng.rand(m.num_features).astype(np.float32) * 0.5 + 0.75)))
    return model


def test_torch_conversion_feature_parity():
    tmodel = randomized_torch_model()
    variables = convert_torchvision_resnet(tmodel.state_dict())

    # converted tree must match the flax init template exactly
    template = init_resnet(jax.random.PRNGKey(0), STAGES, WIDTH, image_size=64)
    flat_t = jax.tree_util.tree_structure(template)
    flat_c = jax.tree_util.tree_structure(variables)
    assert flat_t == flat_c

    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    model = ResNet(stage_sizes=STAGES, width=WIDTH)
    got = np.asarray(model.apply(variables, jnp.asarray(imgs), train=False))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_make_backbone_normalizes_and_batches():
    tmodel = randomized_torch_model(3)
    variables = convert_torchvision_resnet(tmodel.state_dict())
    backbone = make_backbone(variables, STAGES, WIDTH, batch_size=2)
    rng = np.random.RandomState(1)
    imgs = rng.rand(5, 64, 64, 3).astype(np.float32)
    feats = backbone(imgs)
    assert feats.shape == (5, WIDTH * 8 * 4)
    normed = (imgs - IMAGENET_MEAN) / IMAGENET_STD
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(normed.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(feats, ref, atol=1e-4, rtol=1e-4)


def test_hdf5_extraction_roundtrip(tmp_path):
    """Full offline pipeline: jpg frames -> backbone -> HDF5 (reference
    extract_image_feats_from_frames.py:20-59)."""
    h5py = pytest.importorskip("h5py")
    from PIL import Image

    from navc_tpu.data.pretreatment import extract_video_features

    rng = np.random.RandomState(0)
    frame_dirs = {}
    for vid in ("video0", "video1"):
        d = tmp_path / vid
        d.mkdir()
        for i in range(6):
            arr = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / ("image_%05d.jpg" % i))
        frame_dirs[vid] = str(d)

    variables = init_resnet(jax.random.PRNGKey(1), STAGES, WIDTH, image_size=64)
    backbone = make_backbone(variables, STAGES, WIDTH, batch_size=4)
    out = str(tmp_path / "image_feats.hdf5")
    extract_video_features(frame_dirs, backbone, out, k_frames=4,
                           batch_size=4, image_size=64)

    with h5py.File(out) as f:
        assert set(f.keys()) == {"video0", "video1"}
        for vid in f:
            assert f[vid].shape == (4, WIDTH * 8 * 4)
            assert np.isfinite(f[vid][()]).all()
