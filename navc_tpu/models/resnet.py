"""Flax ResNet image backbone for offline feature extraction.

The reference extracts 2048-d image features with a last-layer-stripped
ResNet-101 (pretreatment/extract_image_feats_from_frames.py:104-114, via
``pretrainedmodels``: conv stem -> 4 bottleneck stages -> global average
pool). This module provides the TPU-native equivalent:

  * ``ResNet`` — the torchvision-v1 architecture (Bottleneck layout,
    stride-2 3x3 in the middle conv) so ImageNet checkpoints convert 1:1;
  * ``convert_torchvision_resnet`` — torchvision ``resnet101().state_dict()``
    (or any resnetXX) -> flax variables;
  * ``make_backbone`` — a jitted ``images (N, H, W, 3) in [0,1] -> (N, 2048)``
    callable with ImageNet normalization, pluggable into
    ``data.pretreatment.extract_video_features``.

Weights are obtained offline (zero-egress environments convert a locally
available torchvision checkpoint); random-init works for pipeline tests.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

RESNET_STAGES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + residual."""

    planes: int
    stride: int = 1
    with_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, epsilon=1e-5)
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        residual = x
        y = conv(self.planes, (1, 1), name="conv1")(x)
        y = bn(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                 padding=((1, 1), (1, 1)), name="conv2")(y)
        y = bn(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.planes * 4, (1, 1), name="conv3")(y)
        y = bn(name="bn3")(y)

        if self.with_downsample:
            residual = conv(self.planes * 4, (1, 1),
                            strides=(self.stride, self.stride),
                            name="downsample_conv")(x)
            residual = bn(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """torchvision-v1 ResNet trunk; returns pooled (N, 512*width*4) features."""

    stage_sizes: Sequence[int] = RESNET_STAGES[101]
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, n_blocks in enumerate(self.stage_sizes):
            planes = self.width * (2 ** stage)
            for block in range(n_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(
                    planes=planes, stride=stride,
                    with_downsample=(block == 0), dtype=self.dtype,
                    name="layer%d_%d" % (stage + 1, block))(x, train=train)

        return x.mean(axis=(1, 2))  # global average pool -> (N, C)


# ---------------------------------------------------------------------------
# torchvision state_dict conversion
# ---------------------------------------------------------------------------


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(w):  # torch (O, I, kH, kW) -> flax (kH, kW, I, O)
    return np.ascontiguousarray(_np(w).transpose(2, 3, 1, 0))


def convert_torchvision_resnet(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision ``resnetXX().state_dict()`` -> flax ResNet variables.

    The classifier head (``fc.*``) is dropped — the reference strips it too
    (extract_image_feats_from_frames.py:110).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val

    def bn(dst, prefix):
        put(params, dst + ["scale"], _np(state_dict[prefix + ".weight"]))
        put(params, dst + ["bias"], _np(state_dict[prefix + ".bias"]))
        put(stats, dst + ["mean"], _np(state_dict[prefix + ".running_mean"]))
        put(stats, dst + ["var"], _np(state_dict[prefix + ".running_var"]))

    put(params, ["conv1", "kernel"], _conv(state_dict["conv1.weight"]))
    bn(["bn1"], "bn1")

    for key in state_dict:
        parts = key.split(".")
        if parts[0].startswith("layer") and parts[-1] == "weight" \
                and parts[2].startswith("conv"):
            stage = int(parts[0][5:])
            block = int(parts[1])
            name = "layer%d_%d" % (stage, block)
            put(params, [name, parts[2], "kernel"], _conv(state_dict[key]))
            bn([name, "bn" + parts[2][4:]], "%s.%s.bn%s" % (parts[0], parts[1],
                                                            parts[2][4:]))
        elif parts[0].startswith("layer") and "downsample" in key \
                and parts[-1] == "weight" and parts[3] == "0":
            stage, block = int(parts[0][5:]), int(parts[1])
            name = "layer%d_%d" % (stage, block)
            put(params, [name, "downsample_conv", "kernel"], _conv(state_dict[key]))
            bn([name, "downsample_bn"], "%s.%s.downsample.1" % (parts[0], parts[1]))

    return {"params": params, "batch_stats": stats}


def make_backbone(variables: Dict[str, Any],
                  stage_sizes: Sequence[int] = RESNET_STAGES[101],
                  width: int = 64, batch_size: int = 32):
    """images (N, H, W, 3) float32 in [0, 1] -> features (N, C) np.ndarray.

    Applies ImageNet normalization and runs the trunk jitted; suitable as the
    ``backbone`` argument of data.pretreatment.extract_video_features.
    """
    model = ResNet(stage_sizes=stage_sizes, width=width)

    @jax.jit
    def run(imgs):
        x = (imgs - IMAGENET_MEAN) / IMAGENET_STD
        return model.apply(variables, x, train=False)

    def backbone(images: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(images), batch_size):
            out.append(np.asarray(run(jnp.asarray(images[i:i + batch_size]))))
        return np.concatenate(out) if out else np.zeros((0, width * 32), np.float32)

    return backbone


def init_resnet(rng: jax.Array, stage_sizes: Sequence[int] = RESNET_STAGES[101],
                width: int = 64, image_size: int = 224) -> Dict[str, Any]:
    model = ResNet(stage_sizes=stage_sizes, width=width)
    return model.init(rng, jnp.zeros((1, image_size, image_size, 3)), train=False)
