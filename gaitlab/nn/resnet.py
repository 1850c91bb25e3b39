"""Headless ResNet feature extractors in Flax.

Re-design of the vendored torchvision ResNet copy
(/root/reference/lib/models/resnet.py:121-346 — classifier head removed,
:155,211): standard stem + 4 stages -> global-average-pooled feature
vector. Module names mirror the torch paths so ImageNet/SPIN checkpoints
import mechanically through gaitlab.weights.torch_import.
"""

from __future__ import annotations

from typing import Sequence, Type

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaitlab.nn.hrnet import BasicBlock, Bottleneck
from gaitlab.nn.layers import batch_norm, conv

Array = jax.Array


def max_pool_3x3_s2(x: Array) -> Array:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1), NHWC."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class ResNet(nn.Module):
    """ResNet trunk: (N,H,W,3) -> (N, 512*expansion) pooled features."""

    block: Type[nn.Module] = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 return_spatial: bool = False):
        x = conv(64, 7, 2, padding=3, name="conv1")(x)
        x = batch_norm(train, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        expansion = getattr(self.block, "expansion", 1)
        inplanes = 64
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers), start=1):
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                has_ds = b == 0 and (stride != 1
                                     or inplanes != planes * expansion)
                x = self.block(planes=planes, stride=stride if b == 0 else 1,
                               has_downsample=has_ds,
                               name=f"layer{stage}_{b}")(x, train=train)
            inplanes = planes * expansion

        spatial = x
        x = jnp.mean(x, axis=(1, 2))  # global average pool (headless)
        if return_spatial:
            return x, spatial
        return x


def resnet18(**kw) -> ResNet:
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), **kw)


def resnet152(**kw) -> ResNet:
    return ResNet(block=Bottleneck, layers=(3, 8, 36, 3), **kw)
