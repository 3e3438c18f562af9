"""ResNet backbone (detectron2-compatible), NHWC, flax.linen.

Parity target: detectron2's ``build_resnet_backbone`` as configured by the flagship
configs (configs/GoMatching_ICDAR15.yaml:6-11): depth 50, FrozenBN, STRIDE_IN_1X1
False (i.e. torchvision-style stride placement in the 3x3 conv), OUT_FEATURES
res3/res4/res5. All convs use explicit torch-style symmetric padding so feature-map
alignment matches the reference exactly.

The whole backbone is frozen in GoMatching (FREEZE_TYPE=ExceptROIheads), so
BatchNorm is folded to a per-channel affine at apply time.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """BatchNorm with frozen statistics: y = (x - mean) * gamma / sqrt(var+eps) + beta."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = gamma / jnp.sqrt(var + self.eps)
        return x * scale + (beta - mean * scale)


def conv(features, kernel, stride=1, name=None):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        name=name,
    )


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (carries the stride) -> 1x1 bottleneck with FrozenBN."""

    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        if self.has_shortcut:
            identity = conv(self.out_channels, 1, self.stride, name="shortcut")(x)
            identity = FrozenBN(self.out_channels, name="shortcut_norm")(identity)
        y = conv(self.bottleneck_channels, 1, 1, name="conv1")(x)
        y = nn.relu(FrozenBN(self.bottleneck_channels, name="norm1")(y))
        y = conv(self.bottleneck_channels, 3, self.stride, name="conv2")(y)
        y = nn.relu(FrozenBN(self.bottleneck_channels, name="norm2")(y))
        y = conv(self.out_channels, 1, 1, name="conv3")(y)
        y = FrozenBN(self.out_channels, name="norm3")(y)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet-50/101 trunk emitting a {res2..res5} feature dict (NHWC)."""

    depth: int = 50
    out_features: Sequence[str] = ("res3", "res4", "res5")
    stem_channels: int = 64

    @nn.compact
    def __call__(self, x):
        blocks_per_stage = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]

        y = conv(self.stem_channels, 7, 2, name="stem_conv1")(x)
        y = nn.relu(FrozenBN(self.stem_channels, name="stem_norm1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs = {}
        bottleneck = self.stem_channels
        out_ch = self.stem_channels * 4
        for stage_idx, n_blocks in enumerate(blocks_per_stage):
            stage_name = f"res{stage_idx + 2}"
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage_idx > 0) else 1
                y = Bottleneck(
                    bottleneck_channels=bottleneck,
                    out_channels=out_ch,
                    stride=stride,
                    has_shortcut=(b == 0),
                    name=f"{stage_name}_{b}",
                )(y)
            if stage_name in self.out_features:
                outputs[stage_name] = y
            bottleneck *= 2
            out_ch *= 2
        return outputs
