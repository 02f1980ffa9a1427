"""ResNet feature backbone for the discriminative baseline (NHWC, Flax).

Re-creates the reference's torchvision-based feature extractor
(`nets/resnet.py:6-83`): resnet18/34 (basic blocks) and resnet50
(bottlenecks), first-conv adapted to arbitrary input channels, final FC
stripped → ``[B, output_dim]`` features (512 for 18/34, 2048 for 50).

``pretrained=True`` is accepted for config parity but ignored with a warning:
this environment has zero egress and no torchvision weight files; training
from scratch is the supported path (the reference defaults to ImageNet
weights when available, `nets/resnet.py:31-47`).
"""

from __future__ import annotations

import warnings
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ResNet2D", "RESNET_VARIANTS"]

RESNET_VARIANTS = {
    # variant: (block type, stage sizes, output_dim)
    "resnet18": ("basic", (2, 2, 2, 2), 512),
    "resnet34": ("basic", (3, 4, 6, 3), 512),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 2048),
}


class _BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name=name
        )
        h = nn.Conv(
            self.channels, (3, 3), strides=self.stride, padding=1,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(
            self.channels, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(h)
        h = bn("bn2")(h)
        if x.shape[-1] != self.channels or self.stride != 1:
            x = nn.Conv(
                self.channels, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample",
            )(x)
            x = bn("bn_down")(x)
        return nn.relu(x + h)


class _Bottleneck(nn.Module):
    channels: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, dtype=jnp.float32, name=name
        )
        out_ch = self.channels * 4
        h = nn.Conv(
            self.channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(
            self.channels, (3, 3), strides=self.stride, padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(h)
        h = nn.relu(bn("bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = bn("bn3")(h)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(
                out_ch, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample",
            )(x)
            x = bn("bn_down")(x)
        return nn.relu(x + h)


class ResNet2D(nn.Module):
    """Feature extractor: ``[B, H, W, C] → [B, output_dim]``."""

    variant: str = "resnet18"
    pretrained: bool = False
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @property
    def output_dim(self) -> int:
        return RESNET_VARIANTS[self.variant][2]

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.variant not in RESNET_VARIANTS:
            raise ValueError(f"Unsupported ResNet variant: {self.variant}")
        if self.pretrained:
            warnings.warn(
                "pretrained=True ignored: no ImageNet weights available offline; "
                "training from scratch (see module docstring)."
            )
        block_type, stages, _ = RESNET_VARIANTS[self.variant]
        block = _BasicBlock if block_type == "basic" else _Bottleneck

        x = x.astype(self.dtype)
        h = nn.Conv(
            64, (7, 7), strides=2, padding=3, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        h = nn.relu(
            nn.BatchNorm(
                use_running_average=not train, dtype=jnp.float32, name="bn1"
            )(h)
        )
        # torchvision k3/s2/p1 max pool. Optimization barriers stop XLA from
        # fusing the padded reduce-window with neighbors — that fusion trips a
        # compiler CHECK (`fusion_emitter: window.pad_low == 0`) on this TPU
        # backend; barriers only affect scheduling, not values.
        h = jax.lax.optimization_barrier(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        h = jax.lax.optimization_barrier(h)

        for stage, num_blocks in enumerate(stages):
            channels = 64 * (2**stage)
            for i in range(num_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                h = block(
                    channels, stride, self.dtype, name=f"layer{stage+1}_{i}"
                )(h, train=train)

        h = jnp.mean(h, axis=(1, 2))  # global average pool
        return h.astype(jnp.float32)
