"""ResNet feature backbone for the discriminative baseline (NHWC, Flax).

Re-creates the reference's torchvision-based feature extractor
(`nets/resnet.py:6-83`): resnet18/34 (basic blocks) and resnet50
(bottlenecks), first-conv adapted to arbitrary input channels, final FC
stripped → ``[B, output_dim]`` features (512 for 18/34, 2048 for 50).

Pretrained weights: the reference downloads torchvision's ImageNet bundles
(`nets/resnet.py:31-47`) — impossible in this zero-egress environment.
The equivalent here is :func:`load_pretrained_resnet`, which ingests a
LOCAL ``.npz`` of a torchvision ``state_dict`` (export once elsewhere with
``np.savez(path, **{k: v.numpy() for k, v in model.state_dict().items()})``)
into the Flax variable tree, shape-checked, with OIHW→HWIO kernel layout
conversion. ``pretrained=True`` WITHOUT a ``pretrained_path`` still warns
and trains from scratch.
"""

from __future__ import annotations

import warnings
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ResNet2D", "RESNET_VARIANTS", "load_pretrained_resnet"]

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
    # set when the engine will load local weights (silences the offline
    # warning; the load itself happens in Classifier.init_params)
    pretrained_path: str = ""
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @property
    def output_dim(self) -> int:
        return RESNET_VARIANTS[self.variant][2]

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.variant not in RESNET_VARIANTS:
            raise ValueError(f"Unsupported ResNet variant: {self.variant}")
        if self.pretrained and not self.pretrained_path:
            warnings.warn(
                "pretrained=True without pretrained_path: no ImageNet weights "
                "available offline; training from scratch. Provide a local "
                "torchvision state_dict .npz via config.pretrained_path "
                "(see load_pretrained_resnet)."
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


def _torch_key_map(name: str):
    """Map one torchvision state_dict key to (collection, module, param).

    Returns ``None`` for keys the feature extractor drops: the final
    ``fc.*`` (the reference strips it, `nets/resnet.py:66`) and BatchNorm's
    ``num_batches_tracked`` counters (no Flax equivalent).
    """
    parts = name.split(".")
    if parts[0] == "fc" or parts[-1] == "num_batches_tracked":
        return None
    bn_param = {
        "weight": ("params", "scale"),
        "bias": ("params", "bias"),
        "running_mean": ("batch_stats", "mean"),
        "running_var": ("batch_stats", "var"),
    }
    if parts[0] in ("conv1", "bn1"):  # stem
        module, rest = parts[0], parts[1:]
    elif parts[0].startswith("layer"):
        # layer{s}.{i}.<sub>... → module layer{s}_{i}
        module = f"{parts[0]}_{parts[1]}"
        sub, rest = parts[2], parts[3:]
        if sub == "downsample":
            # downsample.0 = conv, downsample.1 = bn (torchvision Sequential)
            which, rest = rest[0], rest[1:]
            sub = "downsample" if which == "0" else "bn_down"
        if sub.startswith("conv") or sub == "downsample":
            assert rest == ["weight"], name
            return ("params", (module, sub), "kernel")
        coll, leaf = bn_param[rest[0]]
        return (coll, (module, sub), leaf)
    else:
        raise ValueError(f"unrecognized torchvision resnet key: {name}")
    if module == "conv1":
        assert rest == ["weight"], name
        return ("params", (module,), "kernel")
    coll, leaf = bn_param[rest[0]]
    return (coll, (module,), leaf)


def load_pretrained_resnet(
    variables, npz_path: str, *, in_channels: int = 3
):
    """Load a torchvision ``state_dict`` ``.npz`` into a Flax variable tree.

    The offline completion of the reference's pretrained path
    (`nets/resnet.py:31-47`): every conv kernel transposes OIHW→HWIO, every
    BatchNorm maps weight/bias/running stats onto scale/bias/mean/var, and
    the classifier ``fc`` is dropped (the reference strips it, `:66`).
    When ``in_channels != 3`` the stem ``conv1`` keeps its RANDOM init —
    exactly the reference's adaptation, which replaces conv1 with a fresh
    ``nn.Conv2d`` and discards the pretrained stem (`:52-63`).

    Every loaded array is shape-checked against the target leaf; keys that
    map to no leaf (or vice versa) raise, so a wrong-variant bundle fails
    loudly instead of part-loading.
    """
    bundle = np.load(npz_path)
    new = jax.device_get(variables)  # host copies; leaves replaced below
    new = {k: _to_mutable(v) for k, v in new.items()}

    loaded = set()
    for key in bundle.files:
        mapped = _torch_key_map(key)
        if mapped is None:
            continue
        coll, path, leaf = mapped
        if coll == "params" and path == ("conv1",) and in_channels != 3:
            continue  # fresh stem, reference's != 3-channel adaptation
        arr = np.asarray(bundle[key])
        if leaf == "kernel":
            arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
        node = new[coll]
        for p in path:
            if p not in node:
                raise KeyError(
                    f"{key}: no module {'/'.join(path)} in target tree "
                    f"(wrong variant?)"
                )
            node = node[p]
        if leaf not in node:
            raise KeyError(f"{key}: no leaf {leaf} under {'/'.join(path)}")
        tgt = node[leaf]
        if tuple(tgt.shape) != tuple(arr.shape):
            raise ValueError(
                f"{key}: shape {arr.shape} does not match target "
                f"{tuple(tgt.shape)} at {'/'.join(path)}/{leaf}"
            )
        node[leaf] = arr.astype(np.asarray(tgt).dtype)
        loaded.add((coll,) + path + (leaf,))

    expected = set()
    for coll in ("params", "batch_stats"):
        for kp, _ in jax.tree_util.tree_flatten_with_path(new.get(coll, {}))[0]:
            path = tuple(str(getattr(p, "key", p)) for p in kp)
            if coll == "params" and path == ("conv1", "kernel") and in_channels != 3:
                continue
            expected.add((coll,) + path)
    missing = expected - loaded
    if missing:
        raise ValueError(
            f"pretrained bundle is missing {len(missing)} parameters, e.g. "
            f"{sorted('/'.join(m) for m in missing)[:4]}"
        )
    return new


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree
