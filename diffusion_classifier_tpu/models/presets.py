"""Named architecture presets (reference `models/*.py` parity, done right).

The reference stores presets as loose code fragments that `exec` against a
free ``config`` variable (e.g. `models/unet-256.py:5-7` — flagged in SURVEY
§2.1). Here each preset is a function ``(config) -> backbone config`` with
the same architecture hyperparameters, consumable by
``UNetCondition2D`` / ``DiT`` directly.
"""

from __future__ import annotations

from .dit import DiTConfig
from .unet import UNetConfig

__all__ = ["UNET_PRESETS", "DIT_PRESETS", "build_preset"]


def _io(config):
    wt = config.wavelet_transform
    ch = 4 * config.image_channels if wt else config.image_channels
    size = config.image_size // 2 if wt else config.image_size
    return ch, size


def _cond_unet(config, **arch) -> UNetConfig:
    """Shared cross-attention conditioning stack for every UNet preset.

    Every reference UNet fragment conditions the same way (text_proj with
    512-dim context, cross-attn mid block); presets supply only their
    architecture literals.
    """
    return UNetConfig(
        mid_block_type="UNetMidBlock2DCrossAttn",
        encoder_hid_dim=512,
        encoder_hid_dim_type="text_proj",
        cross_attention_dim=512,
        attn_backend=config.attn_backend,
        remat=config.remat,
        **arch,
    )


def unet_128(config) -> UNetConfig:
    """`models/unet-128.py`: 5-level (128,128,256,512,1024), cross-attn 512."""
    ch, size = _io(config)
    return _cond_unet(
        config,
        sample_size=size,
        in_channels=ch,
        out_channels=ch,
        layers_per_block=2,
        block_out_channels=(128, 128, 256, 512, 1024),
        down_block_types=(
            "DownBlock2D", "DownBlock2D", "DownBlock2D",
            "CrossAttnDownBlock2D", "DownBlock2D",
        ),
        up_block_types=(
            "UpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D",
            "UpBlock2D", "UpBlock2D",
        ),
    )


def unet_256(config) -> UNetConfig:
    """`models/unet-256.py`: 6-level (128,128,256,256,512,1024)."""
    ch, size = _io(config)
    return _cond_unet(
        config,
        sample_size=size,
        in_channels=ch,
        out_channels=ch,
        layers_per_block=2,
        block_out_channels=(128, 128, 256, 256, 512, 1024),
        down_block_types=(
            "DownBlock2D", "DownBlock2D", "DownBlock2D",
            "DownBlock2D", "CrossAttnDownBlock2D", "DownBlock2D",
        ),
        up_block_types=(
            "UpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D",
            "UpBlock2D", "UpBlock2D", "UpBlock2D",
        ),
    )


def chexpert_256_unet_dwt_healthysick(config) -> UNetConfig:
    """`models/chexpert-256-unet-dwt-healthysick.py`: fixed 128px/12ch DWT arch."""
    return _cond_unet(
        config,
        sample_size=128,
        in_channels=12,
        out_channels=12,
        layers_per_block=2,
        block_out_channels=(128, 128, 256, 512, 1024),
        down_block_types=(
            "DownBlock2D", "DownBlock2D", "DownBlock2D",
            "CrossAttnDownBlock2D", "DownBlock2D",
        ),
        up_block_types=(
            "UpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D",
            "UpBlock2D", "UpBlock2D",
        ),
    )


def ipmsa_5_unet(config) -> UNetConfig:
    """`models/ipmsa-5-unet.py`: 256px/10ch 6-level arch."""
    return _cond_unet(
        config,
        sample_size=256,
        in_channels=10,
        out_channels=10,
        layers_per_block=(2, 2, 2, 2, 4, 2),
        block_out_channels=(128, 128, 256, 512, 512, 1024),
        down_block_types=(
            "DownBlock2D", "DownBlock2D", "DownBlock2D",
            "DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        ),
        up_block_types=(
            "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D",
            "UpBlock2D", "UpBlock2D", "UpBlock2D",
        ),
    )


def ipmsa_5_dwt_unet(config) -> UNetConfig:
    """`models/ipmsa-5-dwt-unet.py`: 128px/40ch DWT arch."""
    return _cond_unet(
        config,
        sample_size=128,
        in_channels=40,
        out_channels=40,
        layers_per_block=(2, 2, 2, 4, 2),
        block_out_channels=(128, 128, 256, 512, 768),
        down_block_types=(
            "DownBlock2D", "DownBlock2D", "DownBlock2D",
            "CrossAttnDownBlock2D", "DownBlock2D",
        ),
        up_block_types=(
            "UpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D",
            "UpBlock2D", "UpBlock2D",
        ),
    )


def chexpert_256_dit_b4(config) -> DiTConfig:
    """`models/chexpert-256-dit-b4.py`: DiT-B (12×64) depth 12, patch from config."""
    ch, size = _io(config)
    return DiTConfig(
        num_attention_heads=12,
        attention_head_dim=64,
        in_channels=ch,
        out_channels=ch,
        num_layers=12,
        sample_size=size,
        patch_size=config.patch_size,
        num_classes=config.classes,
        attn_backend=config.attn_backend,
        remat=config.remat,
    )


UNET_PRESETS = {
    "unet-128": unet_128,
    "unet-256": unet_256,
    "chexpert-256-unet-dwt-healthysick": chexpert_256_unet_dwt_healthysick,
    "ipmsa-5-unet": ipmsa_5_unet,
    "ipmsa-5-dwt-unet": ipmsa_5_dwt_unet,
}
DIT_PRESETS = {"chexpert-256-dit-b4": chexpert_256_dit_b4}


def build_preset(name: str, config):
    """Instantiate a preset backbone by name."""
    import jax.numpy as jnp

    from .dit import DiT
    from .unet import UNetCondition2D

    dtype = jnp.bfloat16 if config.mixed_precision == "bf16" else jnp.float32
    if name in UNET_PRESETS:
        cfg = UNET_PRESETS[name](config)
        # the engine reads encoder_hid_dim via backbone.config (the
        # UNetConfig carries it); no post-construction Module mutation
        return UNetCondition2D(cfg, dtype=dtype)
    if name in DIT_PRESETS:
        return DiT(DIT_PRESETS[name](config), dtype=dtype)
    raise ValueError(
        f"unknown preset {name!r}; available: "
        f"{sorted(UNET_PRESETS) + sorted(DIT_PRESETS)}"
    )
