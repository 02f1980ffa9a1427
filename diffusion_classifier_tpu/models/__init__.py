from .dit import DiT, DiTConfig
from .encoders import ClassEmbedder, make_encoder, null_token
from .presets import DIT_PRESETS, UNET_PRESETS, build_preset
from .resnet import ResNet2D
from .unet import UNet2D, UNetCondition2D, UNetConfig

__all__ = [
    "UNet2D",
    "UNetCondition2D",
    "UNetConfig",
    "DiT",
    "DiTConfig",
    "ResNet2D",
    "ClassEmbedder",
    "make_encoder",
    "null_token",
    "build_preset",
    "UNET_PRESETS",
    "DIT_PRESETS",
]
