"""Shared setup for the chexpert-unet experiment.

Reference arch: 3-level conditional UNet (256, 512, 768), cross-attention dim
256, trained on CheXpert binary Pleural-Effusion at 256px (DWT → 128px input)
(`/root/reference/experiments/chexpert-unet/train.py:117-138`). The DWT here
is applied in-graph by the engine (``wavelet_transform`` config), and the
plotter inverts it on device via `ops/wavelet.py` — the reference round-trips
through pywt on the CPU (`train.py:69-71`).
"""

import os
import sys

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax.numpy as jnp
import numpy as np

from diffusion_classifier_tpu.data.chexpert import CheXpertDataLoader
from diffusion_classifier_tpu.data.synthetic import SyntheticDataLoader
from diffusion_classifier_tpu.engine import DiffusionClassifier
from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.plotters import make_chexpert_plotter  # noqa: F401


def build_backbone(config: ExperimentConfig):
    dtype = jnp.bfloat16 if config.mixed_precision == "bf16" else jnp.float32
    wt = config.wavelet_transform
    backbone = UNetCondition2D(
        UNetConfig(
            sample_size=config.image_size // 2 if wt else config.image_size,
            in_channels=4 * config.image_channels if wt else config.image_channels,
            out_channels=4 * config.image_channels if wt else config.image_channels,
            layers_per_block=2,
            block_out_channels=(256, 512, 768),
            down_block_types=(
                "DownBlock2D",
                "DownBlock2D",
                "CrossAttnDownBlock2D",
            ),
            up_block_types=(
                "CrossAttnUpBlock2D",
                "UpBlock2D",
                "UpBlock2D",
            ),
            mid_block_type="UNetMidBlock2DCrossAttn",
            encoder_hid_dim=256,
            encoder_hid_dim_type="text_proj",
            cross_attention_dim=256,
            attn_backend=config.attn_backend,
            remat=config.remat,
        ),
        dtype=dtype,
    )
    return backbone


def build_data(config: ExperimentConfig):
    if config.data_path == "synthetic":
        return SyntheticDataLoader(
            num_train=256,
            num_val=64,
            batch_size=config.batch_size,
            image_size=config.image_size,
            channels=config.image_channels,
            classes=config.classes,
            seed=config.seed,
        )
    return CheXpertDataLoader(
        wavelet_transform=config.wavelet_transform,
        data_path=config.data_path,
        batch_size=config.batch_size,
        num_workers=config.num_workers,
        image_size=config.image_size,
        seed=config.seed,
        fast_decode=config.fast_decode,
        decode_cache_dir=config.decode_cache_dir,
    )


def build_engine(config: ExperimentConfig) -> DiffusionClassifier:
    return DiffusionClassifier(build_backbone(config), config)
