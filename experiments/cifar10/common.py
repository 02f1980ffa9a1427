"""Shared setup for the cifar10 experiment (model + data + engine wiring).

Builds the reference's CIFAR-10 architecture — ADM-ish conditional UNet with
blocks (128, 128, 256, 512) and cross-attention dim 128
(`/root/reference/experiments/cifar10/train.py:83-105`) — on the TPU-native
stack. Note the reference's cifar10 scripts are stale (they pass ``unet=`` to
a ``backbone=`` constructor, SURVEY §2.6); this experiment is the corrected
equivalent.
"""

import os
import sys

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax.numpy as jnp
import numpy as np

from diffusion_classifier_tpu.data.cifar import CIFAR10DataLoader
from diffusion_classifier_tpu.data.synthetic import SyntheticDataLoader
from diffusion_classifier_tpu.engine import DiffusionClassifier
from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.plotters import cifar_plotter  # noqa: F401


def build_backbone(config: ExperimentConfig):
    dtype = jnp.bfloat16 if config.mixed_precision == "bf16" else jnp.float32
    backbone = UNetCondition2D(
        UNetConfig(
            sample_size=config.image_size,
            in_channels=config.image_channels,
            out_channels=config.image_channels,
            layers_per_block=2,
            block_out_channels=(128, 128, 256, 512),
            down_block_types=(
                "DownBlock2D",
                "DownBlock2D",
                "CrossAttnDownBlock2D",
                "CrossAttnDownBlock2D",
            ),
            up_block_types=(
                "CrossAttnUpBlock2D",
                "CrossAttnUpBlock2D",
                "UpBlock2D",
                "UpBlock2D",
            ),
            encoder_hid_dim=128,
            encoder_hid_dim_type="text_proj",
            cross_attention_dim=128,
            attn_backend=config.attn_backend,
            remat=config.remat,
        ),
        dtype=dtype,
    )
    return backbone


def build_data(config: ExperimentConfig):
    if config.data_path == "synthetic":
        return SyntheticDataLoader(
            num_train=512,
            num_val=128,
            batch_size=config.batch_size,
            image_size=config.image_size,
            channels=config.image_channels,
            classes=config.classes,
            seed=config.seed,
        )
    return CIFAR10DataLoader(
        data_path=config.data_path,
        batch_size=config.batch_size,
        num_workers=config.num_workers,
        seed=config.seed,
    )


def build_engine(config: ExperimentConfig) -> DiffusionClassifier:
    return DiffusionClassifier(build_backbone(config), config)
