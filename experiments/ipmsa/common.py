"""Shared setup for the ipmsa experiment (MS future-activity prediction).

Reference arch: 5-level conditional UNet (128, 256, 256, 512, 768) with
layers (2, 2, 4, 4, 4) (`/root/reference/experiments/ipmsa/train.py:186-210`);
input is the W000 FLAIR + CT2F slab stack, label = any new-T2 lesions at
W048/W096 (`train.py:139-165`, via
`diffusion_classifier_tpu.data.ipmsa.make_default_transform`).
"""

import os
import sys

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax.numpy as jnp

from diffusion_classifier_tpu.data.ipmsa import (
    IPMSADataLoader,
    make_default_transform,
)
from diffusion_classifier_tpu.data.synthetic import SyntheticDataLoader
from diffusion_classifier_tpu.engine import DiffusionClassifier
from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.plotters import make_ipmsa_plotter  # noqa: F401


def build_backbone(config: ExperimentConfig):
    dtype = jnp.bfloat16 if config.mixed_precision == "bf16" else jnp.float32
    wt = config.wavelet_transform
    backbone = UNetCondition2D(
        UNetConfig(
            sample_size=config.image_size // 2 if wt else config.image_size,
            in_channels=4 * config.image_channels if wt else config.image_channels,
            out_channels=4 * config.image_channels if wt else config.image_channels,
            layers_per_block=(2, 2, 4, 4, 4),
            block_out_channels=(128, 256, 256, 512, 768),
            down_block_types=(
                "DownBlock2D",
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


def build_data(config: ExperimentConfig, cf_label=None):
    if config.data_path == "synthetic":
        return SyntheticDataLoader(
            num_train=128,
            num_val=32,
            batch_size=config.batch_size,
            image_size=config.image_size,
            channels=config.image_channels,
            classes=config.classes,
            seed=config.seed,
            cf_label=cf_label,
        )
    transform = make_default_transform(
        slices=config.slices,
        wavelet_transform=config.wavelet_transform,
        cf_label=cf_label,
    )
    split = os.path.join(config.experiment_path, "split")
    return IPMSADataLoader(
        os.path.join(split, "train_dataset_filtered.pkl"),
        os.path.join(split, "val_dataset_filtered.pkl"),
        os.path.join(split, "test_dataset_filtered.pkl"),
        transform,
        config.slurm,
        config.batch_size,
        config.num_workers,
        seed=config.seed,
    )


def build_engine(config: ExperimentConfig) -> DiffusionClassifier:
    return DiffusionClassifier(build_backbone(config), config)
