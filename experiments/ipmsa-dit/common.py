"""Shared setup for ipmsa-dit (DiT denoiser on the IPMSA task).

Reference arch: DiT 6 heads × 64 (384 wide), 12 layers
(`/root/reference/experiments/ipmsa-dit/train.py:186-203`); the reference's
inference script builds 12 heads — same checkpoint-incompatibility defect as
chexpert-dit (SURVEY §2.6) — so the TRAINING architecture is used everywhere.
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
from diffusion_classifier_tpu.models.dit import DiT, DiTConfig
from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.plotters import make_ipmsa_plotter  # noqa: F401


def build_backbone(config: ExperimentConfig):
    dtype = jnp.bfloat16 if config.mixed_precision == "bf16" else jnp.float32
    wt = config.wavelet_transform
    # width fixed at 384 (= 6*64, reference parity); attention_head_dim=128
    # is the TPU-first full-MXU variant at identical parameter count
    # (config.py knob; benchmarks/dit_headdim_probe.py)
    head_dim = config.attention_head_dim or 64
    assert 384 % head_dim == 0, f"head_dim {head_dim} must divide width 384"
    return DiT(
        DiTConfig(
            num_attention_heads=384 // head_dim,
            attention_head_dim=head_dim,
            in_channels=4 * config.image_channels if wt else config.image_channels,
            out_channels=4 * config.image_channels if wt else config.image_channels,
            num_layers=12,
            sample_size=config.image_size // 2 if wt else config.image_size,
            patch_size=config.patch_size,
            num_classes=config.classes,
            attn_backend=config.attn_backend,
            remat=config.remat,
        ),
        dtype=dtype,
    )


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
    assert config.encoder_type == "DiT", "ipmsa-dit uses encoder_type='DiT'"
    return DiffusionClassifier(build_backbone(config), config)
