"""Shared setup for the chexpert-dit experiment.

Reference arch: DiT with 6 heads × 64 dim (384 wide), 12 layers, patch_size
from config (`/root/reference/experiments/chexpert-dit/train.py:116-134`).
NOTE: the reference's inference/ood scripts build a 12-head (768-wide) model
that cannot load the 6-head training checkpoints (SURVEY §2.6); this
experiment uses the TRAINING architecture consistently everywhere.
"""

import os
import sys

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax.numpy as jnp

from diffusion_classifier_tpu.data.chexpert import CheXpertDataLoader
from diffusion_classifier_tpu.data.synthetic import SyntheticDataLoader
from diffusion_classifier_tpu.engine import DiffusionClassifier
from diffusion_classifier_tpu.models.dit import DiT, DiTConfig
from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.plotters import make_chexpert_plotter  # noqa: F401


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
    # encoder_type='DiT': integer labels pass straight into the backbone's
    # internal AdaLN class table (reference diffusion_classifier.py:71-74).
    assert config.encoder_type == "DiT", "chexpert-dit uses encoder_type='DiT'"
    return DiffusionClassifier(build_backbone(config), config)
