"""Shared setup for ipmsa-classifier (discriminative ResNet baseline).

Reference: ResNet backbone + linear head on the identical IPMSA task and
transform (`/root/reference/experiments/ipmsa-classifier/train.py:109-136`).
"""

import os
import sys

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from diffusion_classifier_tpu.data.ipmsa import (
    IPMSADataLoader,
    make_default_transform,
)
from diffusion_classifier_tpu.data.synthetic import SyntheticDataLoader
from diffusion_classifier_tpu.engine.classifier import Classifier
from diffusion_classifier_tpu.models.resnet import ResNet2D
from diffusion_classifier_tpu.utils.config import ExperimentConfig


def build_data(config: ExperimentConfig):
    if config.data_path == "synthetic":
        return SyntheticDataLoader(
            num_train=128,
            num_val=32,
            batch_size=config.batch_size,
            image_size=config.image_size,
            channels=config.image_channels,
            classes=config.classes,
            seed=config.seed,
        )
    transform = make_default_transform(
        slices=config.slices, wavelet_transform=config.wavelet_transform
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


def build_engine(config: ExperimentConfig) -> Classifier:
    backbone = ResNet2D(
        variant=config.variant,
        pretrained=config.pretrained,
        pretrained_path=config.pretrained_path or "",
        in_channels=config.image_channels,
    )
    return Classifier(backbone, config)
