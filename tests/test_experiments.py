"""Experiment entry-point smoke tests: presets build, scripts import, tiny run."""

import importlib
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from diffusion_classifier_tpu.models import (
    DIT_PRESETS,
    UNET_PRESETS,
    build_preset,
)
from diffusion_classifier_tpu.utils.config import ExperimentConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("name", sorted(UNET_PRESETS) + sorted(DIT_PRESETS))
def test_presets_build(name):
    cfg = ExperimentConfig(
        image_size=64, image_channels=3, classes=2, patch_size=2,
        mixed_precision="no",
    )
    net = build_preset(name, cfg)
    assert net is not None


def test_preset_unknown_name():
    with pytest.raises(ValueError, match="unknown preset"):
        build_preset("resnet-9000", ExperimentConfig())


@pytest.mark.parametrize(
    "experiment",
    [
        "cifar10",
        "chexpert-unet",
        "chexpert-dit",
        "ipmsa",
        "ipmsa-dit",
        "ipmsa-classifier",
    ],
)
def test_experiment_commons_import(experiment):
    """Each experiment's common.py imports cleanly (model/data wiring sound)."""
    exp_dir = os.path.join(REPO, "experiments", experiment)
    sys.path.insert(0, exp_dir)
    try:
        for mod in ("common",):
            if mod in sys.modules:
                del sys.modules[mod]
            importlib.import_module(mod)
    finally:
        sys.path.remove(exp_dir)
        sys.modules.pop("common", None)


@pytest.mark.parametrize("experiment", ["chexpert-dit", "ipmsa-dit"])
def test_dit_attention_head_dim_knob(experiment):
    """attention_head_dim=128 halves the heads at fixed width 384 (the
    TPU-first full-MXU variant); None keeps the 6x64 parity default."""
    exp_dir = os.path.join(REPO, "experiments", experiment)
    sys.path.insert(0, exp_dir)
    try:
        sys.modules.pop("common", None)
        common = importlib.import_module("common")
        cfg = ExperimentConfig(image_size=16, classes=2)
        parity = common.build_backbone(cfg)
        assert (parity.config.num_attention_heads,
                parity.config.attention_head_dim) == (6, 64)
        wide = common.build_backbone(cfg.replace(attention_head_dim=128))
        assert (wide.config.num_attention_heads,
                wide.config.attention_head_dim) == (3, 128)
        with pytest.raises(AssertionError, match="divide width"):
            common.build_backbone(cfg.replace(attention_head_dim=80))
    finally:
        sys.path.remove(exp_dir)
        sys.modules.pop("common", None)


def test_experiment_scripts_have_entrypoints():
    for experiment in (
        "cifar10",
        "chexpert-unet",
        "chexpert-dit",
        "ipmsa",
        "ipmsa-dit",
        "ipmsa-classifier",
    ):
        exp_dir = os.path.join(REPO, "experiments", experiment)
        assert os.path.isfile(os.path.join(exp_dir, "train.py"))
        assert os.path.isfile(os.path.join(exp_dir, "inference.py"))
    for experiment in ("chexpert-unet", "chexpert-dit"):
        assert os.path.isfile(
            os.path.join(REPO, "experiments", experiment, "ood.py")
        )
    assert os.path.isfile(os.path.join(REPO, "experiments", "ipmsa", "explain.py"))
