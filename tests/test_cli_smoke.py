"""Experiment CLI contract tests (round-2 verdict item 5).

The reference's public surface is ``python train.py`` driven by
``TRAINING_CONFIG``/``INFERENCE_CONFIG`` env-var JSON
(`/root/reference/experiments/cifar10/train.py:24-38`). These tests pin that
contract with pytest instead of the manual hardware sweep:

- cifar10 ``train.py`` runs end-to-end in a REAL subprocess on a tiny
  synthetic config, then ``inference.py`` classifies against the checkpoint
  it wrote — env-JSON plumbing, engine wiring, plotter, and checkpoint
  layout all exercised through the actual entry points.
- Every family's ``build_backbone``/``build_data``/``build_engine`` wiring is
  constructed in-process on a tiny config (this is the layer where a stale
  kwarg — e.g. the removed ``resnet_backend`` — turns into a runtime
  TypeError that import-only tests cannot see).
- Every entry-point module (train/inference/ood/explain) imports cleanly and
  exposes a ``main`` callable.
"""

import importlib
import json
import os
import subprocess
import sys

import pytest

from diffusion_classifier_tpu.utils.config import ExperimentConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAMILIES = {
    "cifar10": ("train", "inference"),
    "chexpert-unet": ("train", "inference", "ood"),
    "chexpert-dit": ("train", "inference", "ood"),
    "ipmsa": ("train", "inference", "explain"),
    "ipmsa-dit": ("train", "inference"),
    "ipmsa-classifier": ("train", "inference"),
}


def _tiny_cfg(**over):
    base = dict(
        pred_param="v",
        schedule="shifted_cosine",
        noise_d=8,
        image_size=8,
        image_channels=3,
        classes=2,
        cfg_w=0.1,
        ema_beta=0.99,
        ema_warmup=0,
        ema_update_freq=1,
        mixed_precision="no",
        data_path="synthetic",
        batch_size=8,
        num_workers=0,
        n_stages=1,
        evaluation_per_stage=(1,),
        n_keep_per_stage=(1,),
        use_comet=False,
    )
    base.update(over)
    return ExperimentConfig(**base)


def _import_family(experiment, module):
    """Import an experiment-local module with its family's common.py."""
    exp_dir = os.path.join(REPO, "experiments", experiment)
    sys.path.insert(0, exp_dir)
    for mod in ("common", module):
        sys.modules.pop(mod, None)
    try:
        return importlib.import_module(module)
    finally:
        sys.path.remove(exp_dir)
        for mod in ("common", module):
            sys.modules.pop(mod, None)


@pytest.mark.parametrize("experiment", sorted(FAMILIES))
def test_family_wiring_constructs(experiment):
    """build_backbone + build_data + build_engine run on a tiny config.

    Construction-level regressions (stale kwargs into model configs, renamed
    loader params) surface here without paying for a full train run.
    """
    common = _import_family(experiment, "common")
    cfg = _tiny_cfg(
        classes=10 if experiment == "cifar10" else 2,
        patch_size=2,
        variant="resnet18",
        encoder_type="DiT" if experiment.endswith("dit") else "nn",
    )
    data = common.build_data(cfg)
    assert data.get_train_loader() is not None
    engine = common.build_engine(cfg)
    assert engine is not None
    if hasattr(common, "build_backbone"):
        assert common.build_backbone(cfg) is not None
        if experiment != "ipmsa-classifier":
            # per-model knobs must be PLUMBED, not silently dropped — a
            # `remat: true` config that builds a non-remat model trains with
            # the wrong memory ceiling and no error (round-3 regression)
            remat_backbone = common.build_backbone(
                _tiny_cfg(
                    classes=10 if experiment == "cifar10" else 2,
                    patch_size=2,
                    variant="resnet18",
                    encoder_type="DiT" if experiment.endswith("dit") else "nn",
                    remat=True,
                )
            )
            assert remat_backbone.config.remat is True, (
                f"{experiment}/common.py drops the remat config knob"
            )
            assert remat_backbone.config.attn_backend == "auto"


@pytest.mark.parametrize(
    "experiment,module",
    [(e, m) for e, mods in sorted(FAMILIES.items()) for m in mods],
)
def test_entry_modules_import_and_expose_main(experiment, module):
    mod = _import_family(experiment, module)
    assert callable(getattr(mod, "main", None)), (
        f"{experiment}/{module}.py must expose main()"
    )


def _run_cli(exp_dir, script, env_var, cfg, timeout=1500):
    env = dict(os.environ)
    env[env_var] = json.dumps(cfg)
    # The subprocess must be pure-CPU: the axon sitecustomize (loaded from
    # PYTHONPATH) re-pins JAX_PLATFORMS=axon at interpreter startup, which
    # routes every jit through the remote TPU relay (minutes per compile) —
    # so drop its site dir from PYTHONPATH entirely, then force the platform.
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ) or REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # conftest exports an 8-virtual-device XLA_FLAGS for the parent pytest
    # process; inheriting it makes the subprocess run an 8-way sharded
    # program on one physical core (~3x slower) — give it ONE device.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, script],
        cwd=exp_dir,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    return proc


def _tiny_unet_engine(cfg):
    """DiffusionClassifier over a minimal conditional UNet.

    The chexpert/ipmsa families build their fixed reference-parity
    architectures (220M/130M params) in ``build_backbone`` — far too heavy
    for a CPU smoke test — so the ood/explain main() tests patch the family's
    ``build_engine`` with this tiny one. Everything else (env-JSON parse,
    argparse menu, loader construction, checkpoint restore, evaluate,
    metric/plot output) runs through the real entry-point code.
    """
    from diffusion_classifier_tpu.engine import DiffusionClassifier
    from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig

    backbone = UNetCondition2D(
        UNetConfig(
            sample_size=cfg.image_size,
            in_channels=cfg.image_channels,
            out_channels=cfg.image_channels,
            layers_per_block=1,
            block_out_channels=(32, 64),  # GroupNorm(32) needs 32|C
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            encoder_hid_dim=8,
            encoder_hid_dim_type="text_proj",
            cross_attention_dim=8,
        ),
    )
    return DiffusionClassifier(backbone, cfg)


def _seed_checkpoint(cfg):
    """Write a restorable checkpoint for ``cfg`` (what train.py would leave)."""
    import numpy as np

    engine = _tiny_unet_engine(cfg)
    batch = {
        "images": np.zeros(
            (cfg.batch_size, cfg.image_size, cfg.image_size, cfg.image_channels),
            np.float32,
        ),
        "prompt": np.zeros((cfg.batch_size,), np.int32),
    }
    engine.init_params(batch)
    engine._build_train_state(total_steps=1)
    engine.save_checkpoint(0)


def _cli_cfg(tmp_path, **over):
    cfg = dict(
        pred_param="v",
        schedule="shifted_cosine",
        noise_d=8,
        image_size=8,
        image_channels=3,
        classes=2,
        cfg_w=0.1,
        encoder_type="nn",
        ema_beta=0.99,
        ema_warmup=0,
        ema_update_freq=1,
        mixed_precision="no",
        evaluation_batches=1,
        sampling_steps=2,
        seed=0,
        data_path="synthetic",
        batch_size=8,  # conftest mesh is 8 virtual devices: 8 | batch
        num_workers=0,
        classification=True,
        n_stages=1,
        evaluation_per_stage=[1],
        n_keep_per_stage=[1],
        project_root=str(tmp_path),
        experiment_dir="cli-smoke",
        use_comet=False,
    )
    cfg.update(over)
    return cfg


@pytest.mark.parametrize("family", ["chexpert-unet", "chexpert-dit"])
def test_chexpert_ood_cli_main(tmp_path, monkeypatch, capsys, family):
    """chexpert ood.py main(): env-JSON + --dataset menu + restore +
    classify + metric print, against a checkpoint laid out like train.py's."""
    cfg = _cli_cfg(tmp_path)
    _seed_checkpoint(ExperimentConfig(**cfg))

    mod = _import_family(family, "ood")
    monkeypatch.setattr(mod, "build_engine", _tiny_unet_engine)
    monkeypatch.setenv("INFERENCE_CONFIG", json.dumps(cfg))
    # --dataset must override the config's default (mimic)
    mod.main(["--dataset", "isic"])
    out = capsys.readouterr().out
    assert "isic" in out and "accuracy" in out, out[-2000:]


def test_ipmsa_explain_cli_main(tmp_path, monkeypatch):
    """ipmsa explain.py main(): cf-forced label + from_t=0.5 re-noising
    sampling + counterfactual plot artifact through the real entry point.

    The cf-forced label is genuinely exercised: the synthetic path honors
    cf_label (every prompt overridden, `data/synthetic.py`), so ALL plots
    must land under active/ and none under inactive/ (ADVICE r3).
    """
    # 2 channels = 1-slice FLAIR ‖ CT2F slabs for the ipmsa plotter
    cfg = _cli_cfg(tmp_path, image_channels=2, slices=1, classification=False)
    _seed_checkpoint(ExperimentConfig(**cfg))

    mod = _import_family("ipmsa", "explain")
    monkeypatch.setattr(mod, "build_engine", _tiny_unet_engine)
    monkeypatch.setenv("INFERENCE_CONFIG", json.dumps(cfg))
    mod.main(active_label=True)
    images_dir = tmp_path / "cli-smoke" / "inference_images"
    pngs = list((images_dir / "active").glob("*.png"))
    assert pngs, f"explain.py must write counterfactual plots in {images_dir}/active"
    assert not list((images_dir / "inactive").glob("*.png")), (
        "cf_label forces every prompt active; nothing may plot as inactive"
    )


def test_cifar10_train_then_inference_cli(tmp_path):
    """The reference workflow end-to-end through the real entry points."""
    exp_dir = os.path.join(REPO, "experiments", "cifar10")
    # one source of truth for the smoke-config shape (ADVICE r3): the shared
    # _cli_cfg base plus only what this workflow actually changes
    cfg = _cli_cfg(
        tmp_path,
        classes=10,
        num_epochs=1,
        save_image_epochs=5,  # > num_epochs: skip in-loop eval
        eval_period=1,
        batch_size=128,
        learning_rate=1e-3,
        lr_warmup_steps=2,
        experiment_dir="cifar-smoke",
    )
    _run_cli(exp_dir, "train.py", "TRAINING_CONFIG", cfg)
    ckpt_dir = tmp_path / "cifar-smoke" / "checkpoints"
    assert (ckpt_dir / "experiment_state.json").exists(), (
        "train.py must write the checkpoint sidecar"
    )

    inf_cfg = dict(cfg, checkpoint_folder="checkpoints")
    inf_cfg.pop("num_epochs")
    proc = _run_cli(exp_dir, "inference.py", "INFERENCE_CONFIG", inf_cfg)
    # inference prints the metric dict (reference chance-floor print parity)
    assert "accuracy" in proc.stdout.lower(), proc.stdout[-2000:]
