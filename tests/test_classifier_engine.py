"""End-to-end tests for the discriminative Classifier engine (tiny backbone)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffusion_classifier_tpu.data.synthetic import SyntheticDataLoader
from diffusion_classifier_tpu.engine.classifier import Classifier
from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.metrics import Accuracy


class TinyBackbone(nn.Module):
    """Minimal conv feature extractor with the ResNet2D surface (incl. BatchNorm)."""

    output_dim: int = 16

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(8, (3, 3), strides=2, padding=1)(x)
        h = nn.relu(
            nn.BatchNorm(use_running_average=not train, name="bn")(h)
        )
        h = nn.Conv(self.output_dim, (3, 3), strides=2, padding=1)(h)
        return jnp.mean(h, axis=(1, 2))


def _setup(tmp_path, **overrides):
    cfg = ExperimentConfig(
        classes=2,
        image_size=8,
        image_channels=1,
        batch_size=16,
        num_epochs=3,
        eval_period=1,
        evaluation_batches=1,
        learning_rate=5e-3,
        lr_warmup_steps=2,
        project_root=str(tmp_path),
        experiment_dir="clf",
        mixed_precision="no",
    ).replace(**overrides)
    data = SyntheticDataLoader(
        num_train=128, num_val=32, batch_size=16, image_size=8,
        channels=1, classes=2, seed=3,
    )
    return cfg, Classifier(TinyBackbone(), cfg), data


def test_classifier_trains_and_beats_chance(tmp_path):
    cfg, engine, data = _setup(tmp_path)
    acc = Accuracy("accuracy")
    engine.train_loop(
        data.get_train_loader(), data.get_val_loader(), metrics=[acc]
    )
    batch = next(iter(data.get_val_loader()))
    preds = np.asarray(engine.classify(batch["images"]))
    assert preds.shape == (16,)
    correct = (preds == np.asarray(batch["prompt"])).mean()
    assert correct > 0.6, f"accuracy {correct} not above chance"
    # checkpoint layout (latest)
    assert os.path.exists(
        os.path.join(cfg.experiment_path, "checkpoints", "experiment_state.json")
    )


def test_classifier_inference_restores(tmp_path):
    cfg, engine, data = _setup(tmp_path, num_epochs=1)
    engine.train_loop(data.get_train_loader(), data.get_val_loader())
    w_trained = np.asarray(
        jax.tree.leaves(engine.variables["params"])[0]
    )

    cfg2, engine2, _ = _setup(tmp_path, num_epochs=1)
    val_loss, metric_output = engine2.inference(
        data.get_val_loader(), metrics=[Accuracy("accuracy")]
    )
    assert np.isfinite(val_loss)
    assert 0.0 <= metric_output[0]["accuracy"] <= 1.0
    w_restored = np.asarray(jax.tree.leaves(engine2.variables["params"])[0])
    np.testing.assert_array_equal(w_trained, w_restored)


def test_classifier_eval_only_restore_classifies(tmp_path):
    """init_params → load_checkpoint → classify with NO train step built.

    The optimizer-free flow (round-3 review fix): predict/eval_loss are
    compiled eagerly, and load_checkpoint types the absent opt_state
    template entry from the checkpoint's own metadata.
    """
    cfg, engine, data = _setup(tmp_path, num_epochs=1)
    engine.train_loop(data.get_train_loader(), data.get_val_loader())
    batch = next(iter(data.get_val_loader()))
    want = np.asarray(engine.classify(batch["images"]))

    _, engine2, _ = _setup(tmp_path, num_epochs=1)
    engine2.init_params(batch)
    engine2.load_checkpoint(os.path.join(cfg.experiment_path, "checkpoints"))
    assert engine2._tx is None  # genuinely optimizer-free
    got = np.asarray(engine2.classify(batch["images"]))
    np.testing.assert_array_equal(want, got)
