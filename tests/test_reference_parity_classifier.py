"""Training-math parity for the discriminative engine vs the EXECUTED reference.

Imports `/root/reference/classifier/classifier.py` (comet_ml stubbed) and
trains its `Classifier` — torch Adam + HF cosine-warmup schedule + global
grad-clip 1.0 + CrossEntropyLoss, exactly as the ipmsa-classifier experiment
wires it (`experiments/ipmsa-classifier/train.py:120-126`) — side by side
with this framework's `Classifier` engine on identical weights and batches.
Per-epoch losses and final head weights must agree: this certifies the whole
optimizer stack (optax.adam + cosine_warmup_schedule + clip_by_global_norm
vs torch.optim.Adam + get_cosine_schedule_with_warmup + clip_grad_norm_).

Skipped when the reference tree is not mounted.
"""

import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
from flax import linen as nn

from diffusion_classifier_tpu.engine.classifier import Classifier
from diffusion_classifier_tpu.utils.config import ExperimentConfig

_REF = "/root/reference/classifier/classifier.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF), reason="reference tree not mounted"
)

B, FEAT, CLASSES = 16, 12, 3
LR, WARMUP, EPOCHS = 5e-2, 3, 2  # large LR so drift would be visible


class _FlaxFlat(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return x.reshape((x.shape[0], -1))


class _TorchFlat(torch.nn.Module):
    output_dim = FEAT

    def forward(self, x):
        return x.reshape(x.shape[0], -1)


@pytest.fixture(scope="module")
def ref_mod():
    stubs = {}
    if "comet_ml" not in sys.modules:
        mod = types.ModuleType("comet_ml")
        mod.__spec__ = importlib.machinery.ModuleSpec("comet_ml", loader=None)
        mod.Experiment = mod.ExistingExperiment = object
        stubs["comet_ml"] = mod
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location("ref_classifier", _REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k in stubs:
            sys.modules.pop(k, None)


def _batches(seed=0, n=4):
    rng = np.random.default_rng(seed)
    return [
        {
            "images": rng.standard_normal((B, FEAT)).astype(np.float32),
            "prompt": rng.integers(0, CLASSES, B).astype(np.int64),
        }
        for _ in range(n)
    ]


class _RefConfig:
    def __init__(self, d):
        self._d = d

    def __getattr__(self, name):
        return self._d.get(name)


def test_train_math_parity(ref_mod, tmp_path):
    from transformers.optimization import get_cosine_schedule_with_warmup

    batches = _batches()
    total_steps = len(batches) * EPOCHS

    # ---- our engine ----
    cfg = ExperimentConfig(
        classes=CLASSES,
        batch_size=B,
        learning_rate=LR,
        lr_warmup_steps=WARMUP,
        num_epochs=EPOCHS,
        mixed_precision="no",
        project_root=str(tmp_path),
        experiment_dir="run",
    )
    ours = Classifier(_FlaxFlat(), cfg)
    ours.init_params(batches[0])
    ours._build_train_step(total_steps)
    kernel = np.asarray(ours.variables["params"]["head"]["kernel"])  # [F, C]
    bias = np.asarray(ours.variables["params"]["head"]["bias"])

    our_losses = [ours.train_one_epoch(batches) for _ in range(EPOCHS)]

    # ---- reference engine, same weights/batches ----
    from accelerate import Accelerator

    ref = ref_mod.Classifier(_TorchFlat(), _RefConfig({"classes": CLASSES}))
    with torch.no_grad():
        ref.model.head.weight.copy_(torch.from_numpy(kernel.T.copy()))
        ref.model.head.bias.copy_(torch.from_numpy(bias.copy()))
    optimizer = torch.optim.Adam(ref.parameters(), lr=LR)
    scheduler = get_cosine_schedule_with_warmup(optimizer, WARMUP, total_steps)
    accelerator = Accelerator(cpu=True)
    torch_batches = [
        {
            "images": torch.from_numpy(b["images"]),
            "prompt": torch.from_numpy(b["prompt"]),
        }
        for b in batches
    ]
    ref_losses = [
        ref.train_one_epoch(
            ref.model, optimizer, torch_batches, scheduler, accelerator
        )
        for _ in range(EPOCHS)
    ]

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours.variables["params"]["head"]["kernel"]),
        ref.model.head.weight.detach().numpy().T,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours.variables["params"]["head"]["bias"]),
        ref.model.head.bias.detach().numpy(),
        atol=1e-4,
    )


def test_classify_parity(ref_mod):
    """argmax-over-logits classify (`:335-349`) with identical weights."""
    batches = _batches(seed=5, n=1)
    cfg = ExperimentConfig(classes=CLASSES, batch_size=B, mixed_precision="no")
    ours = Classifier(_FlaxFlat(), cfg)
    ours.init_params(batches[0])
    ours._build_train_step(total_steps=1)

    ref = ref_mod.Classifier(_TorchFlat(), _RefConfig({"classes": CLASSES}))
    with torch.no_grad():
        ref.model.head.weight.copy_(
            torch.from_numpy(
                np.asarray(ours.variables["params"]["head"]["kernel"]).T.copy()
            )
        )
        ref.model.head.bias.copy_(
            torch.from_numpy(
                np.asarray(ours.variables["params"]["head"]["bias"]).copy()
            )
        )
    our_preds = np.asarray(ours.classify(batches[0]["images"]))
    ref_preds = ref.classify(torch.from_numpy(batches[0]["images"])).numpy()
    np.testing.assert_array_equal(our_preds, ref_preds)
