"""Training-step parity for the diffusion engine vs the EXECUTED reference.

Runs the reference inner training loop — CFG dropout to the null token
(`diffusion/diffusion_classifier.py:434-439`), `DiffusionClassifier.loss`
(t draw, noising, min-SNR-weighted MSE, `:295-344`), backward, global
grad-clip 1.0, torch Adam + HF cosine-warmup schedule (the experiments'
wiring, `experiments/cifar10/train.py:107-113`) — side by side with this
framework's fused `make_train_step` on identical weights and prescripted
draws. Per-step losses and the trained parameters must agree.

Note: the reference experiments build the optimizer over the BACKBONE's
parameters only, so the learnable 'nn' class embedding is frozen at its
random init (see PARITY.md §2.6) — the toy model here therefore keeps its
embedding table constant on both sides and trains the backbone weights.

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

import jax
import jax.numpy as jnp

from diffusion_classifier_tpu.engine.state import (
    EmaConfig,
    init_train_state,
    make_optimizer,
)
from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step
from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn

_REF = "/root/reference/diffusion/diffusion_classifier.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF), reason="reference tree not mounted"
)

B, HW, C, D, CLASSES = 8, 4, 2, 6, 3
LR, WARMUP, STEPS = 3e-2, 2, 6

_TABLE = (
    np.linspace(-1.0, 1.0, (CLASSES + 1) * D).reshape(CLASSES + 1, D) * 0.4
).astype(np.float32)


class _EMAStub(torch.nn.Module):
    def __init__(self, model, beta=None, update_after_step=None, update_every=None):
        super().__init__()
        self.ema_model = model

    def forward(self, *a, **k):
        return self.ema_model(*a, **k)

    def update(self):
        pass


class _RefConfig:
    def __init__(self, d):
        self._d = d

    def __getattr__(self, name):
        return self._d.get(name)


class _ToyTorch(torch.nn.Module):
    """pred = w⊙z + mean_D(emb) + u·tanh(logsnr); NCHW."""

    def __init__(self, w, u):
        super().__init__()
        self.w = torch.nn.Parameter(torch.from_numpy(w.copy()))
        self.u = torch.nn.Parameter(torch.tensor(float(u)))
        self.config = types.SimpleNamespace(encoder_hid_dim=D)

    def forward(self, x, noise_labels, encoder_hidden_states=None):
        s = encoder_hidden_states.float().mean(dim=(1, 2))
        return (
            self.w.view(1, -1, 1, 1) * x
            + s.view(-1, 1, 1, 1)
            + self.u * torch.tanh(noise_labels.float()).view(-1, 1, 1, 1)
        )


def _our_apply(params, z, logsnr, labels):
    s = jnp.asarray(_TABLE)[labels].mean(axis=1)
    return (
        params["w"][None, None, None, :] * z
        + s[:, None, None, None]
        + params["u"] * jnp.tanh(logsnr)[:, None, None, None]
    )


@pytest.fixture(scope="module")
def ref_mod():
    stubs = {}
    for name, attrs in (
        ("comet_ml", {"Experiment": object, "ExistingExperiment": object}),
        ("ema_pytorch", {"EMA": _EMAStub}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            for k, v in attrs.items():
                setattr(mod, k, v)
            stubs[name] = mod
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location("ref_dc_train", _REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k in stubs:
            sys.modules.pop(k, None)


class _Replay:
    def __init__(self, arrays, dtype=torch.float32):
        self.items = [torch.as_tensor(np.array(a)).to(dtype) for a in arrays]

    def __call__(self, *args, **kwargs):
        assert self.items, "torch RNG called more times than the jax layout"
        return self.items.pop(0)

    def assert_exhausted(self):
        assert not self.items


def test_train_step_parity(ref_mod):
    from accelerate import Accelerator
    from transformers.optimization import get_cosine_schedule_with_warmup

    rng0 = jax.random.PRNGKey(3)
    kx, kw = jax.random.split(rng0)
    x = jax.random.uniform(kx, (B, HW, HW, C), minval=-1.0, maxval=1.0)
    labels = np.array([0, 1, 2, 0, 1, 2, 0, 1], np.int64)
    w0 = np.asarray(jax.random.normal(kw, (C,)) * 0.2 + 1.0, np.float32)
    u0 = 0.3

    # ---- our side: fused jitted step over STEPS identical calls ----
    schedule_fn = make_schedule_fn("shifted_cosine", float(HW), float(HW))
    loss_fn = make_loss_fn(
        _our_apply, schedule_fn, pred_param="v", null_token=CLASSES
    )
    tx = make_optimizer(LR, WARMUP, STEPS)
    params = {"w": jnp.asarray(w0), "u": jnp.float32(u0)}
    state = init_train_state(params, tx)
    step = make_train_step(loss_fn, tx, EmaConfig(), donate=False)

    step_rngs = jax.random.split(jax.random.PRNGKey(17), STEPS)
    our_losses = []
    for r in step_rngs:
        state, loss = step(state, x, jnp.asarray(labels), r)
        our_losses.append(float(loss))

    # ---- reference side: same draws replayed through torch RNG ----
    drops, ts, epss = [], [], []
    for r in step_rngs:
        r_drop, r_t, r_noise = jax.random.split(r, 3)
        drops.append(np.asarray(jax.random.uniform(r_drop, (B,))))
        ts.append(np.asarray(jax.random.uniform(r_t, (B,))))
        epss.append(
            np.asarray(
                jax.random.normal(r_noise, x.shape, dtype=jnp.float32)
            ).transpose(0, 3, 1, 2)
        )

    cfg = {
        "pred_param": "v",
        "schedule": "shifted_cosine",
        "noise_d": float(HW),
        "image_size": float(HW),
        "cfg_w": 0.0,
        "encoder_type": "nn",
        "classes": CLASSES,
        "ema_beta": 0.99,
        "ema_warmup": 0,
        "ema_update_freq": 1,
    }
    inst = ref_mod.DiffusionClassifier(_ToyTorch(w0, u0), _RefConfig(cfg))
    with torch.no_grad():
        inst.encoder.weight.copy_(torch.from_numpy(_TABLE))
    inst.encoder.weight.requires_grad_(False)  # experiments never train it

    optimizer = torch.optim.Adam(inst.model.parameters(), lr=LR)
    scheduler = get_cosine_schedule_with_warmup(optimizer, WARMUP, STEPS)
    accelerator = Accelerator(cpu=True)
    x_t = torch.from_numpy(np.array(x)).permute(0, 3, 1, 2)
    p_t = torch.from_numpy(labels)

    rand = _Replay(ts)
    rand_like = _Replay(drops)
    randn_like = _Replay(epss)
    orig = (torch.rand, torch.rand_like, torch.randn_like)
    torch.rand, torch.rand_like, torch.randn_like = rand, rand_like, randn_like
    ref_losses = []
    try:
        for _ in range(STEPS):
            # the reference inner loop, `:434-451`
            mask = torch.rand_like(p_t.float()) < 0.15
            p = torch.where(
                mask, torch.full_like(p_t, inst.null_token), p_t
            ).long()
            loss = inst.loss(x_t, p)
            accelerator.backward(loss)
            accelerator.clip_grad_norm_(
                dict(inst.model.named_parameters()).values(), max_norm=1.0
            )
            optimizer.step()
            scheduler.step()
            optimizer.zero_grad()
            ref_losses.append(float(loss.detach()))
    finally:
        torch.rand, torch.rand_like, torch.randn_like = orig
    for replay in (rand, rand_like, randn_like):
        replay.assert_exhausted()

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(state.params["w"]),
        inst.model.w.detach().numpy(),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        float(state.params["u"]), float(inst.model.u.detach()), atol=1e-4
    )
