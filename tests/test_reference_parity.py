"""Parity against the ACTUAL reference implementation, executed on CPU torch.

The other parity tests check this framework against independent float64
re-implementations of the reference formulas. This file goes further: it
imports `/root/reference/diffusion/diffusion_classifier.py` itself (with its
unavailable third-party runtime — comet_ml, ema_pytorch — stubbed), runs the
reference's own `classify` / `sample` / schedule / posterior code on a toy
denoiser implemented identically in torch and JAX, feeds BOTH sides the same
prescripted random draws, and asserts the outputs agree.

Random-draw bridging: the reference draws via torch RNG (`torch.rand`,
`torch.randn_like`, `torch.randint` — `:308,113-115,688-692,676`), this
framework via explicit jax.random keys. The test generates every draw with
the framework's exact key-derivation layout, then patches the torch
entry points to replay the same values in call order. Exhaustion of each
replay list doubles as a call-count parity check (same number of t/ε draws).

Skipped when the reference tree is not mounted.
"""

import importlib.machinery
import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from diffusion_classifier_tpu.diffusion.classify import make_classifier
from diffusion_classifier_tpu.diffusion.process import (
    ddpm_sampler_step,
    pred_to_eps,
    weighted_mse_loss,
)
from diffusion_classifier_tpu.diffusion.sampler import make_sampler
from diffusion_classifier_tpu.diffusion.schedule import (
    alpha_sigma,
    make_schedule_fn,
)

_REF = "/root/reference/diffusion/diffusion_classifier.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF), reason="reference tree not mounted"
)

# Toy problem dimensions (CPU-fast).
C = 5  # classes
D = 6  # encoder_hid_dim
B = 3
HW = 4

# Deterministic class-embedding table, rows with distinct means so per-class
# denoiser behavior (and therefore ELBO rankings) are well separated.
TABLE = (np.linspace(-1.0, 1.0, (C + 1) * D).reshape(C + 1, D) * 0.3).astype(
    np.float32
)


class _EMAStub(torch.nn.Module):
    """ema_pytorch.EMA stand-in: eval paths just use the raw model."""

    def __init__(self, model, beta=None, update_after_step=None, update_every=None):
        super().__init__()
        self.ema_model = model

    def forward(self, *args, **kwargs):
        return self.ema_model(*args, **kwargs)

    def update(self):
        pass


class _RefConfig:
    """The reference TrainingConfig surface: attribute -> dict.get."""

    def __init__(self, d):
        self._d = d

    def __getattr__(self, name):
        return self._d.get(name)


class _ToyTorchBackbone(torch.nn.Module):
    """v-prediction toy denoiser; its JAX twin is `_apply_fn` below."""

    def __init__(self):
        super().__init__()
        self.config = types.SimpleNamespace(encoder_hid_dim=D)

    def forward(self, x, noise_labels, encoder_hidden_states=None):
        s = encoder_hidden_states.float().mean(dim=(1, 2))  # [B]
        return s.view(-1, 1, 1, 1) * x + 0.1 * torch.tanh(
            noise_labels.float()
        ).view(-1, 1, 1, 1)


def _apply_fn(params, z, logsnr, labels):
    """JAX twin of _ToyTorchBackbone + the 'nn' embedding encoder."""
    del params
    s = jnp.asarray(TABLE)[labels].mean(axis=1)
    return s[:, None, None, None] * z + 0.1 * jnp.tanh(logsnr)[:, None, None, None]


@pytest.fixture(scope="module")
def ref_mod():
    """Import the reference engine with its absent deps stubbed."""
    stubs = {}
    for name, attrs in (
        ("comet_ml", {"Experiment": object, "ExistingExperiment": object}),
        ("ema_pytorch", {"EMA": _EMAStub}),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            # a real ModuleSpec so importlib.util.find_spec probes (e.g.
            # accelerate's is_comet_ml_available) see a well-formed module
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            for k, v in attrs.items():
                setattr(mod, k, v)
            stubs[name] = mod
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location("ref_diffusion_classifier", _REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k in stubs:
            sys.modules.pop(k, None)


def _make_ref(ref_mod, **overrides):
    cfg = {
        "pred_param": "v",
        "schedule": "shifted_cosine",
        "noise_d": float(HW),
        "image_size": float(HW),
        "cfg_w": 0.3,
        "encoder_type": "nn",
        "classes": C,
        "ema_beta": 0.999,
        "ema_warmup": 0,
        "ema_update_freq": 1,
        "n_stages": 2,
        "evaluation_per_stage": [2, 5],
        "n_keep_per_stage": [3, 1],
        "n_fast_classes": 3,
        "sampling_steps": 4,
    }
    cfg.update(overrides)
    inst = ref_mod.DiffusionClassifier(_ToyTorchBackbone(), _RefConfig(cfg))
    with torch.no_grad():
        inst.encoder.weight.copy_(torch.from_numpy(TABLE))
    return inst, cfg


class _Replay:
    """Replays prescripted draws through a patched torch RNG entry point."""

    def __init__(self, arrays, dtype=torch.float32):
        self.items = [torch.as_tensor(np.array(a)).to(dtype) for a in arrays]

    def __call__(self, *args, **kwargs):
        assert self.items, "torch RNG called more times than the jax layout"
        return self.items.pop(0)

    def assert_exhausted(self):
        assert not self.items, f"{len(self.items)} prescripted draws never used"


def _toy_image(seed=0, batch=B):
    x = jax.random.uniform(
        jax.random.PRNGKey(100 + seed), (batch, HW, HW, 1), minval=-1.0, maxval=1.0
    )
    return x, torch.from_numpy(np.array(x)).permute(0, 3, 1, 2)  # NHWC -> NCHW


def test_schedule_parity(ref_mod):
    """Both logSNR schedules match the reference's own computation."""
    inst, _ = _make_ref(ref_mod, noise_d=2.0, image_size=float(HW))
    t = np.linspace(0.001, 0.999, 97, dtype=np.float32)
    for name, ref_fn in (
        ("cosine", inst.logsnr_schedule_cosine),
        ("shifted_cosine", inst.logsnr_schedule_cosine_shifted),
    ):
        ours = np.asarray(make_schedule_fn(name, 2.0, float(HW))(jnp.asarray(t)))
        theirs = ref_fn(torch.from_numpy(t)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5, err_msg=name)


def test_posterior_step_parity(ref_mod):
    """ddpm_sampler_step (CFG combine, x̂ clip, μ/var) matches byte-for-byte
    semantics on explicit inputs — no RNG involved."""
    inst, cfg = _make_ref(ref_mod)
    rng = np.random.default_rng(7)
    z = rng.standard_normal((B, 1, HW, HW)).astype(np.float32)
    pred = rng.standard_normal((B, 1, HW, HW)).astype(np.float32)
    u_pred = rng.standard_normal((B, 1, HW, HW)).astype(np.float32)
    lt, ls = np.float32(1.7), np.float32(-0.4)
    for pp in ("v", "eps"):
        inst.pred_param = pp
        mu_ref, var_ref = inst.ddpm_sampler_step(
            torch.from_numpy(z),
            torch.from_numpy(pred),
            torch.from_numpy(u_pred),
            torch.tensor(lt),
            torch.tensor(ls),
        )
        mu, var = ddpm_sampler_step(
            jnp.asarray(z),
            jnp.asarray(pred),
            jnp.asarray(u_pred),
            jnp.asarray(lt),
            jnp.asarray(ls),
            cfg_w=cfg["cfg_w"],
            pred_param=pp,
        )
        np.testing.assert_allclose(np.asarray(mu), mu_ref.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(var), float(var_ref), rtol=1e-5, atol=1e-7
        )


def test_loss_parity(ref_mod):
    """min-SNR-weighted loss agrees with the reference `loss` (`:295-344`)
    under identical (t, ε) draws."""
    inst, _ = _make_ref(ref_mod)
    x, x_t = _toy_image(seed=1)
    labels = np.array([0, 2, 4], np.int64)

    kt, keps = jax.random.split(jax.random.PRNGKey(5))
    t = jax.random.uniform(kt, (B,))
    eps = jax.random.normal(keps, x.shape, dtype=jnp.float32)

    schedule_fn = make_schedule_fn("shifted_cosine", float(HW), float(HW))
    logsnr = schedule_fn(t)
    alpha, sigma = alpha_sigma(logsnr)
    z = alpha[:, None, None, None] * x + sigma[:, None, None, None] * eps
    pred = _apply_fn(None, z, logsnr, jnp.asarray(labels))
    ours = weighted_mse_loss(pred, z, eps, logsnr, "v")

    rand = _Replay([np.asarray(t)])
    randn_like = _Replay([np.asarray(eps).transpose(0, 3, 1, 2)])
    orig_rand, orig_rl = torch.rand, torch.randn_like
    torch.rand, torch.randn_like = rand, randn_like
    try:
        theirs = inst.loss(x_t, text=torch.from_numpy(labels)).detach()
    finally:
        torch.rand, torch.randn_like = orig_rand, orig_rl
    rand.assert_exhausted()
    randn_like.assert_exhausted()
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def _classify_draws(rng, n_stages, ev, fast):
    """Replicate classify's key layout (`diffusion/classify.py`, eval_group=1):
    optional fast-candidate split, then per-stage → per-eval (t, ε) splits."""
    sel = None
    if fast:
        rng, k_sel = jax.random.split(rng)
        sel = np.asarray(
            jax.random.randint(k_sel, (B, 2), 0, C - 1), np.int64
        )  # n_fast_classes - 1 = 2
    ts, epss = [], []
    for i, stage_rng in enumerate(jax.random.split(rng, n_stages)):
        for key in jax.random.split(stage_rng, ev[i + 1] - ev[i]):
            k_t, k_eps = jax.random.split(key)
            ts.append(np.asarray(jax.random.uniform(k_t, (1, B)))[0])
            epss.append(
                np.asarray(
                    jax.random.normal(k_eps, (1, B, HW, HW, 1), dtype=jnp.float32)
                )[0].transpose(0, 3, 1, 2)
            )
    return ts, epss, sel


@pytest.mark.parametrize("fast", [False, True])
def test_classify_tournament_parity(ref_mod, fast):
    """The fused staged tournament and the reference's Python triple loop
    (`:657-725`) make identical decisions under identical draws — including
    stage pruning (mean-of-inf) and fast mode's candidate subset."""
    inst, cfg = _make_ref(ref_mod)
    ev = (0,) + tuple(cfg["evaluation_per_stage"])
    x, x_t = _toy_image(seed=2)
    labels = np.array([1, 3, 0], np.int64)

    classify = make_classifier(
        _apply_fn,
        make_schedule_fn("shifted_cosine", float(HW), float(HW)),
        pred_param="v",
        num_classes=C,
        n_stages=cfg["n_stages"],
        evaluation_per_stage=cfg["evaluation_per_stage"],
        n_keep_per_stage=cfg["n_keep_per_stage"],
        fast=fast,
        n_fast_classes=cfg["n_fast_classes"],
        eval_group=1,
    )
    rng = jax.random.PRNGKey(42)
    ours = np.asarray(classify(None, x, jnp.asarray(labels), rng))

    ts, epss, sel = _classify_draws(rng, cfg["n_stages"], ev, fast)
    rand = _Replay(ts)
    randn_like = _Replay(epss)
    orig = (torch.rand, torch.randn_like, torch.randint)
    torch.rand, torch.randn_like = rand, randn_like
    if fast:
        torch.randint = _Replay([sel], dtype=torch.int64)
    try:
        theirs = inst.classify(
            x_t, text=torch.from_numpy(labels), fast=fast
        ).numpy()
    finally:
        torch.rand, torch.randn_like, torch.randint = orig
    rand.assert_exhausted()
    randn_like.assert_exhausted()
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("from_t", [1.0, 0.5])
def test_sampler_parity(ref_mod, from_t):
    """The lax.scan ancestral sampler reproduces the reference `sample`
    (`:210-293`) trajectory — CFG pair, posterior noise, the extra final-pair
    evaluation, and `from_t` re-noising — under identical draws."""
    inst, cfg = _make_ref(ref_mod)
    steps = cfg["sampling_steps"]
    x, x_t = _toy_image(seed=3, batch=2)
    labels = np.array([2, 4], np.int64)

    sample = make_sampler(
        _apply_fn,
        make_schedule_fn("shifted_cosine", float(HW), float(HW)),
        pred_param="v",
        cfg_w=cfg["cfg_w"],
        null_token=C,
        sampling_steps=steps,
    )
    rng = jax.random.PRNGKey(9)
    ours = np.asarray(sample(None, x, jnp.asarray(labels), rng, from_t=from_t))

    # Replicate the sampler's key layout: (k_init, k_loop); per step the loop
    # key splits off one normal draw.
    k_init, key = jax.random.split(rng)
    init = np.asarray(jax.random.normal(k_init, x.shape, dtype=jnp.float32))
    noises = []
    for _ in range(steps):
        key, sub = jax.random.split(key)
        noises.append(
            np.asarray(jax.random.normal(sub, x.shape, dtype=jnp.float32))
            .transpose(0, 3, 1, 2)
        )
    if from_t == 1.0:
        randn = _Replay([init.transpose(0, 3, 1, 2)])
        randn_like = _Replay(noises)
    else:
        # from_t < 1 re-noises x: diffuse's ε comes through randn_like first.
        randn = _Replay([])
        randn_like = _Replay([init.transpose(0, 3, 1, 2)] + noises)
    orig = (torch.randn, torch.randn_like)
    torch.randn, torch.randn_like = randn, randn_like
    try:
        theirs = inst.sample(
            x_t, text=torch.from_numpy(labels), from_t=from_t
        ).numpy()
    finally:
        torch.randn, torch.randn_like = orig
    randn.assert_exhausted()
    randn_like.assert_exhausted()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )
