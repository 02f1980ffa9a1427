"""End-to-end protocol tests for the fused ELBO classifier and the scan sampler.

Uses an oracle denoiser whose conditioning is analytically forced: it assumes
the clean image is the class template of the conditioned label, so the ε-error
is ~0 for the true class and large otherwise — the argmin class is known.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_classifier_tpu.diffusion.classify import (
    auto_eval_group,
    make_classifier,
)
from diffusion_classifier_tpu.diffusion.sampler import make_sampler
from diffusion_classifier_tpu.diffusion.process import bcast_right
from diffusion_classifier_tpu.diffusion.schedule import (
    alpha_sigma,
    make_schedule_fn,
)

C = 4  # classes
SHAPE = (8, 8, 1)
SCHED = make_schedule_fn("cosine", 8, 8)


def _templates():
    keys = jax.random.split(jax.random.PRNGKey(42), C)
    return jnp.stack(
        [jax.random.uniform(k, SHAPE, minval=-1, maxval=1) for k in keys]
    )


TEMPLATES = _templates()


def oracle_apply(params, z, logsnr, labels):
    """ε-prediction assuming x == TEMPLATES[label] (null token → zeros image)."""
    del params
    temp = jnp.where(
        (labels >= C)[:, None, None, None],
        jnp.zeros(SHAPE),
        TEMPLATES[jnp.clip(labels, 0, C - 1)],
    )
    a, s = alpha_sigma(logsnr)
    a = bcast_right(a, z.ndim)
    s = bcast_right(s, z.ndim)
    return (z - a * temp) / s


def test_classify_recovers_true_class():
    classify = make_classifier(
        oracle_apply,
        SCHED,
        pred_param="eps",
        num_classes=C,
        n_stages=1,
        evaluation_per_stage=(4,),
        n_keep_per_stage=(1,),
    )
    labels = jnp.array([0, 1, 2, 3, 1, 0])
    x = TEMPLATES[labels]
    preds = classify(None, x, jnp.zeros_like(labels), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(labels))


def test_classify_staged_pruning_recovers_true_class():
    classify = make_classifier(
        oracle_apply,
        SCHED,
        pred_param="eps",
        num_classes=C,
        n_stages=2,
        evaluation_per_stage=(2, 6),  # cumulative
        n_keep_per_stage=(2, 1),
        eval_group=2,
    )
    labels = jnp.array([3, 2, 1, 0])
    x = TEMPLATES[labels]
    preds = classify(None, x, jnp.zeros_like(labels), jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(labels))


def test_classify_fast_mode_includes_true_class():
    classify = make_classifier(
        oracle_apply,
        SCHED,
        pred_param="eps",
        num_classes=C,
        n_stages=1,
        evaluation_per_stage=(3,),
        n_keep_per_stage=(1,),
        fast=True,
        n_fast_classes=2,
    )
    labels = jnp.array([0, 1, 2, 3])
    x = TEMPLATES[labels]
    preds = classify(None, x, labels, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(labels))


def test_classify_jits_and_is_deterministic():
    classify = make_classifier(
        oracle_apply,
        SCHED,
        pred_param="eps",
        num_classes=C,
        n_stages=1,
        evaluation_per_stage=(2,),
        n_keep_per_stage=(1,),
    )
    jitted = jax.jit(classify)
    labels = jnp.array([2, 0])
    x = TEMPLATES[labels]
    p1 = jitted(None, x, jnp.zeros_like(labels), jax.random.PRNGKey(3))
    p2 = jitted(None, x, jnp.zeros_like(labels), jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_auto_eval_group_divides():
    assert auto_eval_group(16, 4, 4, target=512) == 16
    assert auto_eval_group(16, 8, 4, target=512) == 16
    assert auto_eval_group(16, 16, 4, target=512) == 8
    assert auto_eval_group(7, 4, 4, target=512) == 7
    assert auto_eval_group(16, 64, 10, target=512) == 1


def test_auto_eval_group_scales_with_image_elements():
    # target counts CIFAR-equivalent (32*32*3-element) images: a 128x128x12
    # CheXpert-DWT image is 64 of them, so the image budget is 512/64 = 8 —
    # B=32 x K=2 exceeds it at ANY group (G=1 floor), B=1 serving still
    # megabatches (1*2*4 = 8 <= 8).
    cx = 128 * 128 * 12
    assert auto_eval_group(4, 32, 2, target=512, img_elems=cx) == 1
    assert auto_eval_group(4, 16, 2, target=512, img_elems=cx) == 1
    assert auto_eval_group(4, 1, 2, target=512, img_elems=cx) == 4
    # CIFAR-sized images keep the historical behavior exactly
    assert auto_eval_group(4, 64, 10, target=512, img_elems=32 * 32 * 3) == 1
    assert auto_eval_group(4, 1, 10, target=512, img_elems=32 * 32 * 3) == 4


def test_sampler_oracle_reconstructs_template():
    sampler = make_sampler(
        oracle_apply,
        SCHED,
        pred_param="eps",
        cfg_w=0.0,
        null_token=C,
        sampling_steps=64,
    )
    labels = jnp.array([0, 2])
    x = jnp.zeros((2,) + SHAPE)
    out = jax.jit(sampler)(None, x, labels, jax.random.PRNGKey(0))
    assert out.shape == x.shape
    err = float(jnp.abs(out - TEMPLATES[labels]).max())
    assert err < 0.06, f"max reconstruction err {err}"


def test_sampler_from_t_renoise_stays_close():
    sampler = make_sampler(
        oracle_apply,
        SCHED,
        pred_param="eps",
        cfg_w=0.0,
        null_token=C,
        sampling_steps=32,
    )
    labels = jnp.array([1, 3])
    x = TEMPLATES[labels]
    out = sampler(None, x, labels, jax.random.PRNGKey(0), from_t=0.5)
    err = float(jnp.abs(out - x).max())
    assert err < 0.06, f"counterfactual re-noise err {err}"
