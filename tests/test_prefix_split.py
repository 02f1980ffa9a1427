"""Prefix/tail split correctness: tail∘encode ≡ full forward, end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_classifier_tpu.diffusion.classify import make_classifier
from diffusion_classifier_tpu.diffusion.sampler import make_sampler
from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
from diffusion_classifier_tpu.engine.denoiser import Denoiser, supports_prefix
from diffusion_classifier_tpu.models import (
    ClassEmbedder,
    UNetCondition2D,
    UNetConfig,
)

CFG = UNetConfig(
    sample_size=16,
    in_channels=1,
    out_channels=1,
    block_out_channels=(16, 32),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    attention_head_dim=2,
    cross_attention_dim=16,
    encoder_hid_dim=16,
    encoder_hid_dim_type="text_proj",
    norm_num_groups=8,
)
SCHED = make_schedule_fn("cosine", 16, 16)


def _denoiser():
    backbone = UNetCondition2D(CFG)
    denoiser = Denoiser(backbone=backbone, encoder=ClassEmbedder(3, 16))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 1))
    lg = jnp.linspace(-2.0, 2.0, 2)
    labels = jnp.array([0, 1])
    params = denoiser.init(rng, x, lg, labels)
    return backbone, denoiser, params, x, lg, labels


def test_backbone_prefix_split_detected():
    backbone = UNetCondition2D(CFG)
    assert backbone.prefix_split == 1
    assert supports_prefix(backbone)
    all_attn = UNetConfig(
        sample_size=16,
        block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1,
        attention_head_dim=2,
        cross_attention_dim=16,
        encoder_hid_dim=16,
        encoder_hid_dim_type="text_proj",
        norm_num_groups=8,
    )
    assert UNetCondition2D(all_attn).prefix_split == 0


def test_tail_of_encode_equals_full():
    _, denoiser, params, x, lg, labels = _denoiser()
    full = denoiser.apply(params, x, lg, labels)
    state = denoiser.apply(params, x, lg, None, mode="encode")
    tail = denoiser.apply(
        params, None, None, labels, mode="tail", prefix_state=state
    )
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(tail), atol=1e-5, rtol=1e-5
    )


def test_classifier_prefix_path_matches_plain():
    _, denoiser, params, x, lg, labels = _denoiser()
    apply_fn = lambda p, z, l, lab: denoiser.apply(p, z, l, lab)
    encode_fn = lambda p, z, l: denoiser.apply(p, z, l, None, mode="encode")
    tail_fn = lambda p, s, lab: denoiser.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )
    common = dict(
        pred_param="v",
        num_classes=3,
        n_stages=1,
        evaluation_per_stage=(3,),
        n_keep_per_stage=(1,),
    )
    plain = make_classifier(apply_fn, SCHED, **common)
    prefix = make_classifier(
        apply_fn, SCHED, encode_fn=encode_fn, tail_fn=tail_fn, **common
    )
    rng = jax.random.PRNGKey(5)
    p_plain = plain(params, x, jnp.zeros_like(labels), rng)
    p_prefix = prefix(params, x, jnp.zeros_like(labels), rng)
    np.testing.assert_array_equal(np.asarray(p_plain), np.asarray(p_prefix))


def test_sampler_prefix_path_matches_plain():
    _, denoiser, params, x, lg, labels = _denoiser()
    apply_fn = lambda p, z, l, lab: denoiser.apply(p, z, l, lab)
    encode_fn = lambda p, z, l: denoiser.apply(p, z, l, None, mode="encode")
    tail_fn = lambda p, s, lab: denoiser.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )
    common = dict(pred_param="v", cfg_w=0.2, null_token=3, sampling_steps=3)
    plain = make_sampler(apply_fn, SCHED, **common)
    prefix = make_sampler(
        apply_fn, SCHED, encode_fn=encode_fn, tail_fn=tail_fn, **common
    )
    rng = jax.random.PRNGKey(6)
    out_plain = plain(params, x, labels, rng)
    out_prefix = prefix(params, x, labels, rng)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_prefix), atol=1e-5, rtol=1e-5
    )
