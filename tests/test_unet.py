"""Shape/dtype/grad unit tests for the conditional UNet backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_classifier_tpu.models import (
    ClassEmbedder,
    UNetCondition2D,
    UNetConfig,
)

TINY = UNetConfig(
    sample_size=16,
    in_channels=3,
    out_channels=3,
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    attention_head_dim=2,
    cross_attention_dim=32,
    encoder_hid_dim=16,
    encoder_hid_dim_type="text_proj",
)


def _setup(dtype=jnp.float32, cfg=TINY, batch=2):
    net = UNetCondition2D(cfg, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, 16, 16, 3))
    logsnr = jnp.linspace(-3.0, 3.0, batch)
    ctx = jax.random.normal(rng, (batch, 1, cfg.encoder_hid_dim))
    params = net.init(rng, x, logsnr, ctx)
    return net, params, x, logsnr, ctx


def test_forward_shape_and_dtype():
    net, params, x, logsnr, ctx = _setup()
    out = net.apply(params, x, logsnr, ctx)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_bf16_compute_fp32_out():
    net, params, x, logsnr, ctx = _setup(dtype=jnp.bfloat16)
    out = net.apply(params, x, logsnr, ctx)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_conditioning_changes_output():
    net, params, x, logsnr, ctx = _setup()
    out_a = net.apply(params, x, logsnr, ctx)
    out_b = net.apply(params, x, logsnr, ctx + 1.0)
    assert float(jnp.abs(out_a - out_b).max()) > 1e-6


def test_timestep_changes_output():
    net, params, x, logsnr, ctx = _setup()
    out_a = net.apply(params, x, logsnr, ctx)
    out_b = net.apply(params, x, logsnr + 1.0, ctx)
    assert float(jnp.abs(out_a - out_b).max()) > 1e-6


def test_grad_flows_to_all_params():
    net, params, x, logsnr, ctx = _setup()

    def loss_fn(p):
        return jnp.mean(net.apply(p, x, logsnr, ctx) ** 2)

    grads = jax.grad(loss_fn)(params)
    norms = jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
    zero = [
        path
        for path, n in jax.tree_util.tree_leaves_with_path(norms)
        if n == 0.0
    ]
    assert not zero, f"params with zero grad: {zero[:10]}"


def test_unconditional_forward_without_context():
    cfg = UNetConfig(
        sample_size=16,
        block_out_channels=(32, 64),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        mid_block_type=None,
        layers_per_block=1,
        attention_head_dim=2,
    )
    net = UNetCondition2D(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    params = net.init(rng, x, jnp.zeros(2), None)
    out = net.apply(params, x, jnp.zeros(2), None)
    assert out.shape == x.shape


def test_class_embedder_null_token_row():
    emb = ClassEmbedder(num_classes=10, embedding_dim=8)
    rng = jax.random.PRNGKey(0)
    labels = jnp.array([0, 10])  # class 0 and the null token
    params = emb.init(rng, labels)
    out = emb.apply(params, labels)
    assert out.shape == (2, 1, 8)
    assert float(jnp.abs(out[0] - out[1]).max()) > 1e-6


def test_cifar_arch_param_count_scale():
    """The reference CIFAR arch (experiments/cifar10/train.py:83-105) at ~50M params."""
    cfg = UNetConfig(
        sample_size=32,
        in_channels=3,
        out_channels=3,
        block_out_channels=(128, 128, 256, 512),
        down_block_types=(
            "DownBlock2D",
            "DownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
        ),
        up_block_types=(
            "CrossAttnUpBlock2D",
            "CrossAttnUpBlock2D",
            "UpBlock2D",
            "UpBlock2D",
        ),
        layers_per_block=2,
        cross_attention_dim=128,
        encoder_hid_dim=128,
        encoder_hid_dim_type="text_proj",
    )
    net = UNetCondition2D(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    ctx = jnp.zeros((1, 1, 128))
    params = net.init(rng, x, jnp.zeros(1), ctx)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # Hand-computed conv/attention math for this architecture lands ~90-100M
    # (the up path with skip-concat inputs dominates).
    assert 60e6 < n < 120e6, f"param count {n/1e6:.1f}M out of expected range"


def test_unconditional_unet2d_with_self_attention():
    """Reference UNet2D surface: Attn blocks + self-attn mid, no conditioning."""
    from diffusion_classifier_tpu.models.unet import UNet2D

    net = UNet2D(
        sample_size=16,
        block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        attention_head_dim=2,
        norm_num_groups=8,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 3))
    params = net.init(rng, x, jnp.zeros(2), None)
    out = net.apply(params, x, jnp.zeros(2), None)
    assert out.shape == x.shape
    # self-attention params exist
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("attention" in str(p) for p, _ in flat)


def test_attention_head_dim_conventions():
    """UNet2DConditionModel treats attention_head_dim as a HEADS count; the
    unconditional UNet2DModel treats it as the per-head DIMENSION
    (reference nets/unet.py:28 wraps the latter)."""
    from diffusion_classifier_tpu.models.unet import UNet2D, UNetConfig

    cond = UNetConfig(block_out_channels=(224, 448), attention_head_dim=8,
                      down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
                      up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"))
    assert cond.heads_for(0) == 8 and cond.heads_for(1) == 8

    uncond = UNet2D(block_out_channels=(224, 448),
                    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                    attention_head_dim=8)
    assert uncond.config.heads_for(0) == 28  # 224 / 8
    assert uncond.config.heads_for(1) == 56  # 448 / 8


def test_resnet_block_split_skip_matches_concat():
    """skip= split-operand path must equal the explicit concat formulation."""
    from diffusion_classifier_tpu.models.layers import ResnetBlock2D

    block = ResnetBlock2D(128, groups=32, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    h = jax.random.normal(rng, (2, 8, 8, 128), jnp.bfloat16)
    s = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, 128), jnp.bfloat16)
    temb = jax.random.normal(jax.random.fold_in(rng, 2), (2, 64))

    cat = jnp.concatenate([h, s], axis=-1)
    params = block.init(rng, cat, temb)
    want = np.asarray(block.apply(params, cat, temb), np.float32)
    got = np.asarray(block.apply(params, h, temb, skip=s), np.float32)
    assert np.abs(got - want).max() < 0.02 * np.abs(want).max()
