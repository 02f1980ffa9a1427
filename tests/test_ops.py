"""Wavelet exactness + flash-attention parity + DiT/ResNet shape tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_classifier_tpu.ops.wavelet import haar_dwt2, haar_idwt2


def test_haar_roundtrip_exact():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    y = haar_dwt2(x)
    assert y.shape == (2, 8, 8, 12)
    back = haar_idwt2(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_haar_energy_preserved():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    y = haar_dwt2(x)
    np.testing.assert_allclose(
        float(jnp.sum(x**2)), float(jnp.sum(y**2)), rtol=1e-5
    )


def test_haar_matches_pywt_reference_algorithm():
    """Independent numpy re-derivation of pywt dwt2('haar') quadrant math."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 4, 1)).astype(np.float32)
    a, b = x[0::2, 0::2, 0], x[0::2, 1::2, 0]
    c, d = x[1::2, 0::2, 0], x[1::2, 1::2, 0]
    want = {
        0: (a + b + c + d) / 2,
        1: (a + b - c - d) / 2,
        2: (a - b + c - d) / 2,
        3: (a - b - c + d) / 2,
    }
    y = np.asarray(haar_dwt2(jnp.asarray(x)))
    for k in range(4):
        np.testing.assert_allclose(y[:, :, k], want[k], atol=1e-6)


def test_haar_constant_image_concentrates_in_ca():
    x = jnp.ones((4, 4, 2))
    y = haar_dwt2(x)
    ca = y[..., 0::4]
    details = jnp.stack([y[..., 1::4], y[..., 2::4], y[..., 3::4]])
    np.testing.assert_allclose(np.asarray(ca), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(details), 0.0, atol=1e-6)


def test_flash_attention_matches_xla():
    from diffusion_classifier_tpu.ops.flash_attention import (
        flash_attention,
        supports,
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (2, 256, 4, 64))
    k = jax.random.normal(k2, (2, 256, 4, 64))
    v = jax.random.normal(k3, (2, 256, 4, 64))
    assert supports(q, k, v)
    got = flash_attention(q, k, v)
    want = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-3
    )


def test_flash_attention_supports_gating():
    from diffusion_classifier_tpu.ops.flash_attention import supports

    q = jnp.zeros((1, 256, 2, 64))
    assert supports(q, q, q)
    q16 = jnp.zeros((1, 256, 2, 16))
    assert not supports(q16, q16, q16)  # head dim too small
    q100 = jnp.zeros((1, 100, 2, 64))
    assert not supports(q100, q100, q100)  # seq not 128-aligned


def test_flash_attention_bh_fallback_matches_xla():
    """Shapes whose unrolled-head score matrices exceed the scoped-VMEM
    budget take the head-major fallback kernel; parity must hold there too."""
    from diffusion_classifier_tpu.ops import flash_attention as fa

    # h=8, s=4096: even blk=128 gives 8*128*4096*4 = 16.8 MB > budget
    assert fa._pick_fused_block_q(4096, 8) is None
    # the DiT-b4 production shape picks the largest block that fits
    assert fa._pick_fused_block_q(1024, 6) == 512
    assert fa._pick_fused_block_q(1024, 12) == 256

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    shape = (1, 4096, 8, 32)
    q = jax.random.normal(k1, shape)
    k = jax.random.normal(k2, shape)
    v = jax.random.normal(k3, shape)
    got = fa.flash_attention(q, k, v)
    want = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-3
    )


def test_dit_forward_shapes_and_conditioning():
    from diffusion_classifier_tpu.models.dit import DiT, DiTConfig

    cfg = DiTConfig(
        num_attention_heads=2,
        attention_head_dim=8,
        in_channels=3,
        num_layers=2,
        sample_size=8,
        patch_size=2,
        num_classes=4,
    )
    net = DiT(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 3))
    labels = jnp.array([0, 4])  # class 0 and null token
    params = net.init(rng, x, jnp.zeros(2), labels)
    out = net.apply(params, x, jnp.zeros(2), labels)
    assert out.shape == x.shape and out.dtype == jnp.float32
    out2 = net.apply(params, x, jnp.zeros(2), jnp.array([1, 4]))
    assert float(jnp.abs(out - out2).max()) > 1e-6


def test_dit_rectangular_input():
    """Non-square images patchify onto a grid_h x grid_w sincos embedding.

    The params are shape-agnostic (conv patchify + shared blocks), so the
    SAME init works at any divisible resolution; the pos table must follow
    the actual grid, with the square case unchanged.
    """
    from diffusion_classifier_tpu.models.dit import (
        DiT,
        DiTConfig,
        get_2d_sincos_pos_embed,
    )

    # rectangular table: row-major [h, w] layout, square case is the
    # h == w slice of the same construction
    sq = get_2d_sincos_pos_embed(16, 4)
    rect = get_2d_sincos_pos_embed(16, 2, 4)
    assert sq.shape == (16, 16) and rect.shape == (8, 16)
    np.testing.assert_array_equal(rect[:4], sq[:4])  # first row of patches

    cfg = DiTConfig(
        num_attention_heads=2,
        attention_head_dim=8,
        in_channels=3,
        num_layers=2,
        sample_size=8,
        patch_size=2,
        num_classes=4,
    )
    net = DiT(cfg)
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, 8, 8, 3)), jnp.zeros(1), None)
    x = jax.random.normal(rng, (2, 8, 16, 3))  # H=8, W=16
    out = net.apply(params, x, jnp.zeros(2), jnp.array([0, 1]))
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())

    with pytest.raises(AssertionError, match="divisible by patch size"):
        net.apply(params, jnp.zeros((1, 8, 9, 3)), jnp.zeros(1), None)


def test_resnet_feature_shapes():
    from diffusion_classifier_tpu.models.resnet import ResNet2D

    for variant, dim in [("resnet18", 512), ("resnet50", 2048)]:
        net = ResNet2D(variant=variant, in_channels=1)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, 32, 32, 1))
        variables = net.init(rng, x, train=False)
        out = net.apply(variables, x, train=False)
        assert out.shape == (2, dim)


def test_resnet_rejects_unknown_variant():
    from diffusion_classifier_tpu.models.resnet import ResNet2D

    net = ResNet2D(variant="resnet99")
    with pytest.raises(ValueError, match="Unsupported ResNet variant"):
        net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 128, 2, 64),  # lane-grouped backward (g=2, no boundary transposes)
        (2, 128, 2, 32),  # head-major backward (g=4 doesn't divide H=2)
        (2, 1024, 6, 64),  # DiT-b4 shape: lane-grouped (sequential sub-heads)
        (1, 2048, 1, 32),  # oversize S: XLA-rematerialized backward fallback
    ],
)
def test_flash_attention_grad_matches_xla(shape):
    """attn_backend='pallas' must be trainable: the custom VJP runs the
    pallas backward kernel where one head's score matrices fit scoped VMEM
    (lane-grouped transpose-free layout where 128/d heads divide H and fit,
    head-major otherwise) and rematerializes through
    jax.nn.dot_product_attention (same math) above."""
    import jax
    import jax.numpy as jnp
    from diffusion_classifier_tpu.ops import flash_attention as fa

    assert fa._bwd_supported(shape[1]) == (shape[1] <= 1024)

    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, shape)
    k = jax.random.normal(kk, shape)
    v = jax.random.normal(kv, shape)

    def loss_pallas(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        assert jnp.allclose(a, b, atol=2e-3), float(jnp.abs(a - b).max())


def test_attention_auto_routing_matches_xla():
    """backend='auto' must be numerically equivalent to xla at both routes
    (short sequence -> xla; long supported sequence -> pallas kernel)."""
    import jax
    import jax.numpy as jnp
    from diffusion_classifier_tpu.ops.attention import attention

    rng = jax.random.PRNGKey(0)
    for shape in ((2, 64, 2, 32), (1, 512, 2, 32)):
        kq, kk, kv = jax.random.split(jax.random.fold_in(rng, shape[1]), 3)
        q = jax.random.normal(kq, shape)
        k = jax.random.normal(kk, shape)
        v = jax.random.normal(kv, shape)
        want = attention(q, k, v, backend="xla")
        got = attention(q, k, v, backend="auto")
        assert jnp.allclose(got, want, atol=2e-3)
