"""Fused Pallas resnet-block kernel vs pure-JAX reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_classifier_tpu.ops.fused_resnet import (
    ResnetParams,
    resnet_block_pallas,
    resnet_block_ref,
    supports,
)


def _params(cin, cout, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 10)
    skip = cin != cout
    return ResnetParams(
        scale1=jax.random.normal(ks[0], (cin,)) * 0.1 + 1.0,
        bias1=jax.random.normal(ks[1], (cin,)) * 0.1,
        w1=jax.random.normal(ks[2], (3, 3, cin, cout)) * 0.05,
        b1=jax.random.normal(ks[3], (cout,)) * 0.1,
        scale2=jax.random.normal(ks[4], (cout,)) * 0.1 + 1.0,
        bias2=jax.random.normal(ks[5], (cout,)) * 0.1,
        w2=jax.random.normal(ks[6], (3, 3, cout, cout)) * 0.05,
        b2=jax.random.normal(ks[7], (cout,)) * 0.1,
        ws=jax.random.normal(ks[8], (cin, cout)) * 0.1 if skip else None,
        bs=jax.random.normal(ks[9], (cout,)) * 0.1 if skip else None,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(dtype):
    cin = cout = 128
    params = _params(cin, cout)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (4, 8, 8, cin), dtype)
    temb = jax.random.normal(k2, (4, cout))
    want = np.asarray(resnet_block_ref(params, x, temb), np.float32)
    got = np.asarray(
        resnet_block_pallas(params, x, temb, interpret=True), np.float32
    )
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.05 * scale


def test_kernel_matches_reference_channel_change():
    """Cin != Cout exercises the fused 1x1 conv_shortcut path."""
    cin, cout = 256, 128
    params = _params(cin, cout, key=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (2, 8, 8, cin), jnp.bfloat16)
    temb = jax.random.normal(k2, (2, cout))
    want = np.asarray(resnet_block_ref(params, x, temb), np.float32)
    got = np.asarray(
        resnet_block_pallas(params, x, temb, interpret=True), np.float32
    )
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.05 * scale


def test_kernel_grad_matches_reference():
    """custom_vjp routes the backward through resnet_block_ref — the kernel
    must be trainable with the same gradients as the pure-JAX block."""
    cin = cout = 128
    params = _params(cin, cout, key=4)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(k1, (2, 8, 8, cin))
    temb = jax.random.normal(k2, (2, cout))

    def loss_pallas(p, x, t):
        return jnp.sum(resnet_block_pallas(p, x, t, interpret=True) ** 2)

    def loss_ref(p, x, t):
        return jnp.sum(resnet_block_ref(p, x, t) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, x, temb)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, temb)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_r)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        # the cotangent itself comes from the bf16 pallas forward, so
        # compare at a tolerance scaled to each leaf's gradient magnitude
        assert np.abs(a - b).max() < 0.03 * (np.abs(b).max() + 1e-3)


def test_supports_gating():
    x = jnp.zeros((2, 32, 32, 128), jnp.bfloat16)
    assert supports(x, 128, 128, 1, 0.0)
    assert supports(x, 256, 128, 1, 0.0)  # channel change now fused
    assert not supports(x, 128, 128, 2, 0.0)  # stride
    assert not supports(x, 128, 128, 1, 0.1)  # dropout
    assert not supports(x, 96, 96, 1, 0.0)  # non-128-multiple channels
    big = jnp.zeros((2, 256, 256, 256), jnp.bfloat16)
    assert not supports(big, 256, 256, 1, 0.0)  # sample exceeds VMEM budget


def test_kernel_grad_bf16_activations():
    """bf16 activations (the repo's compute convention) must be trainable:
    the backward casts the cotangent to the reference block's own output
    dtype instead of forcing fp32 into the pullback."""
    cin = cout = 128
    params = _params(cin, cout, key=6)
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(k1, (2, 8, 8, cin), jnp.bfloat16)
    temb = jax.random.normal(k2, (2, cout), jnp.bfloat16)

    def loss(p, xi, t):
        out = resnet_block_pallas(p, xi, t, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(params, x, temb)
    for leaf in jax.tree.leaves(grads):
        leaf = np.asarray(leaf, np.float32)
        assert np.isfinite(leaf).all()
    assert np.abs(np.asarray(grads[1], np.float32)).max() > 0.0
