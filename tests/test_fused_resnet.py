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


def _params(C, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    return ResnetParams(
        scale1=jax.random.normal(ks[0], (C,)) * 0.1 + 1.0,
        bias1=jax.random.normal(ks[1], (C,)) * 0.1,
        w1=jax.random.normal(ks[2], (3, 3, C, C)) * 0.05,
        b1=jax.random.normal(ks[3], (C,)) * 0.1,
        scale2=jax.random.normal(ks[4], (C,)) * 0.1 + 1.0,
        bias2=jax.random.normal(ks[5], (C,)) * 0.1,
        w2=jax.random.normal(ks[6], (3, 3, C, C)) * 0.05,
        b2=jax.random.normal(ks[7], (C,)) * 0.1,
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(dtype):
    C = 128
    params = _params(C)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (2, 8, 8, C), dtype)
    temb = jax.random.normal(k2, (2, C))
    want = np.asarray(resnet_block_ref(params, x, temb), np.float32)
    got = np.asarray(
        resnet_block_pallas(params, x, temb, interpret=True), np.float32
    )
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.05 * scale


def test_supports_gating():
    x = jnp.zeros((2, 32, 32, 128), jnp.bfloat16)
    assert supports(x, 128, 128, 1, 0.0)
    assert not supports(x, 128, 256, 1, 0.0)  # channel change
    assert not supports(x, 128, 128, 2, 0.0)  # stride
    assert not supports(x, 128, 128, 1, 0.1)  # dropout
    small = jnp.zeros((2, 8, 8, 96), jnp.bfloat16)
    assert not supports(small, 96, 96, 1, 0.0)  # C not 128-aligned
    huge = jnp.zeros((1, 128, 128, 512), jnp.bfloat16)
    assert not supports(huge, 512, 512, 1, 0.0)  # exceeds VMEM budget
