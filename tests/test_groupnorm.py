"""MXU GroupNorm correctness vs flax reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from diffusion_classifier_tpu.models.layers import GroupNormF32


@pytest.mark.parametrize("groups,channels", [(8, 32), (32, 128), (4, 4)])
def test_matches_flax_groupnorm_fp32(groups, channels):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 6, 6, channels)) * 2.0 + 0.5
    gn = GroupNormF32(num_groups=groups)
    params = gn.init(rng, x)
    got = gn.apply(params, x)
    want = nn.GroupNorm(num_groups=groups, epsilon=1e-5).init_with_output(
        rng, x
    )[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4
    )


def test_bf16_io_fp32_stats():
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 8, 8, 64)).astype(jnp.bfloat16)
    gn = GroupNormF32(num_groups=16)
    params = gn.init(rng, x)
    got = gn.apply(params, x)
    assert got.dtype == jnp.bfloat16
    want = nn.GroupNorm(num_groups=16, epsilon=1e-5).init_with_output(
        rng, x.astype(jnp.float32)
    )[0]
    # bf16 output quantization dominates the tolerance
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=5e-2, rtol=5e-2
    )


def test_scale_bias_are_learned():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 4, 4, 8))
    gn = GroupNormF32(num_groups=2)
    params = gn.init(rng, x)
    p = jax.tree_util.tree_map(lambda a: a, params)
    p = {"params": {"scale": jnp.full((8,), 2.0), "bias": jnp.full((8,), 1.0)}}
    base = gn.apply(params, x)
    scaled = gn.apply(p, x)
    np.testing.assert_allclose(
        np.asarray(scaled), np.asarray(base * 2.0 + 1.0), atol=1e-5
    )


def test_rejects_bad_group_count():
    gn = GroupNormF32(num_groups=5)
    with pytest.raises(AssertionError, match="divide"):
        gn.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
