"""Tensor-parallel param sharding over the ('data', 'model') mesh.

GSPMD guarantees exactness for any placement; these tests check (a) the TP
rules actually shard the intended weights, (b) forward results match the
replicated placement, (c) a train step runs under dp+tp."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
from diffusion_classifier_tpu.models.encoders import ClassEmbedder
from diffusion_classifier_tpu.engine.denoiser import Denoiser
from diffusion_classifier_tpu.parallel.mesh import make_mesh, shard_batch
from diffusion_classifier_tpu.parallel.sharding import param_spec, shard_params


def _tiny_denoiser():
    cfg = UNetConfig(
        sample_size=8, in_channels=3, out_channels=3,
        block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=2, cross_attention_dim=16,
        encoder_hid_dim=16, encoder_hid_dim_type="text_proj", norm_num_groups=8,
    )
    return Denoiser(
        backbone=UNetCondition2D(cfg), encoder=ClassEmbedder(4, 16)
    )


def test_param_spec_rules():
    k = jnp.zeros((16, 32))
    assert param_spec("a/attn1/to_q/kernel", k) == P(None, "model")
    assert param_spec("a/attn1/to_out/kernel", k) == P("model", None)
    assert param_spec("a/ff/proj_in/kernel", k) == P(None, "model")
    assert param_spec("a/ff/proj_out/kernel", k) == P("model", None)
    assert param_spec("a/norm1_scale", jnp.zeros((16,))) == P()
    assert param_spec("a/conv1_kernel", jnp.zeros((3, 3, 16, 16))) == P()


def test_tp_forward_matches_replicated():
    denoiser = _tiny_denoiser()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 8, 8, 3))
    lg = jnp.zeros((8,))
    lab = jnp.zeros((8,), jnp.int32)
    params = denoiser.init(rng, x, lg, lab)

    want = np.asarray(denoiser.apply(params, x, lg, lab))

    mesh = make_mesh(data=4, model=2)
    tp_params = shard_params(mesh, params)
    # at least one weight actually sharded over 'model'
    shardings = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(tp_params)
        if hasattr(leaf, "sharding")
    ]
    assert any("model" in str(s) for s in shardings)

    with mesh:
        dev = shard_batch(mesh, {"images": np.asarray(x), "prompt": np.asarray(lab)})
        got = np.asarray(
            jax.jit(denoiser.apply)(tp_params, dev["images"], lg, dev["prompt"])
        )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_tp_train_step_runs():
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.state import (
        EmaConfig, init_train_state, make_optimizer,
    )
    from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step

    denoiser = _tiny_denoiser()
    rng = jax.random.PRNGKey(0)
    x = np.random.default_rng(0).standard_normal((8, 8, 8, 3)).astype(np.float32)
    lab = np.zeros((8,), np.int32)
    params = denoiser.init(rng, jnp.asarray(x), jnp.zeros((8,)), jnp.asarray(lab))

    mesh = make_mesh(data=4, model=2)
    params = shard_params(mesh, params)
    schedule_fn = make_schedule_fn("shifted_cosine", 8, 8)
    loss_fn = make_loss_fn(
        lambda p, z, lg, l: denoiser.apply(p, z, lg, l),
        schedule_fn, pred_param="v", null_token=4,
    )
    tx = make_optimizer(1e-4, 2, 10)
    state = init_train_state(params, tx)
    step = make_train_step(loss_fn, tx, EmaConfig())
    with mesh:
        dev = shard_batch(mesh, {"images": x, "prompt": lab})
        state, loss = step(state, dev["images"], dev["prompt"], jax.random.PRNGKey(1))
        loss = float(jax.block_until_ready(loss))
    assert np.isfinite(loss)
    assert int(state.step) == 1
