"""EMA stepping, LR schedule, and train-step tests (tiny shapes, CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusion_classifier_tpu.engine.state import (
    EmaConfig,
    cosine_warmup_schedule,
    ema_decay,
    ema_update,
    init_train_state,
    make_optimizer,
)
from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step
from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn


def test_ema_decay_matches_ema_pytorch_formula():
    # ema_pytorch increments self.step BEFORE update_moving_average, so for
    # pre-increment call index c its get_current_decay computes
    # epoch = (c + 1) - update_after_step - 1 = c - update_after_step
    cfg = EmaConfig(beta=0.999, update_after_step=5, update_every=1)
    for c in [0, 3, 5, 6, 7, 20, 1000, 100000]:
        got = float(ema_decay(jnp.asarray(c), cfg))
        epoch = max(c - 5, 0)
        want = 0.0 if epoch <= 0 else min(0.999, 1 - (1 + epoch) ** (-2 / 3))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_ema_warmup_copies_then_blends():
    cfg = EmaConfig(beta=0.9, update_after_step=2, update_every=1)
    params = {"w": jnp.array(1.0)}
    ema = {"w": jnp.array(0.0)}
    # counters 0..2: copies (epoch <= 0 → decay 0), ema_pytorch's
    # `step <= update_after_step` warmup branch
    for c in range(3):
        ema = ema_update(ema, params, jnp.asarray(c), cfg)
        assert float(ema["w"]) == 1.0
    # counter 3 → epoch 1 → decay = 1 - 2^(-2/3) (first blended call)
    ema = {"w": jnp.array(0.0)}
    ema = ema_update(ema, params, jnp.asarray(3), cfg)
    d = 1 - 2 ** (-2 / 3)
    np.testing.assert_allclose(float(ema["w"]), 1 - d, rtol=1e-5)


def test_ema_update_every_skips():
    cfg = EmaConfig(beta=0.9, update_after_step=0, update_every=10)
    params = {"w": jnp.array(1.0)}
    ema = {"w": jnp.array(0.0)}
    out = ema_update(ema, params, jnp.asarray(3), cfg)  # 3 % 10 != 0 → no-op
    assert float(out["w"]) == 0.0
    out = ema_update(ema, params, jnp.asarray(20), cfg)  # acts
    assert float(out["w"]) > 0.0


def test_cosine_warmup_schedule_hf_parity():
    lr, warm, total = 2e-4, 100, 1000
    sched = cosine_warmup_schedule(lr, warm, total)
    # linear warmup
    np.testing.assert_allclose(float(sched(50)), lr * 0.5, rtol=1e-6)
    # end of warmup
    np.testing.assert_allclose(float(sched(100)), lr, rtol=1e-6)
    # mid-cosine
    prog = (550 - warm) / (total - warm)
    np.testing.assert_allclose(
        float(sched(550)), lr * 0.5 * (1 + math.cos(math.pi * prog)), rtol=1e-5
    )
    # end
    np.testing.assert_allclose(float(sched(1000)), 0.0, atol=1e-10)


def _tiny_apply(params, z, logsnr, labels):
    """Linear 'denoiser': pred = w * z + bias_per_label."""
    return params["w"] * z + params["b"][labels][:, None, None, None]


def test_train_step_decreases_loss():
    sched = make_schedule_fn("cosine", 8, 8)
    loss_fn = make_loss_fn(
        _tiny_apply, sched, pred_param="eps", null_token=2, cfg_dropout=0.15
    )
    tx = make_optimizer(1e-2, 10, 200)
    params = {"w": jnp.array(0.0), "b": jnp.zeros(3)}
    state = init_train_state(params, tx)
    step = make_train_step(
        loss_fn, tx, EmaConfig(0.99, 0, 1), grad_accum_steps=1, donate=False
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 1))
    labels = jnp.array([0, 1] * 4)
    losses = []
    for i in range(60):
        rng, sub = jax.random.split(rng)
        state, loss = step(state, x, labels, sub)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert int(state.step) == 60


def test_grad_accum_runs_and_steps_once():
    sched = make_schedule_fn("cosine", 8, 8)
    loss_fn = make_loss_fn(
        _tiny_apply, sched, pred_param="v", null_token=2, cfg_dropout=0.0
    )
    params = {"w": jnp.array(0.3), "b": jnp.zeros(3)}
    tx = optax.sgd(1e-3)
    state = init_train_state(params, tx)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 1))
    labels = jnp.array([0, 1] * 4)
    rng = jax.random.PRNGKey(7)

    # 4 microbatches accumulate into exactly ONE optimizer/EMA step.
    step4 = make_train_step(loss_fn, tx, EmaConfig(), grad_accum_steps=4, donate=False)
    new_state, loss_acc = step4(state, x, labels, rng)
    assert np.isfinite(float(loss_acc))
    assert int(new_state.step) == 1
    assert int(new_state.ema_counter) == 1
    assert float(new_state.params["w"]) != float(state.params["w"])


def test_bf16_opt_state_dtype_and_tracking():
    """optimizer_state_dtype='bf16': Adam moments stored in bfloat16, count
    stays int, update math runs in fp32 — a short training run tracks the
    fp32-state optimizer closely (storage precision only)."""
    sched = make_schedule_fn("cosine", 8, 8)
    loss_fn = make_loss_fn(
        _tiny_apply, sched, pred_param="eps", null_token=2, cfg_dropout=0.0
    )
    params = {"w": jnp.array(0.0), "b": jnp.zeros(3)}
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 1))
    labels = jnp.array([0, 1] * 4)

    def run(state_dtype):
        tx = make_optimizer(1e-2, 10, 200, state_dtype=state_dtype)
        state = init_train_state(params, tx)
        step = make_train_step(
            loss_fn, tx, EmaConfig(0.99, 0, 1), grad_accum_steps=1,
            donate=False,
        )
        rng = jax.random.PRNGKey(0)
        for _ in range(30):
            rng, sub = jax.random.split(rng)
            state, loss = step(state, x, labels, sub)
        return state

    bf = run("bf16")
    moment_dtypes = {
        str(leaf.dtype)
        for leaf in jax.tree.leaves(bf.opt_state)
        if jnp.issubdtype(leaf.dtype, jnp.floating)
    }
    assert moment_dtypes == {"bfloat16"}, moment_dtypes
    counts = [
        leaf for leaf in jax.tree.leaves(bf.opt_state)
        if jnp.issubdtype(leaf.dtype, jnp.integer)
    ]
    assert counts and all(int(c) == 30 for c in counts)
    # master params stay fp32 and track the fp32-state run
    fp = run("fp32")
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(bf.params)
    )
    np.testing.assert_allclose(
        float(bf.params["w"]), float(fp.params["w"]), rtol=0.02, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(bf.params["b"]), np.asarray(fp.params["b"]),
        rtol=0.02, atol=2e-4,
    )
    # rejects anything that is not fp32/bf16
    import pytest

    with pytest.raises(ValueError):
        make_optimizer(1e-2, 10, 200, state_dtype="fp16")


def test_lr_at_matches_jnp_schedule():
    """Host-side lr_at mirrors cosine_warmup_schedule bit-comparably."""
    import pytest

    from diffusion_classifier_tpu.engine.state import (
        cosine_warmup_schedule,
        lr_at,
    )

    sched = cosine_warmup_schedule(3e-4, 50, 400)
    for step in [0, 1, 25, 49, 50, 51, 200, 399, 400, 450]:
        # fp32 schedule vs float64 mirror: tight everywhere except right at
        # the cosine zero-crossing, where fp32 cancellation dominates
        assert float(sched(step)) == pytest.approx(
            lr_at(3e-4, 50, 400, step), rel=1e-3, abs=1e-12
        ), step
