"""Jitted training step for the diffusion classifier engine.

One fused device program per optimizer step: CFG label dropout → forward
noising → denoiser forward/backward (optionally scanned over
grad-accumulation microbatches) → global-norm clip → Adam → EMA pytree
update. Mirrors the reference inner loop
(`diffusion/diffusion_classifier.py:428-453`) but as a single XLA
compilation instead of framework callbacks; under a `Mesh` the gradient
`psum` over the 'data' axis is inserted by the compiler.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..diffusion.process import diffuse, weighted_mse_loss
from ..diffusion.schedule import alpha_sigma
from .state import EmaConfig, TrainState, ema_update

__all__ = ["make_loss_fn", "make_train_step"]

CFG_DROP_P = 0.15  # reference `:435`


def make_loss_fn(
    apply_fn: Callable,
    schedule_fn: Callable,
    *,
    pred_param: str,
    null_token: int,
    cfg_dropout: float = CFG_DROP_P,
):
    """Build ``loss(params, x, labels, rng) -> scalar`` (reference `loss`, `:295-344`).

    ``apply_fn(params, z_t, logsnr_t, labels)`` is the bundled denoiser. The
    CFG condition dropout to the null token (reference `:434-439`) lives here
    so it is part of the same traced program.
    """

    def loss_fn(params, x, labels, rng):
        b = x.shape[0]
        r_drop, r_t, r_noise = jax.random.split(rng, 3)

        if cfg_dropout > 0.0:
            drop = jax.random.uniform(r_drop, (b,)) < cfg_dropout
            labels = jnp.where(drop, jnp.full_like(labels, null_token), labels)

        t = jax.random.uniform(r_t, (b,))
        logsnr_t = schedule_fn(t)
        alpha_t, sigma_t = alpha_sigma(logsnr_t)
        z_t, eps_t = diffuse(x, alpha_t, sigma_t, r_noise)
        pred = apply_fn(params, z_t, logsnr_t, labels)
        return weighted_mse_loss(pred, z_t, eps_t, logsnr_t, pred_param)

    return loss_fn


def make_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    ema_cfg: EmaConfig,
    *,
    grad_accum_steps: int = 1,
    donate: bool = True,
):
    """Build the jitted ``train_step(state, x, labels, rng) -> (state, loss)``.

    With ``grad_accum_steps > 1`` the global batch is split into microbatches
    and scanned (`lax.scan`) inside the step — the TPU-native equivalent of
    the reference's ``accelerator.accumulate`` (`:377,430`).
    """

    grad_fn = jax.value_and_grad(loss_fn)

    def step(state: TrainState, x, labels, rng):
        if grad_accum_steps == 1:
            loss, grads = grad_fn(state.params, x, labels, rng)
        else:
            k = grad_accum_steps
            b = x.shape[0]
            assert b % k == 0, f"batch {b} not divisible by accum {k}"
            xs = x.reshape(k, b // k, *x.shape[1:])
            ls = labels.reshape(k, b // k)
            rngs = jax.random.split(rng, k)

            def body(carry, micro):
                loss_acc, grads_acc = carry
                mx, ml, mr = micro
                loss_i, grads_i = grad_fn(state.params, mx, ml, mr)
                return (
                    loss_acc + loss_i,
                    jax.tree.map(jnp.add, grads_acc, grads_i),
                ), None

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                body, (jnp.zeros(()), zero), (xs, ls, rngs)
            )
            loss = loss / k
            grads = jax.tree.map(lambda g: g / k, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = ema_update(state.ema_params, params, state.ema_counter, ema_cfg)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
            ema_counter=state.ema_counter + 1,
        )
        return new_state, loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())
