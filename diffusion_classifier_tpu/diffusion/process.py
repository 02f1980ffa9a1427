"""Forward diffusion, prediction conversions, loss weights, and the DDPM posterior step.

Pure array functions shared by training (`loss`), sampling (`sampler.py`) and
ELBO classification (`classify.py`). Semantics track the reference engine
(`diffusion/diffusion_classifier.py` in faverogian/diffusion-classifier):

- forward noising  ``z_t = α_t·x + σ_t·ε``           (reference `:100-117`)
- v→ε conversion   ``ε̂ = σ_t·z_t + α_t·v̂``           (reference `:326-329`)
- CFG combine      ``(1+w)·pred − w·u_pred``          (reference `:196-197`)
- posterior        ``μ = α_s(z_t(1−c)/α_t + c·x̂)``,
                   ``var = σ_s²·c``, ``c = −expm1(logSNR_t − logSNR_s)``
                                                      (reference `:190-208`)

Layout note: images are NHWC throughout this framework (TPU-native); per-sample
scalars (logSNR, α, σ, weights) broadcast over the trailing image axes via
``_bcast``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .schedule import alpha_sigma, min_snr_weight

__all__ = [
    "bcast_right",
    "diffuse",
    "clip_x",
    "cfg_combine",
    "pred_to_x",
    "pred_to_eps",
    "ddpm_sampler_step",
    "weighted_mse_loss",
]


def bcast_right(v: jax.Array, ndim: int) -> jax.Array:
    """Reshape a per-sample vector ``[B]`` to ``[B, 1, ..., 1]`` with ``ndim`` axes."""
    return v.reshape(v.shape + (1,) * (ndim - v.ndim))


def diffuse(
    x: jax.Array, alpha_t: jax.Array, sigma_t: jax.Array, rng: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Forward noising ``z_t = α_t·x + σ_t·ε`` with ε ~ N(0, I) (reference `:100-117`).

    ``alpha_t``/``sigma_t`` may be per-sample vectors ``[B]`` or already
    broadcast. Returns ``(z_t, eps_t)`` in ``x.dtype``.
    """
    eps_t = jax.random.normal(rng, x.shape, dtype=x.dtype)
    alpha_t = bcast_right(jnp.asarray(alpha_t, x.dtype), x.ndim)
    sigma_t = bcast_right(jnp.asarray(sigma_t, x.dtype), x.ndim)
    return alpha_t * x + sigma_t * eps_t, eps_t


def clip_x(x: jax.Array) -> jax.Array:
    """Clip the predicted clean image to [-1, 1] (reference `:163-173`)."""
    return jnp.clip(x, -1.0, 1.0)


def cfg_combine(pred: jax.Array, u_pred: jax.Array, cfg_w: float) -> jax.Array:
    """Classifier-free guidance: ``(1+w)·pred − w·u_pred`` (reference `:196-197`)."""
    return (1.0 + cfg_w) * pred - cfg_w * u_pred


def pred_to_x(
    pred: jax.Array,
    z_t: jax.Array,
    alpha_t: jax.Array,
    sigma_t: jax.Array,
    pred_param: str,
) -> jax.Array:
    """Convert a model output (v̂ or ε̂) to the clean-image estimate x̂ (reference `:198-201`)."""
    alpha_t = bcast_right(jnp.asarray(alpha_t, z_t.dtype), z_t.ndim)
    sigma_t = bcast_right(jnp.asarray(sigma_t, z_t.dtype), z_t.ndim)
    if pred_param == "v":
        return alpha_t * z_t - sigma_t * pred
    if pred_param == "eps":
        return (z_t - sigma_t * pred) / alpha_t
    raise ValueError(f"Invalid pred_param {pred_param!r}")


def pred_to_eps(
    pred: jax.Array,
    z_t: jax.Array,
    alpha_t: jax.Array,
    sigma_t: jax.Array,
    pred_param: str,
) -> jax.Array:
    """Convert a model output (v̂ or ε̂) to the noise estimate ε̂ (reference `:326-329,706-709`)."""
    if pred_param == "eps":
        return pred
    if pred_param == "v":
        alpha_t = bcast_right(jnp.asarray(alpha_t, z_t.dtype), z_t.ndim)
        sigma_t = bcast_right(jnp.asarray(sigma_t, z_t.dtype), z_t.ndim)
        return sigma_t * z_t + alpha_t * pred
    raise ValueError(f"Invalid pred_param {pred_param!r}")


def ddpm_sampler_step(
    z_t: jax.Array,
    pred: jax.Array,
    u_pred: jax.Array,
    logsnr_t: jax.Array,
    logsnr_s: jax.Array,
    *,
    cfg_w: float,
    pred_param: str,
) -> tuple[jax.Array, jax.Array]:
    """One ancestral DDPM posterior step; returns ``(μ, var)`` (reference `:175-208`).

    ``logsnr_t``/``logsnr_s`` are scalars or per-sample vectors (float32).
    The x̂ estimate is clipped to [-1, 1] before forming the posterior mean,
    exactly as the reference does.
    """
    logsnr_t = jnp.asarray(logsnr_t, jnp.float32)
    logsnr_s = jnp.asarray(logsnr_s, jnp.float32)
    c = -jnp.expm1(logsnr_t - logsnr_s)
    alpha_t, sigma_t = alpha_sigma(logsnr_t)
    alpha_s, sigma_s = alpha_sigma(logsnr_s)

    guided = cfg_combine(pred, u_pred, cfg_w)
    x_pred = clip_x(pred_to_x(guided, z_t, alpha_t, sigma_t, pred_param))

    nd = z_t.ndim
    c_b = bcast_right(c, nd).astype(z_t.dtype)
    alpha_t_b = bcast_right(alpha_t, nd).astype(z_t.dtype)
    alpha_s_b = bcast_right(alpha_s, nd).astype(z_t.dtype)
    sigma_s_b = bcast_right(sigma_s, nd).astype(z_t.dtype)

    mu = alpha_s_b * (z_t * (1.0 - c_b) / alpha_t_b + c_b * x_pred)
    variance = jnp.square(sigma_s_b) * c_b
    return mu, variance


def weighted_mse_loss(
    pred: jax.Array,
    z_t: jax.Array,
    eps_t: jax.Array,
    logsnr_t: jax.Array,
    pred_param: str,
) -> jax.Array:
    """Min-SNR-weighted MSE on the ε residual (reference `loss`, `:295-344`).

    ``loss = mean(w(logSNR) · (ε̂ − ε)²)`` where ε̂ is derived from the model
    output via :func:`pred_to_eps` and ``w`` is :func:`min_snr_weight`.
    Accumulates in float32 even when predictions are bfloat16.
    """
    alpha_t, sigma_t = alpha_sigma(logsnr_t)
    eps_pred = pred_to_eps(pred, z_t, alpha_t, sigma_t, pred_param)
    weight = bcast_right(min_snr_weight(logsnr_t, pred_param), z_t.ndim)
    error = (eps_pred - eps_t).astype(jnp.float32)
    return jnp.mean(weight * jnp.square(error))
