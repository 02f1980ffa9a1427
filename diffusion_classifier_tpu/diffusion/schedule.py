"""Continuous-time logSNR noise schedules (Kingma VDM / "simple diffusion" style).

Pure fp32 functions — no model dependencies. These reproduce, bit-for-bit within
float tolerance, the schedule semantics of the reference engine
(`diffusion/diffusion_classifier.py:119-161` in faverogian/diffusion-classifier):

    logSNR(t) = -2 * log(tan(t_min + t * (t_max - t_min)))

where ``t_min/t_max = atan(exp(-0.5 * logsnr_max/min))`` and both logSNR bounds
are pre-shifted by ``log(noise_d / image_d)`` *before* computing t_min/t_max.
The ``shifted_cosine`` variant additionally adds ``2 * log(noise_d / image_d)``
to the resulting logSNR (reference `:146-161`).

All schedule math is kept in float32 regardless of the model compute dtype:
``tan``/``log`` near the t ∈ {0, 1} boundaries lose too much precision in
bfloat16, and the schedule is evaluated once per step — it is never the
bottleneck on TPU.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "safe_log",
    "logsnr_schedule_cosine",
    "logsnr_schedule_cosine_shifted",
    "make_schedule_fn",
    "alpha_sigma",
    "min_snr_weight",
]


def safe_log(x: jax.Array, eps: float = 1e-20) -> jax.Array:
    """log with the input clamped to ``eps`` (reference helper `:14-15`)."""
    return jnp.log(jnp.clip(x, min=eps))


def logsnr_schedule_cosine(
    t: jax.Array,
    *,
    noise_d: float,
    image_d: float,
    logsnr_min: float = -15.0,
    logsnr_max: float = 15.0,
) -> jax.Array:
    """Cosine logSNR schedule with resolution-dependent bound shifting.

    Matches reference `diffusion/diffusion_classifier.py:119-144`: both bounds
    are shifted by ``log(noise_d / image_d)`` before the atan-boundary
    computation. Returns float32 regardless of input dtype.
    """
    shift = math.log(noise_d / image_d)
    lo = logsnr_max + shift
    hi = logsnr_min + shift
    t_min = math.atan(math.exp(-0.5 * lo))
    t_max = math.atan(math.exp(-0.5 * hi))

    t = jnp.asarray(t, dtype=jnp.float32)
    return -2.0 * safe_log(jnp.tan(t_min + t * (t_max - t_min)))


def logsnr_schedule_cosine_shifted(
    t: jax.Array,
    *,
    noise_d: float,
    image_d: float,
    logsnr_min: float = -15.0,
    logsnr_max: float = 15.0,
) -> jax.Array:
    """Shifted-cosine schedule: cosine + ``2*log(noise_d/image_d)``.

    Matches reference `diffusion/diffusion_classifier.py:146-161`.
    """
    base = logsnr_schedule_cosine(
        t,
        noise_d=noise_d,
        image_d=image_d,
        logsnr_min=logsnr_min,
        logsnr_max=logsnr_max,
    )
    return base + 2.0 * math.log(noise_d / image_d)


def make_schedule_fn(schedule: str, noise_d: float, image_d: float):
    """Bind a named schedule to its resolution parameters.

    ``schedule`` selection semantics mirror reference `:33-39`
    (asserts on the same two names).
    """
    if schedule == "cosine":
        return partial(logsnr_schedule_cosine, noise_d=noise_d, image_d=image_d)
    if schedule == "shifted_cosine":
        return partial(
            logsnr_schedule_cosine_shifted, noise_d=noise_d, image_d=image_d
        )
    raise ValueError(
        f"Invalid schedule {schedule!r}. Must be 'cosine' or 'shifted_cosine'."
    )


def alpha_sigma(logsnr: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``α = √sigmoid(logSNR)``, ``σ = √sigmoid(−logSNR)`` (reference `:191-194,317-318`)."""
    logsnr = jnp.asarray(logsnr, dtype=jnp.float32)
    alpha = jnp.sqrt(jax.nn.sigmoid(logsnr))
    sigma = jnp.sqrt(jax.nn.sigmoid(-logsnr))
    return alpha, sigma


def min_snr_weight(logsnr: jax.Array, pred_param: str) -> jax.Array:
    """Min-SNR loss weight (arXiv:2303.09556), reference `:331-337`.

    ``snr = exp(logSNR)`` clamped to max 5 (clamp applied BEFORE the weight, as
    in the reference); weight is ``1/(1+snr)`` for v-prediction and ``1/snr``
    for ε-prediction.
    """
    snr = jnp.clip(jnp.exp(jnp.asarray(logsnr, dtype=jnp.float32)), max=5.0)
    if pred_param == "v":
        return 1.0 / (1.0 + snr)
    if pred_param == "eps":
        return 1.0 / snr
    raise ValueError(
        f"Invalid prediction parameterization {pred_param!r}. Must be 'v' or 'eps'."
    )
