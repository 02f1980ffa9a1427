"""Golden tests for the diffusion math core.

Expected values are recomputed here in float64 numpy straight from the formulas
of the reference engine (faverogian/diffusion-classifier
`diffusion/diffusion_classifier.py:119-161, 190-208, 326-342`) — an independent
implementation, not a call into the package under test.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_classifier_tpu.diffusion import schedule as S
from diffusion_classifier_tpu.diffusion import process as P


def ref_logsnr_cosine(t, noise_d, image_d, lo=-15.0, hi=15.0):
    """Reference formula in float64 (mirrors diffusion_classifier.py:119-144)."""
    shift = math.log(noise_d / image_d)
    hi, lo = hi + shift, lo + shift
    t_min = math.atan(math.exp(-0.5 * hi))
    t_max = math.atan(math.exp(-0.5 * lo))
    return -2.0 * np.log(np.clip(np.tan(t_min + t * (t_max - t_min)), 1e-20, None))


@pytest.mark.parametrize("noise_d,image_d", [(64, 64), (64, 128), (32, 256)])
def test_logsnr_cosine_matches_reference_formula(noise_d, image_d):
    t = np.linspace(0.0, 1.0, 101)
    want = ref_logsnr_cosine(t, noise_d, image_d)
    got = S.logsnr_schedule_cosine(jnp.asarray(t), noise_d=noise_d, image_d=image_d)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("noise_d,image_d", [(64, 128), (32, 256)])
def test_logsnr_shifted_adds_2log_ratio(noise_d, image_d):
    t = np.linspace(0.0, 1.0, 23)
    base = S.logsnr_schedule_cosine(jnp.asarray(t), noise_d=noise_d, image_d=image_d)
    shifted = S.logsnr_schedule_cosine_shifted(
        jnp.asarray(t), noise_d=noise_d, image_d=image_d
    )
    np.testing.assert_allclose(
        np.asarray(shifted - base),
        2.0 * math.log(noise_d / image_d),
        rtol=1e-5,
        atol=1e-5,
    )


def test_logsnr_endpoints_unshifted():
    # With noise_d == image_d the schedule spans exactly [logsnr_min, logsnr_max].
    got = S.logsnr_schedule_cosine(
        jnp.array([0.0, 1.0]), noise_d=64, image_d=64
    )
    np.testing.assert_allclose(np.asarray(got), [15.0, -15.0], rtol=1e-4, atol=1e-3)


def test_make_schedule_fn_selects_and_rejects():
    fn = S.make_schedule_fn("cosine", 64, 64)
    np.testing.assert_allclose(
        float(fn(jnp.array(0.5))), ref_logsnr_cosine(0.5, 64, 64), rtol=1e-5, atol=1e-5
    )
    with pytest.raises(ValueError):
        S.make_schedule_fn("linear", 64, 64)


def test_alpha_sigma_identity():
    logsnr = jnp.linspace(-15.0, 15.0, 31)
    alpha, sigma = S.alpha_sigma(logsnr)
    np.testing.assert_allclose(
        np.asarray(alpha**2 + sigma**2), 1.0, rtol=1e-6, atol=1e-6
    )
    # α/σ relate to SNR: α²/σ² = exp(logSNR)
    np.testing.assert_allclose(
        np.asarray(2 * (jnp.log(alpha) - jnp.log(sigma))),
        np.asarray(logsnr),
        rtol=1e-4,
        atol=1e-3,
    )


def test_min_snr_weight_clamp_and_values():
    logsnr = jnp.array([-2.0, 0.0, math.log(5.0), 10.0])
    snr = np.clip(np.exp(np.asarray(logsnr)), None, 5.0)
    np.testing.assert_allclose(
        np.asarray(S.min_snr_weight(logsnr, "v")), 1.0 / (1.0 + snr), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(S.min_snr_weight(logsnr, "eps")), 1.0 / snr, rtol=1e-5
    )
    with pytest.raises(ValueError):
        S.min_snr_weight(logsnr, "x0")


def test_diffuse_statistics_and_linearity():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((4, 8, 8, 3))
    alpha = jnp.array([1.0, 0.5, 0.0, 0.8])
    sigma = jnp.sqrt(1.0 - alpha**2)
    z, eps = P.diffuse(x, alpha, sigma, rng)
    # z == αx + σε exactly
    np.testing.assert_allclose(
        np.asarray(z),
        np.asarray(P.bcast_right(alpha, 4) * x + P.bcast_right(sigma, 4) * eps),
        rtol=1e-6,
    )


def test_pred_conversions_roundtrip():
    rng = jax.random.PRNGKey(1)
    kx, ke = jax.random.split(rng)
    x = jax.random.normal(kx, (2, 4, 4, 3))
    eps = jax.random.normal(ke, (2, 4, 4, 3))
    logsnr = jnp.array([1.3, -0.7])
    alpha, sigma = S.alpha_sigma(logsnr)
    a = P.bcast_right(alpha, 4)
    s = P.bcast_right(sigma, 4)
    z = a * x + s * eps
    v = a * eps - s * x  # true v
    # pred_to_eps(v) recovers ε; pred_to_x(v) recovers x
    np.testing.assert_allclose(
        np.asarray(P.pred_to_eps(v, z, alpha, sigma, "v")), np.asarray(eps),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(P.pred_to_x(v, z, alpha, sigma, "v")), np.asarray(x),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(P.pred_to_x(eps, z, alpha, sigma, "eps")), np.asarray(x),
        rtol=1e-4, atol=1e-5,
    )


def test_ddpm_sampler_step_matches_reference_formula():
    rng = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(rng, 3)
    z_t = jax.random.normal(k1, (2, 4, 4, 3))
    pred = jax.random.normal(k2, (2, 4, 4, 3))
    u_pred = jax.random.normal(k3, (2, 4, 4, 3))
    logsnr_t, logsnr_s = jnp.float32(-1.2), jnp.float32(0.9)
    cfg_w = 0.3

    mu, var = P.ddpm_sampler_step(
        z_t, pred, u_pred, logsnr_t, logsnr_s, cfg_w=cfg_w, pred_param="eps"
    )

    # float64 re-derivation (reference :190-208)
    zt = np.asarray(z_t, np.float64)
    pr = np.asarray(pred, np.float64)
    up = np.asarray(u_pred, np.float64)
    lt, ls = float(logsnr_t), float(logsnr_s)
    c = -np.expm1(lt - ls)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    a_t, a_s = math.sqrt(sig(lt)), math.sqrt(sig(ls))
    s_s = math.sqrt(sig(-ls))
    g = (1 + cfg_w) * pr - cfg_w * up
    x_pred = np.clip((zt - math.sqrt(sig(-lt)) * g) / a_t, -1.0, 1.0)
    want_mu = a_s * (zt * (1 - c) / a_t + c * x_pred)
    want_var = s_s**2 * c

    np.testing.assert_allclose(np.asarray(mu), want_mu, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), want_var, rtol=1e-5, atol=1e-6)


def test_weighted_mse_loss_perfect_prediction_is_zero():
    rng = jax.random.PRNGKey(3)
    kx, kn = jax.random.split(rng)
    x = jax.random.normal(kx, (4, 8, 8, 3))
    logsnr = jnp.array([-3.0, 0.0, 2.0, 5.0])
    alpha, sigma = S.alpha_sigma(logsnr)
    z, eps = P.diffuse(x, alpha, sigma, kn)
    v_true = P.bcast_right(alpha, 4) * eps - P.bcast_right(sigma, 4) * x
    loss = P.weighted_mse_loss(v_true, z, eps, logsnr, "v")
    assert float(loss) < 1e-8


def test_weighted_mse_loss_matches_reference_formula():
    rng = jax.random.PRNGKey(4)
    kx, kn, kp = jax.random.split(rng, 3)
    x = jax.random.normal(kx, (4, 8, 8, 3))
    logsnr = jnp.array([-3.0, 0.0, 2.0, 5.0])
    alpha, sigma = S.alpha_sigma(logsnr)
    z, eps = P.diffuse(x, alpha, sigma, kn)
    pred = jax.random.normal(kp, x.shape)
    for pp in ("v", "eps"):
        got = float(P.weighted_mse_loss(pred, z, eps, logsnr, pp))
        a = np.asarray(P.bcast_right(alpha, 4), np.float64)
        s = np.asarray(P.bcast_right(sigma, 4), np.float64)
        zt, ep, pr = (np.asarray(v, np.float64) for v in (z, eps, pred))
        eps_pred = s * zt + a * pr if pp == "v" else pr
        snr = np.clip(np.exp(np.asarray(logsnr, np.float64)), None, 5.0)
        w = 1 / (1 + snr) if pp == "v" else 1 / snr
        want = np.mean(w[:, None, None, None] * (eps_pred - ep) ** 2)
        np.testing.assert_allclose(got, want, rtol=1e-4)
