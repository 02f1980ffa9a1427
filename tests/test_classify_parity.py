"""End-to-end parity trace for the fused ELBO classification tournament.

The reference protocol (`/root/reference/diffusion/diffusion_classifier.py:657-725`)
is re-implemented here INDEPENDENTLY in float64 numpy — error table init to
+inf (`:669`), one shared (t, ε) per batch element per evaluation (`:687-692`),
per-class ‖ε̂ − ε‖² (`:711`), end-of-stage mean over all evals so far with the
mean-of-inf pruning trick (`:717-721`), fast mode's oracle-assisted candidate
subset with replacement (`:671-677`) — and the fused classifier
(`diffusion/classify.py`) must reproduce its per-stage error table, survivor
sets, and final argmin decisions exactly.

The (t, ε) draws themselves are generated with the same jax.random key
derivation the fused classifier uses (documented below); the *protocol math*
downstream of the draws is all-numpy float64. If the classifier's RNG layout
ever changes, update `_draws_for_stage` to match — the protocol assertions are
the point of this test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_classifier_tpu.diffusion.classify import make_classifier
from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn

B, C, HW = 3, 5, 4
NOISE_D = IMAGE_D = 4.0


def _apply_fn(params, z, logsnr, labels):
    """Deterministic toy v-prediction denoiser, class- and t-dependent."""
    del params
    scale = 0.05 * (labels.astype(jnp.float32) + 1.0)
    return (
        scale[:, None, None, None] * z
        + 0.1 * jnp.tanh(logsnr)[:, None, None, None]
    )


def _apply_np(z, logsnr, label):
    """The same denoiser in float64 numpy (independent protocol arm)."""
    return 0.05 * (label + 1.0) * z + 0.1 * np.tanh(logsnr)[:, None, None, None]


def _logsnr_np(t):
    """shifted_cosine schedule in float64 (noise_d == image_d ⇒ no shift)."""
    t_min = np.arctan(np.exp(-0.5 * 15.0))
    t_max = np.arctan(np.exp(-0.5 * -15.0))
    return -2.0 * np.log(np.tan(t_min + t * (t_max - t_min)))


def _draws_for_stage(stage_rng, n_evals, x):
    """Replicate the fused classifier's per-stage (t, ε) key derivation
    (eval_group=1 ⇒ one chunk per evaluation)."""
    draws = []
    for key in jax.random.split(stage_rng, n_evals):
        k_t, k_eps = jax.random.split(key)
        t = np.asarray(jax.random.uniform(k_t, (1, B)), np.float64)[0]
        eps = np.asarray(
            jax.random.normal(k_eps, (1,) + x.shape, dtype=jnp.float32), np.float64
        )[0]
        draws.append((t, eps))
    return draws


def _golden_protocol(x64, cand, ev, keep, stage_rngs):
    """Reference protocol in float64: returns per-stage (mean, cand) + pred.

    `cand` is [B, K0] surviving candidates; errors accumulate into a dense
    [B, C, total_evals] table initialised to +inf (reference `:669`).
    """
    n_stages = len(keep)
    table = np.full((B, C, ev[-1]), np.inf)
    stages = []
    for i in range(n_stages):
        draws = _draws_for_stage(stage_rngs[i], ev[i + 1] - ev[i], x64)
        for j, (t, eps) in enumerate(draws, start=ev[i]):
            logsnr = _logsnr_np(t)
            a = np.sqrt(1.0 / (1.0 + np.exp(-logsnr)))
            s = np.sqrt(1.0 / (1.0 + np.exp(logsnr)))
            z = a[:, None, None, None] * x64 + s[:, None, None, None] * eps
            for row in range(B):
                for c in cand[row]:
                    pred = _apply_np(z[row : row + 1], logsnr[row : row + 1], c)
                    eps_pred = (
                        s[row] * z[row : row + 1] + a[row] * pred
                    )  # v → ε
                    table[row, c, j] = np.sum(
                        (eps_pred - eps[row : row + 1]) ** 2
                    )
        mean = table[:, :, : ev[i + 1]].mean(axis=2)  # inf-poisoned rows stay inf
        order = np.argsort(mean, axis=1, kind="stable")
        cand = order[:, : keep[i]]
        stages.append((mean, cand.copy()))
    return stages, cand[:, 0]


def _make_inputs(seed=0):
    kx = jax.random.PRNGKey(100 + seed)
    x = jax.random.uniform(kx, (B, HW, HW, 1), minval=-1.0, maxval=1.0)
    return x, np.asarray(x, np.float64)


def test_full_protocol_parity_staged():
    """Two-stage tournament: error table, survivors, and argmin all match."""
    schedule_fn = make_schedule_fn("shifted_cosine", NOISE_D, IMAGE_D)
    ev, keep = (0, 2, 5), (3, 1)
    classify = make_classifier(
        _apply_fn,
        schedule_fn,
        pred_param="v",
        num_classes=C,
        n_stages=2,
        evaluation_per_stage=ev[1:],
        n_keep_per_stage=keep,
        eval_group=1,
        trace=True,
    )
    x, x64 = _make_inputs()
    rng = jax.random.PRNGKey(7)
    pred, stages = jax.jit(classify)(
        None, x, jnp.zeros((B,), jnp.int32), rng
    )

    cand0 = np.broadcast_to(np.arange(C), (B, C))
    stage_rngs = jax.random.split(rng, 2)
    gold_stages, gold_pred = _golden_protocol(x64, cand0, ev, keep, stage_rngs)

    for (g_mean, g_cand), got in zip(gold_stages, stages):
        mean = np.asarray(got["mean"], np.float64)
        finite = np.isfinite(g_mean)
        assert (np.isfinite(mean) == finite).all()
        np.testing.assert_allclose(
            mean[finite], g_mean[finite], rtol=1e-4, atol=1e-5
        )
        # survivor SETS must match exactly (ordering by mean may differ
        # only under exact ties, which this denoiser never produces)
        assert (np.sort(np.asarray(got["cand"]), 1) == np.sort(g_cand, 1)).all()
    np.testing.assert_array_equal(np.asarray(pred), gold_pred)


def test_full_protocol_parity_fast_mode_with_duplicates():
    """Fast mode: candidate subset drawn with replacement (reference
    torch.randint semantics, `:671-677`) — duplicated candidates write the
    same slot, unscored classes rank +inf, and the final decision matches."""
    schedule_fn = make_schedule_fn("shifted_cosine", NOISE_D, IMAGE_D)
    ev, keep = (0, 2, 4), (2, 1)
    n_fast = 4
    classify = make_classifier(
        _apply_fn,
        schedule_fn,
        pred_param="v",
        num_classes=C,
        n_stages=2,
        evaluation_per_stage=ev[1:],
        n_keep_per_stage=keep,
        fast=True,
        n_fast_classes=n_fast,
        eval_group=1,
        trace=True,
    )
    x, x64 = _make_inputs(seed=1)
    labels = jnp.asarray([0, 2, 4], jnp.int32)

    # find a seed whose candidate draw contains a duplicate, so the
    # duplicate-slot semantics are actually exercised
    for seed in range(20):
        rng = jax.random.PRNGKey(seed)
        rng2, k_sel = jax.random.split(rng)
        i = np.arange(C - 1)[None, :]
        incorrect = i + (i >= np.asarray(labels)[:, None])
        sel = np.asarray(
            jax.random.randint(k_sel, (B, n_fast - 1), 0, C - 1)
        )
        cand0 = np.concatenate(
            [np.asarray(labels)[:, None], np.take_along_axis(incorrect, sel, 1)],
            axis=1,
        )
        if any(len(set(row)) < n_fast for row in cand0):
            break
    else:  # pragma: no cover
        pytest.fail("no duplicate-producing seed found")

    pred, stages = jax.jit(classify)(None, x, labels, rng)

    stage_rngs = jax.random.split(rng2, 2)
    gold_stages, gold_pred = _golden_protocol(x64, cand0, ev, keep, stage_rngs)

    g_mean0, _ = gold_stages[0]
    mean0 = np.asarray(stages[0]["mean"], np.float64)
    # classes outside the fast candidate subset never get scored → +inf
    assert (np.isfinite(mean0) == np.isfinite(g_mean0)).all()
    for row in range(B):
        assert set(np.where(np.isfinite(g_mean0[row]))[0]) == set(cand0[row])
    finite = np.isfinite(g_mean0)
    np.testing.assert_allclose(
        mean0[finite], g_mean0[finite], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(pred), gold_pred)


def test_grouping_invariance_of_decisions():
    """The megabatch grouping G changes key derivation (different draws) but
    not protocol semantics: with class separation ≫ draw noise in the toy
    error landscape, decisions must agree across groupings."""
    schedule_fn = make_schedule_fn("shifted_cosine", NOISE_D, IMAGE_D)

    def apply_fn(params, z, logsnr, labels):
        # ε̂ = 10·c per pixel: err(c) ≈ ‖ε‖² − 20c·Σε + 100c²·npix, dominated
        # by the last term for c ≥ 1, so class 0 wins under every draw.
        del params, logsnr
        return jnp.broadcast_to(
            10.0 * labels.astype(jnp.float32)[:, None, None, None], z.shape
        )

    classify_g = {
        g: jax.jit(
            make_classifier(
                apply_fn,
                schedule_fn,
                pred_param="eps",
                num_classes=C,
                n_stages=1,
                evaluation_per_stage=(4,),
                n_keep_per_stage=(1,),
                eval_group=g,
            )
        )
        for g in (1, 2, 4)
    }
    x, _ = _make_inputs(seed=2)
    labels = jnp.zeros((B,), jnp.int32)
    preds = {
        g: np.asarray(fn(None, x, labels, jax.random.PRNGKey(3)))
        for g, fn in classify_g.items()
    }
    assert (preds[1] == preds[2]).all() and (preds[1] == preds[4]).all()


def test_eval_group_must_divide_stage_evals():
    schedule_fn = make_schedule_fn("shifted_cosine", NOISE_D, IMAGE_D)
    with pytest.raises(ValueError, match="does not divide"):
        make_classifier(
            _apply_fn,
            schedule_fn,
            pred_param="v",
            num_classes=C,
            n_stages=1,
            evaluation_per_stage=(5,),
            n_keep_per_stage=(1,),
            eval_group=2,
        )


def test_class_chunk_is_pure_schedule():
    """class_chunk changes the execution schedule only: the (t, ε) key
    derivation does not depend on it, so predictions and per-stage means are
    IDENTICAL for any chunking (including fast mode with duplicates)."""
    schedule_fn = make_schedule_fn("shifted_cosine", NOISE_D, IMAGE_D)
    x, _ = _make_inputs(seed=3)
    labels = jnp.asarray([0, 2, 4], jnp.int32)

    def build(chunk, fast):
        return jax.jit(make_classifier(
            _apply_fn, schedule_fn, pred_param="v", num_classes=C,
            n_stages=2, evaluation_per_stage=(2, 5), n_keep_per_stage=(3, 1),
            fast=fast, n_fast_classes=4 if fast else 2,
            eval_group=1, class_chunk=chunk, trace=True,
        ))

    for fast in (False, True):
        base_pred, base_stages = build(0, fast)(None, x, labels, jax.random.PRNGKey(11))
        for chunk in (1, 5) if not fast else (1, 2):
            pred, stages = build(chunk, fast)(None, x, labels, jax.random.PRNGKey(11))
            np.testing.assert_array_equal(np.asarray(base_pred), np.asarray(pred))
            for s0, s1 in zip(base_stages, stages):
                a, b = np.asarray(s0["mean"]), np.asarray(s1["mean"])
                fin = np.isfinite(a)
                assert (np.isfinite(b) == fin).all()
                np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5)


def test_scan_unroll_is_pure_schedule():
    """scan_unroll only removes while-loop back-edges from the on-device
    evaluation/class scans: the traced per-iteration program and the (t, ε)
    key derivation are unchanged, so predictions and per-stage means are
    identical for any unroll factor (including non-dividing ones)."""
    schedule_fn = make_schedule_fn("shifted_cosine", NOISE_D, IMAGE_D)
    x, _ = _make_inputs(seed=4)
    labels = jnp.asarray([1, 3, 0], jnp.int32)

    def build(unroll):
        return jax.jit(make_classifier(
            _apply_fn, schedule_fn, pred_param="v", num_classes=C,
            n_stages=2, evaluation_per_stage=(2, 6), n_keep_per_stage=(3, 1),
            eval_group=1, class_chunk=1, scan_unroll=unroll, trace=True,
        ))

    base_pred, base_stages = build(1)(None, x, labels, jax.random.PRNGKey(12))
    # 3 divides neither scan; 8 exceeds both; (4, 1) is asymmetric
    for unroll in (2, 3, 8, (4, 1)):
        pred, stages = build(unroll)(None, x, labels, jax.random.PRNGKey(12))
        np.testing.assert_array_equal(np.asarray(base_pred), np.asarray(pred))
        for s0, s1 in zip(base_stages, stages):
            a, b = np.asarray(s0["mean"]), np.asarray(s1["mean"])
            fin = np.isfinite(a)
            assert (np.isfinite(b) == fin).all()
            np.testing.assert_allclose(a[fin], b[fin], rtol=1e-5)
