"""Headline benchmark: ELBO classification throughput (images/sec/chip).

Primary metric (LAST line printed, driver contract): the framework's
production classify path — explicit prefix hoisting + class-chunked scoring
(`diffusion_classifier_tpu/diffusion/classify.py`) — against the
reference's execution model: one denoiser forward per (evaluation, class)
(`/root/reference/diffusion/diffusion_classifier.py:681-714`) rebuilt with
the SAME protocol on the SAME chip as an on-device scan. ``vs_baseline``
uses the faithful reconstruction (each per-class call recomputes the ENTIRE
network, as the reference's torch calls do — an optimization_barrier stops
XLA from granting the baseline our prefix sharing); the stricter round-1
variant where XLA LICM hoists the prefix for the baseline too is reported
alongside as ``vs_licm_hoisted_baseline``. Neither baseline pays the
reference's real per-call Python/host-dispatch latency.

Secondary metrics (earlier JSON lines): training-step images/sec, sampler
steps/sec, and B=1 classification latency, so regressions in the other hot
loops are visible to the driver.

Timing methodology (this TPU is reached through a relay with ~30 ms
round-trip latency and duplicate-execution caching): each measured quantity
is computed from the DELTA between a 1-repeat and an R-repeat on-device
`lax.scan` chain with per-iteration RNG, ending in a scalar fetch — fixed
relay latency and dispatch cost cancel out.
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

BATCH = 32
CLASSES = 10
EVALS = 4
CHAIN = 8  # extra repeats for the delta measurement
TRIALS = 5  # best-of; the relay's run-to-run jitter is the noise floor
TRAIN_BATCH = 64
SAMPLER_STEPS = 32

# production classify knobs at this operating point (measured sweeps in
# BASELINE.md: a scan of per-class chunks with the prefix explicitly hoisted
# beats one giant megabatch; the fused-block pallas kernel measured slower
# than XLA's conv emitters at these shapes, so the xla backend is default)
CLASS_CHUNK = 1
RESNET_BACKEND = "xla"


def _timed_delta(fn1, fnR, repeats):
    """Best-of-TRIALS per-repeat seconds from (T_R − T_1)/(R−1)."""
    fn1(0), fnR(0)  # compile both
    best = float("inf")
    for i in range(TRIALS):
        t0 = time.perf_counter()
        fn1(i + 1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        fnR(i + 1)
        tr = time.perf_counter() - t0
        best = min(best, (tr - t1) / (repeats - 1))
    return best


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    # persistent compile cache: repeat bench runs skip the remote compiler
    # (does not affect measurements — the scan-delta excludes compile time)
    enable_compilation_cache("/tmp/dc_tpu_xla_cache")

    from __graft_entry__ import _flagship
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.process import bcast_right, pred_to_eps
    from diffusion_classifier_tpu.diffusion.sampler import make_sampler
    from diffusion_classifier_tpu.diffusion.schedule import (
        alpha_sigma,
        make_schedule_fn,
    )
    from diffusion_classifier_tpu.engine.state import (
        EmaConfig,
        init_train_state,
        make_optimizer,
    )
    from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step

    denoiser, size = _flagship()
    # production serving backbone: same param tree, configured backend
    backbone = denoiser.backbone
    prod_cfg = dataclasses.replace(
        backbone.config, resnet_backend=RESNET_BACKEND
    )
    prod = type(denoiser)(
        backbone=type(backbone)(prod_cfg, dtype=backbone.dtype),
        encoder=denoiser.encoder,
    )

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, size, size, 3), minval=-1, maxval=1)
    labels = jnp.zeros((BATCH,), jnp.int32)
    params = denoiser.init(rng, x, jnp.zeros((BATCH,)), labels)
    schedule_fn = make_schedule_fn("shifted_cosine", 32, 32)
    apply_fn = lambda p, z, lg, lab: denoiser.apply(p, z, lg, lab)
    prod_apply = lambda p, z, lg, lab: prod.apply(p, z, lg, lab)
    encode_fn = lambda p, z, lg: prod.apply(p, z, lg, None, mode="encode")
    tail_fn = lambda p, s, lab: prod.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )

    def chained(fn, repeats, xx, ll):
        # params/x/labels must be ARGUMENTS of the jitted chain — closing over
        # them would inline 96M weights as HLO constants and blow the remote
        # compiler's request size limit.
        @jax.jit
        def run(params, xx, ll, seed):
            def body(carry, key):
                return carry + fn(params, xx, ll, key).astype(jnp.int32).sum(), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
            )
            total, _ = jax.lax.scan(body, jnp.int32(0), keys)
            return total

        return lambda seed: int(run(params, xx, ll, jnp.int32(seed)))

    def measure(fn, xx=x, ll=labels, chain=CHAIN):
        # sub-10ms calls need a longer chain: the delta must dominate the
        # relay's run-to-run latency jitter
        return _timed_delta(
            chained(fn, 1, xx, ll), chained(fn, 1 + chain, xx, ll), 1 + chain
        )

    # ---- secondary: training step (fwd+bwd+clip+Adam+EMA) ----
    loss_fn = make_loss_fn(
        apply_fn, schedule_fn, pred_param="v", null_token=CLASSES
    )
    tx = make_optimizer(1e-4, 10, 1000)
    state = init_train_state(params, tx)
    step = make_train_step(loss_fn, tx, EmaConfig())
    xt = jax.random.uniform(
        rng, (TRAIN_BATCH, size, size, 3), minval=-1, maxval=1
    )
    lt = jnp.zeros((TRAIN_BATCH,), jnp.int32)

    def chained_train(repeats):
        @jax.jit
        def run(state, xx, ll, seed):
            def body(carry, key):
                st, acc = carry
                st, loss = step(st, xx, ll, key)
                return (st, acc + loss), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
            )
            (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)), keys)
            return acc

        return lambda seed: float(run(state, xt, lt, jnp.int32(seed)))

    train_sec = _timed_delta(chained_train(1), chained_train(1 + CHAIN), 1 + CHAIN)
    print(
        json.dumps(
            {
                "metric": "train_step_images_per_sec",
                "value": round(TRAIN_BATCH / train_sec, 3),
                "unit": "images/sec",
            }
        ),
        flush=True,
    )

    # ---- secondary: ancestral sampler steps/sec (CFG pair fused) ----
    sampler = make_sampler(
        prod_apply,
        schedule_fn,
        pred_param="v",
        cfg_w=0.1,
        null_token=CLASSES,
        sampling_steps=SAMPLER_STEPS,
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )

    def sample_fn(params, xx, ll, key):
        return sampler(params, xx, ll, key).astype(jnp.int32).sum(
            axis=(1, 2, 3)
        )

    sample_sec = measure(sample_fn)
    print(
        json.dumps(
            {
                "metric": "sampler_steps_per_sec",
                "value": round(SAMPLER_STEPS / sample_sec, 3),
                "unit": "steps/sec",
                "batch": BATCH,
            }
        ),
        flush=True,
    )

    # ---- production classify (fused tournament) ----
    classify = make_classifier(
        prod_apply,
        schedule_fn,
        pred_param="v",
        num_classes=CLASSES,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        class_chunk=CLASS_CHUNK,
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )

    # secondary: B=1 serving latency — the one-giant-megabatch formulation
    # wins at B=1 (a class-chunk scan would leave the chip nearly idle)
    classify_b1 = make_classifier(
        prod_apply,
        schedule_fn,
        pred_param="v",
        num_classes=CLASSES,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )
    lat_sec = measure(classify_b1, xx=x[:1], ll=labels[:1], chain=32)
    print(
        json.dumps(
            {
                "metric": "classify_b1_latency_ms",
                "value": round(lat_sec * 1e3, 3),
                "unit": "ms",
            }
        ),
        flush=True,
    )

    fused_sec = measure(classify)

    # ---- reference execution model: per-(eval, class) forwards, on-device ----
    # `faithful=True` reconstructs the reference's actual cost model: every
    # per-class call recomputes the ENTIRE network (`:695-704`) — an
    # iteration-dependent optimization_barrier stops XLA from hoisting the
    # class-independent prefix out of the class scan, an optimization the
    # host-driven torch loop cannot perform. `faithful=False` keeps round 1's
    # deliberately over-strict variant where XLA's LICM grants the baseline
    # our own prefix sharing (reported as vs_licm_hoisted_baseline).
    def make_sequential(faithful):
        def sequential_fn(params, x, labels, key):
            del labels

            def eval_body(total, key):
                k_t, k_eps = jax.random.split(key)
                t = jax.random.uniform(k_t, (BATCH,))
                logsnr = schedule_fn(t)
                a, s = alpha_sigma(logsnr)
                eps = jax.random.normal(k_eps, x.shape)
                z = bcast_right(a, 4) * x + bcast_right(s, 4) * eps

                def class_body(errs, c):
                    if faithful:
                        z_c, lg_c = jax.lax.optimization_barrier(
                            (z + 0.0 * c.astype(z.dtype), logsnr)
                        )
                    else:
                        z_c, lg_c = z, logsnr
                    lab_c = jnp.full((BATCH,), c, jnp.int32)
                    pred = apply_fn(params, z_c, lg_c, lab_c)  # batch B fwd
                    eps_pred = pred_to_eps(pred, z_c, a, s, "v")
                    err = jnp.sum((eps_pred - eps) ** 2, axis=(1, 2, 3))
                    return errs.at[:, c].set(err), None

                errs, _ = jax.lax.scan(
                    class_body, jnp.zeros((BATCH, CLASSES)), jnp.arange(CLASSES)
                )
                return total + errs, None

            keys = jax.random.split(key, EVALS)
            total, _ = jax.lax.scan(eval_body, jnp.zeros((BATCH, CLASSES)), keys)
            return jnp.argmin(total, axis=1)

        return sequential_fn

    faithful_sec = measure(make_sequential(True))
    licm_sec = measure(make_sequential(False))

    fused_ips = BATCH / fused_sec
    print(
        json.dumps(
            {
                "metric": "elbo_classify_images_per_sec",
                "value": round(fused_ips, 3),
                "unit": "images/sec",
                "vs_baseline": round(faithful_sec / fused_sec, 3),
                "vs_licm_hoisted_baseline": round(licm_sec / fused_sec, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
