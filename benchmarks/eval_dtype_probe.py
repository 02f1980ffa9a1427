"""Probe: do bf16-stored EMA params speed up the eval paths?

The forward is HBM-bandwidth-bound (BASELINE.md: 81% of the bandwidth
roofline at batch 320). Params are stored fp32 (master weights) and the
model computes in bf16 — so every eval forward streams 4-byte weights from
HBM only to round them to bf16 at the MXU. Casting the EMA tree to bf16
ONCE before classify/sample halves the weight traffic per forward
(96M params: 384 MB -> 192 MB per weight stream) with no change to the
compute numerics (the matmuls already run bf16).

The reference has no analog: torch AMP autocasts compute but always streams
fp32 master weights (`/root/reference/diffusion/diffusion_classifier.py:51-56`
keeps the EMA in model precision).

Measures the production classify (class_chunk=1 scan, prefix split) and the
CFG-fused sampler with fp32 vs bf16 param trees, scan-delta methodology as
bench.py.
"""

import sys
import time

sys.path.insert(0, ".")

BATCH = 32
CLASSES = 10
EVALS = 4
CHAIN = 4
TRIALS = 3
SAMPLER_STEPS = 32


def _timed_delta(fn1, fnR, repeats):
    fn1(0), fnR(0)
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

    from __graft_entry__ import _flagship
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.sampler import make_sampler
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn

    denoiser, size = _flagship()
    prod = denoiser

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, size, size, 3), minval=-1, maxval=1)
    labels = jnp.zeros((BATCH,), jnp.int32)
    params = denoiser.init(rng, x, jnp.zeros((BATCH,)), labels)
    params_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )
    schedule_fn = make_schedule_fn("shifted_cosine", 32, 32)
    prod_apply = lambda p, z, lg, lab: prod.apply(p, z, lg, lab)
    encode_fn = lambda p, z, lg: prod.apply(p, z, lg, None, mode="encode")
    tail_fn = lambda p, s, lab: prod.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )

    def chained(fn, repeats, pp, xx, ll):
        @jax.jit
        def run(pp, xx, ll, seed):
            def body(carry, key):
                return carry + fn(pp, xx, ll, key).astype(jnp.int32).sum(), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
            )
            total, _ = jax.lax.scan(body, jnp.int32(0), keys)
            return total

        return lambda seed: int(run(pp, xx, ll, jnp.int32(seed)))

    def measure(fn, pp, xx=x, ll=labels, chain=CHAIN):
        return _timed_delta(
            chained(fn, 1, pp, xx, ll),
            chained(fn, 1 + chain, pp, xx, ll),
            1 + chain,
        )

    classify = make_classifier(
        prod_apply,
        schedule_fn,
        pred_param="v",
        num_classes=CLASSES,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        class_chunk=1,
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )
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

    def sample_fn(pp, xx, ll, key):
        return sampler(pp, xx, ll, key).astype(jnp.int32).sum(axis=(1, 2, 3))

    for name, pp in (("fp32", params), ("bf16", params_bf16)):
        sec = measure(classify, pp)
        print(f"classify B=32 {name}: {BATCH / sec:.1f} img/s ({sec * 1e3:.2f} ms)", flush=True)
    for name, pp in (("fp32", params), ("bf16", params_bf16)):
        sec = measure(classify_b1, pp, xx=x[:1], ll=labels[:1], chain=32)
        print(f"classify B=1 {name}: {sec * 1e3:.3f} ms", flush=True)
    for name, pp in (("fp32", params), ("bf16", params_bf16)):
        sec = measure(sample_fn, pp)
        print(f"sampler {name}: {SAMPLER_STEPS / sec:.1f} steps/s ({sec * 1e3:.2f} ms)", flush=True)

    # agreement check: predictions with bf16 weights vs fp32 weights
    pr32 = jax.jit(classify)(params, x, labels, jax.random.PRNGKey(7))
    pr16 = jax.jit(classify)(params_bf16, x, labels, jax.random.PRNGKey(7))
    agree = float((pr32 == pr16).mean())
    print(f"prediction agreement bf16 vs fp32: {agree:.3f}", flush=True)


if __name__ == "__main__":
    main()
