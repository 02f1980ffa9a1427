"""Classify formulation sweep on the real TPU (post split-block forward).

Measures at the driver bench operating point (B=32, 10 classes, 4 evals):
- fused classifier with class_chunk in {0, 1, 2, 5}
- sequential per-(eval,class) baseline, two flavors:
  * licm      — plain scan; XLA hoists the class-independent prefix
                (round-1's deliberately conservative baseline)
  * faithful  — an iteration-dependent optimization_barrier forces a FULL
                forward per class, the reference's actual execution model
                (`diffusion/diffusion_classifier.py:695-704` recomputes the
                entire network per class call)
- B=1 fused latency
"""

import json
import sys
import time

sys.path.insert(0, ".")

BATCH, CLASSES, EVALS, CHAIN, TRIALS = 32, 10, 4, 4, 3


def timed_delta(fn1, fnR, repeats):
    fn1(0), fnR(0)
    best = float("inf")
    for i in range(TRIALS):
        t0 = time.perf_counter(); fn1(i + 1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); fnR(i + 1); tr = time.perf_counter() - t0
        best = min(best, (tr - t1) / (repeats - 1))
    return best


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.process import bcast_right, pred_to_eps
    from diffusion_classifier_tpu.diffusion.schedule import alpha_sigma, make_schedule_fn

    denoiser, size = _flagship()
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, size, size, 3), minval=-1, maxval=1)
    labels = jnp.zeros((BATCH,), jnp.int32)
    params = denoiser.init(rng, x, jnp.zeros((BATCH,)), labels)
    schedule_fn = make_schedule_fn("shifted_cosine", 32, 32)
    apply_fn = lambda p, z, lg, lab: denoiser.apply(p, z, lg, lab)
    encode_fn = lambda p, z, lg: denoiser.apply(p, z, lg, None, mode="encode")
    tail_fn = lambda p, s, lab: denoiser.apply(p, None, None, lab, mode="tail", prefix_state=s)

    def chained(fn, repeats, xx, ll):
        @jax.jit
        def run(params, xx, ll, seed):
            def body(c, key):
                return c + fn(params, xx, ll, key).astype(jnp.int32).sum(), None
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
            total, _ = jax.lax.scan(body, jnp.int32(0), keys)
            return total
        return lambda seed: int(run(params, xx, ll, jnp.int32(seed)))

    def measure(fn, xx=x, ll=labels, n=BATCH):
        sec = timed_delta(chained(fn, 1, xx, ll), chained(fn, 1 + CHAIN, xx, ll), 1 + CHAIN)
        return sec

    for chunk in (0, 1, 2, 5):
        fn = make_classifier(
            apply_fn, schedule_fn, pred_param="v", num_classes=CLASSES,
            n_stages=1, evaluation_per_stage=(EVALS,), n_keep_per_stage=(1,),
            class_chunk=chunk, encode_fn=encode_fn, tail_fn=tail_fn,
        )
        sec = measure(fn)
        print(json.dumps({"variant": f"fused_chunk{chunk}",
                          "sec_per_call": round(sec, 6),
                          "images_per_sec": round(BATCH / sec, 2)}), flush=True)

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
                        # iteration-dependent barrier: XLA cannot hoist the
                        # class-independent prefix — each class pays the
                        # FULL forward, like the reference's torch calls
                        z_c, lg_c = jax.lax.optimization_barrier(
                            (z + 0.0 * c.astype(z.dtype), logsnr)
                        )
                    else:
                        z_c, lg_c = z, logsnr
                    lab_c = jnp.full((BATCH,), c, jnp.int32)
                    pred = apply_fn(params, z_c, lg_c, lab_c)
                    eps_pred = pred_to_eps(pred, z_c, a, s, "v")
                    err = jnp.sum((eps_pred - eps) ** 2, axis=(1, 2, 3))
                    return errs.at[:, c].set(err), None
                errs, _ = jax.lax.scan(
                    class_body, jnp.zeros((BATCH, CLASSES)), jnp.arange(CLASSES))
                return total + errs, None
            keys = jax.random.split(key, EVALS)
            total, _ = jax.lax.scan(eval_body, jnp.zeros((BATCH, CLASSES)), keys)
            return jnp.argmin(total, axis=1)
        return sequential_fn

    for name, faithful in (("sequential_licm", False), ("sequential_faithful", True)):
        sec = measure(make_sequential(faithful))
        print(json.dumps({"variant": name, "sec_per_call": round(sec, 6),
                          "images_per_sec": round(BATCH / sec, 2)}), flush=True)

    # B=1 latency, best chunk=0 megabatch formulation
    fn1 = make_classifier(
        apply_fn, schedule_fn, pred_param="v", num_classes=CLASSES,
        n_stages=1, evaluation_per_stage=(EVALS,), n_keep_per_stage=(1,),
        encode_fn=encode_fn, tail_fn=tail_fn,
    )
    sec = measure(fn1, xx=x[:1], ll=labels[:1], n=1)
    print(json.dumps({"variant": "fused_b1_latency",
                      "p50_latency_ms": round(sec * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
