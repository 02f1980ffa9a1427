"""Classify-path variant timing on the real TPU (scan-delta methodology).

Maps where the fused megabatch loses/wins vs the on-device sequential
baseline at the driver bench's operating point (B=32, 10 classes, 4 evals,
CIFAR-sized UNet): megabatch grouping G, prefix split on/off, raw forward
costs. Writes one JSON line per variant to stdout.
"""

import json
import sys
import time

sys.path.insert(0, ".")

BATCH = 32
CLASSES = 10
EVALS = 4
CHAIN = 4
TRIALS = 3


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

    def chained(fn, repeats):
        @jax.jit
        def run(params, x, labels, seed):
            def body(c, key):
                return c + fn(params, x, labels, key).astype(jnp.int32).sum(), None
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
            total, _ = jax.lax.scan(body, jnp.int32(0), keys)
            return total
        return lambda seed: int(run(params, x, labels, jnp.int32(seed)))

    def report(name, sec, unit_imgs=BATCH):
        print(json.dumps({"variant": name, "sec_per_call": round(sec, 6),
                          "images_per_sec": round(unit_imgs / sec, 2)}), flush=True)

    def classifier(**kw):
        return make_classifier(
            apply_fn, schedule_fn, pred_param="v", num_classes=CLASSES,
            n_stages=1, evaluation_per_stage=(EVALS,), n_keep_per_stage=(1,), **kw)

    variants = {
        "fused_split_t512": classifier(encode_fn=encode_fn, tail_fn=tail_fn),
        "fused_split_t1024": classifier(encode_fn=encode_fn, tail_fn=tail_fn,
                                        megabatch_target=1024),
        "fused_split_t2048": classifier(encode_fn=encode_fn, tail_fn=tail_fn,
                                        megabatch_target=2048),
        "fused_nosplit_t512": classifier(),
    }

    # staged tournament variants (2 evals x 10 -> +4 evals x top-3)
    def staged(**kw):
        return make_classifier(
            apply_fn, schedule_fn, pred_param="v", num_classes=CLASSES,
            n_stages=2, evaluation_per_stage=(2, 6), n_keep_per_stage=(3, 1), **kw)

    variants["staged_split_t512"] = staged(encode_fn=encode_fn, tail_fn=tail_fn)
    variants["staged_split_t2048"] = staged(encode_fn=encode_fn, tail_fn=tail_fn,
                                            megabatch_target=2048)

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
                lab_c = jnp.full((BATCH,), c, jnp.int32)
                pred = apply_fn(params, z, logsnr, lab_c)
                eps_pred = pred_to_eps(pred, z, a, s, "v")
                err = jnp.sum((eps_pred - eps) ** 2, axis=(1, 2, 3))
                return errs.at[:, c].set(err), None
            errs, _ = jax.lax.scan(class_body, jnp.zeros((BATCH, CLASSES)), jnp.arange(CLASSES))
            return total + errs, None
        keys = jax.random.split(key, EVALS)
        total, _ = jax.lax.scan(eval_body, jnp.zeros((BATCH, CLASSES)), keys)
        return jnp.argmin(total, axis=1)

    variants["sequential_scan"] = sequential_fn

    for name, fn in variants.items():
        sec = timed_delta(chained(fn, 1), chained(fn, 1 + CHAIN), 1 + CHAIN)
        report(name, sec)

    # raw forward costs per image at two batch sizes
    for bsz, name in ((32, "fwd_b32"), (320, "fwd_b320")):
        xb = jax.random.uniform(jax.random.PRNGKey(1), (bsz, size, size, 3))
        def fwd(params, x_, labels_, key, bsz=bsz):
            lg = schedule_fn(jax.random.uniform(key, (bsz,)))
            z = jax.random.normal(jax.random.fold_in(key, 1), (bsz, size, size, 3))
            pred = apply_fn(params, z, lg, jnp.zeros((bsz,), jnp.int32))
            return jnp.sum(pred, axis=(1, 2, 3))[:1]
        def chained_f(fn, repeats, xb=xb, bsz=bsz):
            @jax.jit
            def run(params, xb, seed):
                def body(c, key):
                    return c + fn(params, xb, None, key).sum(), None
                keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
                total, _ = jax.lax.scan(body, jnp.float32(0), keys)
                return total
            return lambda seed: float(run(params, xb, jnp.int32(seed)))
        sec = timed_delta(chained_f(fwd, 1), chained_f(fwd, 1 + CHAIN), 1 + CHAIN)
        report(name, sec, unit_imgs=bsz)

    # B=1 latency of the fused flat classifier (serving operating point)
    x1 = x[:1]
    l1 = labels[:1]
    cls1 = classifier(encode_fn=encode_fn, tail_fn=tail_fn, megabatch_target=2048)
    def chained_1(repeats):
        @jax.jit
        def run(params, x1, l1, seed):
            def body(c, key):
                return c + cls1(params, x1, l1, key).astype(jnp.int32).sum(), None
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
            total, _ = jax.lax.scan(body, jnp.int32(0), keys)
            return total
        return lambda seed: int(run(params, x1, l1, jnp.int32(seed)))
    sec = timed_delta(chained_1(1), chained_1(1 + CHAIN), 1 + CHAIN)
    print(json.dumps({"variant": "fused_b1_latency", "sec_per_call": round(sec, 6),
                      "p50_latency_ms": round(sec * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
