"""Sweep (eval_group G, class_chunk cc) combinations for fused classify.

Round-2 follow-up: the production default is (G=1, cc=1) — the class-chunk
scan rides the weight-stream pipeline (BASELINE.md). But the round-1 G sweep
predates class chunking: with cc=1 the per-iteration megabatch is B·G (not
B·K·G), so G>1 batches the PREFIX work of G evaluations in one call while
keeping the class scan. This measures whether that composition beats the
default at the bench operating point (B=32, 10 classes, 4 evals, flat).

Same scan-delta methodology as bench.py.
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

COMBOS = [  # (eval_group, class_chunk)
    (1, 1),  # production default at B>=16
    (2, 1),
    (4, 1),
    (2, 2),
    (4, 2),
    (4, 5),
]


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache("/tmp/dc_tpu_xla_cache")

    denoiser, size = _flagship()
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, size, size, 3), minval=-1, maxval=1)
    labels = jnp.zeros((BATCH,), jnp.int32)
    params = denoiser.init(rng, x, jnp.zeros((BATCH,)), labels)
    schedule_fn = make_schedule_fn("shifted_cosine", 32, 32)
    apply_fn = lambda p, z, lg, lab: denoiser.apply(p, z, lg, lab)
    encode_fn = lambda p, z, lg: denoiser.apply(p, z, lg, None, mode="encode")
    tail_fn = lambda p, s, lab: denoiser.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )

    def chained(fn, repeats):
        @jax.jit
        def run(params, xx, ll, seed):
            def body(carry, key):
                return carry + fn(params, xx, ll, key).astype(jnp.int32).sum(), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
            )
            total, _ = jax.lax.scan(body, jnp.int32(0), keys)
            return total

        return lambda seed: int(run(params, x, labels, jnp.int32(seed)))

    def measure(fn):
        f1, fR = chained(fn, 1), chained(fn, 1 + CHAIN)
        f1(0), fR(0)
        best = float("inf")
        for i in range(TRIALS):
            t0 = time.perf_counter(); f1(i + 1); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); fR(i + 1); tr = time.perf_counter() - t0
            best = min(best, (tr - t1) / CHAIN)
        return best

    for g, cc in COMBOS:
        classify = make_classifier(
            apply_fn,
            schedule_fn,
            pred_param="v",
            num_classes=CLASSES,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
            eval_group=g,
            class_chunk=cc,
            encode_fn=encode_fn,
            tail_fn=tail_fn,
        )
        sec = measure(classify)
        print(
            json.dumps(
                {
                    "eval_group": g,
                    "class_chunk": cc,
                    "images_per_sec": round(BATCH / sec, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
