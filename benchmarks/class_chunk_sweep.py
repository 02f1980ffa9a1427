"""class_chunk sweep for the fused classifier on the real TPU.

B=32, 10 classes, 4 evals (the driver bench's operating point). chunk=0 is
one G·B·K megabatch; chunk=c scores c classes per scan step.
Optionally sweeps the pallas fused-resnet backbone when arg 'pallas' given.
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


def main(resnet_backend="xla", chunks=(1, 2, 5)):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn

    denoiser, size = ge._flagship()
    if resnet_backend != "xla":
        import dataclasses
        backbone = denoiser.backbone
        cfg = dataclasses.replace(backbone.config, resnet_backend=resnet_backend)
        denoiser = type(denoiser)(
            backbone=type(backbone)(cfg, dtype=backbone.dtype),
            encoder=denoiser.encoder,
        )
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

    for chunk in chunks:
        fn = make_classifier(
            apply_fn, schedule_fn, pred_param="v", num_classes=CLASSES,
            n_stages=1, evaluation_per_stage=(EVALS,), n_keep_per_stage=(1,),
            class_chunk=chunk, encode_fn=encode_fn, tail_fn=tail_fn,
        )
        sec = timed_delta(chained(fn, 1), chained(fn, 1 + CHAIN), 1 + CHAIN)
        print(json.dumps({
            "resnet_backend": resnet_backend, "class_chunk": chunk,
            "sec_per_call": round(sec, 6),
            "images_per_sec": round(BATCH / sec, 2),
        }), flush=True)


if __name__ == "__main__":
    backend = sys.argv[1] if len(sys.argv) > 1 else "xla"
    chunks = tuple(int(c) for c in sys.argv[2].split(",")) if len(sys.argv) > 2 else (1, 2, 5)
    main(backend, chunks)
