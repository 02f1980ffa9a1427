"""DiT-b4 classify execution-schedule sweep (real TPU).

The chexpert-dit bench line runs B=16, G=1, class_chunk=1 (auto picks at
b >= 16): each evaluation scores K=2 classes via a 2-step scan of B-image
forwards. At K=2 the scan has only two iterations — the weight-streaming
pipeline argument that favors chunking at K=10 may not hold. Sweep
class_chunk in {1 (scan), 0 (one 2B megabatch)} x batch in {8, 16, 32}.
"""

import json
import sys
import time

sys.path.insert(0, ".")

EVALS = 4
CHAIN = 4
TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.denoiser import Denoiser
    from diffusion_classifier_tpu.models.dit import DiT, DiTConfig
    from diffusion_classifier_tpu.ops.wavelet import haar_dwt2
    from diffusion_classifier_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache("/tmp/dc_tpu_xla_cache")

    rng = jax.random.PRNGKey(0)
    schedule_fn = make_schedule_fn("shifted_cosine", 64, 256)
    dwt = lambda img: haar_dwt2(img) / 2.0

    dit = Denoiser(
        backbone=DiT(
            DiTConfig(
                num_attention_heads=6,
                attention_head_dim=64,
                in_channels=12,
                out_channels=12,
                num_layers=12,
                sample_size=128,
                patch_size=4,
                num_classes=2,
                attn_backend="auto",
            ),
            dtype=jnp.bfloat16,
        ),
        encoder=None,
    )
    x_raw32 = jax.random.uniform(rng, (32, 256, 256, 3), minval=-1, maxval=1)
    params = dit.init(
        rng, dwt(x_raw32[:4]), jnp.zeros((4,)), jnp.zeros((4,), jnp.int32)
    )
    apply_fn = lambda p, z, lg, lab: dit.apply(p, z, lg, lab)

    def measure(fn, b):
        xx = x_raw32[:b]
        ll = jnp.zeros((b,), jnp.int32)

        def chained(repeats):
            @jax.jit
            def run(pp, xx, ll, seed):
                def body(carry, key):
                    return carry + fn(pp, xx, ll, key).astype(jnp.int32).sum(), None

                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
                )
                tot, _ = jax.lax.scan(body, jnp.int32(0), keys)
                return tot

            return lambda seed: int(run(params, xx, ll, jnp.int32(seed)))

        f1, fR = chained(1), chained(1 + CHAIN)
        seed0 = int(time.time()) % 100000
        f1(seed0), fR(seed0 + 1)
        best = float("inf")
        for i in range(TRIALS):
            s = seed0 + 10 + i
            t0 = time.perf_counter(); f1(s); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); fR(s); tr = time.perf_counter() - t0
            best = min(best, (tr - t1) / CHAIN)
        return best

    for b in (8, 16, 32):
        for cc in (1, 0):
            inner = make_classifier(
                apply_fn,
                schedule_fn,
                pred_param="v",
                num_classes=2,
                n_stages=1,
                evaluation_per_stage=(EVALS,),
                n_keep_per_stage=(1,),
                class_chunk=cc,
            )
            fn = lambda p, xx, ll, key: inner(p, dwt(xx), ll, key)
            sec = measure(fn, b)
            print(json.dumps({
                "batch": b, "class_chunk": cc,
                "img_per_sec": round(b / sec, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
