"""Probe: does unrolling the classify scans recover scheduling overhead?

Round-4 MFU decomposition (BASELINE.md) left one unexplained residual on the
DiT-b4 classify line: full classify 70.6 ms vs 8 x 8.21 ms standalone
forwards + 0.30 ms protocol = 66.0 ms — a ~4.6 ms gap attributed to
inter-iteration scheduling. The production program runs its 8 forwards
inside `lax.scan` loops (4 eval-chunks x 2 class-chunks); XLA cannot
overlap work across a while-loop back-edge, so each iteration's epilogue
(error reduction, scatter) serializes against the next iteration's forward.
`scan_unroll` removes those barriers with BIT-IDENTICAL results (the (t, e)
key derivation is unchanged; only the loop structure differs).

Sweep scan_unroll in {1 (production), 2, 4, 8} on:
  1. the DiT-b4 chexpert line (B=16, binary, 4 evals, cc=1, flash attn);
  2. the CIFAR headline (B=64, 10 classes, 4 evals, cc=1, prefix split).

Same scan-delta methodology as bench.py (chained executions with
per-iteration RNG, delta between chain lengths, min over interleaved
trials). Run on the real chip with the chip otherwise idle.
"""

import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 8
TRIALS = 3
DIT_B = 16
CIFAR_B = 64
EVALS = 4
UNROLLS = (1, 2, 4, 8)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.denoiser import Denoiser
    from diffusion_classifier_tpu.models.dit import DiT, DiTConfig
    from diffusion_classifier_tpu.ops.wavelet import haar_dwt2
    from diffusion_classifier_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache("/tmp/dc_tpu_xla_cache")
    rng = jax.random.PRNGKey(0)

    def measure(fn, params, xx, ll):
        def chained(repeats):
            @jax.jit
            def run(pp, xx, ll, seed):
                def body(carry, key):
                    return (
                        carry + fn(pp, xx, ll, key).astype(jnp.int32).sum(),
                        None,
                    )

                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
                )
                tot, _ = jax.lax.scan(body, jnp.int32(0), keys)
                return tot

            return lambda seed: int(run(params, xx, ll, jnp.int32(seed)))

        f1, fR = chained(1), chained(1 + CHAIN)
        seed0 = int(time.time()) % 100000
        f1(seed0), fR(seed0 + 1)  # compile + warm
        best = float("inf")
        for i in range(TRIALS):
            s = seed0 + 10 + i
            t0 = time.perf_counter(); f1(s); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); fR(s); tr = time.perf_counter() - t0
            best = min(best, (tr - t1) / CHAIN)
        return best

    # -- 1. DiT-b4 chexpert config (bench.py's chexpert_dit_b4 line) --
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
    schedule_cx = make_schedule_fn("shifted_cosine", 64, 256)
    dwt = lambda img: haar_dwt2(img) / 2.0
    x_raw = jax.random.uniform(
        rng, (DIT_B, 256, 256, 3), minval=-1, maxval=1
    )
    ll_cx = jnp.zeros((DIT_B,), jnp.int32)
    dit_params = dit.init(rng, dwt(x_raw), jnp.zeros((DIT_B,)), ll_cx)
    dit_apply = lambda p, z, lg, lab: dit.apply(p, z, lg, lab)

    for u in UNROLLS:
        inner = make_classifier(
            dit_apply,
            schedule_cx,
            pred_param="v",
            num_classes=2,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
            class_chunk=1,
            scan_unroll=u,
        )
        fn = lambda p, xx, ll, key: inner(p, dwt(xx), ll, key)
        sec = measure(fn, dit_params, x_raw, ll_cx)
        print(json.dumps({
            "config": "dit_b4", "scan_unroll": u,
            "images_per_sec": round(DIT_B / sec, 2),
        }), flush=True)

    # -- 2. CIFAR headline config (bench.py's elbo_classify line) --
    denoiser, size = _flagship()
    x = jax.random.uniform(
        rng, (CIFAR_B, size, size, 3), minval=-1, maxval=1
    )
    ll = jnp.zeros((CIFAR_B,), jnp.int32)
    params = denoiser.init(rng, x, jnp.zeros((CIFAR_B,)), ll)
    schedule_ci = make_schedule_fn("shifted_cosine", 32, 32)
    apply_fn = lambda p, z, lg, lab: denoiser.apply(p, z, lg, lab)
    encode_fn = lambda p, z, lg: denoiser.apply(p, z, lg, None, mode="encode")
    tail_fn = lambda p, s, lab: denoiser.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )

    for u in UNROLLS:
        classify = make_classifier(
            apply_fn,
            schedule_ci,
            pred_param="v",
            num_classes=10,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
            class_chunk=1,
            scan_unroll=u,
            encode_fn=encode_fn,
            tail_fn=tail_fn,
        )
        sec = measure(classify, params, x, ll)
        print(json.dumps({
            "config": "cifar_headline", "scan_unroll": u,
            "images_per_sec": round(CIFAR_B / sec, 2),
        }), flush=True)

    # asymmetric unrolls: flatten the eval loop, keep (or partially keep)
    # the class scan's weight-stream pipelining
    for eu, cu in ((2, 1), (4, 1), (1, 2)):
        classify = make_classifier(
            apply_fn,
            schedule_ci,
            pred_param="v",
            num_classes=10,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
            class_chunk=1,
            scan_unroll=(eu, cu),
            encode_fn=encode_fn,
            tail_fn=tail_fn,
        )
        sec = measure(classify, params, x, ll)
        print(json.dumps({
            "config": "cifar_headline", "scan_unroll": [eu, cu],
            "images_per_sec": round(CIFAR_B / sec, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
