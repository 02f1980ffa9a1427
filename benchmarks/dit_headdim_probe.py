"""Probe: head-dim-128 DiT attention as a TPU-first performance config.

The round-4 MFU decomposition (BASELINE.md) proved the DiT-b4 classify
line's ceiling is structural: with head_dim=64, BOTH flash-attention
matmuls can use at most half the MXU (QKᵀ's 64-deep contraction, P·V's 64
output lanes), capping attention at ~98 TF/s and the whole program at
~65% MFU. VERDICT r4 next-round §9: offer the same-width model with HALF
the heads at DOUBLE the head dim (384 = 6×64 = 3×128) — identical
parameter count and token mixing capacity, but attention matmuls that use
the full 128-deep/128-wide MXU — and measure whether classify MFU moves
toward the UNet's 77–81%. NOT a parity config (the reference fixes 6×64,
`/root/reference/experiments/chexpert-dit/train.py:118-135`); exposed as
the `attention_head_dim` experiment knob with the parity default.

Protocol: the bench DiT-b4 classify line exactly (B=16, binary, 4 evals,
class_chunk=1, scan_unroll=2, in-graph DWT, attn_backend='auto') for
head_dim ∈ {64 (parity), 128}; throughput via the scan-delta chain, MFU
via cost analysis of the unrolled variant over the production time.
Run on the real chip, chip otherwise idle.
"""

import json
import sys

sys.path.insert(0, ".")

B = 16
EVALS = 4
CHAIN = 4
TRIALS = 3
WIDTH = 384


def main():
    import jax
    import jax.numpy as jnp

    import bench
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
    x_raw = jax.random.uniform(rng, (B, 256, 256, 3), minval=-1, maxval=1)
    labels = jnp.zeros((B,), jnp.int32)
    schedule_fn = make_schedule_fn("shifted_cosine", 64, 256)
    dwt = lambda img: haar_dwt2(img) / 2.0
    x0 = dwt(x_raw)

    for head_dim in (64, 128):
        dit = Denoiser(
            backbone=DiT(
                DiTConfig(
                    num_attention_heads=WIDTH // head_dim,
                    attention_head_dim=head_dim,
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
        params = bench._fast_params(
            dit.init, rng, x0, jnp.zeros((B,)), labels
        )
        n_params = sum(
            int(p.size) for p in jax.tree.leaves(params)
        )
        apply_fn = lambda p, z, lg, lab: dit.apply(p, z, lg, lab)
        inner = make_classifier(
            apply_fn,
            schedule_fn,
            pred_param="v",
            num_classes=2,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
            class_chunk=1,
            scan_unroll=2,
        )
        fn = lambda p, xx, ll, key: inner(p, dwt(xx), ll, key)
        call, _ = bench._aot_chain(fn, params, x_raw, labels)
        sec = bench._measure_call(call, chain=CHAIN, trials=TRIALS)

        flat = make_classifier(
            apply_fn,
            schedule_fn,
            pred_param="v",
            num_classes=2,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
            eval_group=EVALS,
            class_chunk=0,
        )
        roof = bench._roofline(
            f"dit_headdim{head_dim}_achieved_tflops",
            lambda p, xx, ll, key: flat(p, dwt(xx), ll, key),
            (params, x_raw, labels, jax.random.PRNGKey(0)),
            sec,
        )
        print(
            json.dumps(
                {
                    "metric": f"dit_headdim{head_dim}_classify_images_per_sec",
                    "value": round(B / sec, 3),
                    "heads": WIDTH // head_dim,
                    "head_dim": head_dim,
                    "params": n_params,
                }
            ),
            flush=True,
        )
        print(json.dumps(roof), flush=True)


if __name__ == "__main__":
    main()
