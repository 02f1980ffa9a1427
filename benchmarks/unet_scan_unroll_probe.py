"""Does scan unrolling also help the binary DWT-UNet classify configs?

The DiT-b4 line gained +7% from scan_unroll=2 (scan_unroll_probe.py): at
K=2 the class scan has only two iterations and the while-loop back-edges
cost more than they pipeline. The CheXpert and IPMSA DWT-UNet lines share
that schedule shape (B=16/8, K=2, 4 evals, cc=1) but run prefix-split UNet
forwards that are ~10x more expensive, so the fixed per-boundary cost
should matter proportionally less. Measure unroll {1, 2} on both.

Same scan-delta methodology as bench.py.
"""

import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 4
TRIALS = 3
EVALS = 4


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.denoiser import Denoiser
    from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
    from diffusion_classifier_tpu.models.encoders import ClassEmbedder
    from diffusion_classifier_tpu.ops.wavelet import haar_dwt2
    from diffusion_classifier_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache("/tmp/dc_tpu_xla_cache")
    rng = jax.random.PRNGKey(0)
    dwt = lambda img: haar_dwt2(img) / 2.0
    schedule_fn = make_schedule_fn("shifted_cosine", 64, 256)

    def measure(fn, params, xx, ll, batch):
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
        f1(seed0), fR(seed0 + 1)
        best = float("inf")
        for i in range(TRIALS):
            s = seed0 + 10 + i
            t0 = time.perf_counter(); f1(s); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); fR(s); tr = time.perf_counter() - t0
            best = min(best, (tr - t1) / CHAIN)
        return batch / best

    # -- CheXpert-256 DWT-UNet (bench config) --
    B = 16
    unet = Denoiser(
        backbone=UNetCondition2D(
            UNetConfig(
                sample_size=128,
                in_channels=12,
                out_channels=12,
                layers_per_block=2,
                block_out_channels=(256, 512, 768),
                down_block_types=(
                    "DownBlock2D", "DownBlock2D", "CrossAttnDownBlock2D",
                ),
                up_block_types=(
                    "CrossAttnUpBlock2D", "UpBlock2D", "UpBlock2D",
                ),
                mid_block_type="UNetMidBlock2DCrossAttn",
                encoder_hid_dim=256,
                encoder_hid_dim_type="text_proj",
                cross_attention_dim=256,
            ),
            dtype=jnp.bfloat16,
        ),
        encoder=ClassEmbedder(2, 256, dtype=jnp.bfloat16),
    )
    x_raw = jax.random.uniform(rng, (B, 256, 256, 3), minval=-1, maxval=1)
    ll = jnp.zeros((B,), jnp.int32)
    params = unet.init(rng, dwt(x_raw), jnp.zeros((B,)), ll)
    af = lambda p, z, lg, lab: unet.apply(p, z, lg, lab)
    ef = lambda p, z, lg: unet.apply(p, z, lg, None, mode="encode")
    tf = lambda p, s, lab: unet.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )
    for u in (1, 2):
        inner = make_classifier(
            af, schedule_fn, pred_param="v", num_classes=2, n_stages=1,
            evaluation_per_stage=(EVALS,), n_keep_per_stage=(1,),
            class_chunk=1, scan_unroll=u, encode_fn=ef, tail_fn=tf,
        )
        fn = lambda p, xx, l, key: inner(p, dwt(xx), l, key)
        print(json.dumps({
            "config": "chexpert_dwt_unet", "scan_unroll": u,
            "images_per_sec": round(measure(fn, params, x_raw, ll, B), 2),
        }), flush=True)
    del params

    # -- IPMSA 5-slice DWT-UNet (bench config) --
    B = 8
    unet = Denoiser(
        backbone=UNetCondition2D(
            UNetConfig(
                sample_size=128,
                in_channels=40,
                out_channels=40,
                layers_per_block=(2, 2, 2, 4, 2),
                block_out_channels=(128, 128, 256, 512, 768),
                down_block_types=(
                    "DownBlock2D", "DownBlock2D", "DownBlock2D",
                    "CrossAttnDownBlock2D", "DownBlock2D",
                ),
                up_block_types=(
                    "UpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D",
                    "UpBlock2D", "UpBlock2D",
                ),
                mid_block_type="UNetMidBlock2DCrossAttn",
                encoder_hid_dim=512,
                encoder_hid_dim_type="text_proj",
                cross_attention_dim=512,
            ),
            dtype=jnp.bfloat16,
        ),
        encoder=ClassEmbedder(2, 512, dtype=jnp.bfloat16),
    )
    x_raw = jax.random.uniform(rng, (B, 256, 256, 10), minval=-1, maxval=1)
    ll = jnp.zeros((B,), jnp.int32)
    params = unet.init(rng, dwt(x_raw), jnp.zeros((B,)), ll)
    af = lambda p, z, lg, lab: unet.apply(p, z, lg, lab)
    ef = lambda p, z, lg: unet.apply(p, z, lg, None, mode="encode")
    tf = lambda p, s, lab: unet.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )
    for u in (1, 2):
        inner = make_classifier(
            af, schedule_fn, pred_param="v", num_classes=2, n_stages=1,
            evaluation_per_stage=(EVALS,), n_keep_per_stage=(1,),
            class_chunk=1, scan_unroll=u, encode_fn=ef, tail_fn=tf,
        )
        fn = lambda p, xx, l, key: inner(p, dwt(xx), l, key)
        print(json.dumps({
            "config": "ipmsa_dwt_unet", "scan_unroll": u,
            "images_per_sec": round(measure(fn, params, x_raw, ll, B), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
