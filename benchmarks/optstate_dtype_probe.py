"""Probe: bf16 optimizer-state storage vs fp32 on the production train step.

The round-5 train rooflines measured BOTH train configs at ~49% MFU with
whole-step arithmetic intensity 66-107 FLOP/B — below the 240.5 ridge —
while the same models' classify programs run 77-81% MFU: the train step is
dragged bandwidth-bound by its optimizer/EMA epilogue, which streams ~6
fp32 copies of every parameter (grads, Adam mu/nu read+write, EMA, master
weights) at O(1) FLOPs per byte (BASELINE.md round 5). `optimizer_state_
dtype='bf16'` (engine/state.py::compress_opt_state) halves the mu/nu
share of that traffic while keeping the update math fp32.

This probe A/Bs the exact bench train programs — CIFAR UNet at B=64 and
CheXpert DiT-b4 at B=16 — with fp32 vs bf16 Adam state, interleaved
trials on an idle chip, and reports the throughput ratio. Prediction from
the traffic model: mu/nu are ~4 of ~13 param-sized fp32 streams in the
epilogue (r+w each), so saving half of them bounds the whole-step win at
~1.1x if the epilogue were 100% of the non-compute time.
"""

import json
import sys

sys.path.insert(0, ".")

CHAIN = 4
TRIALS = 4


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from __graft_entry__ import _flagship
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.denoiser import Denoiser
    from diffusion_classifier_tpu.engine.state import (
        EmaConfig,
        init_train_state,
        make_optimizer,
    )
    from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step
    from diffusion_classifier_tpu.models.dit import DiT, DiTConfig
    from diffusion_classifier_tpu.ops.wavelet import haar_dwt2
    from diffusion_classifier_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache("/tmp/dc_tpu_xla_cache")
    rng = jax.random.PRNGKey(0)

    configs = []

    # CIFAR UNet train config (bench train_step_images_per_sec)
    denoiser, size = _flagship()
    B = 64
    x = jax.random.uniform(rng, (B, size, size, 3), minval=-1, maxval=1)
    lab = jnp.zeros((B,), jnp.int32)
    params = bench._fast_params(
        denoiser.init, rng, x, jnp.zeros((B,)), lab
    )
    configs.append(
        (
            "cifar_unet_train",
            lambda p, z, lg, l: denoiser.apply(p, z, lg, l),
            make_schedule_fn("shifted_cosine", 32, 32),
            10,
            params,
            x,
            lab,
            B,
        )
    )

    # CheXpert DiT-b4 train config (bench chexpert_dit_b4_train_images_per_sec)
    DB = 16
    x_raw = jax.random.uniform(rng, (DB, 256, 256, 3), minval=-1, maxval=1)
    x0 = haar_dwt2(x_raw) / 2.0
    dlab = jnp.zeros((DB,), jnp.int32)
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
    dparams = bench._fast_params(dit.init, rng, x0, jnp.zeros((DB,)), dlab)
    configs.append(
        (
            "chexpert_dit_b4_train",
            lambda p, z, lg, l: dit.apply(p, z, lg, l),
            make_schedule_fn("shifted_cosine", 64, 256),
            2,
            dparams,
            x0,
            dlab,
            DB,
        )
    )

    for name, apply_fn, schedule_fn, null, pp, xx, ll, batch in configs:
        loss_fn = make_loss_fn(
            apply_fn, schedule_fn, pred_param="v", null_token=null
        )
        calls = {}
        for sd in ("fp32", "bf16"):
            tx = make_optimizer(1e-4, 10, 1000, state_dtype=sd)
            state = init_train_state(pp, tx)
            step = make_train_step(loss_fn, tx, EmaConfig())
            call, _ = bench._aot_train_chain(step, state, xx, ll)
            call(bench._next_seed(), 1)
            call(bench._next_seed(), 1 + CHAIN)
            calls[sd] = call

        series = {sd: [] for sd in calls}
        for _ in range(TRIALS):  # interleaved: shared drift hits both
            for sd, call in calls.items():
                series[sd].extend(bench._deltas(call, CHAIN, 1))
        sec = {sd: min(v) for sd, v in series.items()}
        print(
            json.dumps(
                {
                    "metric": f"{name}_optstate_dtype_ab",
                    "fp32_images_per_sec": round(batch / sec["fp32"], 3),
                    "bf16_images_per_sec": round(batch / sec["bf16"], 3),
                    "bf16_over_fp32": round(sec["fp32"] / sec["bf16"], 4),
                    "chain": CHAIN,
                    "trials": TRIALS,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
