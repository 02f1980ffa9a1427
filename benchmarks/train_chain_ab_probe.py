"""A/B probe: scan-chain vs fori-chain harness on the SAME train step.

The round-5 bench rework moved measurement chains from fixed-trip
`lax.scan` pairs (two executables per program, r3/r4) to a single
dynamic-repeat `lax.fori_loop` executable (bench.py::_aot_train_chain).
The first calibration then measured `chexpert_dit_b4_train_images_per_sec`
at 487.8 vs the r3/r4 402-415 band (and CIFAR train 3352.9 vs 3024-3067)
with an UNCHANGED training program — so either the old harness was
under-reporting (scan-chain overhead inside the measured delta) or the new
one is over-reporting. This probe compiles BOTH harness shapes over the
exact bench DiT-b4 train step and interleaves their delta trials on an
idle chip, so whatever the chip/relay is doing that minute hits both.

Protocol: DiT-b4 (384w/12L/patch4 -> 1024 tokens, flash attention) train
step (fwd+bwd+clip+Adam+EMA) at the bench's CX_BATCH=16 on 128px/12ch DWT
inputs; per-step seconds from (T_{1+chain}-T_1)/chain, chain=4, min of 5
interleaved trials per harness.
"""

import json
import sys

sys.path.insert(0, ".")

CHAIN = 4
TRIALS = 5
B = 16


def main():
    import jax
    import jax.numpy as jnp

    import bench
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
    x_raw = jax.random.uniform(rng, (B, 256, 256, 3), minval=-1, maxval=1)
    x0 = haar_dwt2(x_raw) / 2.0
    labels = jnp.zeros((B,), jnp.int32)
    schedule_fn = make_schedule_fn("shifted_cosine", 64, 256)

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
    params = bench._fast_params(dit.init, rng, x0, jnp.zeros((B,)), labels)
    apply_fn = lambda p, z, lg, lab: dit.apply(p, z, lg, lab)
    loss_fn = make_loss_fn(apply_fn, schedule_fn, pred_param="v", null_token=2)
    tx = make_optimizer(1e-4, 10, 1000)
    state = init_train_state(params, tx)
    step = make_train_step(loss_fn, tx, EmaConfig())

    # --- A: round-5 fori chain (single executable, dynamic repeats) ---
    fori_call, _ = bench._aot_train_chain(step, state, x0, labels)

    # --- B: round-3/4 scan chain (fixed trips, one executable per length) ---
    def scan_chain(repeats):
        @jax.jit
        def run(state, xx, ll, seed):
            def body(carry, key):
                st, acc = carry
                st, loss = step(st, xx, ll, key)
                return (st, acc + loss), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
            )
            (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)), keys)
            return acc

        return lambda seed: float(run(state, x0, labels, jnp.int32(seed)))

    s1, sR = scan_chain(1), scan_chain(1 + CHAIN)

    # warm everything before any timed trial
    import time

    fori_call(bench._next_seed(), 1)
    fori_call(bench._next_seed(), 1 + CHAIN)
    s1(bench._next_seed())
    sR(bench._next_seed())

    def scan_delta():
        s = bench._next_seed()
        t0 = time.perf_counter()
        s1(s)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sR(s)
        tr = time.perf_counter() - t0
        return (tr - t1) / CHAIN

    fori, scan = [], []
    for _ in range(TRIALS):  # interleaved: shared drift hits both alike
        fori.extend(bench._deltas(fori_call, CHAIN, 1))
        scan.append(scan_delta())

    sec_f, sec_s = min(fori), min(scan)
    print(
        json.dumps(
            {
                "metric": "dit_b4_train_chain_ab",
                "fori_images_per_sec": round(B / sec_f, 3),
                "scan_images_per_sec": round(B / sec_s, 3),
                "fori_over_scan": round(sec_s / sec_f, 4),
                "fori_trials_ms": [round(1e3 * t, 3) for t in sorted(fori)],
                "scan_trials_ms": [round(1e3 * t, 3) for t in sorted(scan)],
                "chain": CHAIN,
                "trials": TRIALS,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
