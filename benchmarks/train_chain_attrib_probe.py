"""Attribution follow-up to train_chain_ab_probe: WHY is the scan chain slow?

The A/B measured the same DiT-b4 train step at 32.4 ms/iteration inside a
dynamic-repeat `lax.fori_loop` chain vs 39.5 ms inside the r3/r4
`lax.scan`-over-keys chain. Two candidate mechanisms:

(a) `lax.scan` itself (carry buffering / layout choices for the scanned
    keys axis) — tested by a STATIC-trip fori chain with fold_in(i) keys,
    structurally identical to the scan body but with no scanned inputs;
(b) dynamic vs static trip count — if the static fori chain matches the
    dynamic one, trip-count dynamism is free and scan is the overhead.

Protocol identical to the A/B: chain=4 delta, min of 5 interleaved trials.
"""

import json
import sys
import time

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

    # dynamic-trip fori (the round-5 bench harness)
    fori_call, _ = bench._aot_train_chain(step, state, x0, labels)

    # static-trip fori: same body as the dynamic one, repeats baked in
    def static_chain(repeats):
        @jax.jit
        def run(state, xx, ll, seed):
            base = jax.random.fold_in(jax.random.PRNGKey(0), seed)

            def body(i, carry):
                st, acc = carry
                st, loss = step(st, xx, ll, jax.random.fold_in(base, i))
                return (st, acc + loss)

            _, acc = jax.lax.fori_loop(
                0, repeats, body, (state, jnp.float32(0))
            )
            return acc

        return lambda seed: float(run(state, x0, labels, jnp.int32(seed)))

    s1, sR = static_chain(1), static_chain(1 + CHAIN)
    fori_call(bench._next_seed(), 1)
    fori_call(bench._next_seed(), 1 + CHAIN)
    s1(bench._next_seed())
    sR(bench._next_seed())

    def static_delta():
        s = bench._next_seed()
        t0 = time.perf_counter()
        s1(s)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sR(s)
        tr = time.perf_counter() - t0
        return (tr - t1) / CHAIN

    dyn, stat = [], []
    for _ in range(TRIALS):
        dyn.extend(bench._deltas(fori_call, CHAIN, 1))
        stat.append(static_delta())

    print(
        json.dumps(
            {
                "metric": "dit_b4_train_chain_attrib",
                "dynamic_fori_ms": [round(1e3 * t, 3) for t in sorted(dyn)],
                "static_fori_ms": [round(1e3 * t, 3) for t in sorted(stat)],
                "dynamic_images_per_sec": round(B / min(dyn), 3),
                "static_images_per_sec": round(B / min(stat), 3),
                "chain": CHAIN,
                "trials": TRIALS,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
