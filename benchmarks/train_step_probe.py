"""Where does the training step's time go? (fwd / bwd / optimizer split)

Motivation: the DiT-b4 train line (38.6 ms/step at B=16, 415 img/s) runs at
~64% of what the measured classify forward (8.21 ms) predicts for a
fwd + bwd ~= 3x-forward program (~24.6 ms), and the CIFAR train line shows
the same ~40% train-MFU back-of-envelope vs its 77% classify MFU. This
probe decomposes the production `make_train_step` program
(`engine/steps.py:80-117`: loss fwd -> grad -> global-norm clip -> Adam ->
EMA) into separately-timed chains:

  fwd      loss value only (diffuse + denoiser forward + weighted MSE)
  fwd_bwd  value_and_grad, grads kept live via optax.global_norm
  opt      clip + Adam + EMA only, grads precomputed and passed as args
  full     the production train step

Expectations to test: bwd ~= 2x fwd (else the backward pass is inefficient,
e.g. a missed flash-bwd route or fp32 leak); opt ~= HBM-traffic bound
(~9 passes over the param set: read p/g/m/v/ema + norm pass, write p/m/v/ema);
full ~= fwd_bwd + opt (else scheduling waste at the seams).

Same scan-delta methodology as bench.py (on-device chains, relay-safe).
"""

import json
import sys
import time

sys.path.insert(0, ".")

TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from diffusion_classifier_tpu.engine.state import (
        EmaConfig,
        init_train_state,
        make_optimizer,
    )
    from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.denoiser import Denoiser
    from diffusion_classifier_tpu.models import DiT, DiTConfig
    from diffusion_classifier_tpu.ops.wavelet import haar_dwt2
    from diffusion_classifier_tpu.utils.profiling import enable_compilation_cache
    from __graft_entry__ import _flagship

    enable_compilation_cache("/tmp/dc_tpu_xla_cache")
    rng = jax.random.PRNGKey(0)

    def measure(make_chain, batch, chain_len):
        f1, fR = make_chain(1), make_chain(1 + chain_len)
        seed0 = int(time.time()) % 100000
        f1(seed0), fR(seed0 + 1)  # compile both
        best = float("inf")
        for i in range(TRIALS):
            s = seed0 + 10 + i
            t0 = time.perf_counter(); f1(s); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); fR(s); tr = time.perf_counter() - t0
            best = min(best, (tr - t1) / chain_len)
        return {"ms_per_step": round(best * 1e3, 3),
                "images_per_sec": round(batch / best, 2)}

    def probe(config_name, denoiser, x, labels, chain_len, null_token):
        b = x.shape[0]
        schedule_fn = make_schedule_fn("shifted_cosine", x.shape[1], x.shape[1])
        apply_fn = lambda p, z, lg, lab: denoiser.apply(p, z, lg, lab)
        params = denoiser.init(rng, x, jnp.zeros((b,)), labels)
        loss_fn = make_loss_fn(
            apply_fn, schedule_fn, pred_param="v", null_token=null_token
        )
        tx = make_optimizer(1e-4, 10, 1000)
        state = init_train_state(params, tx)
        step = make_train_step(loss_fn, tx, EmaConfig(), donate=False)
        grad_fn = jax.value_and_grad(loss_fn)

        # one grads pytree for the opt-only chain (computed once, passed in)
        grads_const = jax.jit(lambda p, xx, ll: grad_fn(
            p, xx, ll, jax.random.PRNGKey(1))[1])(params, x, labels)
        ema_cfg = EmaConfig()

        from diffusion_classifier_tpu.engine.state import TrainState, ema_update

        def opt_step(st, grads):
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            new_p = optax.apply_updates(st.params, updates)
            ema = ema_update(st.ema_params, new_p, st.ema_counter, ema_cfg)
            return TrainState(step=st.step + 1, params=new_p, ema_params=ema,
                              opt_state=opt_state,
                              ema_counter=st.ema_counter + 1)

        def chain_fwd(repeats):
            @jax.jit
            def run(pp, xx, ll, seed):
                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
                def body(acc, key):
                    return acc + loss_fn(pp, xx, ll, key), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), keys)
                return acc
            return lambda s: float(run(params, x, labels, jnp.int32(s)))

        def chain_fwd_bwd(repeats):
            @jax.jit
            def run(pp, xx, ll, seed):
                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
                def body(acc, key):
                    loss, grads = grad_fn(pp, xx, ll, key)
                    # global_norm consumes every grad leaf: nothing in the
                    # backward pass is dead code (one extra read pass over
                    # the grads, ~|params| bytes — negligible vs the bwd)
                    return acc + loss + optax.global_norm(grads), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), keys)
                return acc
            return lambda s: float(run(params, x, labels, jnp.int32(s)))

        def chain_opt(repeats):
            @jax.jit
            def run(st, grads, seed):
                # fold the seed into one grad leaf so the relay sees distinct
                # executions (its dedupe would return the cached result)
                leaves, treedef = jax.tree.flatten(grads)
                leaves[0] = leaves[0] + (
                    jnp.float32(seed) * 1e-12).astype(leaves[0].dtype)
                grads = jax.tree.unflatten(treedef, leaves)
                def body(st, _):
                    return opt_step(st, grads), None
                st, _ = jax.lax.scan(body, st, None, length=repeats)
                return optax.global_norm(st.params)
            return lambda s: float(run(state, grads_const, jnp.int32(s)))

        def chain_full(repeats):
            @jax.jit
            def run(st, xx, ll, seed):
                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
                def body(carry, key):
                    st, acc = carry
                    st, loss = step(st, xx, ll, key)
                    return (st, acc + loss), None
                (st, acc), _ = jax.lax.scan(body, (st, jnp.float32(0)), keys)
                return acc
            return lambda s: float(run(state, x, labels, jnp.int32(s)))

        for name, mk in (("fwd", chain_fwd), ("fwd_bwd", chain_fwd_bwd),
                         ("opt", chain_opt), ("full", chain_full)):
            r = measure(mk, b, chain_len)
            print(json.dumps({"config": config_name, "variant": name, **r}),
                  flush=True)

    # -- CIFAR UNet headline config (bench.py TRAIN_BATCH=64) --
    denoiser, size = _flagship()
    B = 64
    x = jax.random.uniform(rng, (B, size, size, 3), minval=-1, maxval=1)
    labels = jnp.zeros((B,), jnp.int32)
    probe("cifar_unet", denoiser, x, labels, chain_len=8, null_token=10)

    # -- CheXpert DiT-b4 (bench.py CX_BATCH=16, DWT'd input) --
    B = 16
    dit = Denoiser(
        backbone=DiT(
            DiTConfig(
                num_attention_heads=6, attention_head_dim=64,
                in_channels=12, out_channels=12, num_layers=12,
                sample_size=128, patch_size=4, num_classes=2,
                attn_backend="auto",
            ),
            dtype=jnp.bfloat16,
        ),
        encoder=None,
    )
    x_raw = jax.random.uniform(rng, (B, 256, 256, 3), minval=-1, maxval=1)
    x0 = haar_dwt2(x_raw) / 2.0
    labels = jnp.zeros((B,), jnp.int32)
    probe("dit_b4", dit, x0, labels, chain_len=4, null_token=2)


if __name__ == "__main__":
    main()
