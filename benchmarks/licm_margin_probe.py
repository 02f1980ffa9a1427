"""Probe: is the vs_licm margin (1.073, round 3) recoverable or capped?

VERDICT r3 weak #2 / next-round §3 offers two closures: widen the strict
margin to ≥1.15 by fusing the per-class ε-error reduction into the tail so
predictions never round-trip HBM — or prove the reduction is already fused
and the margin is roofline-capped. This probe decides which:

1. production fused classify (explicit prefix + cc=1 class scan) — time;
2. the LICM baseline (full network per class inside a class scan; XLA
   hoists the class-independent prefix) — time;
3. "rdecomp" variant: per-class error computed WITHOUT forming
   ``eps_pred``/``eps_rep`` — for v-param,
   ``‖ε̂−ε‖² = α²‖v̂‖² + 2α⟨v̂, r⟩ + ‖r‖²`` with the class-independent
   ``r = σ·z − ε`` computed once per eval. If the production program's
   elementwise error path were NOT fused, this would be measurably faster;
   if it measures equal, the reduction is already fused and the remaining
   margin is scheduling, not HBM.

All three share the headline operating point (flagship CIFAR UNet, B=64,
10 classes, 4 evals) and (t, ε) protocol; interleaved paired trials.
"""

import json
import sys

sys.path.insert(0, ".")

CHAIN = 8
TRIALS = 6
B = 64
CLASSES = 10
EVALS = 4


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from __graft_entry__ import _flagship
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.process import bcast_right, pred_to_eps
    from diffusion_classifier_tpu.diffusion.schedule import (
        alpha_sigma,
        make_schedule_fn,
    )
    from diffusion_classifier_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache("/tmp/dc_tpu_xla_cache")
    denoiser, size = _flagship()
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (B, size, size, 3), minval=-1, maxval=1)
    labels = jnp.zeros((B,), jnp.int32)
    params = denoiser.init(rng, x, jnp.zeros((B,)), labels)
    schedule_fn = make_schedule_fn("shifted_cosine", 32, 32)
    apply_fn = lambda p, z, lg, lab: denoiser.apply(p, z, lg, lab)
    encode_fn = lambda p, z, lg: denoiser.apply(p, z, lg, None, mode="encode")
    tail_fn = lambda p, s, lab: denoiser.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )

    fused = make_classifier(
        apply_fn,
        schedule_fn,
        pred_param="v",
        num_classes=CLASSES,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        class_chunk=1,
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )

    def licm(params, x, labels, key):
        del labels

        def eval_body(total, key):
            k_t, k_eps = jax.random.split(key)
            t = jax.random.uniform(k_t, (B,))
            logsnr = schedule_fn(t)
            a, s = alpha_sigma(logsnr)
            eps = jax.random.normal(k_eps, x.shape)
            z = bcast_right(a, 4) * x + bcast_right(s, 4) * eps

            def class_body(errs, c):
                lab_c = jnp.full((B,), c, jnp.int32)
                pred = apply_fn(params, z, logsnr, lab_c)
                eps_pred = pred_to_eps(pred, z, a, s, "v")
                err = jnp.sum((eps_pred - eps) ** 2, axis=(1, 2, 3))
                return errs.at[:, c].set(err), None

            errs, _ = jax.lax.scan(
                class_body, jnp.zeros((B, CLASSES)), jnp.arange(CLASSES)
            )
            return total + errs, None

        keys = jax.random.split(key, EVALS)
        total, _ = jax.lax.scan(eval_body, jnp.zeros((B, CLASSES)), keys)
        return jnp.argmin(total, axis=1)

    def rdecomp(params, x, labels, key):
        """Fused schedule, error via α²‖v̂‖² + 2α⟨v̂,r⟩ + ‖r‖² (no eps_pred)."""
        del labels

        def eval_body(total, key):
            k_t, k_eps = jax.random.split(key)
            t = jax.random.uniform(k_t, (B,))
            logsnr = schedule_fn(t)
            a, s = alpha_sigma(logsnr)
            eps = jax.random.normal(k_eps, x.shape)
            z = bcast_right(a, 4) * x + bcast_right(s, 4) * eps
            state = encode_fn(params, z, logsnr)
            # class-independent residual, reduced pieces computed once
            r = bcast_right(s, 4) * z - eps
            r2 = jnp.sum(r.astype(jnp.float32) ** 2, axis=(1, 2, 3))
            a32 = a.astype(jnp.float32)

            def class_body(errs, c):
                lab_c = jnp.full((B,), c, jnp.int32)
                v = tail_fn(params, state, lab_c).astype(jnp.float32)
                v2 = jnp.sum(v * v, axis=(1, 2, 3))
                vr = jnp.sum(v * r.astype(jnp.float32), axis=(1, 2, 3))
                err = a32 * a32 * v2 + 2.0 * a32 * vr + r2
                return errs.at[:, c].set(err), None

            errs, _ = jax.lax.scan(
                class_body, jnp.zeros((B, CLASSES)), jnp.arange(CLASSES)
            )
            return total + errs, None

        keys = jax.random.split(key, EVALS)
        total, _ = jax.lax.scan(eval_body, jnp.zeros((B, CLASSES)), keys)
        return jnp.argmin(total, axis=1)

    def chained(fn, repeats):
        @jax.jit
        def run(pp, xx, ll, seed):
            def body(carry, key):
                return carry + fn(pp, xx, ll, key).astype(jnp.int32).sum(), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
            )
            total, _ = jax.lax.scan(body, jnp.int32(0), keys)
            return total

        return lambda seed: int(run(params, x, labels, jnp.int32(seed)))

    progs = {}
    for name, fn in (("fused", fused), ("licm", licm), ("rdecomp", rdecomp)):
        f1, fR = chained(fn, 1), chained(fn, 1 + CHAIN)
        f1(bench._next_seed()), fR(bench._next_seed())
        progs[name] = (f1, fR)

    series = {n: [] for n in progs}
    for _ in range(TRIALS):
        for n, (f1, fR) in progs.items():
            series[n].append(
                min(bench._deltas(f1, fR, 1 + CHAIN, 2))
            )

    med = {n: bench._median(v) for n, v in series.items()}
    out = {f"{n}_ms": round(v * 1e3, 3) for n, v in med.items()}
    out["licm_over_fused"] = round(med["licm"] / med["fused"], 4)
    out["licm_over_rdecomp"] = round(med["licm"] / med["rdecomp"], 4)
    out["fused_over_rdecomp"] = round(med["fused"] / med["rdecomp"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
