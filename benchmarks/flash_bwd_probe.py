"""Flash-attention backward kernel probe (real TPU).

Measures fwd+bwd (jax.grad of a sum-of-squares loss) for the pallas
custom-vjp path vs pure XLA attention at the production DiT shapes, with
grad parity asserted on-device first. Interleaved paired scan-chains,
median of TRIALS deltas (same methodology as benchmarks/attention_bench.py).
"""

import functools
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from _timing import interleaved_deltas, median, seed_counter

CHAIN = 64
TRIALS = 7

_seed_counter = seed_counter()


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.ops.flash_attention import flash_attention

    shapes = [
        ("dit_s256_h12_d64", 64, 256, 12, 64),
        ("dit_s1024_h6_d64", 16, 1024, 6, 64),
        ("dit_s1024_h12_d64", 16, 1024, 12, 64),
    ]

    def make(fn, shape):
        b, s, h, d = shape

        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        grad = jax.grad(loss, argnums=(0, 1, 2))

        def chained(repeats):
            @jax.jit
            def run(seed):
                def body(carry, key):
                    q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
                    gq, gk, gv = grad(q, q * 0.5, q * 0.25)
                    return carry + gq.astype(jnp.float32).sum(), None

                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
                )
                tot, _ = jax.lax.scan(body, jnp.float32(0), keys)
                return tot

            return lambda seed: float(run(jnp.int32(seed)))

        return chained

    for name, b, s, h, d in shapes:
        # on-device grad parity before timing
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)

        def loss_p(q, k, v):
            return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

        def loss_x(q, k, v):
            return jnp.sum(
                jax.nn.dot_product_attention(q, k, v).astype(jnp.float32) ** 2
            )

        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(q, k, v)
        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(q, k, v)
        err = max(
            float(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32)).max())
            for a, b_ in zip(gp, gx)
        )
        scale = max(
            float(jnp.abs(b_.astype(jnp.float32)).max()) for b_ in gx
        )

        results = {"shape": name, "max_abs_grad_err": err, "grad_scale": scale}
        # interleaved paired rounds (benchmarks/_timing.py): one delta per
        # backend per round, so one-sided relay drift hits both equally
        chains = {}
        for label, fn in (
            ("xla", jax.nn.dot_product_attention),
            ("pallas", flash_attention),
        ):
            chained = make(fn, (b, s, h, d))
            f1, fR = chained(1), chained(1 + CHAIN)
            f1(next(_seed_counter)), fR(next(_seed_counter))  # compile
            chains[label] = (f1, fR)
        deltas = interleaved_deltas(chains, CHAIN, TRIALS, _seed_counter)
        for label, ds in deltas.items():
            results[label + "_us"] = round(median(ds) * 1e6, 1)
        results["speedup"] = round(results["xla_us"] / results["pallas_us"], 2)
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
