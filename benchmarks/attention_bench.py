"""Pallas flash-attention vs jax.nn.dot_product_attention on the real TPU.

Shapes are the flagship UNet's self-attention sites (megabatch 320):
L2 8×8 tokens @ 8 heads × 32, L3/mid 4×4 tokens @ 8 heads × 64 — plus a
longer-sequence DiT-like shape where flash tiling could plausibly matter.
"""

import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 16
TRIALS = 3


def timed_delta(fn1, fnR, repeats):
    fn1(0), fnR(0)
    best = float("inf")
    for i in range(TRIALS):
        t0 = time.perf_counter(); fn1(i + 1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); fnR(i + 1); tr = time.perf_counter() - t0
        best = min(best, (tr - t1) / (repeats - 1))
    return best


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.ops.flash_attention import flash_attention, supports

    shapes = [
        ("L2_s64_h8_d32", 320, 128, 8, 32),   # s must be %128 for the kernel
        ("dit_s256_h12_d64", 64, 256, 12, 64),
        ("dit_s1024_h12_d64", 16, 1024, 12, 64),
    ]
    for name, b, s, h, d in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
        assert supports(q, k, v), name

        impls = {
            "xla": lambda q, k, v: jax.nn.dot_product_attention(q, k, v),
            "pallas": lambda q, k, v: flash_attention(q, k, v),
        }
        for label, fn in impls.items():
            def chained(repeats, fn=fn):
                @jax.jit
                def run(q, k, v, seed):
                    def body(c, key):
                        qq = q + 0 * jax.random.normal(key, (1,), q.dtype)
                        out = fn(qq, k, v)
                        return c + out.astype(jnp.float32).sum(), None
                    keys = jax.random.split(
                        jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
                    total, _ = jax.lax.scan(body, jnp.float32(0), keys)
                    return total
                return lambda seed: float(run(q, k, v, jnp.int32(seed)))
            sec = timed_delta(chained(1), chained(1 + CHAIN), 1 + CHAIN)
            print(json.dumps({"shape": name, "impl": label,
                              "us": round(sec * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
