"""Production ResnetBlock2D, xla vs pallas backend, on the real TPU.

Runs the actual model module (same param tree both arms) at the flagship
UNet's level shapes with megabatch 320. Scan-delta timing.
"""

import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 8
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

    from diffusion_classifier_tpu.models.layers import ResnetBlock2D

    shapes = [
        ("L0_32x32x128", 320, 32, 128, 128),
        ("L0_up_concat", 320, 32, 256, 128),
        ("L1_16x16x128", 320, 16, 128, 128),
        ("L2_8x8x256", 320, 8, 256, 256),
        ("L3_4x4x512", 320, 4, 512, 512),
    ]

    for name, b, hw, cin, cout in shapes:
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (b, hw, hw, cin), jnp.bfloat16)
        temb = jax.random.normal(jax.random.fold_in(rng, 1), (b, 512))
        blocks = {
            impl: ResnetBlock2D(cout, dtype=jnp.bfloat16, backend=impl)
            for impl in ("xla", "pallas")
        }
        params = blocks["xla"].init(rng, x, temb)

        for impl, block in blocks.items():
            def fn(params, x, temb, key, block=block):
                xx = x + 0 * jax.random.normal(key, (1,), x.dtype)
                return block.apply(params, xx, temb)

            def chained(repeats, fn=fn):
                @jax.jit
                def run(params, x, temb, seed):
                    def body(c, key):
                        out = fn(params, x, temb, key)
                        return c + out.astype(jnp.float32).sum(), None
                    keys = jax.random.split(
                        jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
                    total, _ = jax.lax.scan(body, jnp.float32(0), keys)
                    return total
                return lambda seed: float(run(params, x, temb, jnp.int32(seed)))

            sec = timed_delta(chained(1), chained(1 + CHAIN), 1 + CHAIN)
            print(json.dumps({"shape": name, "impl": impl,
                              "ms": round(sec * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
