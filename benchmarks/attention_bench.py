"""Pallas flash-attention vs jax.nn.dot_product_attention on the real TPU.

Shapes are the flagship UNet's self-attention sites (megabatch 320):
L2 8×8 tokens @ 8 heads × 32, L3/mid 4×4 tokens @ 8 heads × 64 — plus the
long-sequence DiT shapes where flash tiling matters.

Methodology notes (round 3): the round-2 version used CHAIN=16 with
min-of-3 deltas; for sub-ms kernels that statistic is dominated by the
relay's ms-scale latency jitter and produced a fake 2.13× win at the
1024-token shape. This version uses CHAIN=128 with the xla/pallas pair
interleaved per trial and the MEDIAN of 7 paired deltas. A later round-3
review also replaced the in-loop full-tensor normal() draws (whose shared
cost diluted every ratio toward 1 — the old head-major gap read ~1.1–1.25×
at 1024 tokens under that dilution) with a scalar perturbation of
pre-materialized operands, so the reported ratios are now the kernels'.
"""

import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 128
TRIALS = 7


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.ops.flash_attention import (
        flash_attention,
        supports,
    )

    shapes = [
        ("L2_s64_h8_d32", 320, 128, 8, 32),   # s must be %128 for the kernel
        ("dit_s256_h12_d64", 64, 256, 12, 64),
        ("dit_s1024_h6_d64", 16, 1024, 6, 64),   # chexpert-dit bench config
        ("dit_s1024_h12_d64", 16, 1024, 12, 64),
    ]
    for name, b, s, h, d in shapes:
        impls = {
            "xla": lambda q, k, v: jax.nn.dot_product_attention(q, k, v),
            "pallas": lambda q, k, v: flash_attention(q, k, v),
        }
        # Base tensors are ARGUMENTS of the jitted chain (closing over them
        # would inline HLO constants past the relay's request size limit);
        # per-iteration variation is a scalar RNG factor — a fused multiply
        # per operand (~μs at these shapes) instead of a full Box-Muller
        # tensor draw, which at (16,1024,12,64) cost ~as much as the kernel
        # under test and diluted every ratio toward 1 (round-3 review).
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
        q0 = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        k0 = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
        v0 = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)

        progs = {}
        for label, fn in impls.items():
            def chained(repeats, fn=fn):
                @jax.jit
                def run(q0, k0, v0, seed):
                    def body(c, key):
                        f = 1.0 + 0.01 * jax.random.normal(key, (), jnp.bfloat16)
                        out = fn(q0 * f, k0 * f, v0 * f)
                        return c + out.astype(jnp.float32).sum(), None

                    keys = jax.random.split(
                        jax.random.fold_in(jax.random.PRNGKey(0), seed),
                        repeats,
                    )
                    total, _ = jax.lax.scan(body, jnp.float32(0), keys)
                    return total

                return lambda seed: float(run(q0, k0, v0, jnp.int32(seed)))

            f1, fR = chained(1), chained(1 + CHAIN)
            sd = int(time.time() * 1e3) % 10**9
            f1(sd), fR(sd + 1)  # compile
            progs[label] = (f1, fR)

        series = {label: [] for label in progs}
        for _ in range(TRIALS):
            for label, (f1, fR) in progs.items():
                sd = int(time.time() * 1e3) % 10**9
                t0 = time.perf_counter(); f1(sd); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); fR(sd + 1); tr = time.perf_counter() - t0
                series[label].append((tr - t1) / CHAIN)
        sane = supports(
            jnp.zeros((b, s, h, d), jnp.bfloat16),
            jnp.zeros((b, s, h, d), jnp.bfloat16),
            jnp.zeros((b, s, h, d), jnp.bfloat16),
        )
        for label, xs in series.items():
            xs = sorted(xs)
            print(json.dumps({
                "shape": name, "impl": label, "supported": sane,
                "us_median": round(xs[len(xs) // 2] * 1e6, 1),
                "us_min": round(xs[0] * 1e6, 1),
                "us_max": round(xs[-1] * 1e6, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
