"""Focused verification of the flash-attention finalists (interleaved medians).

The broad sweep (flash_tune_probe.py) is min-of-deltas and suffers fake lows
when the relay hiccups during the 1-length chain; this verifier interleaves
the finalists round-robin (drift hits all alike) and reports the MEDIAN of 9
deltas per variant.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 128
TRIALS = 9


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.flash_tune_probe import __name__ as _  # noqa: F401
    from diffusion_classifier_tpu.ops.flash_attention import flash_attention

    # rebuild the probe's variant() locally to avoid import-order surprises
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_kernel(divide_after, use_exp2):
        def kern(q_ref, k_ref, v_ref, o_ref, *, scale):
            q = q_ref[0].astype(jnp.float32)
            k = k_ref[0].astype(jnp.float32)
            v = v_ref[0]
            s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m) if use_exp2 else jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            if divide_after:
                o = jnp.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
                o_ref[0] = (o / l).astype(o_ref.dtype)
            else:
                o_ref[0] = jnp.dot((p / l).astype(v.dtype), v,
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)
        return kern

    def variant(q, k, v, *, block_q, divide_after, use_exp2):
        b, s, h, d = q.shape
        scale = 1.0 / (d**0.5)
        if use_exp2:
            scale = scale * 1.4426950408889634

        def to_bh(x):
            return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

        qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
        out = pl.pallas_call(
            functools.partial(make_kernel(divide_after, use_exp2), scale=scale),
            out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            grid=(b * h, pl.cdiv(s, block_q)),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        )(qb, kb, vb)
        return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)

    finalists = {
        "current": lambda q, k, v: flash_attention(q, k, v),
        "blk256_base": functools.partial(
            variant, block_q=256, divide_after=False, use_exp2=False),
        "blk256_da_exp2": functools.partial(
            variant, block_q=256, divide_after=True, use_exp2=True),
        "blk512_da_exp2": functools.partial(
            variant, block_q=512, divide_after=True, use_exp2=True),
        "blk512_exp2": functools.partial(
            variant, block_q=512, divide_after=False, use_exp2=True),
    }

    for shape in ((16, 1024, 6, 64), (16, 1024, 12, 64)):
        b, s, h, d = shape
        progs = {}
        for name, fn in finalists.items():
            def chained(repeats, fn=fn):
                @jax.jit
                def run(seed):
                    def body(carry, key):
                        q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
                        o = fn(q, q * 0.5, q * 0.25)
                        return carry + o.astype(jnp.float32).sum(), None
                    keys = jax.random.split(
                        jax.random.fold_in(jax.random.PRNGKey(7), seed),
                        repeats)
                    tot, _ = jax.lax.scan(body, jnp.float32(0), keys)
                    return tot
                return lambda seed: float(run(jnp.int32(seed)))
            f1, fR = chained(1), chained(1 + CHAIN)
            base = int(time.time()) % 100000
            f1(base), fR(base + 1)  # compile
            progs[name] = (f1, fR)

        series = {name: [] for name in progs}
        for i in range(TRIALS):
            for name, (f1, fR) in progs.items():
                sd = int(time.time() * 1e3) % 10**9
                t0 = time.perf_counter(); f1(sd); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); fR(sd + 1); tr = time.perf_counter() - t0
                series[name].append((tr - t1) / CHAIN)
        for name, xs in series.items():
            xs = sorted(xs)
            print(json.dumps({
                "shape": list(shape), "variant": name,
                "us_median": round(xs[len(xs) // 2] * 1e6, 1),
                "us_min": round(xs[0] * 1e6, 1),
                "us_max": round(xs[-1] * 1e6, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
