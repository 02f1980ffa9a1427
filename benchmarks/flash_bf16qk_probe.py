"""Probe: bf16 q·k scores matmul (f32 accumulation) vs the f32-cast matmul.

The production kernel upcasts q and k to f32 before the scores matmul; on
TPU that lowers to a true-f32 MXU pass (~1/8 the bf16 rate). Keeping the
operands bf16 with ``preferred_element_type=f32`` is the native MXU mode —
identical accumulation precision, bf16-rounded operands (exactly what the
XLA `jax.nn.dot_product_attention` path feeds the MXU anyway).

Interleaved median methodology (see flash_tune_verify.py).
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 128
TRIALS = 7
_LOG2_E = 1.4426950408889634


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from diffusion_classifier_tpu.ops.flash_attention import flash_attention

    def make_kernel(bf16_qk):
        def kern(q_ref, k_ref, v_ref, o_ref, *, scale):
            if bf16_qk:
                q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
                k = k_ref[0]
            else:
                q = q_ref[0].astype(jnp.float32) * scale
                k = k_ref[0].astype(jnp.float32)
            v = v_ref[0]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[0] = (o / l).astype(o_ref.dtype)
        return kern

    def variant(q, k, v, *, block_q, bf16_qk):
        b, s, h, d = q.shape
        scale = (1.0 / (d**0.5)) * _LOG2_E

        def to_bh(x):
            return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

        qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
        out = pl.pallas_call(
            functools.partial(make_kernel(bf16_qk), scale=scale),
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
        "current_f32qk": lambda q, k, v: flash_attention(q, k, v),
        "blk512_bf16qk": functools.partial(variant, block_q=512, bf16_qk=True),
        "blk256_bf16qk": functools.partial(variant, block_q=256, bf16_qk=True),
        "blk1024_bf16qk": functools.partial(
            variant, block_q=1024, bf16_qk=True),
    }

    for shape in ((16, 1024, 6, 64), (16, 1024, 12, 64), (64, 256, 12, 64)):
        b, s, h, d = shape
        # numeric check vs the XLA path (which also feeds the MXU bf16)
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
        want = jax.nn.dot_product_attention(q, k, v).astype(jnp.float32)

        progs = {}
        for name, fn in finalists.items():
            err = float(jnp.max(jnp.abs(
                fn(q, k, v).astype(jnp.float32) - want)))

            def chained(repeats, fn=fn):
                @jax.jit
                def run(seed):
                    def body(c, key):
                        qq = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
                        o = fn(qq, qq * 0.5, qq * 0.25)
                        return c + o.astype(jnp.float32).sum(), None
                    keys = jax.random.split(
                        jax.random.fold_in(jax.random.PRNGKey(7), seed),
                        repeats)
                    tot, _ = jax.lax.scan(body, jnp.float32(0), keys)
                    return tot
                return lambda seed: float(run(jnp.int32(seed)))

            f1, fR = chained(1), chained(1 + CHAIN)
            sd = int(time.time() * 1e3) % 10**9
            f1(sd), fR(sd + 1)
            progs[name] = (f1, fR, err)

        series = {name: [] for name in progs}
        for _ in range(TRIALS):
            for name, (f1, fR, _e) in progs.items():
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
                "max_abs_err_vs_xla": progs[name][2],
            }), flush=True)


if __name__ == "__main__":
    main()
