"""Flash-attention kernel variant sweep at the DiT-b4 production shape.

Candidates over the round-3 kernel (`ops/flash_attention.py`):
- divide-after-PV: normalize the [BLK_Q, D] output by 1/l instead of the
  [BLK_Q, S] probability matrix — S/D (= 16x at S=1024, D=64) fewer VPU
  divides per block.
- exp2: score softmax via 2^x with log2(e) folded into the qk scale —
  exp2 is the native VPU transcendental; exp(x) = exp2(x * log2 e).
- block_q in {128, 256, 512}: pipelining granularity (K/V stay resident
  across q-blocks of one head either way).

Shapes: (16, 1024, 6, 64) — the chexpert-dit bench config's attention —
and (16, 1024, 12, 64) — the BASELINE.md round-2 comparison row.
Scan-delta methodology (chain delta with per-iteration data variation).
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 128  # sub-ms kernels: the chain must dwarf the relay's ms-scale
TRIALS = 5   # latency jitter or the delta is noise (first probe's lesson)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from diffusion_classifier_tpu.ops.flash_attention import flash_attention

    def make_kernel(divide_after: bool, use_exp2: bool):
        def kern(q_ref, k_ref, v_ref, o_ref, *, scale):
            q = q_ref[0].astype(jnp.float32)
            k = k_ref[0].astype(jnp.float32)
            v = v_ref[0]
            s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            if use_exp2:
                p = jnp.exp2(s - m)
            else:
                p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            if divide_after:
                o = jnp.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32
                )
                o_ref[0] = (o / l).astype(o_ref.dtype)
            else:
                o_ref[0] = jnp.dot(
                    (p / l).astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                ).astype(o_ref.dtype)

        return kern

    def variant(q, k, v, *, block_q, divide_after, use_exp2):
        b, s, h, d = q.shape
        scale = 1.0 / (d**0.5)
        if use_exp2:
            scale = scale * 1.4426950408889634  # log2(e): 2^(x·log2 e) = e^x

        def to_bh(x):
            return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

        qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
        out = pl.pallas_call(
            functools.partial(
                make_kernel(divide_after, use_exp2), scale=scale
            ),
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

    def measure(fn, b, s, h, d):
        def chained(repeats):
            @jax.jit
            def run(seed):
                def body(carry, key):
                    q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
                    o = fn(q, q * 0.5, q * 0.25)
                    return carry + o.astype(jnp.float32).sum(), None

                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(7), seed), repeats
                )
                tot, _ = jax.lax.scan(body, jnp.float32(0), keys)
                return tot

            return lambda seed: float(run(jnp.int32(seed)))

        f1, fR = chained(1), chained(1 + CHAIN)
        f1(0), fR(0)
        best = float("inf")
        for i in range(TRIALS):
            t0 = time.perf_counter(); f1(1000 + i); t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); fR(1000 + i); tr = time.perf_counter() - t0
            best = min(best, (tr - t1) / CHAIN)
        return best

    shapes = [(16, 1024, 6, 64), (16, 1024, 12, 64)]
    for b, s, h, d in shapes:
        # numeric check of each variant against the production kernel
        kq = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq[0], (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(kq[1], (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(kq[2], (b, s, h, d), jnp.bfloat16)
        base = flash_attention(q, k, v)
        rows = {}
        rows["current"] = measure(lambda q, k, v: flash_attention(q, k, v),
                                  b, s, h, d)
        rows["xla"] = measure(
            lambda q, k, v: jax.nn.dot_product_attention(q, k, v), b, s, h, d
        )
        for blk in (128, 256, 512):
            for da in (False, True):
                for e2 in (False, True):
                    name = f"blk{blk}_da{int(da)}_exp2{int(e2)}"
                    fn = functools.partial(
                        variant, block_q=blk, divide_after=da, use_exp2=e2
                    )
                    err = float(
                        jnp.max(jnp.abs(
                            fn(q, k, v).astype(jnp.float32)
                            - base.astype(jnp.float32)
                        ))
                    )
                    sec = measure(fn, b, s, h, d)
                    rows[name] = sec
                    print(json.dumps({
                        "shape": [b, s, h, d], "variant": name,
                        "us": round(sec * 1e6, 1), "max_abs_err": err,
                    }), flush=True)
        for name in ("current", "xla"):
            print(json.dumps({
                "shape": [b, s, h, d], "variant": name,
                "us": round(rows[name] * 1e6, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
