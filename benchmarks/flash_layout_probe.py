"""Probe: flash-attention layout + online-softmax variants (real TPU).

Candidates over the tuned round-3 kernel (`ops/flash_attention.py`):

- **fused-heads / no-transpose**: the production wrapper transposes
  [B,S,H,D] -> [B*H,S,D] around the pallas_call; both transposes
  materialize in HBM (~100 MB moved at the DiT-b4 6-head shape, ~120 us at
  819 GB/s) and cannot fuse into the kernel. Instead view the tensors as
  [B, S, H*D] (a free reshape), block over S only, and compute ALL heads
  inside the kernel with batched dot_general (einsum 'qhd,khd->hqk' /
  'hqk,khd->hqd') — zero boundary transposes, each byte loaded once; any
  head-major relayout happens in VMEM where bandwidth is ~100x HBM.
- **k-blocked online softmax** (classic flash): an unrolled k-block loop
  with running (m, l, acc) over the production [B*H,S,D] layout gives
  Mosaic room to overlap tile i's VPU softmax with tile i+1's MXU matmul.
  VPU work is ~3x MXU time at S=1024, so perfect overlap caps at ~25%.

Interleaved paired-chain methodology (median of TRIALS deltas), numerics
asserted against jax.nn.dot_product_attention per variant.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 128
TRIALS = 7
_LOG2_E = 1.4426950408889634


def make_fused_heads(block_q):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, k_ref, v_ref, o_ref, *, scale, h, d):
        # Heads live side-by-side on the lane axis ([blk, H*D]); slice each
        # head's D=64 lanes and run the 2D per-head program unrolled — Mosaic
        # can't reshape/split the lane dim, but lane slices are supported,
        # and the unrolled head loop lets head j's exp2 (VPU) overlap head
        # j+1's QK matmul (MXU).
        for j in range(h):
            q = q_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)
            k = k_ref[0, :, j * d:(j + 1) * d].astype(jnp.float32)
            v = v_ref[0, :, j * d:(j + 1) * d]
            s = jnp.dot(q * (scale * _LOG2_E), k.T,
                        preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[0, :, j * d:(j + 1) * d] = (o / l).astype(o_ref.dtype)

    def fn(q, k, v):
        b, s, h, d = q.shape
        scale = 1.0 / (d**0.5)
        blk = min(block_q, s)
        qf, kf, vf = (x.reshape(b, s, h * d) for x in (q, k, v))
        grid = (b, pl.cdiv(s, blk))
        out = pl.pallas_call(
            functools.partial(kernel, scale=scale, h=h, d=d),
            out_shape=jax.ShapeDtypeStruct((b, s, h * d), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, blk, h * d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, h * d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, h * d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk, h * d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s * s * d,
                bytes_accessed=4 * b * h * s * d * q.dtype.itemsize,
                transcendentals=b * h * s * s,
            ),
            interpret=jax.default_backend() != "tpu",
        )(qf, kf, vf)
        return out.reshape(b, s, h, d)

    return fn


def make_online(block_q, block_k):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, k_ref, v_ref, o_ref, *, scale, s_len):
        q = q_ref[0].astype(jnp.float32) * (scale * _LOG2_E)  # [blk, d]
        n_kb = s_len // block_k
        m = jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((q.shape[0], 1), jnp.float32)
        acc = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
        for kb in range(n_kb):  # unrolled: static trip count
            ks = k_ref[0, kb * block_k:(kb + 1) * block_k].astype(jnp.float32)
            vs = v_ref[0, kb * block_k:(kb + 1) * block_k]
            sc = jnp.dot(q, ks.T, preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
            p = jnp.exp2(sc - m_new)
            corr = jnp.exp2(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.dot(
                p.astype(vs.dtype), vs, preferred_element_type=jnp.float32
            )
            m = m_new
        o_ref[0] = (acc / l).astype(o_ref.dtype)

    def fn(q, k, v):
        b, s, h, d = q.shape
        scale = 1.0 / (d**0.5)
        blk = min(block_q, s)

        def to_bh(x):
            return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

        grid = (b * h, pl.cdiv(s, blk))
        out = pl.pallas_call(
            functools.partial(kernel, scale=scale, s_len=s),
            out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s * s * d,
                bytes_accessed=4 * b * h * s * d * q.dtype.itemsize,
                transcendentals=b * h * s * s,
            ),
            interpret=jax.default_backend() != "tpu",
        )(to_bh(q), to_bh(k), to_bh(v))
        return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)

    return fn


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.ops.flash_attention import flash_attention

    variants = {
        "current": lambda q, k, v: flash_attention(q, k, v),
        "fused_heads_b256": make_fused_heads(256),  # b512 OOMs scoped vmem at H=12
        "fused_heads_b128": make_fused_heads(128),
        "online_b512_k256": make_online(512, 256),
        "online_b512_k512": make_online(512, 512),
    }

    for b, s, h, d in [(16, 1024, 6, 64), (16, 1024, 12, 64)]:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.bfloat16)
        ref = jax.jit(jax.nn.dot_product_attention)(q, k, v)
        progs = {}
        for name, fn in variants.items():
            out = jax.jit(fn)(q, k, v)
            err = float(jnp.max(jnp.abs(
                out.astype(jnp.float32) - ref.astype(jnp.float32))))
            assert err < 0.02, (name, err)

            def chained(repeats, fn=fn):
                # operands are jit ARGUMENTS (no giant HLO constants over
                # the relay); per-iteration variation via a scalar factor —
                # the old in-loop full-tensor normal() draw cost ~a kernel's
                # worth of time and diluted every ratio toward 1
                @jax.jit
                def run(q, k, v, seed):
                    def body(c, key):
                        f = 1.0 + 0.01 * jax.random.normal(key, (), jnp.bfloat16)
                        out = fn(q * f, k * f, v * f)
                        return c + out.astype(jnp.float32).sum(), None
                    keys = jax.random.split(
                        jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
                    total, _ = jax.lax.scan(body, jnp.float32(0), keys)
                    return total
                return lambda seed: float(run(q, k, v, jnp.int32(seed)))

            f1, fR = chained(1), chained(1 + CHAIN)
            sd = int(time.time() * 1e3) % 10**9
            f1(sd), fR(sd + 1)  # compile
            progs[name] = (f1, fR, err)

        series = {name: [] for name in progs}
        for _ in range(TRIALS):
            for name, (f1, fR, _err) in progs.items():
                sd = int(time.time() * 1e3) % 10**9
                t0 = time.perf_counter(); f1(sd); t1 = time.perf_counter() - t0
                t0 = time.perf_counter(); fR(sd + 1); tr = time.perf_counter() - t0
                series[name].append((tr - t1) / CHAIN)
        for name, xs in series.items():
            xs = sorted(xs)
            print(json.dumps({
                "shape": [b, s, h, d], "variant": name,
                "us_median": round(xs[len(xs) // 2] * 1e6, 1),
                "us_min": round(xs[0] * 1e6, 1),
                "us_max": round(xs[-1] * 1e6, 1),
                "max_abs_err_vs_xla": progs[name][2],
            }), flush=True)


if __name__ == "__main__":
    main()
