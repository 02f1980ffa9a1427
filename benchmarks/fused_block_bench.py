"""Fused resnet-block kernel vs XLA chain on the real TPU (scan-delta timing)."""

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

    from diffusion_classifier_tpu.ops.fused_resnet import (
        ResnetParams, resnet_block_pallas, resnet_block_ref, supports,
    )

    # level shapes of the flagship CIFAR UNet at megabatch 320
    shapes = [
        ("L0_32x32x128", 320, 32, 128, 128),
        ("L0_up_concat", 320, 32, 256, 128),   # up-path concat input
        ("L1_16x16x128", 320, 16, 128, 128),
        ("L2_8x8x256", 320, 8, 256, 256),
        ("L3_4x4x512", 320, 4, 512, 512),
    ]

    for name, b, hw, cin, cout in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 12)
        skip = cin != cout
        params = ResnetParams(
            scale1=jnp.ones((cin,)), bias1=jnp.zeros((cin,)),
            w1=jax.random.normal(ks[0], (3, 3, cin, cout)) * 0.05,
            b1=jnp.zeros((cout,)),
            scale2=jnp.ones((cout,)), bias2=jnp.zeros((cout,)),
            w2=jax.random.normal(ks[1], (3, 3, cout, cout)) * 0.05,
            b2=jnp.zeros((cout,)),
            ws=jax.random.normal(ks[2], (cin, cout)) * 0.1 if skip else None,
            bs=jnp.zeros((cout,)) if skip else None,
        )
        x = jax.random.normal(ks[3], (b, hw, hw, cin), jnp.bfloat16)
        temb = jax.random.normal(ks[4], (b, cout))
        assert supports(x, cin, cout, 1, 0.0), name

        # flax-equivalent XLA chain (bf16 convs, f32 GN stats — what
        # ResnetBlock2D's xla path lowers to)
        def gn(h, scale, bias):
            c = h.shape[-1]
            grp = h.reshape(h.shape[0], -1, 32, c // 32).astype(jnp.float32)
            mean = grp.mean(axis=(1, 3), keepdims=True)
            var = grp.var(axis=(1, 3), keepdims=True)
            y = (grp - mean) * jax.lax.rsqrt(var + 1e-5)
            y = y.reshape(h.shape) * scale + bias
            return y.astype(h.dtype)

        def conv(h, w, b2):
            out = jax.lax.conv_general_dilated(
                h, w.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out + b2.astype(jnp.bfloat16)

        def xla_chain(params, x, temb, key):
            x = x + 0 * jax.random.normal(key, (1,), x.dtype)  # fresh input per iter
            h = jax.nn.silu(gn(x, params.scale1, params.bias1))
            h = conv(h, params.w1, params.b1)
            h = h + temb.astype(h.dtype)[:, None, None, :]
            h = jax.nn.silu(gn(h, params.scale2, params.bias2))
            h = conv(h, params.w2, params.b2)
            skip = x
            if params.ws is not None:
                skip = (
                    x.reshape(-1, x.shape[-1]) @ params.ws.astype(jnp.bfloat16)
                    + params.bs.astype(jnp.bfloat16)
                ).reshape(h.shape)
            return skip + h

        def pallas_block(params, x, temb, key):
            x = x + 0 * jax.random.normal(key, (1,), x.dtype)
            return resnet_block_pallas(params, x, temb)

        for label, fn in (("xla", xla_chain), ("pallas", pallas_block)):
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
            print(json.dumps({"shape": name, "impl": label,
                              "ms": round(sec * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
