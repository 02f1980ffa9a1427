"""Up-path resnet block: concat input vs split-operand formulation (TPU).

conv(concat(h, s), W) == conv(h, W_top) + conv(s, W_bot) and GroupNorm
factorizes per half when each half's channels are a multiple of the group
width — so the up block never needs to materialize [B, H, W, 2C] tensors.
Measures whether XLA's concat handling actually costs anything at the
flagship L0-up shape (320×32²×(128+128)→128).
"""

import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 8
TRIALS = 3
B, HW, CH = 320, 32, 128  # h and skip both CH; block out CH


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

    from diffusion_classifier_tpu.models.layers import group_norm_mxu

    cin, cout, groups = 2 * CH, CH, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    p = {
        "scale1": jnp.ones((cin,)), "bias1": jnp.zeros((cin,)),
        "w1": jax.random.normal(ks[0], (3, 3, cin, cout), jnp.float32) * 0.05,
        "b1": jnp.zeros((cout,)),
        "scale2": jnp.ones((cout,)), "bias2": jnp.zeros((cout,)),
        "w2": jax.random.normal(ks[1], (3, 3, cout, cout), jnp.float32) * 0.05,
        "b2": jnp.zeros((cout,)),
        "ws": jax.random.normal(ks[2], (cin, cout), jnp.float32) * 0.1,
        "bs": jnp.zeros((cout,)),
    }
    h0 = jax.random.normal(ks[3], (B, HW, HW, CH), jnp.bfloat16)
    s0 = jax.random.normal(ks[4], (B, HW, HW, CH), jnp.bfloat16)
    temb = jax.random.normal(ks[5], (B, cout))

    def conv(h, w, b):
        out = jax.lax.conv_general_dilated(
            h, w.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + b.astype(jnp.bfloat16)

    def body_from(h1, p, temb):
        h1 = h1 + temb.astype(h1.dtype)[:, None, None, :]
        h1 = group_norm_mxu(h1, p["scale2"], p["bias2"], num_groups=groups, eps=1e-5)
        h1 = jax.nn.silu(h1)
        return conv(h1, p["w2"], p["b2"])

    def concat_impl(p, h, s, temb, key):
        h = h + 0 * jax.random.normal(key, (1,), h.dtype)
        x = jnp.concatenate([h, s], axis=-1)
        h1 = group_norm_mxu(x, p["scale1"], p["bias1"], num_groups=groups, eps=1e-5)
        h1 = jax.nn.silu(h1)
        h1 = conv(h1, p["w1"], p["b1"])
        h2 = body_from(h1, p, temb)
        skip = (x.reshape(-1, cin) @ p["ws"].astype(jnp.bfloat16)
                + p["bs"].astype(jnp.bfloat16)).reshape(h2.shape)
        return skip + h2

    def split_impl(p, h, s, temb, key):
        h = h + 0 * jax.random.normal(key, (1,), h.dtype)
        gh = groups * CH // cin  # groups covering the h half
        ha = group_norm_mxu(h, p["scale1"][:CH], p["bias1"][:CH],
                            num_groups=gh, eps=1e-5)
        sa = group_norm_mxu(s, p["scale1"][CH:], p["bias1"][CH:],
                            num_groups=groups - gh, eps=1e-5)
        h1 = (conv(jax.nn.silu(ha), p["w1"][:, :, :CH], p["b1"])
              + conv(jax.nn.silu(sa), p["w1"][:, :, CH:], jnp.zeros_like(p["b1"])))
        h2 = body_from(h1, p, temb)
        skip = (h.reshape(-1, CH) @ p["ws"][:CH].astype(jnp.bfloat16)
                + s.reshape(-1, CH) @ p["ws"][CH:].astype(jnp.bfloat16)
                + p["bs"].astype(jnp.bfloat16)).reshape(h2.shape)
        return skip + h2

    # correctness first
    a = concat_impl(p, h0, s0, temb, jax.random.PRNGKey(9))
    b2 = split_impl(p, h0, s0, temb, jax.random.PRNGKey(9))
    import numpy as np
    err = float(jnp.abs(a.astype(jnp.float32) - b2.astype(jnp.float32)).max())
    scale = float(jnp.abs(a.astype(jnp.float32)).max())
    print(json.dumps({"check_max_abs_err": err, "scale": scale}), flush=True)
    assert err < 0.05 * scale

    for label, fn in (("concat", concat_impl), ("split", split_impl)):
        def chained(repeats, fn=fn):
            @jax.jit
            def run(p, h, s, temb, seed):
                def body(c, key):
                    out = fn(p, h, s, temb, key)
                    return c + out.astype(jnp.float32).sum(), None
                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats)
                total, _ = jax.lax.scan(body, jnp.float32(0), keys)
                return total
            return lambda seed: float(run(p, h0, s0, temb, jnp.int32(seed)))
        sec = timed_delta(chained(1), chained(1 + CHAIN), 1 + CHAIN)
        print(json.dumps({"impl": label, "ms": round(sec * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
