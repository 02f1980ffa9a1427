"""Probe: where does the DiT-b4 classify forward spend its time?

VERDICT r3 weak #1: the DiT-b4 classify line runs at 58.7% MFU — worst of
the three flagship configs — at ~65% of its own bandwidth roofline. Before
touching anything, decompose the program (scan-delta timing, chip
otherwise idle):

1. full classify program (production: B=16, binary, 4 evals, cc=1);
2. one denoiser forward at the megabatch shape (B=16, 1024 tokens);
3. attention-only: the 12 flash-attention calls at the block shape;
4. denses-only: the DiT forward with attention replaced by identity
   (costs the same HBM traffic at the boundary minus the kernel);
5. the same forward with attn_backend='xla' for contrast.

From (1)-(2): protocol overhead (noising/RNG/DWT/scatter/scan) = (1) − 8·(2).
From (3)-(4): the attention/dense split inside a forward.
"""

import json
import sys
import time

sys.path.insert(0, ".")

CHAIN = 8
TRIALS = 3
B = 16


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.denoiser import Denoiser
    from diffusion_classifier_tpu.models.dit import DiT, DiTConfig
    from diffusion_classifier_tpu.ops.flash_attention import flash_attention
    from diffusion_classifier_tpu.ops.wavelet import haar_dwt2
    from diffusion_classifier_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    enable_compilation_cache("/tmp/dc_tpu_xla_cache")
    rng = jax.random.PRNGKey(0)
    x_raw = jax.random.uniform(rng, (B, 256, 256, 3), minval=-1, maxval=1)
    labels = jnp.zeros((B,), jnp.int32)
    schedule_fn = make_schedule_fn("shifted_cosine", 64, 256)
    dwt = lambda img: haar_dwt2(img) / 2.0

    def make_dit(backend):
        return Denoiser(
            backbone=DiT(
                DiTConfig(
                    num_attention_heads=6,
                    attention_head_dim=64,
                    in_channels=12,
                    out_channels=12,
                    num_layers=12,
                    sample_size=128,
                    patch_size=4,
                    num_classes=2,
                    attn_backend=backend,
                ),
                dtype=jnp.bfloat16,
            ),
            encoder=None,
        )

    dit = make_dit("auto")
    x0 = dwt(x_raw)
    params = dit.init(rng, x0, jnp.zeros((B,)), labels)

    def chained(fn, repeats, pp, xx, ll):
        @jax.jit
        def run(pp, xx, ll, seed):
            def body(carry, key):
                return carry + fn(pp, xx, ll, key), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
            )
            total, _ = jax.lax.scan(body, jnp.float32(0), keys)
            return total

        return lambda seed: float(run(pp, xx, ll, jnp.int32(seed)))

    def measure(fn, pp, xx, ll, chain=CHAIN, trials=TRIALS):
        f1 = chained(fn, 1, pp, xx, ll)
        fR = chained(fn, 1 + chain, pp, xx, ll)
        f1(bench._next_seed()), fR(bench._next_seed())
        return min(bench._deltas(f1, fR, 1 + chain, trials))

    out = {}

    # 1. full production classify
    inner = make_classifier(
        lambda p, z, lg, lab: dit.apply(p, z, lg, lab),
        schedule_fn,
        pred_param="v",
        num_classes=2,
        n_stages=1,
        evaluation_per_stage=(4,),
        n_keep_per_stage=(1,),
        class_chunk=1,
    )
    cls_fn = lambda p, xx, ll, key: inner(p, dwt(xx), ll, key).astype(
        jnp.float32
    ).sum()
    out["classify_ms"] = measure(cls_fn, params, x_raw, labels) * 1e3

    # 2. one denoiser forward at the megabatch shape (per-iteration RNG noise
    #    so the relay never dedupes)
    def fwd(p, xx, ll, key):
        z = jax.random.normal(key, x0.shape, x0.dtype)
        lg = jax.random.uniform(key, (B,))
        return dit.apply(p, z, lg, ll).astype(jnp.float32).sum()

    out["forward_ms"] = measure(fwd, params, x0, labels) * 1e3

    # 5. forward with XLA attention
    dit_x = make_dit("xla")

    def fwd_x(p, xx, ll, key):
        z = jax.random.normal(key, x0.shape, x0.dtype)
        lg = jax.random.uniform(key, (B,))
        return dit_x.apply(p, z, lg, ll).astype(jnp.float32).sum()

    out["forward_xla_attn_ms"] = measure(fwd_x, params, x0, labels) * 1e3

    # 3. attention-only: 12 chained flash calls at the block shape
    def attn_only(p, xx, ll, key):
        del p, ll
        q = jax.random.normal(key, (B, 1024, 6, 64), jnp.bfloat16)
        h = q

        def body(h, _):
            return flash_attention(h, q, q), None

        h, _ = jax.lax.scan(body, h, None, length=12)
        return h.astype(jnp.float32).sum()

    out["attn12_ms"] = measure(attn_only, params, x0, labels) * 1e3

    # 12 XLA attention calls for the same shape
    def attn_only_xla(p, xx, ll, key):
        del p, ll
        q = jax.random.normal(key, (B, 1024, 6, 64), jnp.bfloat16)
        h = q

        def body(h, _):
            return jax.nn.dot_product_attention(h, q, q), None

        h, _ = jax.lax.scan(body, h, None, length=12)
        return h.astype(jnp.float32).sum()

    out["attn12_xla_ms"] = measure(attn_only_xla, params, x0, labels) * 1e3

    out["protocol_overhead_ms"] = out["classify_ms"] - 8 * out["forward_ms"]
    out["attn_share_of_forward"] = out["attn12_ms"] / out["forward_ms"]
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
