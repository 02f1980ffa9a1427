"""Probe: lane-grouped flash backward at S=1024 (over the assumed budget).

Written when the router still assumed the g=2 sub-heads' [S, S] f32
intermediates were concurrently live under Mosaic's unrolling (the fused
forward's measured convention), which would put S=1024/d=64 at ~25 MB. The
probe force-compiled the lane-grouped layout at that shape and found the
BACKWARD's sub-heads schedule sequentially: it compiles, matches
bit-exactly, and ran 1.22-1.27× faster than the head-major layout — so the
lane-grouped layout was PROMOTED to the production route for g ≤ 2
(commit 6fcb470; `_flash_bwd` now takes this path itself, making the
"prod" vs "lane" comparison below a self-check rather than a contrast).

Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flash_bwd_lane1024_probe.py
"""

import functools
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from _timing import interleaved_deltas, median, seed_counter

CHAIN = 64
TRIALS = 7

_seed_counter = seed_counter()


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from diffusion_classifier_tpu.ops import flash_attention as fa

    shapes = [
        ("dit_s1024_h6_d64", 16, 1024, 6, 64),
        ("dit_s1024_h12_d64", 16, 1024, 12, 64),
    ]

    def lane_bwd(q, k, v, do):
        b, s, h, d = q.shape
        scale = 1.0 / (d**0.5)
        g = 128 // d
        hd = h * d
        qf, kf, vf, dof = (x.reshape(b, s, hd) for x in (q, k, v, do))
        spec = pl.BlockSpec(
            (1, s, g * d), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        outs = pl.pallas_call(
            functools.partial(fa._bwd_kernel_lanes, scale=scale, d=d),
            out_shape=[
                jax.ShapeDtypeStruct((b, s, hd), x.dtype) for x in (q, k, v)
            ],
            grid=(b, h // g),
            in_specs=[spec] * 4,
            out_specs=[spec] * 3,
            cost_estimate=fa._bwd_cost(b, s, h, d, q.dtype.itemsize),
        )(qf, kf, vf, dof)
        return tuple(o.reshape(b, s, h, d) for o in outs)

    for name, b, s, h, d in shapes:
        kq = jax.random.PRNGKey(7)
        q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        k, v, do = q * 0.5, q * 0.25, q * 0.125

        # compile check first — failure here is the expected outcome if the
        # concurrency assumption holds
        try:
            ref = jax.jit(fa._flash_bwd)(q, k, v, do)
            got = jax.jit(lane_bwd)(q, k, v, do)
            err = max(
                float(
                    jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32)).max()
                )
                for a, b_ in zip(got, ref)
            )
        except Exception as e:
            print(json.dumps({"shape": name, "compile": False,
                              "error": str(e)[:200]}), flush=True)
            continue

        results = {"shape": name, "compile": True, "max_abs_err_vs_prod": err}
        # interleaved paired rounds (benchmarks/_timing.py): one delta per
        # layout per round so one-sided relay drift cannot bias the ratio
        chains = {}
        for label, fn in (("prod", fa._flash_bwd), ("lane", lane_bwd)):
            def chained(repeats, fn=fn):
                @jax.jit
                def run(seed):
                    def body(carry, key):
                        qq = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
                        dq, dk, dv = fn(qq, qq * 0.5, qq * 0.25, qq * 0.125)
                        return carry + dq.astype(jnp.float32).sum(), None

                    keys = jax.random.split(
                        jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
                    )
                    tot, _ = jax.lax.scan(body, jnp.float32(0), keys)
                    return tot

                return lambda seed: float(run(jnp.int32(seed)))

            f1, fR = chained(1), chained(1 + CHAIN)
            f1(next(_seed_counter)), fR(next(_seed_counter))  # compile
            chains[label] = (f1, fR)
        deltas = interleaved_deltas(chains, CHAIN, TRIALS, _seed_counter)
        for label, ds in deltas.items():
            results[label + "_us"] = round(median(ds) * 1e6, 1)
        results["lane_vs_prod"] = round(results["prod_us"] / results["lane_us"], 2)
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
