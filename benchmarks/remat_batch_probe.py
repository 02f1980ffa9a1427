"""Remat batch-ceiling probe (real TPU).

For a production train step, find the largest batch that fits HBM with and
without per-block rematerialization (`remat` config knob), and the
throughput at each mode's ceiling. Run:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/remat_batch_probe.py [unet]

Default model is the DiT-b4 1024-token config; `unet` selects the
CheXpert-256 DWT-UNet (3-level 256/512/768 cross-attn, 128px/12ch input —
`/root/reference/experiments/chexpert-unet/train.py:118-138` arch).
"""

import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, __file__.rsplit("/", 1)[0])

from _timing import interleaved_deltas, median, seed_counter

CHAIN = 4
TRIALS = 5

_seed = seed_counter()


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.denoiser import Denoiser
    from diffusion_classifier_tpu.engine.state import (
        EmaConfig, init_train_state, make_optimizer,
    )
    from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step
    from diffusion_classifier_tpu.models.dit import DiT, DiTConfig
    from diffusion_classifier_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache("/tmp/dc_tpu_xla_cache")
    schedule_fn = make_schedule_fn("shifted_cosine", 64, 256)
    family = sys.argv[1] if len(sys.argv) > 1 else "dit"

    def build(remat):
        if family == "dit":
            net = Denoiser(
                backbone=DiT(
                    DiTConfig(
                        num_attention_heads=6, attention_head_dim=64,
                        in_channels=12, out_channels=12, num_layers=12,
                        sample_size=128, patch_size=4, num_classes=2,
                        attn_backend="auto", remat=remat,
                    ),
                    dtype=jnp.bfloat16,
                ),
                encoder=None,
            )
        else:
            from diffusion_classifier_tpu.models import (
                UNetCondition2D, UNetConfig,
            )
            from diffusion_classifier_tpu.models.encoders import ClassEmbedder

            net = Denoiser(
                backbone=UNetCondition2D(
                    UNetConfig(
                        sample_size=128, in_channels=12, out_channels=12,
                        layers_per_block=2,
                        block_out_channels=(256, 512, 768),
                        down_block_types=(
                            "DownBlock2D", "DownBlock2D",
                            "CrossAttnDownBlock2D",
                        ),
                        up_block_types=(
                            "CrossAttnUpBlock2D", "UpBlock2D", "UpBlock2D",
                        ),
                        mid_block_type="UNetMidBlock2DCrossAttn",
                        encoder_hid_dim=256,
                        encoder_hid_dim_type="text_proj",
                        cross_attention_dim=256,
                        remat=remat,
                    ),
                    dtype=jnp.bfloat16,
                ),
                encoder=ClassEmbedder(2, 256, dtype=jnp.bfloat16),
            )
        rng = jax.random.PRNGKey(0)
        x1 = jax.random.normal(rng, (2, 128, 128, 12))
        params = net.init(rng, x1, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32))
        apply_fn = lambda p, z, lg, lab: net.apply(p, z, lg, lab)
        loss_fn = make_loss_fn(apply_fn, schedule_fn, pred_param="v", null_token=2)
        tx = make_optimizer(1e-4, 10, 1000)
        state = init_train_state(params, tx)
        step = make_train_step(loss_fn, tx, EmaConfig())
        return state, step

    def try_batch(state, step, b):
        """Returns img/s at batch b, or None on OOM."""
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (b, 128, 128, 12), jnp.float32)
        ll = jnp.zeros((b,), jnp.int32)

        def chained(repeats):
            @jax.jit
            def run(state, xx, ll, seed):
                def body(carry, key):
                    st, acc = carry
                    st, loss = step(st, xx, ll, key)
                    return (st, acc + loss), None

                keys = jax.random.split(
                    jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
                )
                (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)), keys)
                return acc

            return lambda seed: float(run(state, x, ll, jnp.int32(seed)))

        try:
            f1, fR = chained(1), chained(1 + CHAIN)
            f1(next(_seed)), fR(next(_seed))
            deltas = interleaved_deltas({"t": (f1, fR)}, CHAIN, TRIALS, _seed)
            return b / median(deltas["t"])
        except Exception as e:
            msg = str(e)
            # device OOM (RESOURCE_EXHAUSTED) or the relay's compile-time
            # variant ("Ran out of memory in memory space hbm" inside an
            # INTERNAL/HTTP-500 wrapper)
            if any(
                s in msg
                for s in (
                    "RESOURCE_EXHAUSTED",
                    "Ran out of memory",
                    "Out of memory",
                    "Exceeded hbm capacity",
                )
            ):
                return None
            raise

    batches = (64, 128, 256, 384, 512, 768) if family == "dit" else (
        16, 32, 64, 96, 128, 192, 256
    )
    # optional 2nd arg 'on'/'off': probe one mode per process — an OOM'd
    # attempt can leave the device heap fragmented for later builds
    modes = (False, True)
    if len(sys.argv) > 2:
        modes = (sys.argv[2] == "on",)
    for remat in modes:
        state, step = build(remat)
        best = None
        for b in batches:
            ips = try_batch(state, step, b)
            line = {"remat": remat, "batch": b,
                    "images_per_sec": round(ips, 1) if ips else None,
                    "fits": ips is not None}
            print(json.dumps(line), flush=True)
            if ips is None:
                break
            best = (b, ips)
        if best:
            print(json.dumps({"remat": remat, "max_batch": best[0],
                              "images_per_sec_at_max": round(best[1], 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
