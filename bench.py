"""Headline benchmark: ELBO classification throughput (images/sec/chip).

Primary metric (LAST line printed, driver contract): the framework's
production classify path — explicit prefix hoisting + class-chunked scoring
(`diffusion_classifier_tpu/diffusion/classify.py`) — against the
reference's execution model: one denoiser forward per (evaluation, class)
(`/root/reference/diffusion/diffusion_classifier.py:681-714`) rebuilt with
the SAME protocol on the SAME chip as an on-device scan. ``vs_baseline``
uses the faithful reconstruction (each per-class call recomputes the ENTIRE
network, as the reference's torch calls do — an optimization_barrier stops
XLA from granting the baseline our prefix sharing); the stricter round-1
variant where XLA LICM hoists the prefix for the baseline too is reported
alongside as ``vs_licm_hoisted_baseline``. Neither baseline pays the
reference's real per-call Python/host-dispatch latency. Both ratios carry a
``*_band`` [min, max] over interleaved paired trials so the verdict is
statistically resolved, not a single draw (VERDICT r2 "what's weak" §1).

Secondary metrics (earlier JSON lines), covering BASELINE.json's other
named configs (VERDICT r2 next-round §1):

- training-step images/sec, sampler steps/sec, B=1 latency (CIFAR UNet);
- staged-tournament classify img/s (the framework's real best operating
  point at CIFAR: 2 evals × 10 classes → 4 evals × top-3);
- CheXpert-256 DWT-UNet classify img/s + B=1 latency (arch
  `/root/reference/experiments/chexpert-unet/train.py:118-138`, binary
  classes, in-graph Haar DWT 256px→128px/12ch);
- CheXpert-256 DiT-b4 classify img/s (arch
  `/root/reference/experiments/chexpert-dit/train.py:116-134`, 1024 tokens
  — the config where `attn_backend='auto'` routes to the Pallas flash
  attention kernel);
- an MFU/roofline line for the headline classify program (XLA cost
  analysis ÷ measured time, VERDICT r2 next-round §7).

Timing methodology (this TPU is reached through a relay with ~30 ms
round-trip latency and duplicate-execution caching): each measured quantity
is computed from the DELTA between a 1-repeat and an R-repeat on-device
`lax.scan` chain with per-iteration RNG, ending in a scalar fetch — fixed
relay latency and dispatch cost cancel out.
"""

import itertools
import json
import sys
import time

sys.path.insert(0, ".")

# Headline operating point. Measured sweep (BASELINE.md round-3 operating
# point probe): at class_chunk=1 the chip peaks at B=64 (466-481 img/s vs
# 449-456 at B=32); B=128 regresses (~448) — the class-scan's weight-stream
# reuse window is exceeded and the per-iteration activations spill. The
# faithful/licm baseline ratios are unchanged at B=64 (bands exclude 1.0).
BATCH = 64
CLASSES = 10
EVALS = 4
CHAIN = 8  # extra repeats for the delta measurement
TRIALS = 5  # best-of for secondary lines; the relay jitter is the noise floor
HEADLINE_TRIALS = 10  # paired fused/baseline trials for the ratio band
HEADLINE_INNER = 2  # deltas per program per trial; min taken (relay noise is
# one-sided slow, so a single-delta trial can misorder a ratio by ~5%)
TRAIN_BATCH = 64
SAMPLER_BATCH = 32  # sampler line stays at B=32: steps/sec is batch-dependent
# and this keeps the metric comparable across rounds (BASELINE.md history)
SAMPLER_STEPS = 32

# CheXpert-256 lines (binary healthy-vs-sick, DWT path): heavier model, fewer
# trials / shorter chains keep the bench's wall time bounded
CX_BATCH = 16
CX_TRIALS = 3
CX_CHAIN = 4

# production classify knobs at this operating point (measured sweeps in
# BASELINE.md: a scan of per-class chunks with the prefix explicitly hoisted
# beats one giant megabatch)
CLASS_CHUNK = 1

# TPU v5e single-chip peaks for the roofline line (public spec: 197 TFLOP/s
# bf16, 819 GB/s HBM)
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9


_seed_counter = None


def _next_seed():
    """Globally unique measurement seed — unique within AND across bench
    processes (time-based start), so the relay's duplicate-execution cache
    can never short-circuit a repeated measurement of the same program."""
    global _seed_counter
    if _seed_counter is None:
        _seed_counter = itertools.count((int(time.time()) % 1_000_000) * 1_000)
    return next(_seed_counter)


def _deltas(fn1, fnR, repeats, trials):
    """Per-repeat seconds from (T_R − T_1)/(R−1), one value per trial."""
    out = []
    for _ in range(trials):
        s = _next_seed()
        t0 = time.perf_counter()
        fn1(s)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        fnR(s)
        tr = time.perf_counter() - t0
        out.append((tr - t1) / (repeats - 1))
    return out


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _roofline(metric, fn, args, sec):
    """One MFU/roofline JSON dict: XLA cost analysis of ``fn(*args)`` over a
    measured per-call time. ``fn`` must be the fully-unrolled program variant
    (XLA counts a lax.scan body ONCE, not times its trip count — analyzing
    the production scan would undercount); ``sec`` is the PRODUCTION
    program's measured time. Best-effort on the relay: any failure is
    reported in-line rather than raised."""
    import jax

    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_acc = float(cost.get("bytes accessed", 0.0))
        if flops > 0 and bytes_acc > 0 and sec > 0:
            achieved = flops / sec
            return {
                "metric": metric,
                "value": round(achieved / 1e12, 2),
                "unit": "TFLOP/s",
                "mfu_pct": round(100 * achieved / PEAK_FLOPS, 1),
                "arithmetic_intensity_flop_per_byte": round(
                    flops / bytes_acc, 1
                ),
                "ridge_flop_per_byte": round(PEAK_FLOPS / PEAK_HBM, 1),
            }
        return {"metric": metric, "value": None, "error": "zero cost analysis"}
    except Exception as e:  # cost analysis is best-effort on the relay
        return {"metric": metric, "value": None, "error": str(e)[:120]}


def _host_pipeline_line():
    """Host input-pipeline feed rate: 256px JPEG decode images/sec.

    Measures the production loader stack (`data/loader.py`: MapDataLoader
    with the multi-worker decode pool + background Prefetcher) on synthetic
    256px JPEGs through EXACTLY the CheXpert item path
    (`data/chexpert.py::CheXpertDataset.__getitem__`: PIL open → RGB →
    bilinear resize → [-1,1] float32). This is the rate the host can feed
    the chip — compare against the `*_train_images_per_sec` lines in the
    same bench run (VERDICT r3 missing #1 / weak #6: the chip demands
    413–3,067 img/s and nothing measured whether the host could deliver).
    Reported value is the pooled rate; the serial (num_workers=0) rate is
    included for the scaling story.
    """
    import os
    import shutil
    import tempfile

    import numpy as np

    try:
        from PIL import Image

        from diffusion_classifier_tpu.data.loader import (
            MapDataLoader,
            Prefetcher,
        )

        tmp = tempfile.mkdtemp(prefix="dc_tpu_jpeg_")
        try:
            n_files = 64
            rng = np.random.default_rng(0)
            paths = []
            for i in range(n_files):
                # smooth low-frequency content (decode cost like a real
                # radiograph, not the worst-case noise image)
                small = rng.integers(0, 256, (32, 32), dtype=np.uint8)
                img = Image.fromarray(small, "L").resize(
                    (256, 256), Image.BILINEAR
                )
                p = os.path.join(tmp, f"{i}.jpg")
                img.save(p, quality=90)
                paths.append(p)

            def load(i):
                img = Image.open(paths[i % n_files]).convert("RGB")
                img = img.resize((256, 256), Image.BILINEAR)
                arr = np.asarray(img, np.float32) / 255.0
                return (arr - 0.5) / 0.5, 0

            workers = min(16, os.cpu_count() or 1)

            def rate(w, n_items):
                loader = Prefetcher(
                    MapDataLoader(
                        n_items, load, 16, shuffle=False, num_workers=w
                    )
                )
                t0 = time.perf_counter()
                n = sum(len(b["prompt"]) for b in loader)
                return n / (time.perf_counter() - t0)

            rate(workers, 128)  # warm the page cache + pool
            serial = max(rate(0, 256) for _ in range(2))
            pooled = max(rate(workers, 1024) for _ in range(2))

            # real-data geometry: the reference's CheXpert scans are large
            # (~2800px) downsampled to 256 — measure a 2048px source with
            # and without fast_decode (reduced-scale libjpeg decode,
            # `data/loader.py::decode_image`)
            from diffusion_classifier_tpu.data.loader import decode_image

            big = os.path.join(tmp, "big.jpg")
            small = rng.integers(0, 256, (32, 32), dtype=np.uint8)
            Image.fromarray(small, "L").resize(
                (2048, 2048), Image.BILINEAR
            ).save(big, quality=92)

            def hires_rate(fast, n=48):
                t0 = time.perf_counter()
                for _ in range(n):
                    np.asarray(decode_image(big, 256, fast=fast))
                return n / (time.perf_counter() - t0)

            hires_rate(True), hires_rate(False)  # warm
            hires = max(hires_rate(False) for _ in range(2))
            hires_fast = max(hires_rate(True) for _ in range(2))
            return {
                "metric": "host_pipeline_images_per_sec",
                "value": round(pooled, 1),
                "unit": "images/sec",
                "serial_images_per_sec": round(serial, 1),
                "hires_2048px_images_per_sec": round(hires, 1),
                "hires_2048px_fast_decode_images_per_sec": round(
                    hires_fast, 1
                ),
                "num_workers": workers,
                "cpu_count": os.cpu_count(),
                "protocol": "256px JPEG decode, CheXpert item path",
            }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception as e:  # never block the TPU lines on a host issue
        return {
            "metric": "host_pipeline_images_per_sec",
            "value": None,
            "error": str(e)[:120],
        }


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    # host input-pipeline feed rate first: no TPU involved, lands even if
    # the remote compiler is slow
    print(json.dumps(_host_pipeline_line()), flush=True)

    # persistent compile cache: repeat bench runs skip the remote compiler
    # (does not affect measurements — the scan-delta excludes compile time)
    enable_compilation_cache("/tmp/dc_tpu_xla_cache")

    from __graft_entry__ import _flagship
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.process import bcast_right, pred_to_eps
    from diffusion_classifier_tpu.diffusion.sampler import make_sampler
    from diffusion_classifier_tpu.diffusion.schedule import (
        alpha_sigma,
        make_schedule_fn,
    )
    from diffusion_classifier_tpu.engine.state import (
        EmaConfig,
        init_train_state,
        make_optimizer,
    )
    from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step

    denoiser, size = _flagship()
    prod = denoiser

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, size, size, 3), minval=-1, maxval=1)
    labels = jnp.zeros((BATCH,), jnp.int32)
    params = denoiser.init(rng, x, jnp.zeros((BATCH,)), labels)
    schedule_fn = make_schedule_fn("shifted_cosine", 32, 32)
    apply_fn = lambda p, z, lg, lab: denoiser.apply(p, z, lg, lab)
    prod_apply = lambda p, z, lg, lab: prod.apply(p, z, lg, lab)
    encode_fn = lambda p, z, lg: prod.apply(p, z, lg, None, mode="encode")
    tail_fn = lambda p, s, lab: prod.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )

    def chained(fn, repeats, pp, xx, ll):
        # params/x/labels must be ARGUMENTS of the jitted chain — closing over
        # them would inline the weights as HLO constants and blow the remote
        # compiler's request size limit.
        @jax.jit
        def run(pp, xx, ll, seed):
            def body(carry, key):
                return carry + fn(pp, xx, ll, key).astype(jnp.int32).sum(), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
            )
            total, _ = jax.lax.scan(body, jnp.int32(0), keys)
            return total

        return lambda seed: int(run(pp, xx, ll, jnp.int32(seed)))

    def measure(
        fn, pp=params, xx=x, ll=labels, chain=CHAIN, trials=TRIALS,
        reduce=min,
    ):
        # sub-10ms calls need a longer chain: the delta must dominate the
        # relay's run-to-run latency jitter. ``reduce`` picks the statistic:
        # min (throughput lines — relay noise is one-sided slow) or _median
        # (the p50 latency lines).
        f1 = chained(fn, 1, pp, xx, ll)
        fR = chained(fn, 1 + chain, pp, xx, ll)
        f1(_next_seed()), fR(_next_seed())  # compile both
        return reduce(_deltas(f1, fR, 1 + chain, trials))

    # ---- secondary: training step (fwd+bwd+clip+Adam+EMA) ----
    loss_fn = make_loss_fn(
        apply_fn, schedule_fn, pred_param="v", null_token=CLASSES
    )
    tx = make_optimizer(1e-4, 10, 1000)
    state = init_train_state(params, tx)
    step = make_train_step(loss_fn, tx, EmaConfig())
    xt = jax.random.uniform(
        rng, (TRAIN_BATCH, size, size, 3), minval=-1, maxval=1
    )
    lt = jnp.zeros((TRAIN_BATCH,), jnp.int32)

    def chained_train(repeats):
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

        return lambda seed: float(run(state, xt, lt, jnp.int32(seed)))

    t1, tR = chained_train(1), chained_train(1 + CHAIN)
    t1(_next_seed()), tR(_next_seed())
    train_sec = min(_deltas(t1, tR, 1 + CHAIN, TRIALS))
    print(
        json.dumps(
            {
                "metric": "train_step_images_per_sec",
                "value": round(TRAIN_BATCH / train_sec, 3),
                "unit": "images/sec",
            }
        ),
        flush=True,
    )

    # ---- secondary: ancestral sampler steps/sec (CFG pair fused) ----
    sampler = make_sampler(
        prod_apply,
        schedule_fn,
        pred_param="v",
        cfg_w=0.1,
        null_token=CLASSES,
        sampling_steps=SAMPLER_STEPS,
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )

    def sample_fn(params, xx, ll, key):
        return sampler(params, xx, ll, key).astype(jnp.int32).sum(
            axis=(1, 2, 3)
        )

    sample_sec = measure(
        sample_fn, xx=x[:SAMPLER_BATCH], ll=labels[:SAMPLER_BATCH]
    )
    print(
        json.dumps(
            {
                "metric": "sampler_steps_per_sec",
                "value": round(SAMPLER_STEPS / sample_sec, 3),
                "unit": "steps/sec",
                "batch": SAMPLER_BATCH,
            }
        ),
        flush=True,
    )

    # ---- production classify (fused tournament) ----
    classify = make_classifier(
        prod_apply,
        schedule_fn,
        pred_param="v",
        num_classes=CLASSES,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        class_chunk=CLASS_CHUNK,
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )

    # secondary: B=1 serving latency — the one-giant-megabatch formulation
    # wins at B=1 (a class-chunk scan would leave the chip nearly idle)
    classify_b1 = make_classifier(
        prod_apply,
        schedule_fn,
        pred_param="v",
        num_classes=CLASSES,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )
    lat_sec = measure(classify_b1, xx=x[:1], ll=labels[:1], chain=32)
    print(
        json.dumps(
            {
                "metric": "classify_b1_latency_ms",
                "value": round(lat_sec * 1e3, 3),
                "unit": "ms",
            }
        ),
        flush=True,
    )

    # secondary: staged tournament — the framework's best full-protocol
    # operating point (reference stage pruning `:717-721` as fixed shapes)
    classify_staged = make_classifier(
        prod_apply,
        schedule_fn,
        pred_param="v",
        num_classes=CLASSES,
        n_stages=2,
        evaluation_per_stage=(2, 6),
        n_keep_per_stage=(3, 1),
        class_chunk=CLASS_CHUNK,
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )
    staged_sec = measure(classify_staged)
    print(
        json.dumps(
            {
                "metric": "elbo_classify_staged_images_per_sec",
                "value": round(BATCH / staged_sec, 3),
                "unit": "images/sec",
                "protocol": "2 evals x 10 classes -> 4 evals x top-3",
            }
        ),
        flush=True,
    )

    # ---- reference execution model: per-(eval, class) forwards, on-device ----
    # `faithful=True` reconstructs the reference's actual cost model: every
    # per-class call recomputes the ENTIRE network (`:695-704`) — an
    # iteration-dependent optimization_barrier stops XLA from hoisting the
    # class-independent prefix out of the class scan, an optimization the
    # host-driven torch loop cannot perform. `faithful=False` keeps round 1's
    # deliberately over-strict variant where XLA's LICM grants the baseline
    # our own prefix sharing (reported as vs_licm_hoisted_baseline).
    def make_sequential(faithful):
        def sequential_fn(params, x, labels, key):
            del labels

            def eval_body(total, key):
                k_t, k_eps = jax.random.split(key)
                t = jax.random.uniform(k_t, (BATCH,))
                logsnr = schedule_fn(t)
                a, s = alpha_sigma(logsnr)
                eps = jax.random.normal(k_eps, x.shape)
                z = bcast_right(a, 4) * x + bcast_right(s, 4) * eps

                def class_body(errs, c):
                    if faithful:
                        z_c, lg_c = jax.lax.optimization_barrier(
                            (z + 0.0 * c.astype(z.dtype), logsnr)
                        )
                    else:
                        z_c, lg_c = z, logsnr
                    lab_c = jnp.full((BATCH,), c, jnp.int32)
                    pred = apply_fn(params, z_c, lg_c, lab_c)  # batch B fwd
                    eps_pred = pred_to_eps(pred, z_c, a, s, "v")
                    err = jnp.sum((eps_pred - eps) ** 2, axis=(1, 2, 3))
                    return errs.at[:, c].set(err), None

                errs, _ = jax.lax.scan(
                    class_body, jnp.zeros((BATCH, CLASSES)), jnp.arange(CLASSES)
                )
                return total + errs, None

            keys = jax.random.split(key, EVALS)
            total, _ = jax.lax.scan(eval_body, jnp.zeros((BATCH, CLASSES)), keys)
            return jnp.argmin(total, axis=1)

        return sequential_fn

    # Interleaved paired trials: one (fused, faithful, licm) triple per trial
    # so slow relay drift hits all three programs alike; the reported band is
    # min/max of the per-trial ratios (VERDICT r2: resolve the 1.01-1.08
    # jitter band instead of reporting a point inside it).
    progs = {}
    for name, fn in (
        ("fused", classify),
        ("faithful", make_sequential(True)),
        ("licm", make_sequential(False)),
    ):
        f1 = chained(fn, 1, params, x, labels)
        fR = chained(fn, 1 + CHAIN, params, x, labels)
        f1(_next_seed()), fR(_next_seed())  # compile
        progs[name] = (f1, fR)
    series = {name: [] for name in progs}
    for i in range(HEADLINE_TRIALS):
        for name, (f1, fR) in progs.items():
            series[name].append(
                min(_deltas(f1, fR, 1 + CHAIN, HEADLINE_INNER))
            )

    fused_med = _median(series["fused"])
    ratios_faithful = sorted(
        f / g for f, g in zip(series["faithful"], series["fused"])
    )
    ratios_licm = sorted(
        f / g for f, g in zip(series["licm"], series["fused"])
    )

    # ---- roofline: XLA cost analysis of ONE fused classify call ----
    # Flop/byte counts come from the fully-unrolled megabatch variant
    # (eval_group=EVALS, no class chunking): the math is identical to the
    # production program for any schedule knobs, but XLA's cost analysis
    # counts a lax.scan body ONCE, not times its trip count — analyzing the
    # production class-chunk scan undercounts ~(evals x chunks)x. Time is
    # the production program's measured median.
    classify_flat = make_classifier(
        prod_apply,
        schedule_fn,
        pred_param="v",
        num_classes=CLASSES,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        eval_group=EVALS,
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )
    # intensity note: the unrolled variant's byte count — the production
    # scan streams fewer distinct bytes, so this is a lower bound on locality
    print(
        json.dumps(
            _roofline(
                "classify_achieved_tflops",
                classify_flat,
                (params, x, labels, jax.random.PRNGKey(0)),
                fused_med,
            )
        ),
        flush=True,
    )

    # ---- CheXpert-256 DWT-UNet + DiT-b4 lines (BASELINE.json config #2/#3) --
    for line in _chexpert_lines(measure):
        print(json.dumps(line), flush=True)

    # ---- IPMSA DWT-UNet + OOD sweep lines (BASELINE.json config #4/#5) ----
    for line in _ipmsa_ood_lines(measure):
        print(json.dumps(line), flush=True)

    # ---- headline (LAST line, driver contract) ----
    print(
        json.dumps(
            {
                "metric": "elbo_classify_images_per_sec",
                "value": round(BATCH / fused_med, 3),
                "unit": "images/sec",
                "vs_baseline": round(_median(ratios_faithful), 3),
                "vs_baseline_band": [
                    round(ratios_faithful[0], 3),
                    round(ratios_faithful[-1], 3),
                ],
                "vs_licm_hoisted_baseline": round(_median(ratios_licm), 3),
                "vs_licm_band": [
                    round(ratios_licm[0], 3),
                    round(ratios_licm[-1], 3),
                ],
                "trials": HEADLINE_TRIALS,
            }
        ),
        flush=True,
    )


def _chexpert_lines(measure):
    """Measure BASELINE.json's CheXpert-256 configs; yields JSON dicts.

    Both configs run the production engine path: in-graph Haar DWT
    (256px/3ch → 128px/12ch, engine `_prepare_batch` parity) feeding the
    classify tournament with the binary healthy-vs-sick protocol
    (`/root/reference/experiments/chexpert-unet/train.py:118-138`,
    `/root/reference/experiments/chexpert-dit/train.py:116-134`).
    """
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.denoiser import Denoiser
    from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
    from diffusion_classifier_tpu.models.dit import DiT, DiTConfig
    from diffusion_classifier_tpu.models.encoders import ClassEmbedder
    from diffusion_classifier_tpu.ops.wavelet import haar_dwt2

    rng = jax.random.PRNGKey(0)
    # raw 256px images; the DWT runs inside the measured program (engine
    # parity: every image entering the engine is decomposed on device)
    x_raw = jax.random.uniform(
        rng, (CX_BATCH, 256, 256, 3), minval=-1, maxval=1
    )
    labels = jnp.zeros((CX_BATCH,), jnp.int32)
    # engine schedule parity: shift uses the PRE-DWT image size (engine
    # `diffusion_classifier.py:83-85` passes config.image_size=256, noise_d=64)
    schedule_fn = make_schedule_fn("shifted_cosine", 64, 256)
    dwt = lambda img: haar_dwt2(img) / 2.0

    # -- CheXpert-256 DWT-UNet (3-level 256/512/768, cross-attn 256) --
    unet = Denoiser(
        backbone=UNetCondition2D(
            UNetConfig(
                sample_size=128,
                in_channels=12,
                out_channels=12,
                layers_per_block=2,
                block_out_channels=(256, 512, 768),
                down_block_types=(
                    "DownBlock2D", "DownBlock2D", "CrossAttnDownBlock2D",
                ),
                up_block_types=(
                    "CrossAttnUpBlock2D", "UpBlock2D", "UpBlock2D",
                ),
                mid_block_type="UNetMidBlock2DCrossAttn",
                encoder_hid_dim=256,
                encoder_hid_dim_type="text_proj",
                cross_attention_dim=256,
            ),
            dtype=jnp.bfloat16,
        ),
        encoder=ClassEmbedder(2, 256, dtype=jnp.bfloat16),
    )
    x0 = dwt(x_raw)
    params = unet.init(rng, x0, jnp.zeros((CX_BATCH,)), labels)
    apply_fn = lambda p, z, lg, lab: unet.apply(p, z, lg, lab)
    encode_fn = lambda p, z, lg: unet.apply(p, z, lg, None, mode="encode")
    tail_fn = lambda p, s, lab: unet.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )

    def cx_classify(b):
        inner = make_classifier(
            apply_fn,
            schedule_fn,
            pred_param="v",
            num_classes=2,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
            class_chunk=CLASS_CHUNK if b > 1 else 0,
            encode_fn=encode_fn,
            tail_fn=tail_fn,
        )
        # in-graph DWT + tournament = the engine's production program
        return lambda p, xx, ll, key: inner(p, dwt(xx), ll, key)

    sec = measure(
        cx_classify(CX_BATCH), pp=params, xx=x_raw, ll=labels,
        chain=CX_CHAIN, trials=CX_TRIALS,
    )
    yield {
        "metric": "chexpert_unet_dwt_classify_images_per_sec",
        "value": round(CX_BATCH / sec, 3),
        "unit": "images/sec",
        "protocol": f"binary, {EVALS} evals, 256px DWT->128px/12ch",
    }

    # roofline for the DWT-UNet line (same method as the headline's: cost-
    # analyze the fully-unrolled variant since XLA counts a scan body once;
    # time the production class-chunked program)
    unet_flat = make_classifier(
        apply_fn,
        schedule_fn,
        pred_param="v",
        num_classes=2,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        eval_group=EVALS,
        class_chunk=0,
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )
    yield _roofline(
        "chexpert_unet_dwt_achieved_tflops",
        lambda p, xx, ll, key: unet_flat(p, dwt(xx), ll, key),
        (params, x_raw, labels, jax.random.PRNGKey(0)),
        sec,
    )
    lat = measure(
        cx_classify(1), pp=params, xx=x_raw[:1], ll=labels[:1],
        chain=8, trials=CX_TRIALS,
    )
    yield {
        "metric": "chexpert_unet_dwt_classify_b1_latency_ms",
        "value": round(lat * 1e3, 3),
        "unit": "ms",
    }

    # -- CheXpert-256 DiT-b4 (384 wide, 12 layers, patch 4 → 1024 tokens;
    #    attn_backend='auto' routes to the Pallas flash-attention kernel) --
    dit = Denoiser(
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
                attn_backend="auto",
            ),
            dtype=jnp.bfloat16,
        ),
        encoder=None,  # encoder_type='DiT': labels feed the AdaLN class table
    )
    dit_params = dit.init(rng, x0, jnp.zeros((CX_BATCH,)), labels)
    dit_apply = lambda p, z, lg, lab: dit.apply(p, z, lg, lab)
    dit_inner = make_classifier(
        dit_apply,
        schedule_fn,
        pred_param="v",
        num_classes=2,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        class_chunk=CLASS_CHUNK,
        # At K=2 the class scan has only two iterations: unrolling them (and
        # pairs of eval chunks) removes while-loop back-edges XLA cannot
        # schedule across — 228.7 → 245.3 img/s measured
        # (benchmarks/scan_unroll_probe.py; BASELINE.md round 4). The
        # 10-class headline LOSES with unrolling (467 → 437), so this stays
        # per-config, not an auto default.
        scan_unroll=2,
    )
    dit_fn = lambda p, xx, ll, key: dit_inner(p, dwt(xx), ll, key)
    sec = measure(
        dit_fn, pp=dit_params, xx=x_raw, ll=labels,
        chain=CX_CHAIN, trials=CX_TRIALS,
    )
    yield {
        "metric": "chexpert_dit_b4_classify_images_per_sec",
        "value": round(CX_BATCH / sec, 3),
        "unit": "images/sec",
        "protocol": f"binary, {EVALS} evals, 1024 tokens, pallas flash attn",
    }

    # roofline for the DiT line (same method as the headline's: cost-analyze
    # the fully-unrolled variant — XLA counts a scan body once, so the
    # production class-chunk scan would undercount — time the production
    # program; the flash kernel's flops enter via its pl.CostEstimate)
    dit_flat = make_classifier(
        dit_apply,
        schedule_fn,
        pred_param="v",
        num_classes=2,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        eval_group=EVALS,
        class_chunk=0,
    )
    yield _roofline(
        "chexpert_dit_b4_achieved_tflops",
        lambda p, xx, ll, key: dit_flat(p, dwt(xx), ll, key),
        (dit_params, x_raw, labels, jax.random.PRNGKey(0)),
        sec,
    )

    # -- DiT-b4 train step (fwd+bwd+clip+Adam+EMA): the config where BOTH
    #    pallas flash-attention kernels fire — the fused-heads forward and
    #    the lane-grouped (batch, head-pair)-gridded backward
    #    (`ops/flash_attention.py`) --
    from diffusion_classifier_tpu.engine.state import (
        EmaConfig,
        init_train_state,
        make_optimizer,
    )
    from diffusion_classifier_tpu.engine.steps import make_loss_fn, make_train_step

    dit_loss = make_loss_fn(dit_apply, schedule_fn, pred_param="v", null_token=2)
    tx = make_optimizer(1e-4, 10, 1000)
    dit_state = init_train_state(dit_params, tx)
    dit_step = make_train_step(dit_loss, tx, EmaConfig())

    def chained_train(repeats):
        @jax.jit
        def run(state, xx, ll, seed):
            def body(carry, key):
                st, acc = carry
                st, loss = dit_step(st, xx, ll, key)
                return (st, acc + loss), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), seed), repeats
            )
            (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)), keys)
            return acc

        return lambda seed: float(run(dit_state, x0, labels, jnp.int32(seed)))

    t1, tR = chained_train(1), chained_train(1 + CX_CHAIN)
    t1(_next_seed()), tR(_next_seed())
    sec = min(_deltas(t1, tR, 1 + CX_CHAIN, CX_TRIALS))
    yield {
        "metric": "chexpert_dit_b4_train_images_per_sec",
        "value": round(CX_BATCH / sec, 3),
        "unit": "images/sec",
        "protocol": "1024 tokens, pallas flash fwd+bwd",
    }


def _ipmsa_ood_lines(measure):
    """BASELINE.json configs #4 and #5 (VERDICT r3 next-round §6).

    (#4) IPMSA 5-slice DWT-UNet classify images/sec on synthetic volumes:
    the reference arch `/root/reference/models/ipmsa-5-dwt-unet.py` (5-level
    128/128/256/512/768 UNet, layers (2,2,2,4,2), 40 = 10·4 DWT channels,
    cross-attn 512), binary future-activity protocol, in-graph Haar DWT of
    [256, 256, 10] volumes.

    (#5) OOD-sweep p50 classify latency per dataset through each dataset's
    reference evaluation geometry (`data/ood.py`): MIMIC and PadChest at
    64px (the intentional resolution-mismatch stress vs 256px training),
    ISIC at 256px — one B=1 line each, scored by the CheXpert-256 DWT-UNet
    (`experiments/chexpert-unet/ood.py` flow). Latency content-independent:
    synthetic pixels, real program.
    """
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
    from diffusion_classifier_tpu.engine.denoiser import Denoiser
    from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
    from diffusion_classifier_tpu.models.encoders import ClassEmbedder
    from diffusion_classifier_tpu.ops.wavelet import haar_dwt2

    rng = jax.random.PRNGKey(0)
    dwt = lambda img: haar_dwt2(img) / 2.0

    # -- (#4) IPMSA 5-slice DWT-UNet --
    IP_BATCH = 8
    x_raw = jax.random.uniform(
        rng, (IP_BATCH, 256, 256, 10), minval=-1, maxval=1
    )
    labels = jnp.zeros((IP_BATCH,), jnp.int32)
    schedule_fn = make_schedule_fn("shifted_cosine", 64, 256)
    unet = Denoiser(
        backbone=UNetCondition2D(
            UNetConfig(
                sample_size=128,
                in_channels=40,
                out_channels=40,
                layers_per_block=(2, 2, 2, 4, 2),
                block_out_channels=(128, 128, 256, 512, 768),
                down_block_types=(
                    "DownBlock2D", "DownBlock2D", "DownBlock2D",
                    "CrossAttnDownBlock2D", "DownBlock2D",
                ),
                up_block_types=(
                    "UpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D",
                    "UpBlock2D", "UpBlock2D",
                ),
                mid_block_type="UNetMidBlock2DCrossAttn",
                encoder_hid_dim=512,
                encoder_hid_dim_type="text_proj",
                cross_attention_dim=512,
            ),
            dtype=jnp.bfloat16,
        ),
        encoder=ClassEmbedder(2, 512, dtype=jnp.bfloat16),
    )
    x0 = dwt(x_raw)
    params = unet.init(rng, x0, jnp.zeros((IP_BATCH,)), labels)
    apply_fn = lambda p, z, lg, lab: unet.apply(p, z, lg, lab)
    encode_fn = lambda p, z, lg: unet.apply(p, z, lg, None, mode="encode")
    tail_fn = lambda p, s, lab: unet.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )
    inner = make_classifier(
        apply_fn,
        schedule_fn,
        pred_param="v",
        num_classes=2,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        class_chunk=CLASS_CHUNK,
        encode_fn=encode_fn,
        tail_fn=tail_fn,
    )
    ip_fn = lambda p, xx, ll, key: inner(p, dwt(xx), ll, key)
    sec = measure(
        ip_fn, pp=params, xx=x_raw, ll=labels, chain=CX_CHAIN,
        trials=CX_TRIALS,
    )
    yield {
        "metric": "ipmsa_dwt_unet_classify_images_per_sec",
        "value": round(IP_BATCH / sec, 3),
        "unit": "images/sec",
        "protocol": f"binary, {EVALS} evals, 256px/10ch DWT->128px/40ch",
    }
    del params, x_raw, x0  # free the ~130M-param tree before the next model

    # -- (#5) OOD sweep p50 latency: CheXpert-256 DWT-UNet scoring each
    #    dataset at its reference evaluation geometry --
    cx = Denoiser(
        backbone=UNetCondition2D(
            UNetConfig(
                sample_size=128,
                in_channels=12,
                out_channels=12,
                layers_per_block=2,
                block_out_channels=(256, 512, 768),
                down_block_types=(
                    "DownBlock2D", "DownBlock2D", "CrossAttnDownBlock2D",
                ),
                up_block_types=(
                    "CrossAttnUpBlock2D", "UpBlock2D", "UpBlock2D",
                ),
                mid_block_type="UNetMidBlock2DCrossAttn",
                encoder_hid_dim=256,
                encoder_hid_dim_type="text_proj",
                cross_attention_dim=256,
            ),
            dtype=jnp.bfloat16,
        ),
        encoder=ClassEmbedder(2, 256, dtype=jnp.bfloat16),
    )
    # conv UNet params are size-independent: one init serves every geometry
    x64 = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    cx_params = cx.init(
        rng, dwt(x64), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32)
    )
    cx_apply = lambda p, z, lg, lab: cx.apply(p, z, lg, lab)
    cx_encode = lambda p, z, lg: cx.apply(p, z, lg, None, mode="encode")
    cx_tail = lambda p, s, lab: cx.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )
    cx_inner = make_classifier(
        cx_apply,
        schedule_fn,
        pred_param="v",
        num_classes=2,
        n_stages=1,
        evaluation_per_stage=(EVALS,),
        n_keep_per_stage=(1,),
        encode_fn=cx_encode,
        tail_fn=cx_tail,
    )
    cx_fn = lambda p, xx, ll, key: cx_inner(p, dwt(xx), ll, key)
    lab1 = jnp.zeros((1,), jnp.int32)
    for name, size in (("mimic", 64), ("padchest", 64), ("isic", 256)):
        xb = jax.random.uniform(rng, (1, size, size, 3), minval=-1, maxval=1)
        sec = measure(
            cx_fn, pp=cx_params, xx=xb, ll=lab1, chain=8,
            trials=CX_TRIALS, reduce=_median,
        )
        yield {
            "metric": f"ood_{name}_classify_b1_latency_p50_ms",
            "value": round(sec * 1e3, 3),
            "unit": "ms",
            "protocol": f"{size}px eval geometry, chexpert DWT-UNet",
        }


if __name__ == "__main__":
    main()
