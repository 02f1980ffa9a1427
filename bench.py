"""Headline benchmark: ELBO classification throughput (images/sec/chip).

Primary metric (LAST line printed, driver contract): the framework's
production classify path — explicit prefix hoisting + class-chunked scoring
(`diffusion_classifier_tpu/diffusion/classify.py`) — against the
reference's execution model: one denoiser forward per (evaluation, class)
(`/root/reference/diffusion/diffusion_classifier.py:681-714`) rebuilt with
the SAME protocol on the SAME chip as an on-device loop. ``vs_baseline``
uses the faithful reconstruction (each per-class call recomputes the ENTIRE
network, as the reference's torch calls do — an optimization_barrier stops
XLA from granting the baseline our prefix sharing); the stricter round-1
variant where XLA LICM hoists the prefix for the baseline too is reported
alongside as ``vs_licm_hoisted_baseline``. Neither baseline pays the
reference's real per-call Python/host-dispatch latency. Both ratios carry a
``*_band`` [min, max] over interleaved paired trials so the verdict is
statistically resolved, not a single draw (VERDICT r2 "what's weak" §1).

Round-5 bench engineering (VERDICT r4 next-round §1/§4):

- **Deadline budget.** The round-4 driver run timed out (rc=124) before the
  headline printed. The bench now runs against a wall-clock budget
  (``BENCH_DEADLINE_S`` env, conservative default) with the headline ratio
  block measured FIRST (it is the contract) and every secondary block
  guarded: a block whose cost estimate exceeds the remaining budget emits
  ``{"metric": ..., "skipped": "deadline"}`` instead of running. The
  headline is ALWAYS the last line and the process always exits 0.
- **One compile per program.** Measurement chains take the repeat count as
  a runtime argument (`lax.fori_loop`), so the 1-repeat and R-repeat
  timings share a single executable — half the remote compiles of the
  round-4 scheme (which compiled separate 1- and R-length `lax.scan`
  chains). Model parameters are filled by one trivial on-device RNG
  program instead of the full flax `init` (another large remote compile
  per model; values are timing-irrelevant).
- **Contention awareness.** A calibrated host spin-probe samples dispatch
  jitter during the headline trials; a contended host (the round-4
  self-run corrupted its ratio band this way, vs_licm trials 0.72–1.12)
  widens the per-trial inner delta count and labels the headline JSON with
  ``contended: true`` + the observed jitter instead of silently emitting a
  garbage band.

Secondary metrics (earlier JSON lines), covering BASELINE.json's named
configs (VERDICT r2 next-round §1, r4 §2/§5/§6):

- training-step images/sec + roofline, sampler steps/sec, B=1 latency
  (CIFAR UNet); staged-tournament classify img/s; classify MFU roofline;
- CheXpert-256 DWT-UNet classify img/s + MFU + B=1 latency (arch
  `/root/reference/experiments/chexpert-unet/train.py:118-138`);
- CheXpert-256 DiT-b4 classify img/s + MFU + B=1 latency + train img/s +
  train roofline (arch
  `/root/reference/experiments/chexpert-dit/train.py:116-134`, 1024
  tokens — the config where both Pallas flash-attention kernels fire);
- IPMSA 5-slice DWT-UNet classify img/s; OOD p50 latency sweep.

Timing methodology (this TPU is reached through a relay with ~30 ms
round-trip latency and duplicate-execution caching): each measured quantity
is computed from the DELTA between a 1-repeat and an R-repeat on-device
chain with per-iteration RNG, ending in a scalar fetch — fixed relay
latency and dispatch cost cancel out.
"""

import itertools
import json
import os
import sys
import threading
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
# one-sided slow, so a single-delta trial can misorder a ratio by ~5%).
# Widened automatically on a contended host (see _spin_probe).
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

# Wall-clock budget (VERDICT r4 §1). The driver's round-4 run was killed by
# an external timeout somewhere past the ~25-minute (1500 s) mark; 1380 s
# keeps the whole bench — headline guaranteed — safely inside that even if
# the kill is at exactly 1500 s, while a warm persistent compile cache lets
# every line land in well under the budget. The round-5 calibration run
# (BASELINE.md) showed guard estimates alone cannot bound the total — a
# block admitted at T-est can overrun (elapsed 1521 s vs a 1500 s budget) —
# so a watchdog thread HARD-stops the process at the deadline: it prints
# the already-measured headline as the last line and exits 0.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1380"))
RESERVE_S = 60.0  # head-room kept for the final headline print
_T0 = time.monotonic()

# Set by main() the moment the headline ratio block completes; the watchdog
# and the normal exit path race to print it exactly once (_emit_headline).
_HEADLINE = None
_HEADLINE_PRINTED = False
_HEADLINE_LOCK = threading.Lock()


def _emit_headline(error=None):
    """Print the headline as the last line, exactly once (driver contract).
    Called from the watchdog (deadline), the normal end of main(), or the
    top-level exception handler — whichever comes first wins."""
    global _HEADLINE_PRINTED
    with _HEADLINE_LOCK:
        if _HEADLINE_PRINTED:
            return
        _HEADLINE_PRINTED = True
        line = _HEADLINE if _HEADLINE is not None else {
            "metric": "elbo_classify_images_per_sec",
            "value": None,
            "error": error or "deadline before the headline block completed",
        }
        line["elapsed_s"] = round(time.monotonic() - _T0, 1)
        # start on a fresh line: the main thread could be mid-print when the
        # watchdog fires, and the headline must parse as the last line
        sys.stdout.write("\n")
        emit(line)


def _start_watchdog():
    """Hard deadline: whatever block is mid-flight, the process prints the
    headline and exits 0 at DEADLINE_S - 2 s. Guards make overruns unlikely;
    the watchdog makes them survivable (an external kill after the deadline
    would otherwise leave the wrong line last, as in BENCH_r04)."""

    def _fire():
        time.sleep(max(1.0, DEADLINE_S - 2.0 - (time.monotonic() - _T0)))
        _emit_headline()
        sys.stdout.flush()
        os._exit(0)

    threading.Thread(target=_fire, daemon=True).start()


def _remaining():
    return DEADLINE_S - (time.monotonic() - _T0) - RESERVE_S


def emit(d):
    print(json.dumps(d), flush=True)


_seed_counter = None


def _next_seed():
    """Globally unique measurement seed — unique within AND across bench
    processes (time-based start), so the relay's duplicate-execution cache
    can never short-circuit a repeated measurement of the same program."""
    global _seed_counter
    if _seed_counter is None:
        _seed_counter = itertools.count((int(time.time()) % 1_000_000) * 1_000)
    return next(_seed_counter)


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


# ---------------------------------------------------------------------------
# host contention probe (VERDICT r4 next-round §4)
# ---------------------------------------------------------------------------

_SPIN_N = 200_000  # ~3-6 ms of pure-python arithmetic on this host class


def _spin_s():
    """Seconds for a fixed CPU-bound loop — dispatch-jitter proxy. The
    paired-ratio trials interleave host dispatch; when another process owns
    the core, this loop's wall time inflates the same way dispatch does."""
    t0 = time.perf_counter()
    x = 0
    for i in range(_SPIN_N):
        x += i
    return time.perf_counter() - t0


def _contention_stats(samples):
    s = sorted(samples)
    lo = s[0]
    p90 = s[min(len(s) - 1, int(0.9 * len(s)))]
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = -1.0
    contended = (p90 / lo > 2.0) or (load1 > 1.5)
    return {
        "contended": bool(contended),
        "spin_jitter_p90_over_min": round(p90 / lo, 2),
        "load1": round(load1, 2),
    }


# ---------------------------------------------------------------------------
# measurement harness: ONE compiled executable per program, repeat count as
# a runtime argument
# ---------------------------------------------------------------------------


def _aot_chain(fn, pp, xx, ll):
    """Compile one dynamic-repeat chain for ``fn(params, x, labels, key)``.

    Returns ``(call, compiled)`` where ``call(seed, repeats) -> int`` runs the
    chain on device and fetches a scalar, and ``compiled`` exposes
    ``cost_analysis()``. The repeat count is a runtime scalar
    (`lax.fori_loop`), so the 1-repeat and R-repeat timings of the
    scan-delta method share this single executable.
    """
    import jax
    import jax.numpy as jnp

    def run(pp, xx, ll, seed, repeats):
        base = jax.random.fold_in(jax.random.PRNGKey(0), seed)

        def body(i, acc):
            key = jax.random.fold_in(base, i)
            return acc + fn(pp, xx, ll, key).astype(jnp.int32).sum()

        return jax.lax.fori_loop(0, repeats, body, jnp.int32(0))

    compiled = (
        jax.jit(run).lower(pp, xx, ll, jnp.int32(0), jnp.int32(1)).compile()
    )

    def call(seed, repeats):
        return int(compiled(pp, xx, ll, jnp.int32(seed), jnp.int32(repeats)))

    return call, compiled


def _aot_train_chain(step, state, xx, ll):
    """Like :func:`_aot_chain` for a ``step(state, x, labels, key)`` train
    step: the loop carries the evolving TrainState + a loss accumulator."""
    import jax
    import jax.numpy as jnp

    def run(state, xx, ll, seed, repeats):
        base = jax.random.fold_in(jax.random.PRNGKey(0), seed)

        def body(i, carry):
            st, acc = carry
            st, loss = step(st, xx, ll, jax.random.fold_in(base, i))
            return (st, acc + loss)

        _, acc = jax.lax.fori_loop(0, repeats, body, (state, jnp.float32(0)))
        return acc

    compiled = (
        jax.jit(run)
        .lower(state, xx, ll, jnp.int32(0), jnp.int32(1))
        .compile()
    )

    def call(seed, repeats):
        return float(
            compiled(state, xx, ll, jnp.int32(seed), jnp.int32(repeats))
        )

    return call, compiled


def _deltas(call, chain, trials):
    """Per-repeat seconds from (T_{1+chain} − T_1)/chain, one per trial."""
    out = []
    for _ in range(trials):
        s = _next_seed()
        t0 = time.perf_counter()
        call(s, 1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        call(s, 1 + chain)
        tr = time.perf_counter() - t0
        out.append((tr - t1) / chain)
    return out


def _measure_call(call, chain=CHAIN, trials=TRIALS, reduce=min):
    """Warm both repeat counts once, then reduce the per-trial deltas.
    ``reduce``: min for throughput lines (relay noise is one-sided slow),
    _median for the p50 latency lines."""
    s = _next_seed()
    call(s, 1)
    call(_next_seed(), 1 + chain)
    return reduce(_deltas(call, chain, trials))


def _fast_params(init_fn, *args, scale=0.02):
    """Parameter pytree with init's shapes/dtypes from ONE on-device RNG
    fill (a single `normal` + slices — a trivial compile) instead of the
    full flax init program (a large remote compile per model). Benchmark
    timing is weight-value independent; only shapes/dtypes matter."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    shapes = jax.tree.map(
        lambda s: s, jax.eval_shape(init_fn, *args)
    )
    leaves, treedef = jax.tree.flatten(shapes)
    sizes = [int(np.prod(l.shape)) if l.shape else 1 for l in leaves]
    total = sum(sizes)

    @jax.jit
    def fill(seed):
        flat = scale * jax.random.normal(jax.random.PRNGKey(seed), (total,))
        outs, off = [], 0
        for l, n in zip(leaves, sizes):
            outs.append(flat[off : off + n].reshape(l.shape).astype(l.dtype))
            off += n
        return jax.tree.unflatten(treedef, outs)

    return fill(0)


def _roofline_from_cost(metric, cost, sec):
    """One MFU/roofline JSON dict from an XLA cost analysis + measured
    per-call seconds. Best-effort: any failure reported in-line."""
    try:
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_acc = float(cost.get("bytes accessed", 0.0))
        if flops > 0 and sec > 0:
            achieved = flops / sec
            d = {
                "metric": metric,
                "value": round(achieved / 1e12, 2),
                "unit": "TFLOP/s",
                "mfu_pct": round(100 * achieved / PEAK_FLOPS, 1),
                "ridge_flop_per_byte": round(PEAK_FLOPS / PEAK_HBM, 1),
            }
            if bytes_acc > 0:
                d["arithmetic_intensity_flop_per_byte"] = round(
                    flops / bytes_acc, 1
                )
            return d
        return {"metric": metric, "value": None, "error": "zero cost analysis"}
    except Exception as e:
        return {"metric": metric, "value": None, "error": str(e)[:120]}


def _roofline(metric, fn, args, sec):
    """Roofline via a fresh compile of the fully-unrolled program variant.
    ``fn`` must be unrolled (XLA counts a lax.scan body ONCE, not times its
    trip count — analyzing the production scan would undercount); ``sec`` is
    the PRODUCTION program's measured time."""
    import jax

    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        return _roofline_from_cost(metric, cost, sec)
    except Exception as e:  # cost analysis is best-effort on the relay
        return {"metric": metric, "value": None, "error": str(e)[:120]}


def _guard(est_s, metrics, fn):
    """Run ``fn`` if the remaining budget covers ``est_s``; otherwise emit a
    labeled skip line per metric (VERDICT r4 §1: explicit, not silent).
    Exceptions never kill the bench — the headline must still print."""
    if _remaining() < est_s:
        for m in metrics:
            emit({"metric": m, "value": None, "skipped": "deadline"})
        return
    try:
        fn()
    except Exception as e:
        for m in metrics:
            emit({"metric": m, "value": None, "error": str(e)[:160]})


# ---------------------------------------------------------------------------
# host input pipeline (no TPU involved)
# ---------------------------------------------------------------------------


def _host_pipeline_line():
    """Host input-pipeline feed rate: 256px JPEG decode images/sec.

    Measures the production loader stack (`data/loader.py`: MapDataLoader
    with the multi-worker decode pool + background Prefetcher) on synthetic
    256px JPEGs through EXACTLY the CheXpert item path
    (`data/chexpert.py::CheXpertDataset.__getitem__`: PIL open → RGB →
    bilinear resize → [-1,1] float32). This is the rate the host can feed
    the chip — compare against the `*_train_images_per_sec` lines in the
    same bench run. Reported value is the pooled rate; the serial
    (num_workers=0) rate, the real-CheXpert-geometry (2048px source) rates
    with and without `fast_decode`, and the decoded-sample-cache epoch rate
    (VERDICT r4 next-round §3) are included for the scaling story.
    """
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

            # decoded-sample cache: epoch-2+ feed rate once the first epoch
            # has paid the decode (VERDICT r4 §3 — the lever that breaks the
            # 1-core decode wall the way the reference's per-sample lz4
            # cache does, `/root/reference/dataset/ipmsa.py:174-197`)
            cached = None
            try:
                from diffusion_classifier_tpu.data.decode_cache import (
                    DecodeCache,
                )

                cache_dir = os.path.join(tmp, "decode_cache")
                cache = DecodeCache(cache_dir, size=256)

                def load_cached(i):
                    arr = cache.get_or_decode(paths[i % n_files])
                    arr = arr.astype(np.float32) / 255.0
                    return (arr - 0.5) / 0.5, 0

                def crate(n_items):
                    loader = Prefetcher(
                        MapDataLoader(
                            n_items, load_cached, 16,
                            shuffle=False, num_workers=0,
                        )
                    )
                    t0 = time.perf_counter()
                    n = sum(len(b["prompt"]) for b in loader)
                    return n / (time.perf_counter() - t0)

                crate(128)  # epoch 1: decode + populate
                cached = max(crate(1024) for _ in range(2))
                cache_err = None
            except Exception as e:  # label the drop, never hide it
                cached, cache_err = None, str(e)[:80]

            line = {
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
            if cached is not None:
                line["decode_cache_epoch_images_per_sec"] = round(cached, 1)
            elif cache_err is not None:
                line["decode_cache_error"] = cache_err
            return line
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception as e:  # never block the TPU lines on a host issue
        return {
            "metric": "host_pipeline_images_per_sec",
            "value": None,
            "error": str(e)[:120],
        }


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------


def main():
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    _start_watchdog()

    # host input-pipeline feed rate first: no TPU involved, lands even if
    # the remote compiler is slow
    emit(_host_pipeline_line())

    # persistent compile cache: repeat bench runs skip the remote compiler
    # (does not affect measurements — the chain-delta excludes compile time).
    # REPO-LOCAL by default: the driver executes bench.py inside this same
    # working tree, so a cache warmed by a builder-side validation run
    # survives into the driver's run even when its /tmp is fresh (the
    # round-4/5 cold-cache runs each paid ~20 min of compiles). Gitignored;
    # absent dir = plain cold run, the deadline guards handle it.
    cache_dir = os.environ.get(
        "BENCH_XLA_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache"),
    )
    enable_compilation_cache(cache_dir)

    from __graft_entry__ import _flagship
    from diffusion_classifier_tpu.diffusion.classify import make_classifier
    from diffusion_classifier_tpu.diffusion.process import (
        bcast_right,
        pred_to_eps,
    )
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
    from diffusion_classifier_tpu.engine.steps import (
        make_loss_fn,
        make_train_step,
    )

    denoiser, size = _flagship()

    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, size, size, 3), minval=-1, maxval=1)
    labels = jnp.zeros((BATCH,), jnp.int32)
    params = _fast_params(
        denoiser.init, rng, x, jnp.zeros((BATCH,)), labels
    )
    schedule_fn = make_schedule_fn("shifted_cosine", 32, 32)
    apply_fn = lambda p, z, lg, lab: denoiser.apply(p, z, lg, lab)
    encode_fn = lambda p, z, lg: denoiser.apply(p, z, lg, None, mode="encode")
    tail_fn = lambda p, s, lab: denoiser.apply(
        p, None, None, lab, mode="tail", prefix_state=s
    )

    # ---- headline ratio block FIRST (it is the driver contract) ----
    classify = make_classifier(
        apply_fn,
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

    # reference execution model: per-(eval, class) forwards, on-device.
    # `faithful=True` reconstructs the reference's actual cost model: every
    # per-class call recomputes the ENTIRE network (`:695-704`) — an
    # iteration-dependent optimization_barrier stops XLA from hoisting the
    # class-independent prefix out of the class scan, an optimization the
    # host-driven torch loop cannot perform. `faithful=False` keeps round
    # 1's deliberately over-strict variant where XLA's LICM grants the
    # baseline our prefix sharing (reported as vs_licm_hoisted_baseline).
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
                    class_body,
                    jnp.zeros((BATCH, CLASSES)),
                    jnp.arange(CLASSES),
                )
                return total + errs, None

            keys = jax.random.split(key, EVALS)
            total, _ = jax.lax.scan(
                eval_body, jnp.zeros((BATCH, CLASSES)), keys
            )
            return jnp.argmin(total, axis=1)

        return sequential_fn

    progs = {}
    for name, fn in (
        ("fused", classify),
        ("faithful", make_sequential(True)),
        ("licm", make_sequential(False)),
    ):
        call, _ = _aot_chain(fn, params, x, labels)
        call(_next_seed(), 1)
        call(_next_seed(), 1 + CHAIN)  # warm both repeat counts
        progs[name] = call

    # Interleaved paired trials: one (fused, faithful, licm) triple per
    # trial so slow relay drift hits all three programs alike; the reported
    # band is min/max of the per-trial ratios. A contended host (spin-probe
    # jitter) widens the inner min-of-N and is labeled in the output.
    spin0 = [_spin_s() for _ in range(5)]
    pre = _contention_stats(spin0)
    inner = HEADLINE_INNER * (2 if pre["contended"] else 1)
    spins = list(spin0)
    series = {name: [] for name in progs}
    for _ in range(HEADLINE_TRIALS):
        spins.append(_spin_s())
        for name, call in progs.items():
            series[name].append(min(_deltas(call, CHAIN, inner)))
    contention = _contention_stats(spins)

    fused_med = _median(series["fused"])
    ratios_faithful = sorted(
        f / g for f, g in zip(series["faithful"], series["fused"])
    )
    ratios_licm = sorted(
        f / g for f, g in zip(series["licm"], series["fused"])
    )
    global _HEADLINE
    headline = {
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
        "inner_deltas": inner,
        **contention,
    }
    _HEADLINE = headline  # from here on the watchdog can land the contract

    # ---- secondary: training step (fwd+bwd+clip+Adam+EMA) + roofline ----
    def train_block():
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
        call, compiled = _aot_train_chain(step, state, xt, lt)
        sec = _measure_call(call)
        emit(
            {
                "metric": "train_step_images_per_sec",
                "value": round(TRAIN_BATCH / sec, 3),
                "unit": "images/sec",
            }
        )
        # roofline from the SAME executable: the fori body (one full step,
        # no inner scans at grad_accum=1) is counted once by the XLA cost
        # analysis, which is exactly one production train step
        # (VERDICT r4 next-round §5).
        try:
            cost = compiled.cost_analysis()
        except Exception as e:
            cost = None
            emit(
                {
                    "metric": "train_achieved_tflops",
                    "value": None,
                    "error": str(e)[:120],
                }
            )
        if cost is not None:
            emit(_roofline_from_cost("train_achieved_tflops", cost, sec))

    _guard(
        240,
        ["train_step_images_per_sec", "train_achieved_tflops"],
        train_block,
    )

    # ---- secondary: ancestral sampler steps/sec (CFG pair fused) ----
    def sampler_block():
        sampler = make_sampler(
            apply_fn,
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

        call, _ = _aot_chain(
            sample_fn, params, x[:SAMPLER_BATCH], labels[:SAMPLER_BATCH]
        )
        sec = _measure_call(call)
        emit(
            {
                "metric": "sampler_steps_per_sec",
                "value": round(SAMPLER_STEPS / sec, 3),
                "unit": "steps/sec",
                "batch": SAMPLER_BATCH,
            }
        )

    _guard(180, ["sampler_steps_per_sec"], sampler_block)

    # ---- secondary: B=1 serving latency — the one-giant-megabatch
    # formulation wins at B=1 (a class-chunk scan would idle the chip) ----
    def b1_block():
        classify_b1 = make_classifier(
            apply_fn,
            schedule_fn,
            pred_param="v",
            num_classes=CLASSES,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
            encode_fn=encode_fn,
            tail_fn=tail_fn,
        )
        call, _ = _aot_chain(classify_b1, params, x[:1], labels[:1])
        sec = _measure_call(call, chain=32)
        emit(
            {
                "metric": "classify_b1_latency_ms",
                "value": round(sec * 1e3, 3),
                "unit": "ms",
            }
        )

    _guard(150, ["classify_b1_latency_ms"], b1_block)

    # ---- secondary: staged tournament — the framework's best
    # full-protocol operating point (reference stage pruning `:717-721`
    # as fixed shapes) ----
    def staged_block():
        classify_staged = make_classifier(
            apply_fn,
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
        call, _ = _aot_chain(classify_staged, params, x, labels)
        sec = _measure_call(call)
        emit(
            {
                "metric": "elbo_classify_staged_images_per_sec",
                "value": round(BATCH / sec, 3),
                "unit": "images/sec",
                "protocol": "2 evals x 10 classes -> 4 evals x top-3",
            }
        )

    _guard(180, ["elbo_classify_staged_images_per_sec"], staged_block)

    # ---- roofline: XLA cost analysis of ONE fused classify call ----
    # Flop/byte counts come from the fully-unrolled megabatch variant
    # (eval_group=EVALS, no class chunking): the math is identical to the
    # production program for any schedule knobs, but XLA's cost analysis
    # counts a lax.scan body ONCE — analyzing the production class-chunk
    # scan undercounts ~(evals x chunks)x. Time is the production
    # program's measured median.
    def classify_roofline_block():
        classify_flat = make_classifier(
            apply_fn,
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
        emit(
            _roofline(
                "classify_achieved_tflops",
                classify_flat,
                (params, x, labels, jax.random.PRNGKey(0)),
                fused_med,
            )
        )

    _guard(180, ["classify_achieved_tflops"], classify_roofline_block)

    # ---- CheXpert-256 + IPMSA + OOD lines ----
    # Nothing in the per-config groups may kill the run: a setup failure
    # (model ctor, param fill compile) emits one labeled error line for the
    # group and the headline still prints (driver contract).
    for group in (_chexpert_blocks, _ipmsa_ood_blocks, _dit_hd128_block):
        try:
            group()
        except Exception as e:
            emit(
                {
                    "metric": group.__name__.strip("_"),
                    "value": None,
                    "error": str(e)[:160],
                }
            )

    # ---- headline (LAST line, driver contract) ----
    _emit_headline()


def _chexpert_blocks():
    """BASELINE.json's CheXpert-256 configs, each deadline-guarded.

    Both configs run the production engine path: in-graph Haar DWT
    (256px/3ch → 128px/12ch, engine `_prepare_batch` parity) feeding the
    classify tournament with the binary healthy-vs-sick protocol
    (`/root/reference/experiments/chexpert-unet/train.py:118-138`,
    `/root/reference/experiments/chexpert-dit/train.py:116-134`).
    """
    # the group's setup itself costs a param-fill compile per model; if the
    # budget cannot cover even the cheapest block, skip the whole group with
    # labeled lines instead of paying setup for nothing
    group_metrics = [
        "chexpert_unet_dwt_classify_images_per_sec",
        "chexpert_unet_dwt_achieved_tflops",
        "chexpert_unet_dwt_classify_b1_latency_ms",
        "chexpert_dit_b4_classify_images_per_sec",
        "chexpert_dit_b4_achieved_tflops",
        "chexpert_dit_b4_classify_b1_latency_ms",
        "chexpert_dit_b4_train_images_per_sec",
        "chexpert_dit_b4_train_achieved_tflops",
    ]
    if _remaining() < 180:
        for m in group_metrics:
            emit({"metric": m, "value": None, "skipped": "deadline"})
        return

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
    # `diffusion_classifier.py:83-85` passes config.image_size=256,
    # noise_d=64)
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
    params = _fast_params(
        unet.init, rng, x0, jnp.zeros((CX_BATCH,)), labels
    )
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

    cx_sec = [None]

    def cx_classify_block():
        call, _ = _aot_chain(cx_classify(CX_BATCH), params, x_raw, labels)
        sec = _measure_call(call, chain=CX_CHAIN, trials=CX_TRIALS)
        cx_sec[0] = sec
        emit(
            {
                "metric": "chexpert_unet_dwt_classify_images_per_sec",
                "value": round(CX_BATCH / sec, 3),
                "unit": "images/sec",
                "protocol": f"binary, {EVALS} evals, 256px DWT->128px/12ch",
            }
        )

    _guard(
        200, ["chexpert_unet_dwt_classify_images_per_sec"], cx_classify_block
    )

    # roofline for the DWT-UNet line (same method as the headline's: cost-
    # analyze the fully-unrolled variant since XLA counts a scan body once;
    # time the production class-chunked program)
    def cx_roofline_block():
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
        emit(
            _roofline(
                "chexpert_unet_dwt_achieved_tflops",
                lambda p, xx, ll, key: unet_flat(p, dwt(xx), ll, key),
                (params, x_raw, labels, jax.random.PRNGKey(0)),
                cx_sec[0],
            )
        )

    if cx_sec[0] is not None:
        _guard(200, ["chexpert_unet_dwt_achieved_tflops"], cx_roofline_block)
    else:
        emit(
            {
                "metric": "chexpert_unet_dwt_achieved_tflops",
                "value": None,
                "skipped": "deadline",
            }
        )

    def cx_b1_block():
        call, _ = _aot_chain(cx_classify(1), params, x_raw[:1], labels[:1])
        lat = _measure_call(call, chain=8, trials=CX_TRIALS)
        emit(
            {
                "metric": "chexpert_unet_dwt_classify_b1_latency_ms",
                "value": round(lat * 1e3, 3),
                "unit": "ms",
            }
        )

    _guard(150, ["chexpert_unet_dwt_classify_b1_latency_ms"], cx_b1_block)

    # budget gate before the DiT param-fill compile (same rationale as the
    # group gate above)
    if _remaining() < 150:
        for m in group_metrics[3:]:
            emit({"metric": m, "value": None, "skipped": "deadline"})
        return

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
    dit_params = _fast_params(
        dit.init, rng, x0, jnp.zeros((CX_BATCH,)), labels
    )
    dit_apply = lambda p, z, lg, lab: dit.apply(p, z, lg, lab)
    dit_sec = [None]

    def dit_classify_block():
        dit_inner = make_classifier(
            dit_apply,
            schedule_fn,
            pred_param="v",
            num_classes=2,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
            class_chunk=CLASS_CHUNK,
            # At K=2 the class scan has only two iterations: unrolling them
            # (and pairs of eval chunks) removes while-loop back-edges XLA
            # cannot schedule across — 228.7 → 245.3 img/s measured
            # (benchmarks/scan_unroll_probe.py; BASELINE.md round 4). The
            # 10-class headline LOSES with unrolling (467 → 437), so this
            # stays per-config, not an auto default.
            scan_unroll=2,
        )
        dit_fn = lambda p, xx, ll, key: dit_inner(p, dwt(xx), ll, key)
        call, _ = _aot_chain(dit_fn, dit_params, x_raw, labels)
        sec = _measure_call(call, chain=CX_CHAIN, trials=CX_TRIALS)
        dit_sec[0] = sec
        emit(
            {
                "metric": "chexpert_dit_b4_classify_images_per_sec",
                "value": round(CX_BATCH / sec, 3),
                "unit": "images/sec",
                "protocol": (
                    f"binary, {EVALS} evals, 1024 tokens, pallas flash attn"
                ),
            }
        )

    _guard(
        200, ["chexpert_dit_b4_classify_images_per_sec"], dit_classify_block
    )

    def dit_roofline_block():
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
        emit(
            _roofline(
                "chexpert_dit_b4_achieved_tflops",
                lambda p, xx, ll, key: dit_flat(p, dwt(xx), ll, key),
                (dit_params, x_raw, labels, jax.random.PRNGKey(0)),
                dit_sec[0],
            )
        )

    if dit_sec[0] is not None:
        _guard(150, ["chexpert_dit_b4_achieved_tflops"], dit_roofline_block)
    else:
        emit(
            {
                "metric": "chexpert_dit_b4_achieved_tflops",
                "value": None,
                "skipped": "deadline",
            }
        )

    # B=1 serving latency for the DiT-b4 config (VERDICT r4 next-round §6 —
    # completes BASELINE.md's "p50 latency per config" target; the megabatch
    # formulation, like the other B=1 lines)
    def dit_b1_block():
        dit_b1 = make_classifier(
            dit_apply,
            schedule_fn,
            pred_param="v",
            num_classes=2,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
        )
        fn = lambda p, xx, ll, key: dit_b1(p, dwt(xx), ll, key)
        call, _ = _aot_chain(fn, dit_params, x_raw[:1], labels[:1])
        lat = _measure_call(call, chain=16, trials=CX_TRIALS, reduce=_median)
        emit(
            {
                "metric": "chexpert_dit_b4_classify_b1_latency_ms",
                "value": round(lat * 1e3, 3),
                "unit": "ms",
            }
        )

    _guard(120, ["chexpert_dit_b4_classify_b1_latency_ms"], dit_b1_block)

    # -- DiT-b4 train step (fwd+bwd+clip+Adam+EMA): the config where BOTH
    #    pallas flash-attention kernels fire — the fused-heads forward and
    #    the lane-grouped backward (`ops/flash_attention.py`) --
    def dit_train_block():
        from diffusion_classifier_tpu.engine.state import (
            EmaConfig,
            init_train_state,
            make_optimizer,
        )
        from diffusion_classifier_tpu.engine.steps import (
            make_loss_fn,
            make_train_step,
        )

        dit_loss = make_loss_fn(
            dit_apply, schedule_fn, pred_param="v", null_token=2
        )
        tx = make_optimizer(1e-4, 10, 1000)
        dit_state = init_train_state(dit_params, tx)
        dit_step = make_train_step(dit_loss, tx, EmaConfig())
        call, compiled = _aot_train_chain(dit_step, dit_state, x0, labels)
        sec = _measure_call(call, chain=CX_CHAIN, trials=CX_TRIALS)
        emit(
            {
                "metric": "chexpert_dit_b4_train_images_per_sec",
                "value": round(CX_BATCH / sec, 3),
                "unit": "images/sec",
                "protocol": "1024 tokens, pallas flash fwd+bwd",
            }
        )
        # train roofline from the same executable (fori body = one step;
        # the flash kernels' flops enter via their pl.CostEstimate)
        try:
            cost = compiled.cost_analysis()
            emit(
                _roofline_from_cost(
                    "chexpert_dit_b4_train_achieved_tflops", cost, sec
                )
            )
        except Exception as e:
            emit(
                {
                    "metric": "chexpert_dit_b4_train_achieved_tflops",
                    "value": None,
                    "error": str(e)[:120],
                }
            )

    _guard(
        240,
        [
            "chexpert_dit_b4_train_images_per_sec",
            "chexpert_dit_b4_train_achieved_tflops",
        ],
        dit_train_block,
    )


def _ipmsa_ood_blocks():
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
    synthetic pixels, real program. MIMIC and PadChest share one compiled
    executable (identical geometry → identical program); each still gets
    its own measurement.
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
    schedule_fn = make_schedule_fn("shifted_cosine", 64, 256)

    # -- (#4) IPMSA 5-slice DWT-UNet --
    def ipmsa_block():
        IP_BATCH = 8
        x_raw = jax.random.uniform(
            rng, (IP_BATCH, 256, 256, 10), minval=-1, maxval=1
        )
        labels = jnp.zeros((IP_BATCH,), jnp.int32)
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
        params = _fast_params(
            unet.init, rng, x0, jnp.zeros((IP_BATCH,)), labels
        )
        apply_fn = lambda p, z, lg, lab: unet.apply(p, z, lg, lab)
        encode_fn = lambda p, z, lg: unet.apply(
            p, z, lg, None, mode="encode"
        )
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
        call, _ = _aot_chain(ip_fn, params, x_raw, labels)
        sec = _measure_call(call, chain=CX_CHAIN, trials=CX_TRIALS)
        emit(
            {
                "metric": "ipmsa_dwt_unet_classify_images_per_sec",
                "value": round(IP_BATCH / sec, 3),
                "unit": "images/sec",
                "protocol": (
                    f"binary, {EVALS} evals, 256px/10ch DWT->128px/40ch"
                ),
            }
        )

    _guard(240, ["ipmsa_dwt_unet_classify_images_per_sec"], ipmsa_block)

    # -- (#5) OOD sweep p50 latency: CheXpert-256 DWT-UNet scoring each
    #    dataset at its reference evaluation geometry --
    def ood_block():
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
        # conv UNet params are size-independent: one init serves every
        # geometry
        x64 = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
        cx_params = _fast_params(
            cx.init, rng, dwt(x64), jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32),
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
        calls = {}
        for name, sz in (("mimic", 64), ("padchest", 64), ("isic", 256)):
            if _remaining() < 90:
                emit(
                    {
                        "metric": f"ood_{name}_classify_b1_latency_p50_ms",
                        "value": None,
                        "skipped": "deadline",
                    }
                )
                continue
            if sz not in calls:
                xb = jax.random.uniform(
                    rng, (1, sz, sz, 3), minval=-1, maxval=1
                )
                calls[sz], _ = _aot_chain(cx_fn, cx_params, xb, lab1)
            sec = _measure_call(
                calls[sz], chain=8, trials=CX_TRIALS, reduce=_median
            )
            emit(
                {
                    "metric": f"ood_{name}_classify_b1_latency_p50_ms",
                    "value": round(sec * 1e3, 3),
                    "unit": "ms",
                    "protocol": f"{sz}px eval geometry, chexpert DWT-UNet",
                }
            )

    _guard(
        150,
        [
            "ood_mimic_classify_b1_latency_p50_ms",
            "ood_padchest_classify_b1_latency_p50_ms",
            "ood_isic_classify_b1_latency_p50_ms",
        ],
        ood_block,
    )


def _dit_hd128_block():
    """TPU-first DiT variant: `attention_head_dim=128` at the same width.

    Same 32.6M parameters and model width as the parity DiT-b4 line (which
    stays 6×64 for reference parity) but 3 heads × D=128, so both flash
    matmuls use the full MXU depth. Probe-measured at +25.8% classify /
    79.5% MFU vs the parity config's 63.2% (BASELINE.md round 5,
    `benchmarks/dit_headdim_probe.py`); this line makes the variant
    driver-visible. Lowest-priority block: last to run, first skipped.
    """
    metric = "chexpert_dit_b4_hd128_classify_images_per_sec"
    if _remaining() < 150:
        emit({"metric": metric, "value": None, "skipped": "deadline"})
        return

    def block():
        import jax
        import jax.numpy as jnp

        from diffusion_classifier_tpu.diffusion.classify import make_classifier
        from diffusion_classifier_tpu.diffusion.schedule import make_schedule_fn
        from diffusion_classifier_tpu.engine.denoiser import Denoiser
        from diffusion_classifier_tpu.models.dit import DiT, DiTConfig
        from diffusion_classifier_tpu.ops.wavelet import haar_dwt2

        rng = jax.random.PRNGKey(0)
        x_raw = jax.random.uniform(
            rng, (CX_BATCH, 256, 256, 3), minval=-1, maxval=1
        )
        labels = jnp.zeros((CX_BATCH,), jnp.int32)
        schedule_fn = make_schedule_fn("shifted_cosine", 64, 256)
        dwt = lambda img: haar_dwt2(img) / 2.0
        dit = Denoiser(
            backbone=DiT(
                DiTConfig(
                    num_attention_heads=3,
                    attention_head_dim=128,
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
            encoder=None,
        )
        x0 = dwt(x_raw)
        params = _fast_params(dit.init, rng, x0, jnp.zeros((CX_BATCH,)), labels)
        inner = make_classifier(
            lambda p, z, lg, lab: dit.apply(p, z, lg, lab),
            schedule_fn,
            pred_param="v",
            num_classes=2,
            n_stages=1,
            evaluation_per_stage=(EVALS,),
            n_keep_per_stage=(1,),
            class_chunk=CLASS_CHUNK,
            scan_unroll=2,
        )
        fn = lambda p, xx, ll, key: inner(p, dwt(xx), ll, key)
        call, _ = _aot_chain(fn, params, x_raw, labels)
        sec = _measure_call(call, chain=CX_CHAIN, trials=CX_TRIALS)
        emit(
            {
                "metric": metric,
                "value": round(CX_BATCH / sec, 3),
                "unit": "images/sec",
                "protocol": "binary, 4 evals, 1024 tokens, 3 heads x D=128",
                "note": "non-parity TPU-first variant, same params/width as dit_b4",
            }
        )

    _guard(150, [metric], block)


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — contract: headline last, rc 0
        if isinstance(e, KeyboardInterrupt):
            raise
        _emit_headline(error=f"{type(e).__name__}: {e}"[:160])
    sys.exit(0)
