"""Per-class ELBO classification as fused fixed-shape device programs.

This is the throughput core of the framework — the reference's triple Python
loop over (stage → evaluation → class), each iteration one full denoiser
forward issued from the host (`diffusion/diffusion_classifier.py:657-725`,
cost model SURVEY §3.2), collapsed into megabatched TPU steps:

- Each evaluation draws ONE shared ``(t, ε)`` per batch element (reference
  `:687-692`) — the protocol invariant that makes per-class errors
  comparable.
- All surviving candidate classes for a group of evaluations are scored in a
  SINGLE denoiser forward on a ``[B · K · G]`` megabatch (classes broadcast,
  shared noise), instead of ``K · G`` sequential forwards.
- Stage pruning (reference `:717-721`): per-class mean error over all
  evaluations so far; keep the ``n_keep_per_stage[i]`` lowest. Stages are
  unrolled in Python (static config), so candidate shapes stay fixed per
  stage — no dynamic shapes under jit.
- The reference's "+inf init" semantics (`:669`) — classes that miss any
  evaluation rank last — are reproduced with an (err_sum, count) pair:
  ``mean = where(count == evals_so_far, err_sum / evals_so_far, +inf)``.
- Fast mode (reference `:671-677`): score only the true class plus
  ``n_fast_classes − 1`` uniformly drawn incorrect classes (with
  replacement, matching ``torch.randint``); candidate 0 is the true class.

Error metric per (example, class, eval): ``‖ε̂ − ε‖²₂`` over the flattened
image (reference `:711`), accumulated in float32.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from .process import bcast_right, pred_to_eps
from .schedule import alpha_sigma

__all__ = ["make_classifier", "auto_eval_group"]


#: elements of one CIFAR image — the unit ``megabatch_target`` is calibrated in
_REF_IMG_ELEMS = 32 * 32 * 3


def auto_eval_group(
    n_evals: int,
    batch: int,
    k_classes: int,
    target: int = 512,
    img_elems: int = _REF_IMG_ELEMS,
) -> int:
    """Largest divisor G of ``n_evals`` with megabatch ``B·K·G ≤ budget``.

    ``target`` is in CIFAR-equivalent images (32·32·3 elements); the budget
    scales down with the actual per-image element count so the auto choice
    never builds a megabatch whose activations exceed HBM — a 128²×12
    CheXpert-DWT image is 64 CIFAR-equivalents, so its image budget is
    512/64 = 8 (measured: B=32, K=2, G=4 OOMs a 16 GB v5e chip while G=1
    fits with headroom — BASELINE.md round-3 CheXpert probe).
    """
    budget = max(1, (target * _REF_IMG_ELEMS) // max(img_elems, 1))
    best = 1
    for g in range(1, n_evals + 1):
        if n_evals % g == 0 and batch * k_classes * g <= budget:
            best = g
    return best


def make_classifier(
    apply_fn: Callable,
    schedule_fn: Callable,
    *,
    pred_param: str,
    num_classes: int,
    n_stages: int,
    evaluation_per_stage: Sequence[int],
    n_keep_per_stage: Sequence[int],
    fast: bool = False,
    n_fast_classes: int = 2,
    eval_group: int = 0,
    class_chunk: int = 0,
    scan_unroll=1,  # int, or (eval_unroll, class_unroll)
    megabatch_target: int = 512,
    encode_fn: Callable = None,
    tail_fn: Callable = None,
    trace: bool = False,
):
    """Build ``classify(params, x, labels, rng) -> predicted class ids [B]``.

    ``labels`` is consumed only in fast mode (oracle-assisted candidate
    subsetting, reference `:671-677`); pass zeros otherwise.

    ``class_chunk`` scores candidates ``class_chunk`` classes at a time via
    an on-device scan instead of one giant megabatch — predictions are
    IDENTICAL for any value (the (t, ε) key derivation does not depend on
    it); only the execution schedule changes. 0 = all classes at once;
    -1 = auto (chunk 1 at batch ≥ 16 where the scan's weight-stream
    pipelining wins — BASELINE.md round-2 sweep — and the full megabatch at
    small/serving batches where it keeps the chip busy). Values that do not
    divide a stage's surviving-candidate count fall back to no chunking for
    that stage.

    ``scan_unroll`` unrolls the on-device evaluation/class scans by that
    factor (``lax.scan(..., unroll=)``): numerics and predictions are
    bit-identical for any value — unrolling only removes while-loop
    barriers so XLA may overlap one iteration's epilogue (error reduction,
    scatter) with the next forward. Longer compiles at higher values.
    A ``(eval_unroll, class_unroll)`` pair applies different factors to the
    two scans (e.g. ``(4, 1)`` flattens the evaluation loop while keeping
    the class scan's weight-stream pipelining).

    When ``encode_fn(params, z, logsnr) -> prefix_state`` and
    ``tail_fn(params, prefix_state, labels) -> pred`` are provided (UNet
    backbones), the conditioning-independent prefix runs ONCE per
    (evaluation, image) and only the conditioned tail fans out across the K
    candidate classes — the per-class cost drops by the prefix share of the
    network. The reference recomputes the entire network per class
    (`:695-704`).
    """
    ev = (0,) + tuple(evaluation_per_stage)
    keep = tuple(n_keep_per_stage)
    assert len(ev) - 1 == n_stages and len(keep) == n_stages
    assert keep[-1] == 1, (
        "Only one class should be selected at the end of the classification process."
    )
    if isinstance(scan_unroll, (tuple, list)):
        eval_unroll, class_unroll = scan_unroll
    else:
        eval_unroll = class_unroll = scan_unroll
    if fast:
        assert 2 <= n_fast_classes <= num_classes
    if eval_group:
        # A group that does not divide a stage's evaluation count would
        # silently truncate the scan (count never reaches ev[i+1], every
        # mean becomes +inf, and the tournament degenerates to class 0).
        for i in range(n_stages):
            n_evals = ev[i + 1] - ev[i]
            if n_evals % eval_group != 0:
                raise ValueError(
                    f"eval_group={eval_group} does not divide stage {i}'s "
                    f"evaluation count {n_evals}; use 0 for auto grouping"
                )

    def _score_stage(
        params, x, cand, err_sum, count, rng, n_evals, group, identity=False
    ):
        """Score `cand` [B,K] over `n_evals` evaluations, G at a time.

        When ``class_chunk`` divides K into more than one chunk, the K
        candidates are scored by a ``lax.scan`` over chunks of ``cc`` classes
        (megabatch G·B·cc each) instead of one G·B·K megabatch. Measured on
        TPU v5e, a scan of medium batches outruns one giant batch — the
        pipeline double-buffers weight streaming across scan iterations —
        which is also why the reference's per-class loop rebuilt as an
        on-device scan is fast (BASELINE.md). Errors for all chunks of one
        evaluation land in a dense [G, B, C] table CARRIED through the class
        scan, so a candidate duplicated across chunks (fast mode) still
        counts once per evaluation, exactly like the reference's same-slot
        writes (`:711`).
        """
        b = x.shape[0]
        k = cand.shape[1]
        assert n_evals % group == 0, (n_evals, group)
        n_chunks = n_evals // group
        keys = jax.random.split(rng, n_chunks)

        chunk = class_chunk if class_chunk >= 0 else (1 if b >= 16 else 0)
        cc = chunk if chunk and k % chunk == 0 else k
        n_cc = k // cc

        img_axes = tuple(range(1, x.ndim))  # spatial+channel axes of one image

        def chunk_body(carry, key):
            err_sum, count = carry
            k_t, k_eps = jax.random.split(key)
            # One shared (t, ε) per (eval-in-group, batch element) — classes
            # all see identical noise (reference `:687-692`).
            t = jax.random.uniform(k_t, (group, b))
            logsnr_t = schedule_fn(t)  # [G, B]
            alpha_t, sigma_t = alpha_sigma(logsnr_t)
            eps = jax.random.normal(k_eps, (group,) + x.shape, dtype=x.dtype)
            a = bcast_right(alpha_t, eps.ndim).astype(x.dtype)
            s = bcast_right(sigma_t, eps.ndim).astype(x.dtype)
            z = a * x[None] + s * eps  # [G, B, ...]

            if encode_fn is not None and tail_fn is not None:
                # Shared-prefix path: the conditioning-independent prefix
                # runs on [G·B] ONCE per evaluation group; only the
                # conditioned tail fans out across candidate classes.
                z_flat = z.reshape((group * b,) + x.shape[1:])
                lg_flat = logsnr_t.reshape(group * b)
                state = encode_fn(params, z_flat, lg_flat)
            else:
                state = None

            def score_classes(cand_c):
                """Errors for `cand_c` [B, cc_] classes → [G, B, cc_]."""
                cc_ = cand_c.shape[1]
                lg = jnp.broadcast_to(
                    logsnr_t[:, :, None], (group, b, cc_)
                ).reshape(-1)
                lab = jnp.broadcast_to(cand_c[None], (group, b, cc_)).reshape(-1)
                zz = jnp.broadcast_to(
                    z[:, :, None], (group, b, cc_) + x.shape[1:]
                ).reshape((group * b * cc_,) + x.shape[1:])
                if state is not None:
                    state_rep = jax.tree.map(
                        lambda a: jnp.repeat(a, cc_, axis=0), state
                    )
                    pred = tail_fn(params, state_rep, lab)
                else:
                    pred = apply_fn(params, zz, lg, lab)
                al, si = alpha_sigma(lg)
                eps_pred = pred_to_eps(pred, zz, al, si, pred_param)
                eps_rep = jnp.broadcast_to(
                    eps[:, :, None], (group, b, cc_) + x.shape[1:]
                ).reshape((group * b * cc_,) + x.shape[1:])
                return jnp.sum(
                    jnp.square((eps_pred - eps_rep).astype(jnp.float32)),
                    axis=img_axes,
                ).reshape(group, b, cc_)

            if identity and n_cc == 1:
                # cand[b] == arange(C) for every row (full-class stage before
                # any pruning): the err slots are already class-aligned — no
                # scatter needed.
                err = score_classes(cand)
                err_sum = err_sum + err.sum(axis=0)
                count = count + group
                return (err_sum, count), None

            g_idx = jnp.arange(group)[:, None, None]
            b_idx = jnp.arange(b)[None, :, None]

            def class_body(dense, cand_c):
                err = score_classes(cand_c)
                # duplicates in/across chunks write the same value into the
                # same slot (shared (t, ε) ⇒ identical error)
                return dense.at[g_idx, b_idx, cand_c[None]].set(err), None

            dense0 = jnp.full((group, b, num_classes), jnp.inf, jnp.float32)
            if n_cc == 1:
                dense, _ = class_body(dense0, cand)
            else:
                chunks = cand.reshape(b, n_cc, cc).transpose(1, 0, 2)
                dense, _ = jax.lax.scan(
                    class_body, dense0, chunks,
                    unroll=min(max(class_unroll, 1), n_cc),
                )
            scored = jnp.isfinite(dense)
            err_sum = err_sum + jnp.where(scored, dense, 0.0).sum(axis=0)
            count = count + scored.sum(axis=0)
            return (err_sum, count), None

        (err_sum, count), _ = jax.lax.scan(
            chunk_body, (err_sum, count), keys,
            unroll=min(max(eval_unroll, 1), n_chunks),
        )
        return err_sum, count

    def classify(params, x, labels, rng):
        b = x.shape[0]

        if fast:
            rng, k_sel = jax.random.split(rng)
            # incorrect classes of row b in ascending order: i + (i >= label)
            i = jnp.arange(num_classes - 1)[None, :]
            incorrect = i + (i >= labels[:, None])
            sel = jax.random.randint(
                k_sel, (b, n_fast_classes - 1), 0, num_classes - 1
            )
            cand = jnp.concatenate(
                [labels[:, None], jnp.take_along_axis(incorrect, sel, axis=1)],
                axis=1,
            ).astype(jnp.int32)
        else:
            cand = jnp.broadcast_to(
                jnp.arange(num_classes, dtype=jnp.int32)[None], (b, num_classes)
            )

        err_sum = jnp.zeros((b, num_classes), jnp.float32)
        count = jnp.zeros((b, num_classes), jnp.int32)

        stages = []  # per-stage (mean, cand) when tracing
        stage_rngs = jax.random.split(rng, n_stages)
        for i in range(n_stages):
            n_evals = ev[i + 1] - ev[i]
            group = eval_group or auto_eval_group(
                n_evals, b, cand.shape[1], megabatch_target,
                img_elems=math.prod(x.shape[1:]),
            )
            identity = (not fast) and i == 0 and cand.shape[1] == num_classes
            err_sum, count = _score_stage(
                params, x, cand, err_sum, count, stage_rngs[i], n_evals, group,
                identity=identity,
            )
            # Mean over ALL evals so far; classes missing any eval → +inf
            # (reference's mean-of-inf trick, `:669,719`).
            mean = jnp.where(
                count == ev[i + 1], err_sum / ev[i + 1], jnp.inf
            )
            _, keep_idx = jax.lax.top_k(-mean, keep[i])
            cand = keep_idx.astype(jnp.int32)  # [B, keep[i]]
            if trace:
                stages.append({"mean": mean, "cand": cand})

        if trace:
            return cand[:, 0], tuple(stages)
        return cand[:, 0]

    return classify
