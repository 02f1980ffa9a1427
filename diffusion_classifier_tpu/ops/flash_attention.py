"""TPU Pallas flash attention (non-causal, fixed-shape) for denoiser backbones.

Replaces the reference's reliance on torch/CUDA attention kernels inside
diffusers blocks with a first-party TPU kernel. Image-denoiser sequence
lengths here are ≤ 4096 tokens, so the full K/V stays resident in VMEM and
online-softmax streaming across K is unnecessary (measured slower —
`benchmarks/flash_layout_probe.py`). Softmax statistics are computed in
float32 on the VPU; both matmuls hit the MXU with
``preferred_element_type=float32``.

Layout (round 3, "fused heads"): the kernel consumes ``[B, S, H*D]`` — a
free reshape of the model's ``[B, S, H, D]`` — with a grid over
``(batch, q-blocks)`` and an unrolled head loop inside the kernel, each head
a D-wide lane slice. This removes the HBM round-trip of transposing to a
head-major layout on both sides of the kernel (~100 MB moved at the DiT-b4
shape) and lets head j's VPU softmax overlap head j+1's MXU matmul.
Measured 1.50×/1.56× over the round-2 head-major kernel at the 1024-token
DiT shapes (6/12 heads), 2.2× over ``jax.nn.dot_product_attention``.

Mosaic keeps the unrolled heads' f32 score matrices live concurrently
(software pipelining), so the q-block size is chosen to keep
``H · block_q · S · 4B`` inside the scoped-VMEM budget; shapes too large
for that fall back to the round-2 head-major kernel (one (batch·head,
q-block) grid cell per head, full K/V in VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "supports"]

_MAX_SEQ = 4096
_LOG2_E = 1.4426950408889634
# Mosaic's per-kernel scoped-VMEM stack is 16 MB; the dominant term is the
# unrolled heads' f32 score matrices (H·blk·S·4B). Empirical boundary on
# v5e: H=6/blk=512/S=1024 (12.6 MB estimate) compiles, H=12/blk=512
# (25 MB) OOMs — 13 MB keeps the measured-optimal picks on both sides.
_SCOPED_BUDGET = 13 * 1024 * 1024


def supports(q: jax.Array, k: jax.Array, v: jax.Array) -> bool:
    """True if shapes satisfy the kernel's tiling constraints."""
    if q.ndim != 4 or k.shape != q.shape or v.shape != q.shape:
        return False
    _, s, _, d = q.shape
    if d not in (32, 64, 128):
        return False
    if s > _MAX_SEQ or s % 128 != 0:
        return False
    return True


def _pick_fused_block_q(s: int, h: int) -> int | None:
    """Largest q-block whose unrolled-head score matrices fit scoped VMEM."""
    for blk in (512, 256, 128):
        if h * blk * s * 4 <= _SCOPED_BUDGET:
            return blk
    return None


def _pick_bh_block_q(s: int) -> int:
    """Head-major q-block: one head's f32 scores AND its exp2 result live
    concurrently ([blk, S] each), so budget 2·blk·S·4B — at S=4096 a 512
    block estimates 16.8 MB (over the 13 MB boundary the fused path
    measured), so the pick degrades to 256 there; ≤ 2048 keeps 512."""
    for blk in (512, 256):
        if 2 * blk * s * 4 <= _SCOPED_BUDGET:
            return blk
    return 128


def _softmax_pv(q, k, v, scale):
    """One head's attention: f32 scores/softmax stats, MXU matmuls.

    The kernel is VPU-bound, not MXU-bound (~16% matmul MFU at S=1024) —
    softmax elementwise work dominates, so: (a) exp via the native exp2
    with log2(e) pre-folded into the qk scale, and (b) the 1/l normalizer
    applied to the [BLK_Q, D] output instead of the [BLK_Q, S] probability
    matrix (S/D x fewer divides). Measured together: −9..13% kernel time
    at the 1024-token DiT shapes (benchmarks/flash_tune_verify.py).
    """
    s = jnp.dot(
        q.astype(jnp.float32) * (scale * _LOG2_E),
        k.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )  # [BLK_Q, S]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return o / l


def _attn_kernel_fused(q_ref, k_ref, v_ref, o_ref, *, scale: float, h: int, d: int):
    # Heads live side-by-side on the lane axis ([blk, H*D]); each head is a
    # D-wide lane slice. The head loop is unrolled (static trip count), so
    # Mosaic can overlap head j's VPU softmax with head j+1's MXU matmuls.
    for j in range(h):
        sl = slice(j * d, (j + 1) * d)
        o = _softmax_pv(q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl], scale)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _attn_kernel_bh(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    o = _softmax_pv(q_ref[0], k_ref[0], v_ref[0], scale)
    o_ref[0] = o.astype(o_ref.dtype)


def _cost_estimate(b, s, h, d, itemsize):
    return pl.CostEstimate(
        flops=4 * b * h * s * s * d,
        bytes_accessed=4 * b * h * s * d * itemsize,
        transcendentals=b * h * s * s,
    )


def _flash_fused_heads(q, k, v, block_q):
    b, s, h, d = q.shape
    scale = 1.0 / (d**0.5)
    blk = min(block_q, s)
    hd = h * d
    qf, kf, vf = (x.reshape(b, s, hd) for x in (q, k, v))
    grid = (b, pl.cdiv(s, blk))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_fused, scale=scale, h=h, d=d),
        out_shape=jax.ShapeDtypeStruct((b, s, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, blk, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, blk, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=_cost_estimate(b, s, h, d, q.dtype.itemsize),
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    return out.reshape(b, s, h, d)


def _flash_bh(q, k, v, block_q):
    b, s, h, d = q.shape
    scale = 1.0 / (d**0.5)
    blk = min(block_q, s)

    # [B, S, H, D] → [B·H, S, D]
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    grid = (b * h, pl.cdiv(s, blk))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_bh, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, blk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=_cost_estimate(b, s, h, d, q.dtype.itemsize),
        interpret=jax.default_backend() != "tpu",
    )(to_bh(q), to_bh(k), to_bh(v))
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _flash_attention_impl(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int
) -> jax.Array:
    """Non-causal attention over ``[B, S, H, D]``; returns ``q.dtype``."""
    _, s, h, _ = q.shape
    fused_blk = _pick_fused_block_q(s, h)
    if fused_blk is not None:
        if block_q > 0:
            fused_blk = min(fused_blk, block_q)
        return _flash_fused_heads(q, k, v, fused_blk)
    return _flash_bh(q, k, v, block_q if block_q > 0 else _pick_bh_block_q(s))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int = 0
) -> jax.Array:
    """Non-causal attention over ``[B, S, H, D]``; returns ``q.dtype``.

    ``block_q=0`` (default) picks the largest VMEM-safe q-block
    automatically; a positive value caps it.

    Differentiable: the forward runs the Pallas kernel; the backward runs
    the Pallas flash-backward kernel (`_flash_bwd` — softmax recompute +
    dq/dk/dv, flash-attention style) wherever one head's [S, S] score
    matrices fit scoped VMEM, and rematerializes through
    `jax.nn.dot_product_attention` (the same math) for oversize sequences,
    so ``attn_backend="pallas"`` is safe in training configs.
    """
    return _flash_attention_impl(q, k, v, block_q)


def _bwd_one_head(q, k, v, do, scale):
    """One head's backward: recompute softmax, return (dq, dk, dv).

    Standard flash backward with the whole sequence resident (S ≤ 1024 —
    the [S, S] f32 intermediates stay inside scoped VMEM):
    ``dv = pᵀ·dO``, ``dp = dO·vᵀ``, ``ds = p ∘ (dp − rowsum(p ∘ dp))``,
    ``dq = scale·ds·k``, ``dk = scale·dsᵀ·q``. The [S, S] operands are cast
    to the input dtype for the MXU matmuls (same numerics convention as the
    forward's p·v matmul).
    """
    s = jnp.dot(
        q.astype(jnp.float32) * (scale * _LOG2_E),
        k.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )  # [S, S]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    dv = jnp.dot(p.astype(do.dtype).T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)  # [S, S]
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)  # rowsum(dO ∘ O)
    ds = p * (dp - delta)
    dsl = ds.astype(q.dtype)
    dq = jnp.dot(dsl, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(dsl.T, q, preferred_element_type=jnp.float32) * scale
    return dq, dk, dv


def _bwd_kernel_lanes(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float, d: int
):
    # One lane-aligned head group ([S, G·D] block, G·D a multiple of 128);
    # sub-heads are static D-wide lane slices, same trick as the fused
    # forward. The loop iterations run sequentially (measured — see
    # `_bwd_lane_group`), so only one head's [S, S] intermediates occupy
    # scoped VMEM at a time.
    g = q_ref.shape[-1] // d
    for j in range(g):
        sl = slice(j * d, (j + 1) * d)
        dq, dk, dv = _bwd_one_head(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl], do_ref[0, :, sl],
            scale,
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _bwd_kernel_bh(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    dq, dk, dv = _bwd_one_head(q_ref[0], k_ref[0], v_ref[0], do_ref[0], scale)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_lane_group(s: int, h: int, d: int) -> int | None:
    """Heads per grid cell for the transpose-free layout, or None.

    Mosaic requires lane (minor-dim) blocks to be multiples of 128, so a
    cell must cover ``g = 128/d`` whole heads; g must divide H. Unlike the
    fused forward (whose unrolled heads' buffers coexist under software
    pipelining), the backward's sub-heads are scheduled sequentially at
    g=2 — measured: g=2 at S=1024 compiles and runs 1.22-1.27x faster than
    the head-major layout (`benchmarks/flash_bwd_lane1024_probe.py`). Only
    g ≤ 2 is measured; g=4 (d=32) is NOT assumed sequential (if Mosaic kept
    even two of four sub-heads' [S, S] buffers live it would blow scoped
    VMEM at S=1024), so d=32 uses the head-major layout. The VMEM budget
    itself is the caller's gate (`_bwd_supported`). None → head-major.
    """
    g = 1 if d % 128 == 0 else 128 // d
    if g > 2 or h % g != 0:
        return None
    return g


def _bwd_supported(s: int) -> bool:
    # the head-major path needs one head's p/dp/ds [S, S] f32 in scoped VMEM
    return 3 * s * s * 4 <= _SCOPED_BUDGET


def _bwd_cost(b, s, h, d, itemsize):
    return pl.CostEstimate(
        flops=10 * b * h * s * s * d,
        bytes_accessed=7 * b * h * s * d * itemsize,
        transcendentals=b * h * s * s,
    )


def _flash_bwd(q, k, v, do):
    """Pallas backward; grid (batch, head-group), one head per MXU pass.

    Where D·g = 128 lane alignment works out (D ∈ {64, 128}) the kernel
    reads the [B, S, H·D] view directly — no boundary transposes, mirroring
    the fused-heads forward. Otherwise it falls back to the head-major
    [B·H, S, D] layout (full-minor-dim blocks are always legal).
    """
    b, s, h, d = q.shape
    scale = 1.0 / (d**0.5)
    g = _bwd_lane_group(s, h, d)
    if g is not None:
        hd = h * d
        qf, kf, vf, dof = (x.reshape(b, s, hd) for x in (q, k, v, do))
        spec = pl.BlockSpec(
            (1, s, g * d), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        )
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel_lanes, scale=scale, d=d),
            out_shape=[jax.ShapeDtypeStruct((b, s, hd), x.dtype) for x in (q, k, v)],
            grid=(b, h // g),
            in_specs=[spec] * 4,
            out_specs=[spec] * 3,
            cost_estimate=_bwd_cost(b, s, h, d, q.dtype.itemsize),
            interpret=jax.default_backend() != "tpu",
        )(qf, kf, vf, dof)
        return tuple(o.reshape(b, s, h, d) for o in outs)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    spec = pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_bh, scale=scale),
        out_shape=[jax.ShapeDtypeStruct((b * h, s, d), x.dtype) for x in (q, k, v)],
        grid=(b * h,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        cost_estimate=_bwd_cost(b, s, h, d, q.dtype.itemsize),
        interpret=jax.default_backend() != "tpu",
    )(to_bh(q), to_bh(k), to_bh(v), to_bh(do))
    return tuple(
        o.reshape(b, h, s, d).transpose(0, 2, 1, 3) for o in outs
    )


def _flash_attention_fwd(q, k, v, block_q):
    return _flash_attention_impl(q, k, v, block_q), (q, k, v)


def _flash_attention_bwd(block_q, residuals, g):
    q, k, v = residuals
    if _bwd_supported(q.shape[1]):
        return _flash_bwd(q, k, v, g)
    # oversize sequences: rematerialize through XLA (same math)
    _, vjp = jax.vjp(jax.nn.dot_product_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)
