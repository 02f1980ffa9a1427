"""TPU Pallas flash attention (non-causal, fixed-shape) for denoiser backbones.

Replaces the reference's reliance on torch/CUDA attention kernels inside
diffusers blocks with a first-party TPU kernel. Layout ``[B, S, H, D]``; the
kernel runs per (batch·head, q-block) grid cell with the full K/V resident in
VMEM — image-denoiser sequence lengths here are ≤ 4096 tokens, so K/V fit
comfortably and online-softmax streaming across K is unnecessary. Softmax
statistics are computed in float32 on the VPU; both matmuls hit the MXU with
``preferred_element_type=float32``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "supports"]

_BLOCK_Q = 512
_MAX_SEQ = 4096
_LOG2_E = 1.4426950408889634


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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # [BLK_Q, D]
    k = k_ref[0].astype(jnp.float32)  # [S, D]
    v = v_ref[0]                      # [S, D]

    # The kernel is VPU-bound, not MXU-bound (~16% matmul MFU at S=1024) —
    # softmax elementwise work dominates, so: (a) exp via the native exp2
    # with log2(e) pre-folded into the qk scale, and (b) the 1/l normalizer
    # applied to the [BLK_Q, D] output instead of the [BLK_Q, S] probability
    # matrix (S/D x fewer divides). Measured together: −9..13% kernel time at
    # the 1024-token DiT shapes (benchmarks/flash_tune_verify.py).
    s = jnp.dot(
        q * (scale * _LOG2_E), k.T, preferred_element_type=jnp.float32
    )  # [BLK_Q, S]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _flash_attention_impl(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int
) -> jax.Array:
    """Non-causal attention over ``[B, S, H, D]``; returns ``q.dtype``."""
    b, s, h, d = q.shape
    block_q = min(block_q, s)
    scale = 1.0 / (d**0.5)

    # [B, S, H, D] → [B·H, S, D]
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    grid = (b * h, pl.cdiv(s, block_q))
    # Mosaic only compiles for TPU; on the CPU test mesh run interpreted.
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=(3 * b * h * s * d + b * h * s * d) * q.dtype.itemsize,
            transcendentals=b * h * s * s,
        ),
        interpret=interpret,
    )(qb, kb, vb)

    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int = _BLOCK_Q
) -> jax.Array:
    """Non-causal attention over ``[B, S, H, D]``; returns ``q.dtype``.

    Differentiable: the forward runs the Pallas kernel; the backward
    rematerializes through `jax.nn.dot_product_attention` (the same
    function mathematically), so ``attn_backend="pallas"`` is safe in
    training configs — `jax.grad` through a bare `pallas_call` would
    otherwise fail.
    """
    return _flash_attention_impl(q, k, v, block_q)


def _flash_attention_fwd(q, k, v, block_q):
    return _flash_attention_impl(q, k, v, block_q), (q, k, v)


def _flash_attention_bwd(block_q, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(jax.nn.dot_product_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)
