"""Fully-fused ResnetBlock2D forward as a single Pallas TPU kernel (EXPERIMENTAL).

Motivation: profiling (BASELINE.md) shows the UNet forward is
HBM-bandwidth-bound — XLA cannot fuse across convolutions, so every
GN → SiLU → conv → +temb → GN → SiLU → conv → +skip chain makes ~6 round
trips through HBM. This kernel keeps one batch element's activations
resident in VMEM for the whole block: convs as in-VMEM im2col + one
``[HW, 9C] @ [9C, C]`` MXU matmul, GN statistics via VMEM reductions + a
same-group channel-mask matmul (fp32), SiLU/temb/residual in-register.

**Status: correct but NOT wired into the model.** Measured on TPU v5e at the
L0 shape (batch 320, 32²×128): this kernel 1.75 ms vs XLA's unfused chain
1.04-1.42 ms — XLA's specialized conv emitters (halo-aware spatial tiling,
weight-stationary streaming, DMA overlap) beat the naive in-VMEM im2col even
though it saves HBM passes. Kept in-tree with tests as the starting point
for a round-2 kernel with proper conv tiling; `supports()` gates the shapes
it handles.

Scope (v1): equal in/out channels, stride 1, no dropout; forward only (the
intended use is the EMA eval paths, where autodiff is not needed). The
time-embedding projection (``silu(temb) @ W + b``, tiny) is applied OUTSIDE.
`resnet_block_ref` defines the exact semantics; the kernel is tested
against it in interpret mode and on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ResnetParams", "resnet_block_ref", "resnet_block_pallas", "supports"]


class ResnetParams(NamedTuple):
    """Flat parameter bundle for one fused block (all fp32)."""

    scale1: jax.Array  # [C]
    bias1: jax.Array  # [C]
    w1: jax.Array  # [3, 3, C, C]
    b1: jax.Array  # [C]
    scale2: jax.Array  # [C]
    bias2: jax.Array  # [C]
    w2: jax.Array  # [3, 3, C, C]
    b2: jax.Array  # [C]


def _group_norm(x, scale, bias, groups, eps):
    """fp32-stat group norm over [..., C] (same math as GroupNormF32)."""
    c = x.shape[-1]
    cg = c // groups
    xf = x.reshape(-1, c).astype(jnp.float32)
    grp = xf.reshape(xf.shape[0], groups, cg)
    mean = grp.mean(axis=(0, 2))
    var = jnp.maximum((grp**2).mean(axis=(0, 2)) - mean**2, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, cg)
    inv_c = jnp.repeat(inv, cg)
    y = (xf - mean_c) * inv_c * scale + bias
    return y.reshape(x.shape).astype(x.dtype)


def resnet_block_ref(
    params: ResnetParams,
    x: jax.Array,  # [B, H, W, C]
    temb_proj: jax.Array,  # [B, C] — already silu(temb) @ Wt + bt
    *,
    groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """Pure-JAX semantics: per-sample GN → SiLU → conv → +temb → GN → SiLU → conv → +x."""

    def conv(h, w, b):
        out = jax.lax.conv_general_dilated(
            h.astype(jnp.float32),
            w.astype(jnp.float32),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + b

    def per_sample(xi, ti):
        h = _group_norm(xi, params.scale1, params.bias1, groups, eps)
        h = jax.nn.silu(h.astype(jnp.float32))
        h = conv(h[None], params.w1, params.b1)[0]
        h = h + ti[None, None, :]
        h = _group_norm(h, params.scale2, params.bias2, groups, eps)
        h = jax.nn.silu(h)
        h = conv(h[None], params.w2, params.b2)[0]
        return (xi.astype(jnp.float32) + h).astype(x.dtype)

    # per-sample GN (matches the block semantics; batch is independent)
    return jax.vmap(per_sample)(x, temb_proj)


def supports(x: jax.Array, in_ch: int, out_ch: int, stride: int, dropout: float) -> bool:
    if in_ch != out_ch or stride != 1 or dropout > 0.0:
        return False
    b, h, w, c = x.shape
    if c % 128 != 0:
        return False
    # padded activations + two fp32 accumulators must fit VMEM comfortably
    vmem = (h + 2) * (w + 2) * c * 2 + 2 * h * w * c * 4
    return vmem <= 6 * 1024 * 1024


def _kernel(
    x_ref,  # [1, H, W, C]
    temb_ref,  # [B, C] (full array; row selected by program_id)
    scale1_ref, bias1_ref,  # [1, C]
    w1_ref,  # [9C, C]
    b1_ref,  # [1, C]
    scale2_ref, bias2_ref,  # [1, C]
    w2_ref,  # [9C, C]
    b2_ref,  # [1, C]
    o_ref,  # [1, H, W, C]
    *,
    H: int,
    W: int,
    C: int,
    groups: int,
    eps: float,
):
    cg = C // groups
    hw = H * W

    # same-group channel mask [C, C] for group-stat broadcast via MXU
    ci = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0) // cg
    cj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1) // cg
    gmask = (ci == cj).astype(jnp.float32)

    def gn_silu(h_flat, scale, bias):
        # h_flat: [HW, C] fp32 → group-normalized + SiLU → bf16
        s = jnp.sum(h_flat, axis=0, keepdims=True)  # [1, C]
        ss = jnp.sum(h_flat * h_flat, axis=0, keepdims=True)
        cnt = hw * cg
        mean_c = jnp.dot(s, gmask, preferred_element_type=jnp.float32) / cnt
        ex2_c = jnp.dot(ss, gmask, preferred_element_type=jnp.float32) / cnt
        var_c = jnp.maximum(ex2_c - mean_c * mean_c, 0.0)
        inv_c = jax.lax.rsqrt(var_c + eps)
        y = (h_flat - mean_c) * inv_c * scale + bias
        return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)

    def conv3x3(h_bf_hwc, w_flat, bias):
        # h_bf_hwc: [H, W, C] bf16; im2col in VMEM → ONE [HW, 9C]@[9C, C]
        # MXU matmul (K = 9·C keeps the systolic array streaming).
        padded = jnp.pad(h_bf_hwc, ((1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [
                padded[k // 3 : k // 3 + H, k % 3 : k % 3 + W, :].reshape(hw, C)
                for k in range(9)
            ],
            axis=1,
        )  # [HW, 9C] bf16
        acc = jnp.dot(cols, w_flat, preferred_element_type=jnp.float32)
        return acc + bias

    x_bf = x_ref[0]  # [H, W, C] compute dtype
    x_flat32 = x_bf.reshape(hw, C).astype(jnp.float32)

    h = gn_silu(x_flat32, scale1_ref[...], bias1_ref[...])
    h = conv3x3(h.reshape(H, W, C), w1_ref[...], b1_ref[...])
    h = h + temb_ref[pl.ds(pl.program_id(0), 1), :]  # [1, C] row broadcast
    h = gn_silu(h, scale2_ref[...], bias2_ref[...])
    h = conv3x3(h.reshape(H, W, C), w2_ref[...], b2_ref[...])

    o_ref[0] = (x_flat32 + h).reshape(H, W, C).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def resnet_block_pallas(
    params: ResnetParams,
    x: jax.Array,  # [B, H, W, C]
    temb_proj: jax.Array,  # [B, C]
    *,
    groups: int = 32,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    b, h, w, c = x.shape
    # [3,3,Cin,Cout] → [9·Cin, Cout], row k·C+cin = tap k (matches im2col)
    w1 = params.w1.reshape(9 * c, c).astype(jnp.bfloat16)
    w2 = params.w2.reshape(9 * c, c).astype(jnp.bfloat16)
    row = lambda v: v.reshape(1, c).astype(jnp.float32)

    vec_specs = [
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ]

    out = pl.pallas_call(
        functools.partial(
            _kernel, H=h, W=w, C=c, groups=groups, eps=eps
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # temb, whole [B, C]
            *vec_specs,  # scale1
            *vec_specs,  # bias1
            pl.BlockSpec((9 * c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *vec_specs,  # b1
            *vec_specs,  # scale2
            *vec_specs,  # bias2
            pl.BlockSpec((9 * c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *vec_specs,  # b2
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 2 * 9 * h * w * c * c,
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize + 2 * 9 * c * c * 4,
            transcendentals=2 * b * h * w * c,
        ),
        interpret=interpret,
    )(
        x,
        temb_proj.astype(jnp.float32),
        row(params.scale1),
        row(params.bias1),
        w1,
        row(params.b1),
        row(params.scale2),
        row(params.bias2),
        w2,
        row(params.b2),
    )
    return out
