"""Shared Flax building blocks for the denoiser backbones (NHWC, TPU-native).

These re-create, functionally, the diffusers blocks the reference adapters
lean on (`nets/unet.py`, `nets/dit.py` wrap `diffusers` `UNet2DConditionModel`
/ `DiTTransformer2DModel`) — resnet blocks, spatial transformer blocks,
sinusoidal time embeddings, up/down sampling — but written TPU-first:

- NHWC layout so convolutions tile directly onto the MXU;
- norm statistics in float32 with bf16 compute elsewhere;
- attention through :mod:`diffusion_classifier_tpu.ops.attention`.

Parity notes (structure, not weights): GroupNorm(32, eps=1e-5) in resnets and
eps=1e-6 before spatial transformers; SiLU activations; GEGLU feed-forward;
time-embedding MLP of width 4·c0; per-head dim = channels // num_heads with
diffusers' "attention_head_dim is actually num_heads" convention preserved by
the UNet config.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention

Dtype = jnp.dtype


class ResnetParams(NamedTuple):
    """Flat parameter bundle for one resnet block (all fp32, flax shapes)."""

    scale1: jax.Array  # [Cin]
    bias1: jax.Array  # [Cin]
    w1: jax.Array  # [3, 3, Cin, Cout]
    b1: jax.Array  # [Cout]
    scale2: jax.Array  # [Cout]
    bias2: jax.Array  # [Cout]
    w2: jax.Array  # [3, 3, Cout, Cout]
    b2: jax.Array  # [Cout]
    ws: Optional[jax.Array] = None  # [Cin, Cout] 1x1 shortcut (None: identity)
    bs: Optional[jax.Array] = None  # [Cout]


def sinusoidal_embedding(
    timesteps: jax.Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal position/time embedding of a ``[B]`` float vector → ``[B, dim]``.

    Mirrors diffusers ``Timesteps`` (used by UNet2DConditionModel's
    ``time_proj``): here the "timesteps" are continuous logSNR values, which
    the reference feeds directly as ``noise_labels``
    (`diffusion/diffusion_classifier.py:320-324`).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP lifting the sinusoidal embedding to ``time_embed_dim``."""

    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jax.Array) -> jax.Array:
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(h)


def group_norm_mxu(
    x: jax.Array, scale: jax.Array, bias: jax.Array, *, num_groups: int, eps: float
) -> jax.Array:
    """GroupNorm with fp32-accumulated statistics computed on the MXU.

    XLA lowers the textbook NHWC group-norm reduction to ``convert_reduce``
    fusions that measured at ~48% of the whole UNet forward on TPU v5e
    (profiler trace, batch 320). Here the per-group sums are two small
    matmuls against a block-diagonal group-membership matrix — MXU work with
    fp32 accumulation (``preferred_element_type``) — and the reduction cost
    disappears into the noise.

    Precision: accumulation is always fp32, and fp32 inputs square exactly.
    For bf16 inputs the squares are DELIBERATELY formed in bf16 (~2⁻⁸
    relative rounding per element) before the exact fp32 accumulation —
    upcasting first would push the multiply off the fast path. This is
    bf16-compute rounding of the same order the activations already carry,
    NOT flax semantics (flax ``_compute_stats`` promotes to fp32 before
    squaring); parity vs flax is tested to 5e-2 in bf16
    (`tests/test_groupnorm.py`).
    """
    g = num_groups
    c = x.shape[-1]
    assert c % g == 0, f"groups {g} must divide channels {c}"
    cg = c // g

    n = x.shape[0]
    xf = x.reshape(n, -1, c)
    count = xf.shape[1] * cg

    # membership[c, g'] = 1 iff channel c belongs to group g'
    chan_group = jnp.arange(c, dtype=jnp.int32) // cg
    membership = (
        chan_group[:, None] == jnp.arange(g, dtype=jnp.int32)[None, :]
    ).astype(x.dtype)

    # bf16 inputs: single-pass MXU with fp32 accumulation is exact for the
    # sum. fp32 inputs: force full-precision passes (the TPU default
    # decomposes fp32 matmuls into lossy bf16 passes).
    precision = (
        jax.lax.Precision.DEFAULT
        if x.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    s_g = jnp.einsum(
        "nsc,ck->nk",
        xf,
        membership,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    ss_g = jnp.einsum(
        "nsc,ck->nk",
        xf * xf,
        membership,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    mean = s_g / count
    var = jnp.maximum(ss_g / count - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)

    # broadcast per-group stats back to channels: [n, g] → [n, c]
    mean_c = jnp.repeat(mean, cg, axis=1)
    inv_c = jnp.repeat(inv, cg, axis=1)
    w = (inv_c * scale[None, :]).astype(x.dtype)
    b = (bias[None, :] - mean_c * inv_c * scale[None, :]).astype(x.dtype)
    y = xf * w[:, None, :] + b[:, None, :]
    return y.reshape(x.shape)


class GroupNormF32(nn.Module):
    """Module wrapper over :func:`group_norm_mxu` (fp32 MXU statistics)."""

    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_mxu(
            x, scale, bias, num_groups=self.num_groups, eps=self.eps
        )


class ResnetBlock2D(nn.Module):
    """GN→SiLU→conv3x3, +time-emb, GN→SiLU→dropout→conv3x3, skip 1x1 on channel change.

    Structure-parity with diffusers ``ResnetBlock2D`` (default
    ``resnet_time_scale_shift='default'``, ``output_scale_factor=1``).

    Executes as XLA convs + the MXU group-norm. A fully fused Pallas block
    kernel was built and measured in rounds 1-2 and lost to XLA's conv
    emitters at every production shape (the chains are compute-bound —
    BASELINE.md "fused-block Pallas kernel" table), so it was removed in
    round 3; parameters stay declared flat (`ResnetParams`) so any future
    kernel can drive the same tree.
    """

    out_channels: int
    dropout: float = 0.0
    groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: jax.Array,
        *,
        skip: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """When ``skip`` is given, the block's logical input is
        ``concat([x, skip], -1)`` — but it is never materialized:
        ``conv(concat(h, s), W) = conv(h, W_top) + conv(s, W_bot)`` and
        GroupNorm factorizes per half whenever each half's channels are a
        multiple of the group width. Measured 1.46x faster than the concat
        formulation at the flagship up-block shape (320×32²×(128+128)→128,
        TPU v5e — BASELINE.md). Parameters are identical either way."""
        split_halves = None
        if skip is not None:
            total = x.shape[-1] + skip.shape[-1]
            cg = total // self.groups
            if x.shape[-1] % cg == 0:
                split_halves = (x, skip)
            else:  # groups straddle the boundary: fall back to concat
                x = jnp.concatenate([x, skip], axis=-1)

        in_ch = x.shape[-1] if split_halves is None else (
            x.shape[-1] + skip.shape[-1]
        )
        out_ch = self.out_channels
        lecun = nn.initializers.lecun_normal()
        ones, zeros = nn.initializers.ones, nn.initializers.zeros
        channel_change = in_ch != out_ch

        p = ResnetParams(
            scale1=self.param("norm1_scale", ones, (in_ch,), jnp.float32),
            bias1=self.param("norm1_bias", zeros, (in_ch,), jnp.float32),
            w1=self.param("conv1_kernel", lecun, (3, 3, in_ch, out_ch), jnp.float32),
            b1=self.param("conv1_bias", zeros, (out_ch,), jnp.float32),
            scale2=self.param("norm2_scale", ones, (out_ch,), jnp.float32),
            bias2=self.param("norm2_bias", zeros, (out_ch,), jnp.float32),
            w2=self.param("conv2_kernel", lecun, (3, 3, out_ch, out_ch), jnp.float32),
            b2=self.param("conv2_bias", zeros, (out_ch,), jnp.float32),
            ws=self.param("shortcut_kernel", lecun, (in_ch, out_ch), jnp.float32)
            if channel_change
            else None,
            bs=self.param("shortcut_bias", zeros, (out_ch,), jnp.float32)
            if channel_change
            else None,
        )
        wt = self.param(
            "time_emb_kernel", lecun, (temb.shape[-1], out_ch), jnp.float32
        )
        bt = self.param("time_emb_bias", zeros, (out_ch,), jnp.float32)
        t = nn.silu(temb).astype(self.dtype) @ wt.astype(self.dtype) + bt.astype(
            self.dtype
        )

        def conv(h, w, b):
            out = jax.lax.conv_general_dilated(
                h.astype(self.dtype),
                w.astype(self.dtype),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out + b.astype(self.dtype)

        def gn_silu(v, scale, bias, groups):
            v = group_norm_mxu(v, scale, bias, num_groups=groups, eps=self.eps)
            return nn.silu(v)

        if split_halves is None:
            h = gn_silu(x, p.scale1, p.bias1, self.groups)
            h = conv(h, p.w1, p.b1)
        else:
            xc = x.shape[-1]
            gh = self.groups * xc // in_ch  # groups covering the x half
            hx = gn_silu(x, p.scale1[:xc], p.bias1[:xc], gh)
            hs = gn_silu(
                skip, p.scale1[xc:], p.bias1[xc:], self.groups - gh
            )
            h = conv(hx, p.w1[:, :, :xc], p.b1) + conv(
                hs, p.w1[:, :, xc:], jnp.zeros_like(p.b1)
            )
        h = h + t[:, None, None, :]
        h = gn_silu(h, p.scale2, p.bias2, self.groups)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv(h, p.w2, p.b2)

        if channel_change:
            b_, hh, ww, _ = h.shape
            if split_halves is None:
                res = x.reshape(-1, in_ch).astype(self.dtype) @ p.ws.astype(
                    self.dtype
                )
            else:
                xc = x.shape[-1]
                res = x.reshape(-1, xc).astype(self.dtype) @ p.ws[:xc].astype(
                    self.dtype
                ) + skip.reshape(-1, in_ch - xc).astype(self.dtype) @ p.ws[
                    xc:
                ].astype(self.dtype)
            x = (res + p.bs.astype(self.dtype)).reshape(b_, hh, ww, out_ch)
        elif split_halves is not None:  # pragma: no cover - identity skip
            # identity shortcut with a split input cannot happen: the concat
            # always changes the channel count vs out_channels in the UNet
            x = jnp.concatenate(split_halves, axis=-1)
        return x + h


class MultiHeadAttention(nn.Module):
    """QKV projection + scaled-dot-product attention + output projection.

    Self-attention when ``context is None``; cross-attention otherwise (keys
    and values from ``context``, e.g. projected class/text embeddings).
    """

    num_heads: int
    head_dim: int
    dtype: Dtype = jnp.float32
    attn_backend: str = "xla"

    @nn.compact
    def __call__(
        self, x: jax.Array, context: Optional[jax.Array] = None
    ) -> jax.Array:
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        b, sq, _ = x.shape
        sk = ctx.shape[1]

        # Single-token context: softmax over one key is identically 1, so
        # attention(q, k, v) == v — skip the QK path entirely (exact, and
        # saves two projections + the attention matmuls per call; the common
        # case here, since class conditioning is a one-token sequence). The
        # reference computes the full QK product whose gradient is exactly
        # zero in this case (torch softmax over one key is constant), so no
        # learnable behavior is lost. Note: to_q/to_k params are then not
        # created at all; a model initialized with one-token contexts cannot
        # later be applied to multi-token contexts without re-init.
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        if context is not None and sk == 1:
            o = jnp.broadcast_to(v, (b, sq, inner))
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            qh = q.reshape(b, sq, self.num_heads, self.head_dim)
            kh = k.reshape(b, sk, self.num_heads, self.head_dim)
            vh = v.reshape(b, sk, self.num_heads, self.head_dim)
            o = attention(qh, kh, vh, backend=self.attn_backend)
            o = o.reshape(b, sq, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(o)


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward: ``Linear(d, 8d) → split → x·gelu(gate) → Linear(4d, d)``."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """LayerNorm+self-attn, LayerNorm+cross-attn, LayerNorm+GEGLU FF (pre-norm residuals)."""

    num_heads: int
    head_dim: int
    dtype: Dtype = jnp.float32
    attn_backend: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array]) -> jax.Array:
        dim = x.shape[-1]
        # epsilon 1e-5: diffusers BasicTransformerBlock norm_eps default
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        x = x + MultiHeadAttention(
            self.num_heads, self.head_dim, self.dtype, self.attn_backend, name="attn1"
        )(h.astype(self.dtype))
        if context is not None:
            attn2 = MultiHeadAttention(
                self.num_heads,
                self.head_dim,
                self.dtype,
                self.attn_backend,
                name="attn2",
            )
            if context.shape[1] == 1:
                # One context token: cross-attn output is to_out(to_v(ctx)),
                # independent of x (see MultiHeadAttention) — the pre-attn
                # LayerNorm would be dead compute with zero gradient, so it
                # is skipped (and its params never created).
                x = x + attn2(x, context)
            else:
                h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
                x = x + attn2(h.astype(self.dtype), context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x)
        x = x + GEGLUFeedForward(dim, dtype=self.dtype, name="ff")(
            h.astype(self.dtype)
        )
        return x


class AttentionBlock2D(nn.Module):
    """Plain self-attention residual block: GN → QKV attention → proj, +residual.

    The lean attention used by diffusers' ``AttnDownBlock2D``/``AttnUpBlock2D``
    inside the unconditional ``UNet2DModel`` (reference `nets/unet.py:8-71`) —
    no LayerNorm/FF/cross-attention, unlike :class:`SpatialTransformer`.
    """

    num_heads: int
    head_dim: int
    groups: int = 32
    dtype: Dtype = jnp.float32
    attn_backend: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hgt, wid, c = x.shape
        h = GroupNormF32(self.groups, 1e-5, name="group_norm")(x)
        h = h.reshape(b, hgt * wid, c)
        h = MultiHeadAttention(
            self.num_heads, self.head_dim, self.dtype, self.attn_backend,
            name="attention",
        )(h)
        return x + h.reshape(b, hgt, wid, c)


class SpatialTransformer(nn.Module):
    """GN(eps 1e-6) → 1x1 proj_in → tokens → transformer blocks → 1x1 proj_out, residual.

    The cross-attention carrier inside CrossAttn{Down,Up}Block2D / the mid
    block (diffusers ``Transformer2DModel`` with conv projections).
    """

    num_heads: int
    head_dim: int
    depth: int = 1
    groups: int = 32
    dtype: Dtype = jnp.float32
    attn_backend: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array]) -> jax.Array:
        b, hgt, wid, c = x.shape
        residual = x
        h = GroupNormF32(self.groups, 1e-6, name="norm")(x)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(b, hgt * wid, c)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.num_heads,
                self.head_dim,
                self.dtype,
                self.attn_backend,
                name=f"block_{i}",
            )(h, context)
        h = h.reshape(b, hgt, wid, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class Downsample2D(nn.Module):
    """3x3 stride-2 conv downsampling (diffusers ``downsample_type='conv'``)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.out_channels, (3, 3), strides=2, padding=1, dtype=self.dtype,
            name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest-neighbor 2x upsample + 3x3 conv (diffusers ``upsample_type='conv'``).

    The upsample is a broadcast-reshape (exact nearest-neighbor) rather than
    ``jax.image.resize``'s gather lowering — cheaper on TPU.
    """

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
        ).reshape(b, 2 * h, 2 * w, c)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
        )(x)
