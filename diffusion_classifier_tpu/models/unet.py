"""Conditional 2D UNet denoiser (Flax, NHWC) — the workhorse backbone.

Functional re-creation of the reference's conditional UNet surface
(`nets/unet.py:77-195` wraps diffusers ``UNet2DConditionModel``): configurable
down/up block types (plain resnet vs. cross-attention), a cross-attention mid
block, sinusoidal time embedding of continuous logSNR values, and an optional
``text_proj`` projection of encoder hidden states into the cross-attention
dimension. Built TPU-first rather than translated: NHWC convs, fp32 norms,
bf16-able compute, attention via the shared ops layer.

Normalized forward signature (reference `nets/unet.py:186-195`):
``apply(variables, x, noise_labels, encoder_hidden_states=None)`` with
``x: [B, H, W, C]``, ``noise_labels: [B]`` (logSNR), and
``encoder_hidden_states: [B, S, encoder_hid_dim]``.

The diffusers quirk where ``attention_head_dim`` is really the *number of
heads* when ``num_attention_heads`` is unset is preserved (the reference's
experiments rely on the default ``attention_head_dim=8`` meaning 8 heads).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    AttentionBlock2D,
    Downsample2D,
    GroupNormF32,
    ResnetBlock2D,
    SpatialTransformer,
    TimestepEmbedding,
    Upsample2D,
    sinusoidal_embedding,
)

DOWN_BLOCK_TYPES = ("DownBlock2D", "AttnDownBlock2D", "CrossAttnDownBlock2D")
UP_BLOCK_TYPES = ("UpBlock2D", "AttnUpBlock2D", "CrossAttnUpBlock2D")


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Architecture preset mirroring the reference constructor's knobs
    (`nets/unet.py:77-140`). Unused diffusers extras are intentionally absent."""

    sample_size: int = 32
    in_channels: int = 3
    out_channels: int = 3
    down_block_types: Sequence[str] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Sequence[str] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    mid_block_type: Optional[str] = "UNetMidBlock2DCrossAttn"
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: Union[int, Sequence[int]] = 2
    # diffusers UNet2DConditionModel convention: this is the PER-BLOCK
    # NUMBER OF HEADS (the quirk the reference's conditional experiments
    # rely on). The unconditional UNet2DModel instead treats it as the
    # per-head DIMENSION (heads = channels // dim) — set
    # ``attention_head_dim_is_dim=True`` for that convention.
    attention_head_dim: Union[int, Sequence[int]] = 8
    attention_head_dim_is_dim: bool = False
    cross_attention_dim: int = 1280
    transformer_layers_per_block: int = 1
    encoder_hid_dim: Optional[int] = None
    encoder_hid_dim_type: Optional[str] = None  # 'text_proj' or None
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    dropout: float = 0.0
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    attn_backend: str = "auto"
    # per-block activation rematerialization (`jax.checkpoint` via nn.remat)
    # over resnet/attention blocks: backward recomputes block interiors
    # instead of storing them, trading ~one extra forward of FLOPs for peak
    # activation memory. No effect on inference programs.
    remat: bool = False

    def __post_init__(self):
        n = len(self.block_out_channels)
        assert len(self.down_block_types) == n and len(self.up_block_types) == n
        for t in self.down_block_types:
            assert t in DOWN_BLOCK_TYPES, f"unknown down block {t}"
        for t in self.up_block_types:
            assert t in UP_BLOCK_TYPES, f"unknown up block {t}"

    def layers_for(self, i: int) -> int:
        if isinstance(self.layers_per_block, int):
            return self.layers_per_block
        return self.layers_per_block[i]

    def heads_for(self, i: int) -> int:
        v = (
            self.attention_head_dim
            if isinstance(self.attention_head_dim, int)
            else self.attention_head_dim[i]
        )
        if self.attention_head_dim_is_dim:
            ch = self.block_out_channels[i]
            assert ch % v == 0, (
                f"attention_head_dim {v} must divide level channels {ch}"
            )
            return ch // v
        return v


class UNetCondition2D(nn.Module):
    """Class/text-conditional UNet denoiser. ``pred = net(z_t, logSNR_t, cond)``.

    Supports prefix/tail splitting for conditioning-independent compute
    hoisting: the leading plain ``DownBlock2D`` levels (plus conv_in and the
    time embedding) do not depend on the class condition, so classification
    can run them ONCE per (image, noise draw) and fan the result out across
    candidate classes, and CFG sampling can share them between the
    conditional and unconditional branches:

    - ``mode='encode'`` → returns ``(h, skips, temb)`` after the prefix;
    - ``mode='tail'``   → consumes ``prefix_state`` and the condition, runs
      the remaining down blocks, mid, up path and output head;
    - ``mode='full'``   → the ordinary forward (tail ∘ encode, one program).

    Parameters are shared across modes (module names are identical);
    initialize with ``mode='full'``.
    """

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    # conditioning-independent prefix = down levels before the first cross-attn
    @property
    def prefix_split(self) -> int:
        types = tuple(self.config.down_block_types)
        for i, t in enumerate(types):
            if t == "CrossAttnDownBlock2D":
                return i
        return len(types)

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array],
        noise_labels: Optional[jax.Array],
        encoder_hidden_states: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        mode: str = "full",
        prefix_state=None,
    ):
        assert mode in ("full", "encode", "tail")
        cfg = self.config
        chans = tuple(cfg.block_out_channels)
        time_embed_dim = chans[0] * 4
        split = self.prefix_split

        def resnet(out_ch, name):
            return ResnetBlock2D(
                out_ch,
                dropout=cfg.dropout,
                groups=cfg.norm_num_groups,
                eps=cfg.norm_eps,
                dtype=self.dtype,
                name=name,
            )

        # Block-call wrappers: the remat boundary is one block (resnet /
        # spatial transformer / self-attn), with static flags closed over so
        # `jax.checkpoint` sees array-only arguments. Identity when remat is
        # off — the param tree is identical either way.
        def call_res(mdl, h, temb, skip):
            return mdl(h, temb, skip=skip, deterministic=deterministic)

        def call_ctx(mdl, h, context):
            return mdl(h, context)

        def call_self(mdl, h):
            return mdl(h)

        if cfg.remat:
            call_res = nn.remat(call_res)
            call_ctx = nn.remat(call_ctx)
            call_self = nn.remat(call_self)

        def transformer(level_ch, heads, name):
            return SpatialTransformer(
                num_heads=heads,
                head_dim=level_ch // heads,
                depth=cfg.transformer_layers_per_block,
                groups=cfg.norm_num_groups,
                dtype=self.dtype,
                attn_backend=cfg.attn_backend,
                name=name,
            )

        def self_attn(level_ch, heads, name):
            return AttentionBlock2D(
                num_heads=heads,
                head_dim=level_ch // heads,
                groups=cfg.norm_num_groups,
                dtype=self.dtype,
                attn_backend=cfg.attn_backend,
                name=name,
            )

        def down_level(i, block_type, h, skips, temb, context):
            out_ch = chans[i]
            heads = cfg.heads_for(i)
            for j in range(cfg.layers_for(i)):
                h = call_res(resnet(out_ch, f"down_{i}_res_{j}"), h, temb, None)
                if block_type == "CrossAttnDownBlock2D":
                    h = call_ctx(
                        transformer(out_ch, heads, f"down_{i}_attn_{j}"), h, context
                    )
                elif block_type == "AttnDownBlock2D":
                    h = call_self(self_attn(out_ch, heads, f"down_{i}_attn_{j}"), h)
                skips.append(h)
            if i < len(chans) - 1:
                h = Downsample2D(out_ch, self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)
            return h

        # --- prefix: time embedding, conv_in, plain down levels ---
        if mode in ("full", "encode"):
            noise_labels = jnp.broadcast_to(
                jnp.atleast_1d(noise_labels), (x.shape[0],)
            )
            t_emb = sinusoidal_embedding(
                noise_labels,
                chans[0],
                flip_sin_to_cos=cfg.flip_sin_to_cos,
                freq_shift=cfg.freq_shift,
            ).astype(self.dtype)
            temb = TimestepEmbedding(
                time_embed_dim, self.dtype, name="time_embedding"
            )(t_emb)

            x = x.astype(self.dtype)
            h = nn.Conv(
                chans[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in"
            )(x)
            skips = [h]
            for i in range(split):
                h = down_level(i, cfg.down_block_types[i], h, skips, temb, None)
            if mode == "encode":
                return h, tuple(skips), temb
        else:
            assert prefix_state is not None, "mode='tail' needs prefix_state"
            h, skips, temb = prefix_state
            skips = list(skips)

        # --- conditioning projection ('text_proj', nets/unet.py parity) ---
        context = encoder_hidden_states
        if context is not None:
            context = context.astype(self.dtype)
            if cfg.encoder_hid_dim_type == "text_proj":
                context = nn.Dense(
                    cfg.cross_attention_dim, dtype=self.dtype, name="encoder_hid_proj"
                )(context)

        # --- remaining (conditioned) down levels ---
        for i in range(split, len(cfg.down_block_types)):
            h = down_level(i, cfg.down_block_types[i], h, skips, temb, context)

        # --- mid block ---
        if cfg.mid_block_type == "UNetMidBlock2DCrossAttn":
            mid_ch = chans[-1]
            heads = cfg.heads_for(len(chans) - 1)
            h = call_res(resnet(mid_ch, "mid_res_0"), h, temb, None)
            h = call_ctx(transformer(mid_ch, heads, "mid_attn_0"), h, context)
            h = call_res(resnet(mid_ch, "mid_res_1"), h, temb, None)
        elif cfg.mid_block_type == "UNetMidBlock2D":
            # self-attention mid block (unconditional UNet2DModel parity)
            mid_ch = chans[-1]
            heads = cfg.heads_for(len(chans) - 1)
            h = call_res(resnet(mid_ch, "mid_res_0"), h, temb, None)
            h = call_self(self_attn(mid_ch, heads, "mid_attn_0"), h)
            h = call_res(resnet(mid_ch, "mid_res_1"), h, temb, None)
        elif cfg.mid_block_type is not None:
            raise ValueError(f"unknown mid block {cfg.mid_block_type}")

        # --- up path (skip concat; layers_per_block+1 resnets per level) ---
        rev_chans = tuple(reversed(chans))
        for i, block_type in enumerate(cfg.up_block_types):
            level = len(chans) - 1 - i  # config index of the matching down level
            out_ch = rev_chans[i]
            heads = cfg.heads_for(level)
            for j in range(cfg.layers_for(level) + 1):
                # skip passed separately: the block computes the concat
                # semantics split-operand-wise without materializing the
                # [B, H, W, C+Cskip] tensor (ResnetBlock2D docstring)
                h = call_res(
                    resnet(out_ch, f"up_{i}_res_{j}"), h, temb, skips.pop()
                )
                if block_type == "CrossAttnUpBlock2D":
                    h = call_ctx(
                        transformer(out_ch, heads, f"up_{i}_attn_{j}"), h, context
                    )
                elif block_type == "AttnUpBlock2D":
                    h = call_self(self_attn(out_ch, heads, f"up_{i}_attn_{j}"), h)
            if i < len(chans) - 1:
                h = Upsample2D(out_ch, self.dtype, name=f"up_{i}_upsample")(h)

        assert not skips, "skip-connection bookkeeping mismatch"

        # --- output head ---
        h = GroupNormF32(cfg.norm_num_groups, cfg.norm_eps, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        return h.astype(jnp.float32)


def UNet2D(
    sample_size: int = 32,
    in_channels: int = 3,
    out_channels: int = 3,
    block_out_channels: Sequence[int] = (224, 448, 672, 896),
    down_block_types: Sequence[str] = (
        "DownBlock2D",
        "AttnDownBlock2D",
        "AttnDownBlock2D",
        "AttnDownBlock2D",
    ),
    up_block_types: Sequence[str] = (
        "AttnUpBlock2D",
        "AttnUpBlock2D",
        "AttnUpBlock2D",
        "UpBlock2D",
    ),
    layers_per_block: int = 2,
    attention_head_dim: int = 8,
    norm_num_groups: int = 32,
    dtype: jnp.dtype = jnp.float32,
    **extra,
) -> UNetCondition2D:
    """Unconditional UNet (reference `nets/unet.py:8-71` surface parity).

    Same defaults as diffusers ``UNet2DModel`` (self-attention down/up blocks,
    self-attention mid block, no conditioning inputs); returns a
    :class:`UNetCondition2D` configured without cross-attention — call it with
    ``encoder_hidden_states=None``. ``attention_head_dim`` here follows the
    UNet2DModel convention — it is the per-head DIMENSION (heads =
    channels // attention_head_dim), unlike the conditional model's
    heads-count quirk.
    """
    return UNetCondition2D(
        UNetConfig(
            sample_size=sample_size,
            in_channels=in_channels,
            out_channels=out_channels,
            block_out_channels=tuple(block_out_channels),
            down_block_types=tuple(down_block_types),
            up_block_types=tuple(up_block_types),
            mid_block_type="UNetMidBlock2D",
            layers_per_block=layers_per_block,
            attention_head_dim=attention_head_dim,
            attention_head_dim_is_dim=True,
            norm_num_groups=norm_num_groups,
            **extra,
        ),
        dtype=dtype,
    )
