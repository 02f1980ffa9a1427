"""Fully-fused ResnetBlock2D forward as a single Pallas TPU kernel.

The UNet denoiser forward spends most of its time in
GN → SiLU → conv3x3 → +temb → GN → SiLU → conv3x3 → +skip chains
(diffusers ``ResnetBlock2D`` semantics; reference backbones delegate these to
torch/cuDNN via diffusers — `nets/unet.py`). XLA cannot fuse across
convolutions, so the chain makes several HBM round trips per block and the
measured forward sits ~30% above the MXU floor (BASELINE.md). This kernel
keeps a whole batch-tile's activations resident in VMEM for the entire block.

Key design (v3):

- **Batched in-VMEM im2col conv.** Each 3×3 conv is ONE
  ``[bt·H·W, 9C] @ [9C, Cout]`` MXU matmul with fp32 accumulation — the
  deep K = 9C contraction keeps the systolic array streaming, and the
  column matrix costs a single relayout. (Two alternatives measured slower
  on v5e: per-tap shifted-slice accumulation — every unaligned slice costs
  Mosaic a full-slab relayout, 9x per conv, 8.6 ms vs XLA's 3.0 ms at the
  L0 shape — and the round-1 single-sample grid at 1.75 ms.)
- **Batch-tiled grid.** ``bt`` samples per grid step so the matmul M
  dimension is thousands of rows; weights stay VMEM-resident across the
  whole grid (constant index_map).
- **MXU group-norm.** Per-(sample, group) statistics via a same-group
  channel-mask matmul in fp32, exactly like ``GroupNormF32``.
- Channel change (``Cin ≠ Cout``) and the 1×1 ``conv_shortcut`` are fused
  in; the tiny time-embedding projection (``silu(temb) @ Wt + bt``) happens
  OUTSIDE (it is [B, C]-shaped, negligible, and shared across pixels).

Differentiable: the backward rematerializes through the pure-JAX
``resnet_block_ref`` (identical math), so the kernel is safe under
``jax.grad`` in training configs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ResnetParams", "resnet_block_ref", "resnet_block_pallas", "supports"]

_VMEM_BUDGET = 16 * 1024 * 1024  # estimate cap; Mosaic live ranges run ~2-3x,
# absorbed by the raised vmem_limit_bytes in the pallas_call


class ResnetParams(NamedTuple):
    """Flat parameter bundle for one fused block (all fp32, flax shapes)."""

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
    x: jax.Array,  # [B, H, W, Cin]
    temb_proj: jax.Array,  # [B, Cout] — already silu(temb) @ Wt + bt
    *,
    groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """Pure-JAX semantics: GN → SiLU → conv → +temb → GN → SiLU → conv → +skip."""

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
        skip = xi.astype(jnp.float32)
        if params.ws is not None:
            skip = skip @ params.ws + params.bs
        return (skip + h).astype(x.dtype)

    return jax.vmap(per_sample)(x, temb_proj)


def _tile_batch(b: int, h: int, w: int, cin: int, cout: int) -> int:
    """Largest divisor of ``b`` whose working set fits the VMEM budget."""
    hw = h * w
    cmax = max(cin, cout)

    def bytes_for(bt):
        # dominated by the im2col column matrix; Mosaic's live-range
        # accounting runs ~2-3x this estimate, absorbed by the raised
        # vmem_limit_bytes
        return (
            bt * hw * 9 * cmax * 2  # im2col columns (bf16)
            + bt * hw * cout * 4  # fp32 conv accumulator
            + bt * hw * (cin + cout) * 4  # x/intermediates
            + 9 * (cin + cout) * cout * 2  # weights
        )

    # Mosaic must statically prove the temb row-slice start (program_id·bt)
    # is a multiple of 8, so bt must be %8 (or the grid must be one step).
    best = 0
    for bt in range(1, b + 1):
        if b % bt != 0 or (bt % 8 != 0 and bt != b):
            continue
        if bytes_for(bt) <= _VMEM_BUDGET:
            best = bt
    return best


def supports(x: jax.Array, in_ch: int, out_ch: int, stride: int, dropout: float) -> bool:
    """Shapes this kernel handles: stride 1, no dropout, 128-multiple channels."""
    if stride != 1 or dropout > 0.0:
        return False
    b, h, w, _ = x.shape
    if in_ch % 128 != 0 or out_ch % 128 != 0:
        return False
    # one sample must fit the VMEM budget
    return _tile_batch(b, h, w, in_ch, out_ch) >= 1 and (
        (h + 2) * (w + 2) * max(in_ch, out_ch) * 2 <= _VMEM_BUDGET // 3
    )


def _kernel(
    x_ref,  # [bt, H, W, Cin]
    temb_ref,  # [B, Cout] (whole array; rows selected by program_id)
    scale1_ref, bias1_ref,  # [1, Cin] f32
    w1_ref,  # [9·Cin, Cout] bf16 (im2col row order)
    b1_ref,  # [1, Cout] f32
    scale2_ref, bias2_ref,  # [1, Cout] f32
    w2_ref,  # [9·Cout, Cout] bf16
    b2_ref,  # [1, Cout] f32
    ws_ref,  # [Cin, Cout] bf16 or None
    bs_ref,  # [1, Cout] f32 or None
    o_ref,  # [bt, H, W, Cout]
    *,
    H: int,
    W: int,
    groups: int,
    eps: float,
):
    bt, _, _, cin = x_ref.shape
    cout = o_ref.shape[-1]
    hw = H * W

    def gn_silu(h, c, scale, bias):
        # h: [bt, HW, c] f32 → per-(sample, group) stats → SiLU → bf16
        cg = c // groups
        ci = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0) // cg
        cj = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1) // cg
        gmask = (ci == cj).astype(jnp.float32)
        s = jnp.sum(h, axis=1)  # [bt, c]
        ss = jnp.sum(h * h, axis=1)
        cnt = hw * cg
        mean_c = jnp.dot(s, gmask, preferred_element_type=jnp.float32) / cnt
        ex2_c = jnp.dot(ss, gmask, preferred_element_type=jnp.float32) / cnt
        var_c = jnp.maximum(ex2_c - mean_c * mean_c, 0.0)
        inv_c = jax.lax.rsqrt(var_c + eps)
        y = (h - mean_c[:, None, :]) * inv_c[:, None, :] * scale + bias
        return (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)

    def conv3x3(h_bf, c, w_taps, bias):
        # h_bf: [bt, H, W, c] bf16 → in-VMEM im2col → ONE
        # [bt·H·W, 9c] @ [9c, cout] MXU matmul. The deep K = 9c dimension
        # keeps the systolic array streaming; building the column matrix is
        # one relayout. (A shifted-slice accumulation formulation measured
        # ~3x slower: every unaligned tap slice costs Mosaic a full-slab
        # relayout, nine times per conv.)
        padded = jnp.pad(h_bf, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [
                padded[:, k // 3 : k // 3 + H, k % 3 : k % 3 + W, :].reshape(
                    bt * hw, c
                )
                for k in range(9)
            ],
            axis=1,
        )  # [bt·HW, 9c]
        acc = jnp.dot(cols, w_taps[...], preferred_element_type=jnp.float32)
        return acc.reshape(bt, H, W, cout) + bias

    x = x_ref[...]  # [bt, H, W, Cin]
    xf = x.reshape(bt, hw, cin).astype(jnp.float32)

    # temb rows of this batch tile (whole-array ref: keeps the batch tile
    # free of Mosaic's %8 block rule on 2D operands)
    t = temb_ref[pl.ds(pl.program_id(0) * bt, bt), :]

    h = gn_silu(xf, cin, scale1_ref[...], bias1_ref[...])
    h = conv3x3(h.reshape(bt, H, W, cin), cin, w1_ref, b1_ref[...])
    h = h + t[:, None, None, :]
    h = gn_silu(h.reshape(bt, hw, cout), cout, scale2_ref[...], bias2_ref[...])
    h = conv3x3(h.reshape(bt, H, W, cout), cout, w2_ref, b2_ref[...])

    if ws_ref is None:
        skip = xf.reshape(bt, H, W, cin)
    else:
        skip = jnp.dot(
            x.reshape(bt * hw, cin).astype(jnp.bfloat16),
            ws_ref[...],
            preferred_element_type=jnp.float32,
        )
        skip = (skip + bs_ref[...]).reshape(bt, H, W, cout)
    o_ref[...] = (skip + h).astype(o_ref.dtype)


def _pallas_impl(params, x, temb_proj, groups, eps, interpret):
    b, h, w, cin = x.shape
    cout = params.w1.shape[-1]
    bt = _tile_batch(b, h, w, cin, cout)
    grid = (b // bt,)
    cmax = max(cin, cout)

    # [3,3,Cin,Cout] → [9·Cin, Cout]: row (k·Cin + cin) = tap k — matches
    # the kernel's im2col column order
    w1 = params.w1.reshape(9 * cin, cout).astype(jnp.bfloat16)
    w2 = params.w2.reshape(9 * cout, cout).astype(jnp.bfloat16)
    row = lambda v, c: v.reshape(1, c).astype(jnp.float32)

    def vec(c):
        return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)

    has_skip = params.ws is not None
    inputs = [
        x,
        temb_proj.astype(jnp.float32),
        row(params.scale1, cin),
        row(params.bias1, cin),
        w1,
        row(params.b1, cout),
        row(params.scale2, cout),
        row(params.bias2, cout),
        w2,
        row(params.b2, cout),
    ]
    in_specs = [
        pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # temb: whole [B, Cout]
        vec(cin), vec(cin),
        pl.BlockSpec((9 * cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        vec(cout), vec(cout), vec(cout),
        pl.BlockSpec((9 * cout, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        vec(cout),
    ]
    if has_skip:
        inputs += [params.ws.astype(jnp.bfloat16), row(params.bs, cout)]
        in_specs += [
            pl.BlockSpec((cin, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vec(cout),
        ]
        kernel = functools.partial(_kernel, H=h, W=w, groups=groups, eps=eps)
    else:
        kernel = functools.partial(
            _skipless_kernel, H=h, W=w, groups=groups, eps=eps
        )

    # Per-output-element MAC cost of one 3x3 conv producing cout channels
    # from c_in input channels is 9·c_in·cout; conv1 reads cin, conv2 reads
    # cout, so the two convs total 9·h·(w+2)·(cin + cout)·cout MACs (×2 for
    # multiply+add). The (w+2) reflects the halo columns each row convolves.
    conv_flops = 2 * 9 * h * (w + 2) * (cin + cout) * cout * b
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bt, h, w, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=conv_flops,
            bytes_accessed=b * h * w * (cin + cout) * x.dtype.itemsize
            + 9 * (cin + cout) * cout * 2,
            transcendentals=b * h * w * (cin + cout),
        ),
        # Mosaic's scoped-vmem default (16 MB) undercounts this kernel's
        # unrolled-tap live ranges; raise it (physical VMEM is far larger —
        # jax's own flash-attention kernels set 128 MB).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)


def _skipless_kernel(*refs, **kw):
    """`_kernel` arity without the shortcut operands (identity skip)."""
    *main, o_ref = refs
    _kernel(*main, None, None, o_ref, **kw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _block(params, x, temb_proj, groups, eps, interpret):
    return _pallas_impl(params, x, temb_proj, groups, eps, interpret)


def _fwd(params, x, temb_proj, groups, eps, interpret):
    out = _pallas_impl(params, x, temb_proj, groups, eps, interpret)
    return out, (params, x, temb_proj)


def _bwd(groups, eps, interpret, residuals, g):
    params, x, temb_proj = residuals
    ref_out, vjp = jax.vjp(
        lambda p, xi, t: resnet_block_ref(p, xi, t, groups=groups, eps=eps),
        params, x, temb_proj,
    )
    # The cotangent must match the reference function's OWN output dtype
    # (bf16 activations ⇒ bf16 pullback input; fp32 would make jax.vjp
    # reject the cotangent).
    dp, dx, dt = vjp(g.astype(ref_out.dtype))
    return dp, dx.astype(x.dtype), dt.astype(temb_proj.dtype)


_block.defvjp(_fwd, _bwd)


def resnet_block_pallas(
    params: ResnetParams,
    x: jax.Array,  # [B, H, W, Cin]
    temb_proj: jax.Array,  # [B, Cout]
    *,
    groups: int = 32,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """Fused resnet block forward; backward through `resnet_block_ref`
    (identical math), so the op is trainable."""
    return _block(params, x, temb_proj, groups, eps, interpret)
