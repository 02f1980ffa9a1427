"""Multi-head attention ops for denoiser backbones.

Single entry point :func:`attention` over ``[B, S, H, D]`` tensors. Three
backends:

- ``"xla"`` — `jax.nn.dot_product_attention`, which XLA fuses into an MXU
  flash-attention-style kernel. Always correct.
- ``"pallas"`` — hand-written TPU flash-attention kernel (`ops/flash_attention.py`),
  used when shapes satisfy its tiling constraints; falls back to XLA otherwise.
- ``"auto"`` — measured routing (TPU v5e, BASELINE.md): the fused-heads
  pallas kernel wins 2.2x at 1024-token sequences (the 256px+DWT DiT-b4
  shape) and 1.6x at 256 tokens, but still loses at the 128-token
  small-UNet levels, so auto picks pallas for ``S ≥ 256`` when supported,
  xla otherwise.

The reference delegates attention to diffusers/torch CUDA kernels
(`nets/unet.py`, via `diffusers` blocks); here it is a first-party TPU op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["attention"]


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    backend: str = "xla",
) -> jax.Array:
    """Scaled dot-product attention over ``[B, S, H, D]`` (BSHD layout).

    Softmax accumulates in float32; output dtype matches ``q``.
    """
    if backend == "auto":
        backend = "pallas" if q.shape[1] >= 256 else "xla"
    if backend == "pallas":
        from .flash_attention import flash_attention, supports

        if supports(q, k, v):
            return flash_attention(q, k, v)
        backend = "xla"
    if backend == "xla":
        return jax.nn.dot_product_attention(q, k, v)
    raise ValueError(f"Unknown attention backend {backend!r}")
