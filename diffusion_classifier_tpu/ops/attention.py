"""Multi-head attention ops for denoiser backbones.

Single entry point :func:`attention` over ``[B, S, H, D]`` tensors. Two
backends:

- ``"xla"`` — `jax.nn.dot_product_attention`, which XLA fuses into an MXU
  flash-attention-style kernel. Default and always correct.
- ``"pallas"`` — hand-written TPU flash-attention kernel (`ops/flash_attention.py`),
  used when shapes satisfy its tiling constraints; falls back to XLA otherwise.

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
    if backend == "pallas":
        from .flash_attention import flash_attention, supports

        if supports(q, k, v):
            return flash_attention(q, k, v)
        backend = "xla"
    if backend == "xla":
        return jax.nn.dot_product_attention(q, k, v)
    raise ValueError(f"Unknown attention backend {backend!r}")
