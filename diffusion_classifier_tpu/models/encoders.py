"""Prompt/condition encoders for the diffusion classifier.

Reproduces the reference's three ``encoder_type`` modes
(`diffusion/diffusion_classifier.py:58-98`):

- ``'nn'``  — learnable ``Embed(classes + 1, encoder_hid_dim)`` with the null
  token at index ``classes``; output is a one-token sequence ``[B, 1, D]``
  (reference ``unsqueeze_(1)`` at `:89`), consumed by UNet cross-attention.
- ``'DiT'`` — pass integer class labels through unchanged; the DiT backbone
  owns its internal AdaLN class table (null token = index ``classes``).
- ``'t5'``  — frozen text encoder. Deliberately pluggable-but-stubbed: the
  in-tree reference experiments never exercise it (SURVEY §2.2), and this
  environment has no weights to download. Hook point kept for parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ClassEmbedder", "null_token", "make_encoder"]


def null_token(num_classes: int) -> int:
    """The CFG null-condition token id (reference `:70,74`)."""
    return num_classes


class ClassEmbedder(nn.Module):
    """``encoder_type='nn'``: ``Embed(classes+1, dim)`` → ``[B, 1, dim]``."""

    num_classes: int
    embedding_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jax.Array) -> jax.Array:
        emb = nn.Embed(
            self.num_classes + 1,
            self.embedding_dim,
            dtype=self.dtype,
            name="embedding",
        )(labels.astype(jnp.int32))
        return emb[:, None, :]


def make_encoder(
    encoder_type: Optional[str],
    *,
    num_classes: int,
    embedding_dim: Optional[int] = None,
    dtype: jnp.dtype = jnp.float32,
):
    """Build the encoder module (or None for label passthrough / unconditional).

    Returns ``(module_or_none, null_token_id)``.
    """
    if encoder_type == "nn":
        assert embedding_dim is not None, "encoder_type='nn' needs embedding_dim"
        return (
            ClassEmbedder(num_classes, embedding_dim, dtype=dtype),
            null_token(num_classes),
        )
    if encoder_type == "DiT":
        return None, null_token(num_classes)
    if encoder_type == "t5":
        raise NotImplementedError(
            "t5 text encoding is a parity hook; the reference's in-tree "
            "experiments only use encoder_type in {'nn', 'DiT'} (SURVEY §2.2)."
        )
    if encoder_type is None:
        return None, null_token(num_classes)
    raise ValueError(f"Unknown encoder_type {encoder_type!r}")
