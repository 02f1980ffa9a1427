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
import numpy as np
from flax import linen as nn

__all__ = [
    "ClassEmbedder",
    "FrozenTableEncoder",
    "build_t5_class_table",
    "null_token",
    "make_encoder",
]


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


class FrozenTableEncoder(nn.Module):
    """Constant (non-learnable) context table: labels → ``table[labels]``.

    Carrier for the ``'t5'`` mode: per-class text embeddings are precomputed
    ONCE by the frozen T5 encoder (:func:`build_t5_class_table`) and baked
    into the jitted programs as a constant — the reference re-runs tokenizer
    + T5 on every call (`diffusion/diffusion_classifier.py:93-98`), even
    inside the classify hot loop (`:697-698`).
    """

    table: jax.Array  # [num_classes + 1, seq, dim]; last row = null condition
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jax.Array) -> jax.Array:
        return jnp.asarray(self.table, self.dtype)[labels.astype(jnp.int32)]


def _default_tokenize(texts, max_length: int, model_path: str):
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_path)
    out = tokenizer(
        list(texts),
        return_tensors="np",
        padding="max_length",
        truncation=True,
        max_length=max_length,
    )
    return out["input_ids"], out["attention_mask"]


def build_t5_class_table(
    class_names,
    *,
    model=None,
    model_path: str = "t5-base",
    max_length: int = 8,
    tokenize_fn=None,
    null_text: str = "",
) -> jax.Array:
    """Precompute the ``[C+1, S, D]`` class-name embedding table with frozen T5.

    ``model`` may be a ready ``FlaxT5EncoderModel`` (tests use a tiny random
    one); otherwise it is loaded from ``model_path`` (a local directory in
    zero-egress environments). ``tokenize_fn(texts, max_length)`` overrides
    the HF tokenizer when its files are unavailable; it returns int ids or
    an ``(ids, attention_mask)`` pair (a bare ids array masks ``ids != 0``,
    T5's pad id).
    """
    if model is None:
        from transformers import FlaxT5EncoderModel

        model = FlaxT5EncoderModel.from_pretrained(model_path)
    texts = list(class_names) + [null_text]
    if tokenize_fn is not None:
        out = tokenize_fn(texts, max_length)
    else:
        out = _default_tokenize(texts, max_length, model_path)
    ids, mask = out if isinstance(out, tuple) else (out, out != 0)
    # np.array (not asarray): the row fix-up below must never write into a
    # caller-owned mask array
    mask = np.array(mask, dtype=np.int32)
    # an all-pad row (empty null_text under a stub tokenizer) must keep one
    # attended position — the HF tokenizer always emits at least an EOS
    mask[mask.sum(axis=-1) == 0, 0] = 1
    # the mask matters: without it, pad tokens contaminate every class
    # embedding (reference runs `self.encoder(**inputs)` with the
    # tokenizer's attention_mask, `diffusion/diffusion_classifier.py:94-97`)
    hidden = model(input_ids=ids, attention_mask=mask).last_hidden_state
    return jnp.asarray(hidden)


def make_encoder(
    encoder_type: Optional[str],
    *,
    num_classes: int,
    embedding_dim: Optional[int] = None,
    dtype: jnp.dtype = jnp.float32,
    t5_table: Optional[jax.Array] = None,
):
    """Build the encoder module (or None for label passthrough / unconditional).

    Returns ``(module_or_none, null_token_id)``. For ``'t5'`` pass a
    precomputed ``t5_table`` from :func:`build_t5_class_table`.
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
        assert t5_table is not None, (
            "encoder_type='t5' needs a precomputed class-embedding table "
            "(build_t5_class_table)"
        )
        assert t5_table.shape[0] == num_classes + 1
        return (
            FrozenTableEncoder(t5_table, dtype=dtype),
            null_token(num_classes),
        )
    if encoder_type is None:
        return None, null_token(num_classes)
    raise ValueError(f"Unknown encoder_type {encoder_type!r}")
