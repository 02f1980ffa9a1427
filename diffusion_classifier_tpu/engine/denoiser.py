"""Conditional denoiser: backbone + prompt encoder as one Flax module.

Bundling the encoder with the backbone puts the learnable class-embedding
table (`encoder_type='nn'`) inside the same parameter pytree as the UNet, so
one `jax.grad` covers both — the reference reaches the same effect by
registering the embedding with Accelerate separately
(`diffusion/diffusion_classifier.py:385-386`).

Two conditioning modes (reference `encode_text_prompt`, `:83-98`):

- ``context`` — labels → encoder → ``[B, 1, D]`` tokens → backbone
  cross-attention (``encoder_type='nn'``).
- ``labels`` — integer labels handed straight to the backbone, which owns an
  internal class table (``encoder_type='DiT'``).

The public call signature is always ``(z_t, logsnr_t, labels)`` with integer
labels (null token = ``num_classes``); classification and CFG operate purely
on label ids.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Denoiser"]


class Denoiser(nn.Module):
    backbone: nn.Module
    encoder: Optional[nn.Module]  # None → 'labels' passthrough mode

    @nn.compact
    def __call__(
        self,
        z_t: jax.Array,
        logsnr_t: jax.Array,
        labels: jax.Array,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        if self.encoder is not None:
            context = self.encoder(labels)
            return self.backbone(
                z_t, logsnr_t, context, deterministic=deterministic
            )
        return self.backbone(
            z_t, logsnr_t, labels, deterministic=deterministic
        )
