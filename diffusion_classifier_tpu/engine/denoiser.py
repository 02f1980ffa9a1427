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

__all__ = ["Denoiser", "supports_prefix"]


class Denoiser(nn.Module):
    backbone: nn.Module
    encoder: Optional[nn.Module]  # None → 'labels' passthrough mode

    @nn.compact
    def __call__(
        self,
        z_t: Optional[jax.Array],
        logsnr_t: Optional[jax.Array],
        labels: Optional[jax.Array],
        *,
        deterministic: bool = True,
        mode: str = "full",
        prefix_state=None,
    ) -> jax.Array:
        """Forward; ``mode`` mirrors the UNet's prefix/tail split.

        - ``'full'``   — ordinary forward (all backbones).
        - ``'encode'`` — conditioning-independent prefix; labels ignored.
        - ``'tail'``   — conditioned remainder from ``prefix_state``.
        Only backbones exposing the mode kwarg (UNetCondition2D) support
        encode/tail; use :func:`supports_prefix` to check.
        """
        if mode == "encode":
            return self.backbone(
                z_t, logsnr_t, None, deterministic=deterministic, mode="encode"
            )
        cond = self.encoder(labels) if self.encoder is not None else labels
        if mode == "tail":
            return self.backbone(
                None,
                None,
                cond,
                deterministic=deterministic,
                mode="tail",
                prefix_state=prefix_state,
            )
        return self.backbone(z_t, logsnr_t, cond, deterministic=deterministic)


def supports_prefix(backbone) -> bool:
    """True if the backbone exposes the encode/tail split with a nonempty prefix."""
    return getattr(backbone, "prefix_split", 0) > 0
