"""One-level Haar DWT/IDWT as in-graph XLA ops (NHWC, exact in fp32).

The reference runs this per channel on the CPU through pywt with
numpy↔tensor round-trips inside DataLoader workers
(`utils/wavelet.py:4-67`) — flagged in SURVEY §2.4 as a host-side bottleneck.
Here the transform is a pure reshape-butterfly on device (Haar coefficients
are ±½, exact in float32), fused by XLA into the input stage — no host
round-trip, fully batched.

Conventions match pywt's ``dwt2(x, 'haar')`` with the standard quadrant sums
(a=x[0::2,0::2], b=x[0::2,1::2], c=x[1::2,0::2], d=x[1::2,1::2]):

    cA = (a + b + c + d)/2        cH = (a + b − c − d)/2
    cV = (a − b + c − d)/2        cD = (a − b − c + d)/2

Channel layout matches the reference's interleave: output channel
``4·i + k`` holds coefficient k ∈ {cA, cH, cV, cD} of input channel i
(`utils/wavelet.py:28-33`). Shapes: ``[..., H, W, C] → [..., H/2, W/2, 4C]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["haar_dwt2", "haar_idwt2"]


def haar_dwt2(x: jax.Array) -> jax.Array:
    """``[..., H, W, C] → [..., H/2, W/2, 4C]`` one-level Haar decomposition."""
    *lead, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"H,W must be even, got {h}x{w}"
    a = x[..., 0::2, 0::2, :]
    b = x[..., 0::2, 1::2, :]
    cc = x[..., 1::2, 0::2, :]
    d = x[..., 1::2, 1::2, :]
    ca = (a + b + cc + d) * 0.5
    ch = (a + b - cc - d) * 0.5
    cv = (a - b + cc - d) * 0.5
    cd = (a - b - cc + d) * 0.5
    # interleave: out channel 4i+k = coeff k of channel i
    out = jnp.stack([ca, ch, cv, cd], axis=-1)  # [..., H/2, W/2, C, 4]
    return out.reshape(*lead, h // 2, w // 2, 4 * c)


def haar_idwt2(y: jax.Array) -> jax.Array:
    """``[..., H/2, W/2, 4C] → [..., H, W, C]`` exact inverse of :func:`haar_dwt2`."""
    *lead, hh, ww, c4 = y.shape
    assert c4 % 4 == 0, f"channel count {c4} not divisible by 4"
    c = c4 // 4
    y = y.reshape(*lead, hh, ww, c, 4)
    ca, ch, cv, cd = y[..., 0], y[..., 1], y[..., 2], y[..., 3]
    a = (ca + ch + cv + cd) * 0.5
    b = (ca + ch - cv - cd) * 0.5
    cc = (ca - ch + cv - cd) * 0.5
    d = (ca - ch - cv + cd) * 0.5
    # un-butterfly: place quadrants back on the even/odd grid
    top = jnp.stack([a, b], axis=-2).reshape(*lead, hh, 2 * ww, c)
    bot = jnp.stack([cc, d], axis=-2).reshape(*lead, hh, 2 * ww, c)
    out = jnp.stack([top, bot], axis=-3)  # [..., hh, 2, 2ww, c]
    return out.reshape(*lead, 2 * hh, 2 * ww, c)
