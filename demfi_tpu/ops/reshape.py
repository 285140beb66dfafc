"""Space-to-depth / depth-to-space with PyTorch channel ordering, in NHWC.

The reference uses ``pixel_reshuffle`` (/root/reference/DeMFInet.py:290-316)
to fold a 2x2 spatial neighborhood into channels before the RDB backbone,
and ``nn.PixelShuffle`` (DeMFInet.py:230) to unfold it in the UPNet head.
The exact element ordering matters for porting released checkpoints: torch
orders the folded channel axis as (c, ry, rx) with c-major. These NHWC
versions preserve that ordering, so converted conv weights line up without
any channel permutation.
"""
from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H//r, W//r, C*r*r].

    Output channel index (c * r + ry) * r + rx, matching the reference's
    ``pixel_reshuffle`` permute(0, 1, 3, 5, 2, 4) ordering in NCHW.
    """
    b, h, w, c = x.shape
    if h % r or w % r:
        raise ValueError(f"space_to_depth: {h}x{w} not divisible by r={r}")
    x = x.reshape(b, h // r, r, w // r, r, c)
    # -> [B, H/r, W/r, C, ry, rx]
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C*r*r] -> [B, H*r, W*r, C].

    Inverse of :func:`space_to_depth`; matches ``torch.nn.PixelShuffle``
    element ordering (input channel (c*r + ry)*r + rx -> output channel c
    at spatial offset (ry, rx)).
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    if c * r * r != crr:
        raise ValueError(f"depth_to_space: C={crr} not divisible by r^2={r*r}")
    x = x.reshape(b, h, w, c, r, r)
    # -> [B, H, ry, W, rx, C]
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)
