"""Rotation fold/unfold for the four blind-spot branches.

The reference runs four sequential shared-weight U-Net passes over 90-degree
rotated inputs (SURVEY.md §3.3). TPU-first redesign: the four rotations are
*folded into the batch dimension* — one (4B, H, W, C) tensor through one conv
stack — so the MXU sees a 4x larger batch instead of 4 small launches, and
weight sharing holds by construction ([B]: "four 90°-rotated input branches
fused into one batched ... conv path").

Rotations are pure data movement (transpose + reverse); XLA fuses them into
the surrounding program. Square spatial dims are required to batch the four
orientations together.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rot90(x: jax.Array, k: int) -> jax.Array:
    """Rotate NHWC images counter-clockwise by k*90 degrees in the (H, W)
    plane."""
    k %= 4
    if k == 0:
        return x
    if k == 1:
        return jnp.flip(jnp.swapaxes(x, 1, 2), axis=1)
    if k == 2:
        return jnp.flip(x, axis=(1, 2))
    return jnp.flip(jnp.swapaxes(x, 1, 2), axis=2)


def rotation_stack(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (4B, H, W, C): branch-major stack of the 4 rotations.

    Branch k holds the input rotated by k*90 deg CCW; requires H == W.
    """
    if x.shape[1] != x.shape[2]:
        raise ValueError(
            f"rotation_stack requires square inputs, got {x.shape[1]}x{x.shape[2]}"
        )
    return jnp.concatenate([rot90(x, k) for k in range(4)], axis=0)


def rotation_unstack(y: jax.Array) -> jax.Array:
    """(4B, H, W, C) -> (B, H, W, 4C): inverse-rotate each branch back to the
    input frame and concatenate along channels (SURVEY.md §2.4: derotate,
    concat -> 384 ch before the 1x1 head)."""
    b4 = y.shape[0]
    if b4 % 4:
        raise ValueError(f"leading dim {b4} not divisible by 4")
    b = b4 // 4
    branches = [rot90(y[k * b : (k + 1) * b], -k) for k in range(4)]
    return jnp.concatenate(branches, axis=-1)
