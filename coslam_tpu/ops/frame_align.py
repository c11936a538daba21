"""Per-frame affine exposure alignment (defined-but-unused in the
reference: optimization/frame_align.py — kept for capability parity).

Each frame gets 4 parameters (3 per-channel gains + 1 offset) applied to
rendered RGB before the photometric loss, to absorb exposure changes.
"""

from __future__ import annotations

import jax.numpy as jnp


def init_frame_align(n_frames: int, dtype=jnp.float32) -> jnp.ndarray:
    """[N, 4]: gains init 1, offset init 0."""
    p = jnp.zeros((n_frames, 4), dtype)
    return p.at[:, :3].set(1.0)


def apply_frame_align(params: jnp.ndarray, frame_id, rgb: jnp.ndarray
                      ) -> jnp.ndarray:
    """rgb [..., 3] -> gains * rgb + offset for the given frame."""
    p = params[frame_id]
    return rgb * p[..., :3] + p[..., 3:4]
