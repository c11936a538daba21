"""Per-frame quaternion+translation pose table (functional PoseArray).

Equivalent of the reference's PoseArray nn.ParameterList of 7-vectors
(reference: optimization/pose_array.py) — an alternative differentiable
pose parameterization storing [qw, qx, qy, qz, tx, ty, tz] per frame,
used by the multiprocessing variant's pose updates. Here it is a plain
[N, 7] array with pure conversion functions (jit/grad-safe).
"""

from __future__ import annotations

import jax.numpy as jnp

from .pose import matrix_to_quaternion, quaternion_to_matrix


def init_pose_array(n_frames: int, dtype=jnp.float32) -> jnp.ndarray:
    """Identity poses: quaternion (1,0,0,0), zero translation."""
    arr = jnp.zeros((n_frames, 7), dtype)
    return arr.at[:, 0].set(1.0)


def set_pose(pose_array: jnp.ndarray, frame_id, c2w: jnp.ndarray) -> jnp.ndarray:
    """Write a 4x4 transform into slot frame_id."""
    q = matrix_to_quaternion(c2w[:3, :3])
    vec = jnp.concatenate([q, c2w[:3, 3]])
    return pose_array.at[frame_id].set(vec)


def get_transform(pose_array: jnp.ndarray, frame_id) -> jnp.ndarray:
    """Differentiable slot -> 4x4 transform (reference quad2rotation path,
    optimization/pose_array.py:6-61)."""
    vec = pose_array[frame_id]
    R = quaternion_to_matrix(vec[..., :4])
    batch = vec.shape[:-1]
    T = jnp.zeros(batch + (4, 4), pose_array.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(vec[..., 4:])
    T = T.at[..., 3, 3].set(1.0)
    return T
