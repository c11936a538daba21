"""Pure-JAX SE(3) / rotation parameterization utilities.

TPU-native replacement for the reference's pytorch3d / mathutils /
hand-rolled torch rotation conversions (reference: optimization/utils.py,
optimization/pose_array.py). All functions are jit-safe, batched, and
differentiable; the axis-angle exponential map uses a Taylor-safe form
near theta=0 (the reference's Rodrigues form divides by ||w|| and
produces NaN at identity — a documented quirk we deliberately fix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def axis_angle_to_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map. w: [..., 3] -> R: [..., 3, 3].

    Taylor-safe at theta -> 0: sin(t)/t -> 1, (1-cos t)/t^2 -> 1/2.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < _EPS

    # K = [w]_x (the skew-symmetric cross-product matrix of the *unnormalized* w)
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, _EPS * _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    # K @ K == w w^T - theta^2 I  (exact closed form; avoids a batched
    # 3x3 matmul that default matmul precision would run in bf16 on TPU).
    KK = w[..., :, None] * w[..., None, :] - theta_sq[..., None, None] * eye
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w, x, y, z).

    Branch-free Shepperd-style selection of the numerically best of the
    four candidate formulations (same contract as pytorch3d's
    matrix_to_quaternion used at reference optimization/utils.py:23-28).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # Four candidate squared magnitudes (may be <=0 off-branch; clamp).
    qw_sq = 1.0 + m00 + m11 + m22
    qx_sq = 1.0 + m00 - m11 - m22
    qy_sq = 1.0 - m00 + m11 - m22
    qz_sq = 1.0 - m00 - m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Candidate quaternions from each pivot (unnormalized).
    qw = _safe_sqrt(qw_sq)
    q0 = jnp.stack([qw_sq, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (2.0 * qw)[..., None]
    qx = _safe_sqrt(qx_sq)
    q1 = jnp.stack([m21 - m12, qx_sq, m01 + m10, m02 + m20], axis=-1) / (2.0 * qx)[..., None]
    qy = _safe_sqrt(qy_sq)
    q2 = jnp.stack([m02 - m20, m01 + m10, qy_sq, m12 + m21], axis=-1) / (2.0 * qy)[..., None]
    qz = _safe_sqrt(qz_sq)
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz_sq], axis=-1) / (2.0 * qz)[..., None]

    mags = jnp.stack([qw_sq, qx_sq, qy_sq, qz_sq], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> axis-angle vector [..., 3]."""
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # w >= 0 => theta in [0, pi]
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1)
    half = jnp.arctan2(norm, w)
    theta = 2.0 * half
    # theta / sin(half) with Taylor fallback: theta/sin(t/2) ~ 2 + theta^2/12
    scale = jnp.where(norm < 1e-8, 2.0 + theta * theta / 12.0, theta / jnp.maximum(norm, 1e-12))
    return xyz * scale[..., None]


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> axis-angle [..., 3] (log map)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(R))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Continuous 6D rotation representation (Zhou et al.) -> [..., 3, 3]."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2).swapaxes(-1, -2)


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> 6D representation (first two columns, row-major)."""
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def _compose_se3(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def at_to_transform_matrix(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """(axis-angle [..., 3], translation [..., 3]) -> SE(3) [..., 4, 4]."""
    return _compose_se3(axis_angle_to_matrix(rot), trans)


def qt_to_transform_matrix(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """(quaternion [..., 4], translation [..., 3]) -> SE(3) [..., 4, 4]."""
    return _compose_se3(quaternion_to_matrix(rot), trans)


def six_t_to_transform_matrix(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """(6D rotation [..., 6], translation [..., 3]) -> SE(3) [..., 4, 4]."""
    return _compose_se3(rotation_6d_to_matrix(rot), trans)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of an SE(3) matrix [..., 4, 4] (no linalg.inv)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return _compose_se3(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def get_pose_representation(rot_rep: str):
    """Return (matrix_to_tensor, matrix_from_tensor) for a rotation rep.

    Mirrors reference coslam.py:51-65 ('axis_angle' | 'quat').
    """
    if rot_rep == "axis_angle":
        return matrix_to_axis_angle, at_to_transform_matrix
    if rot_rep == "quat":
        return matrix_to_quaternion, qt_to_transform_matrix
    raise NotImplementedError(f"Unknown rotation representation: {rot_rep}")
