"""Rotation/SE(3) conversions vs scipy.spatial.transform closed forms."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from coslam_tpu.ops import pose


def random_rotvecs(rng, n=32, scale=2.0):
    return (rng.standard_normal((n, 3)) * scale).astype(np.float32)


def test_axis_angle_to_matrix_matches_scipy(rng):
    w = random_rotvecs(rng)
    R_ours = np.asarray(pose.axis_angle_to_matrix(jnp.asarray(w)))
    R_scipy = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)


def test_axis_angle_identity_is_safe():
    R = np.asarray(pose.axis_angle_to_matrix(jnp.zeros((2, 3))))
    assert np.all(np.isfinite(R))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_matrix_to_quaternion_roundtrip(rng):
    w = random_rotvecs(rng)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    q = np.asarray(pose.matrix_to_quaternion(jnp.asarray(R)))
    # scipy uses (x, y, z, w); ours is (w, x, y, z)
    q_scipy = Rotation.from_matrix(R).as_quat()
    q_scipy = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
    sign = np.sign(q_scipy[:, :1])
    sign[sign == 0] = 1
    np.testing.assert_allclose(q, q_scipy * sign, atol=1e-5)

    R_back = np.asarray(pose.quaternion_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_matrix_to_axis_angle_roundtrip(rng):
    w = random_rotvecs(rng, scale=1.0)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    w_back = np.asarray(pose.matrix_to_axis_angle(jnp.asarray(R)))
    np.testing.assert_allclose(w_back, w, atol=1e-4)


def test_at_to_transform_matrix(rng):
    w = random_rotvecs(rng, n=4, scale=0.5)
    t = rng.standard_normal((4, 3)).astype(np.float32)
    T = np.asarray(pose.at_to_transform_matrix(jnp.asarray(w), jnp.asarray(t)))
    assert T.shape == (4, 4, 4)
    np.testing.assert_allclose(T[:, :3, :3], Rotation.from_rotvec(w).as_matrix(),
                               atol=1e-5)
    np.testing.assert_allclose(T[:, :3, 3], t, atol=1e-6)
    np.testing.assert_allclose(T[:, 3], np.broadcast_to([0, 0, 0, 1], (4, 4)),
                               atol=0)


def test_six_t_roundtrip(rng):
    w = random_rotvecs(rng, n=8, scale=1.0)
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    d6 = np.asarray(pose.matrix_to_rotation_6d(jnp.asarray(R)))
    R_back = np.asarray(pose.rotation_6d_to_matrix(jnp.asarray(d6)))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_se3_inverse(rng):
    w = random_rotvecs(rng, n=8, scale=1.0)
    t = rng.standard_normal((8, 3)).astype(np.float32)
    T = np.asarray(pose.at_to_transform_matrix(jnp.asarray(w), jnp.asarray(t)))
    Tinv = np.asarray(pose.se3_inverse(jnp.asarray(T)))
    prod = np.einsum("bij,bjk->bik", T, Tinv)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (8, 4, 4)),
                               atol=1e-5)


def test_get_pose_representation():
    to_t, from_t = pose.get_pose_representation("axis_angle")
    assert to_t is pose.matrix_to_axis_angle
    to_t, from_t = pose.get_pose_representation("quat")
    assert to_t is pose.matrix_to_quaternion
    with pytest.raises(NotImplementedError):
        pose.get_pose_representation("euler")
