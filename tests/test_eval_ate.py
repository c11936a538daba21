"""ATE evaluation: Horn alignment recovers known rigid transforms."""

import numpy as np
from scipy.spatial.transform import Rotation

from coslam_tpu.eval.ate import align, associate, evaluate_ate, pose_evaluation


def _traj(n=50, rng=None):
    rng = rng or np.random.default_rng(0)
    t = np.linspace(0, 4 * np.pi, n)
    return np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=0)  # 3xN


def test_align_exact():
    model = _traj()
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    data = R @ model + np.array([[1.0], [2.0], [-0.5]])
    rot, trans, err = align(model, data)
    np.testing.assert_allclose(rot, R, atol=1e-8)
    assert err.max() < 1e-8


def test_evaluate_ate_with_noise(rng):
    model = _traj()
    R = Rotation.from_rotvec([0.1, 0.2, -0.3]).as_matrix()
    noise = 0.01 * rng.standard_normal(model.shape)
    data = R @ model + np.array([[1.0], [0.0], [0.0]]) + noise
    gt = {i: model[:, i] for i in range(model.shape[1])}
    est = {i: data[:, i] for i in range(model.shape[1])}
    res = evaluate_ate(gt, est)
    rmse = res["absolute_translational_error.rmse"]
    assert 0.001 < rmse < 0.03
    # The "w/o align" column (reference ScanNet tables): the rigid
    # offset stays in the error, so it dwarfs the aligned RMSE here.
    assert res["absolute_translational_error.rmse_noalign"] > 0.5
    exact = evaluate_ate(gt, {i: model[:, i] for i in range(model.shape[1])})
    assert exact["absolute_translational_error.rmse_noalign"] < 1e-9


def test_associate_offsets():
    first = {0.0: [0], 1.0: [1], 2.0: [2]}
    second = {0.005: [0], 1.004: [1], 5.0: [2]}
    matches = associate(first, second)
    assert matches == [(0.0, 0.005), (1.0, 1.004)]


def test_pose_evaluation_end_to_end(tmp_path, rng):
    n = 20
    poses = {}
    for i in range(n):
        c2w = np.eye(4)
        c2w[:3, :3] = Rotation.from_rotvec([0, 0, 0.1 * i]).as_matrix()
        c2w[:3, 3] = [np.cos(0.3 * i), np.sin(0.3 * i), 0.05 * i]
        poses[i] = c2w
    est = {i: poses[i] + 0.0 for i in range(n)}
    for i in range(n):
        est[i] = est[i].copy()
        est[i][:3, 3] += 0.005 * rng.standard_normal(3)
    res = pose_evaluation(poses, est, 1, str(tmp_path), 0)
    assert res["absolute_translational_error.rmse"] < 0.02
    assert (tmp_path / "output.txt").exists()
    assert (tmp_path / "pose_0.png").exists()


def test_pose_evaluation_masks_invalid_gt(tmp_path):
    n = 10
    poses = {i: np.eye(4) + 0.0 for i in range(n)}
    for i in range(n):
        poses[i] = poses[i].copy()
        poses[i][:3, 3] = [0.2 * i, 0, 0]
    est = {i: poses[i].copy() for i in range(n)}
    poses[3] = poses[3].copy()
    poses[3][0, 0] = np.nan  # invalid GT frame must be skipped
    res = pose_evaluation(poses, est, 1, str(tmp_path), 1)
    assert res["compared_pose_pairs"] == n - 1
    assert res["absolute_translational_error.rmse"] < 1e-6
