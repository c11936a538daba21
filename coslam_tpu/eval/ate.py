"""Absolute trajectory error (ATE) evaluation, TUM protocol.

Pure-numpy port of the reference tooling (reference: tools/eval_ate.py):
timestamp association, Horn closed-form SE(3) alignment, RMSE/mean/
median statistics, trajectory plots, and the pose_evaluation entry point
(4x4 poses -> quat+trans with nan/inf GT masking). No torch, no
mathutils — rotation->quaternion is a closed-form numpy conversion.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """3x3 rotation -> quaternion (w, x, y, z), numerically robust."""
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
    return np.concatenate([q[3:], q[:3]])


def get_tensor_from_camera(RT: np.ndarray, Tquad: bool = False) -> np.ndarray:
    """4x4 (or 3x4) pose -> [quat, trans] or [trans, quad]
    (reference tools/eval_ate.py:10-33)."""
    R, T = RT[:3, :3], RT[:3, 3]
    quad = rotmat_to_quat(R)
    if Tquad:
        return np.concatenate([T, quad], 0)
    return np.concatenate([quad, T], 0)


def associate(first_list: Dict, second_list: Dict, offset: float = 0.0,
              max_difference: float = 0.02):
    """Greedy closest-timestamp association (reference tools/eval_ate.py:35-65)."""
    first_keys = list(first_list.keys())
    second_keys = list(second_list.keys())
    potential = sorted(
        (abs(a - (b + offset)), a, b)
        for a in first_keys for b in second_keys
        if abs(a - (b + offset)) < max_difference)
    matches = []
    fset, sset = set(first_keys), set(second_keys)
    for diff, a, b in potential:
        if a in fset and b in sset:
            fset.remove(a)
            sset.remove(b)
            matches.append((a, b))
    matches.sort()
    return matches


def align(model: np.ndarray, data: np.ndarray):
    """Horn closed-form SE(3) alignment of two 3xN trajectories.

    Returns (rot 3x3, trans 3x1, per-point translational error [N])
    (reference tools/eval_ate.py:67-101).
    """
    model_zc = model - model.mean(1, keepdims=True)
    data_zc = data - data.mean(1, keepdims=True)

    W = model_zc @ data_zc.T
    U, d, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(1, keepdims=True) - rot @ model.mean(1, keepdims=True)

    aligned = rot @ model + trans
    err = aligned - data
    trans_error = np.sqrt(np.sum(err * err, axis=0))
    return rot, trans, trans_error


def evaluate_ate(first_list: Dict, second_list: Dict, plot: str = "",
                 offset: float = 0.0, scale: float = 1.0,
                 max_difference: float = 0.02) -> Dict:
    """ATE statistics between GT (first) and estimated (second)
    {stamp: [tx, ty, tz, ...]} dicts (reference tools/eval_ate.py:134-245)."""
    matches = associate(first_list, second_list, offset, max_difference)
    if len(matches) < 2 and len(first_list) > 5:
        raise ValueError("Couldn't find matching timestamp pairs between "
                         "groundtruth and estimated trajectory!")

    first_xyz = np.array([[float(v) for v in first_list[a][0:3]]
                          for a, b in matches]).T
    second_xyz = np.array([[float(v) * scale for v in second_list[b][0:3]]
                           for a, b in matches]).T

    rot, trans, trans_error = align(second_xyz, first_xyz)
    # Unaligned error: both trajectories share the first-frame anchor,
    # so this is the reference ScanNet tables' "w/o align" column
    # (evaluation/benchmark/scannet/README.md reports both).
    raw_error = np.linalg.norm(second_xyz - first_xyz, axis=0)

    if plot:
        _plot_trajectories(plot, first_list, second_list, matches, rot, trans,
                           scale, trans_error)

    return {
        "compared_pose_pairs": len(trans_error),
        "absolute_translational_error.rmse":
            float(np.sqrt(np.dot(trans_error, trans_error) / len(trans_error))),
        "absolute_translational_error.mean": float(np.mean(trans_error)),
        "absolute_translational_error.median": float(np.median(trans_error)),
        "absolute_translational_error.std": float(np.std(trans_error)),
        "absolute_translational_error.min": float(np.min(trans_error)),
        "absolute_translational_error.max": float(np.max(trans_error)),
        "absolute_translational_error.rmse_noalign":
            float(np.sqrt(np.dot(raw_error, raw_error) / len(raw_error))),
    }


def _plot_trajectories(path, first_list, second_list, matches, rot, trans,
                       scale, trans_error):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    stamps1 = sorted(first_list.keys())
    stamps2 = sorted(second_list.keys())
    xyz1 = np.array([[float(v) for v in first_list[s][0:3]] for s in stamps1]).T
    xyz2 = np.array([[float(v) * scale for v in second_list[s][0:3]]
                     for s in stamps2]).T
    xyz2_aligned = rot @ xyz2 + trans

    fig, ax = plt.subplots()
    ate = np.sqrt(np.dot(trans_error, trans_error) / len(trans_error))
    ax.set_title(f"len:{len(trans_error)} ATE RMSE:{ate:.4f}")
    ax.plot(xyz1[0], xyz1[1], "-", color="black", label="ground truth")
    ax.plot(xyz2_aligned[0], xyz2_aligned[1], "-", color="blue",
            label="estimated")
    ax.legend()
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    fig.savefig(path, dpi=90)
    plt.close(fig)


def convert_poses(c2w_list: Dict[int, np.ndarray], N: int, scale: float,
                  gt: bool = True):
    """4x4 pose dict -> ([N, 7] trans+quat array, validity mask), masking
    nan/inf GT poses (reference tools/eval_ate.py:259-276)."""
    poses = []
    mask = np.ones(N, bool)
    for idx in range(N):
        c2w = np.array(c2w_list[idx], np.float64, copy=True)
        if gt and (np.any(np.isinf(c2w)) or np.any(np.isnan(c2w))):
            mask[idx] = False
            continue
        c2w[:3, 3] /= scale
        poses.append(get_tensor_from_camera(c2w, Tquad=True))
    return np.stack(poses), mask


def pose_evaluation(poses_gt: Dict[int, np.ndarray],
                    poses_est: Dict[int, np.ndarray], scale: float,
                    path_to_save: str, i: int, img: str = "pose",
                    name: str = "output.txt") -> Dict:
    """End-of-run / periodic ATE evaluation writing output.txt + plot
    (reference tools/eval_ate.py:278-288)."""
    N = len(poses_est)
    gt_arr, mask = convert_poses(poses_gt, N, scale)
    est_arr, _ = convert_poses(poses_est, N, scale, gt=False)
    est_arr = est_arr[mask[:len(est_arr)]]

    gt_dict = {k: gt_arr[k] for k in range(len(gt_arr))}
    est_dict = {k: est_arr[k] for k in range(len(est_arr))}

    os.makedirs(path_to_save, exist_ok=True)
    plt_path = os.path.join(path_to_save, f"{img}_{i}.png")
    results = evaluate_ate(gt_dict, est_dict, plot=plt_path)
    results["Name"] = i
    with open(os.path.join(path_to_save, name), "a") as f:
        print(results, file=f)
    return results
