"""On-disk format parsing for TUM / ScanNet / Synthetic / Azure loaders,
using tiny generated fixtures in each dataset's native layout."""

import os

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from coslam_tpu.data.datasets import (AzureDataset, RGBDataset,
                                      ScannetDataset, TUMDataset)
from coslam_tpu.data.synth import make_synthetic_config


def _base_cfg(H, W, dataset, extra_cam=None):
    cfg = make_synthetic_config("unused", "unused", H=H, W=W)
    cfg["dataset"] = dataset
    cfg["cam"]["png_depth_scale"] = 1000.0
    if extra_cam:
        cfg["cam"].update(extra_cam)
    return cfg


def _write_img_pair(cdir, ddir, name, H, W, depth_scale, rng):
    rgbu = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(cdir, f"{name}.jpg"), rgbu)
    d = (rng.uniform(0.5, 3.0, (H, W)) * depth_scale).astype(np.uint16)
    cv2.imwrite(os.path.join(ddir, f"{name}.png"), d)


def test_tum_format(tmp_path):
    H, W, n = 24, 32, 5
    rng = np.random.default_rng(0)
    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()

    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(n):
        t = 100.0 + i * 0.1
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "rgb" / f"{t:.4f}.png"), img)
        d = (rng.uniform(0.5, 3.0, (H, W)) * 5000).astype(np.uint16)
        cv2.imwrite(str(root / "depth" / f"{t:.4f}.png"), d)
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        depth_lines.append(f"{t + 0.004:.4f} depth/{t:.4f}.png")
        q = Rotation.from_rotvec([0, 0, 0.05 * i]).as_quat()
        gt_lines.append(f"{t + 0.002:.4f} {0.1*i} 0.0 0.0 "
                        f"{q[0]} {q[1]} {q[2]} {q[3]}")
    hdr = "# header\n# header\n# header\n"
    (root / "rgb.txt").write_text(hdr + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text(hdr + "\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text(hdr + "\n".join(gt_lines) + "\n")

    cfg = _base_cfg(H, W, "tum", {"png_depth_scale": 5000.0})
    ds = TUMDataset(cfg, str(root))
    assert len(ds) == n
    b = ds[2]
    assert b["rgb"].shape == (H, W, 3)
    assert b["depth"].shape == (H, W)
    # pose: translation x = 0.2, OpenGL convention (y/z cols negated)
    np.testing.assert_allclose(b["c2w"][:3, 3], [0.2, 0, 0], atol=1e-6)
    R_gl = b["c2w"][:3, :3].copy()
    R_gl[:, 1] *= -1
    R_gl[:, 2] *= -1
    np.testing.assert_allclose(
        R_gl, Rotation.from_rotvec([0, 0, 0.1]).as_matrix(), atol=1e-6)


def test_scannet_format(tmp_path):
    H, W, n = 24, 32, 4
    rng = np.random.default_rng(1)
    root = tmp_path / "scannet"
    for sub in ("color", "depth", "pose"):
        (root / sub).mkdir(parents=True)
    for i in range(n):
        _write_img_pair(str(root / "color"), str(root / "depth"), str(i),
                        H, W, 1000.0, rng)
        c2w = np.eye(4)
        c2w[:3, 3] = [0.05 * i, 0, 0]
        lines = "\n".join(" ".join(str(v) for v in row) for row in c2w)
        (root / "pose" / f"{i}.txt").write_text(lines + "\n")

    cfg = _base_cfg(H, W, "scannet")
    cfg["cam"]["crop_edge"] = 2
    ds = ScannetDataset(cfg, str(root))
    assert len(ds) == n
    b = ds[1]
    assert b["rgb"].shape == (H - 4, W - 4, 3)   # crop_edge applied
    assert b["depth"].shape == (H - 4, W - 4)
    assert b["direction"].shape == (H - 4, W - 4, 3)
    np.testing.assert_allclose(b["c2w"][:3, 3], [0.05, 0, 0], atol=1e-6)


def test_synthetic_neuralrgbd_format(tmp_path):
    H, W, n = 24, 32, 4
    rng = np.random.default_rng(2)
    root = tmp_path / "rgbd"
    (root / "images").mkdir(parents=True)
    (root / "depth_filtered").mkdir()
    lines = []
    for i in range(n):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images" / f"img{i}.png"), img)
        d = (rng.uniform(0.5, 3.0, (H, W)) * 1000).astype(np.uint16)
        cv2.imwrite(str(root / "depth_filtered" / f"depth{i}.png"), d)
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0.1 * i, 0]
        if i == 2:
            c2w[0, 0] = np.nan  # invalid pose -> frame dropped
        for row in c2w:
            lines.append(" ".join(f"{v}" for v in row))
    (root / "poses.txt").write_text("\n".join(lines) + "\n")

    cfg = _base_cfg(H, W, "synthetic")
    ds = RGBDataset(cfg, str(root))
    assert len(ds) == n - 1  # nan-pose frame filtered
    b = ds[2]  # originally frame 3
    np.testing.assert_allclose(b["c2w"][:3, 3], [0, 0.3, 0], atol=1e-6)


def test_kitti_format(tmp_path):
    from coslam_tpu.data.datasets import KITTIDataset

    H, W, n = 24, 32, 4
    rng = np.random.default_rng(5)
    root = tmp_path / "kitti"
    (root / "image_2").mkdir(parents=True)
    (root / "depth").mkdir()
    rows = []
    for i in range(n):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "image_2" / f"{i:06d}.png"), img)
        d = (rng.uniform(1, 10, (H, W)) * 256).astype(np.uint16)
        cv2.imwrite(str(root / "depth" / f"{i:06d}.png"), d)
        c2w = np.eye(4)
        c2w[:3, 3] = [1.0 * i, 0, 0]
        rows.append(" ".join(str(v) for v in c2w[:3, :4].reshape(-1)))
    (root / "poses.txt").write_text("\n".join(rows) + "\n")

    cfg = _base_cfg(H, W, "kitti", {"png_depth_scale": 256.0})
    ds = KITTIDataset(cfg, str(root))
    assert len(ds) == n
    b = ds[3]
    assert b["rgb"].shape == (H, W, 3)
    np.testing.assert_allclose(b["c2w"][:3, 3], [3.0, 0, 0], atol=1e-6)
    assert 1.0 <= b["depth"].mean() <= 10.0


def test_azure_format(tmp_path):
    H, W, n = 24, 32, 3
    rng = np.random.default_rng(3)
    root = tmp_path / "azure"
    for sub in ("color", "depth", "scene"):
        (root / sub).mkdir(parents=True)
    log_lines = []
    for i in range(n):
        _write_img_pair(str(root / "color"), str(root / "depth"), str(i),
                        H, W, 1000.0, rng)
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 0.2 * i]
        log_lines.append(f"{i} {i} {i + 1}")
        for row in c2w:
            log_lines.append(" ".join(str(v) for v in row))
    (root / "scene" / "trajectory.log").write_text("\n".join(log_lines) + "\n")

    cfg = _base_cfg(H, W, "azure")
    ds = AzureDataset(cfg, str(root))
    assert len(ds) == n
    np.testing.assert_allclose(ds[2]["c2w"][:3, 3], [0, 0, 0.4], atol=1e-6)


def test_realsense_format(tmp_path):
    """align_mat.txt pre-multiplies the trajectory.log poses before the
    OpenGL flip, and cam.crop_edge shrinks the camera model."""
    from coslam_tpu.data.datasets import RealsenseDataset

    H, W, n = 24, 32, 3
    rng = np.random.default_rng(4)
    root = tmp_path / "rs"
    for sub in ("color", "depth", "scene"):
        (root / sub).mkdir(parents=True)
    align = np.eye(4)
    align[:3, 3] = [0.5, 0.0, 0.0]
    np.savetxt(str(root / "align_mat.txt"), align)
    log_lines = []
    for i in range(n):
        _write_img_pair(str(root / "color"), str(root / "depth"), str(i),
                        H, W, 1000.0, rng)
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 0.2 * i]
        log_lines.append(f"{i} {i} {i + 1}")
        for row in c2w:
            log_lines.append(" ".join(str(v) for v in row))
    (root / "scene" / "trajectory.log").write_text("\n".join(log_lines) + "\n")

    cfg = _base_cfg(H, W, "realsense", extra_cam={"crop_edge": 2})
    ds = RealsenseDataset(cfg, str(root))
    assert len(ds) == n
    b = ds[2]
    assert b["rgb"].shape == (H - 4, W - 4, 3)      # crop_edge applied
    assert b["direction"].shape == (H - 4, W - 4, 3)
    # align @ pose, then y/z columns flipped to OpenGL.
    np.testing.assert_allclose(b["c2w"][:3, 3], [0.5, 0, 0.4], atol=1e-6)
    np.testing.assert_allclose(b["c2w"][:3, :3],
                               np.diag([1.0, -1.0, -1.0]), atol=1e-6)


def test_iphone_format(tmp_path):
    """StrayScanner layout: images/ + depth/ + odometry.csv quaternion
    poses (x y z qx qy qz qw after two leading columns)."""
    from coslam_tpu.data.datasets import iPhoneDataset

    H, W, n = 24, 32, 3
    rng = np.random.default_rng(5)
    root = tmp_path / "iphone"
    (root / "images").mkdir(parents=True)
    (root / "depth").mkdir()
    rows = ["t, frame, x, y, z, qx, qy, qz, qw"]
    q = Rotation.from_rotvec([0.0, 0.3, 0.0]).as_quat()  # xyzw
    for i in range(n):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images" / f"{i:06d}.png"), img)
        d = (rng.uniform(0.5, 3.0, (H, W)) * 1000.0).astype(np.uint16)
        cv2.imwrite(str(root / "depth" / f"{i:06d}.png"), d)
        rows.append(f"{i * 0.1}, {i}, {0.1 * i}, 0.0, 0.0, "
                    f"{q[0]}, {q[1]}, {q[2]}, {q[3]}")
    (root / "odometry.csv").write_text("\n".join(rows) + "\n")

    cfg = _base_cfg(H, W, "iphone")
    ds = iPhoneDataset(cfg, str(root))
    assert len(ds) == n
    b = ds[1]
    assert b["rgb"].shape == (H, W, 3)
    np.testing.assert_allclose(b["c2w"][:3, 3], [0.1, 0, 0], atol=1e-6)
    R_gl = Rotation.from_rotvec([0.0, 0.3, 0.0]).as_matrix() @ np.diag(
        [1.0, -1.0, -1.0])
    np.testing.assert_allclose(b["c2w"][:3, :3], R_gl, atol=1e-6)


def test_iphone_mp4_extraction(tmp_path):
    """rgb.mp4 is extracted to images/ on first load (StrayScanner's raw
    capture layout). Skipped when no mp4 encoder is available."""
    from coslam_tpu.data.datasets import iPhoneDataset

    H, W, n = 24, 32, 4
    rng = np.random.default_rng(6)
    root = tmp_path / "iphone"
    root.mkdir()
    (root / "depth").mkdir()
    vw = cv2.VideoWriter(str(root / "rgb.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (W, H))
    if not vw.isOpened():
        pytest.skip("no mp4 encoder in this OpenCV build")
    for i in range(n):
        vw.write((rng.random((H, W, 3)) * 255).astype(np.uint8))
        d = (rng.uniform(0.5, 3.0, (H, W)) * 1000.0).astype(np.uint16)
        cv2.imwrite(str(root / "depth" / f"{i:06d}.png"), d)
    vw.release()
    rows = ["t, frame, x, y, z, qx, qy, qz, qw"]
    for i in range(n):
        rows.append(f"{i * 0.1}, {i}, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0")
    (root / "odometry.csv").write_text("\n".join(rows) + "\n")

    cfg = _base_cfg(H, W, "iphone")
    ds = iPhoneDataset(cfg, str(root))
    # The loader drops the mp4's final frame (StrayScanner writes one
    # more video frame than odometry rows).
    assert len(ds) == n - 1
    assert ds[0]["rgb"].shape == (H, W, 3)


# ---------------------------------------------------------------------------
# Adversarial fixtures: broken captures must fail with actionable errors
# (the reference loaders crash deep inside numpy/cv2 on all of these —
# reference datasets/dataset.py:582-599 is the only malformed-input guard).
# ---------------------------------------------------------------------------


def _write_replica(root, H, W, n, n_poses=None, rng=None):
    rng = rng or np.random.default_rng(7)
    (root / "results").mkdir(parents=True)
    for i in range(n):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "results" / f"frame{i:06d}.jpg"), img)
        d = (rng.uniform(0.5, 3.0, (H, W)) * 1000).astype(np.uint16)
        cv2.imwrite(str(root / "results" / f"depth{i:06d}.png"), d)
    lines = []
    for i in range(n if n_poses is None else n_poses):
        c2w = np.eye(4)
        c2w[0, 3] = 0.1 * i
        lines.append(" ".join(str(v) for v in c2w.reshape(-1)))
    (root / "traj.txt").write_text("\n".join(lines) + "\n")


def test_truncated_png_clear_error(tmp_path):
    from coslam_tpu.data.datasets import ReplicaDataset

    H, W = 24, 32
    root = tmp_path / "replica"
    _write_replica(root, H, W, 3)
    bad = root / "results" / "depth000001.png"
    bad.write_bytes(bad.read_bytes()[:40])  # truncate mid-header
    ds = ReplicaDataset(_base_cfg(H, W, "replica"), str(root))
    assert ds[0]["rgb"].shape == (H, W, 3)  # intact frames still load
    with pytest.raises(ValueError, match="depth000001.png"):
        ds[1]["depth"]


def test_zero_frame_directory(tmp_path):
    from coslam_tpu.data.datasets import ReplicaDataset

    root = tmp_path / "replica"
    (root / "results").mkdir(parents=True)
    (root / "traj.txt").write_text("")
    with pytest.raises(ValueError, match="no frames found"):
        ReplicaDataset(_base_cfg(24, 32, "replica"), str(root))


def test_truncated_trajectory_clear_error(tmp_path):
    from coslam_tpu.data.datasets import ReplicaDataset

    root = tmp_path / "replica"
    _write_replica(root, 24, 32, 4, n_poses=2)
    with pytest.raises(ValueError, match="trajectory file is truncated"):
        ReplicaDataset(_base_cfg(24, 32, "replica"), str(root))


def test_missing_depth_partner_clear_error(tmp_path):
    from coslam_tpu.data.datasets import ReplicaDataset

    root = tmp_path / "replica"
    _write_replica(root, 24, 32, 3)
    os.remove(str(root / "results" / "depth000002.png"))
    with pytest.raises(ValueError, match="only 2 depth frames"):
        ReplicaDataset(_base_cfg(24, 32, "replica"), str(root))


def test_mismatched_intrinsics_clear_error(tmp_path):
    """Config camera model disagreeing with on-disk resolution must be a
    named error, not a silent pixel/ray-direction mismatch."""
    from coslam_tpu.data.datasets import ReplicaDataset

    root = tmp_path / "replica"
    _write_replica(root, 24, 32, 2)
    ds = ReplicaDataset(_base_cfg(48, 64, "replica"), str(root))
    with pytest.raises(ValueError, match="camera model expects"):
        ds[0]


def test_tum_association_drops_unmatched(tmp_path):
    """An rgb frame whose depth partner is missing (timestamp gap >
    0.08 s) is dropped, matching the reference association semantics
    (reference datasets/dataset.py:661-668); a capture with no matches
    at all raises instead of producing an empty dataset."""
    H, W, n = 24, 32, 4
    rng = np.random.default_rng(8)
    root = tmp_path / "tum"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(n):
        t = 100.0 + i * 0.2
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "rgb" / f"{t:.4f}.png"), img)
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        if i != 2:  # frame 2's depth partner is missing
            d = (rng.uniform(0.5, 3.0, (H, W)) * 5000).astype(np.uint16)
            cv2.imwrite(str(root / "depth" / f"{t:.4f}.png"), d)
            depth_lines.append(f"{t:.4f} depth/{t:.4f}.png")
        gt_lines.append(f"{t:.4f} {0.1 * i} 0 0 0 0 0 1")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")

    cfg = _base_cfg(H, W, "tum", {"png_depth_scale": 5000.0})
    ds = TUMDataset(cfg, str(root))
    assert len(ds) == n - 1
    assert all(b["depth"].shape == (H, W) for b in (ds[0], ds[2]))

    # Shift every depth timestamp out of association range -> no frames.
    bad = [ln.split(" ", 1) for ln in depth_lines]
    (root / "depth.txt").write_text("\n".join(
        f"{float(t) + 50.0:.4f} {p}" for t, p in bad) + "\n")
    with pytest.raises(ValueError, match="association produced no frames"):
        TUMDataset(cfg, str(root))


def test_tum_missing_association_file(tmp_path):
    root = tmp_path / "tum"
    root.mkdir()
    (root / "rgb.txt").write_text("100.0 rgb/a.png\n")
    with pytest.raises(FileNotFoundError):
        TUMDataset(_base_cfg(24, 32, "tum"), str(root))


def test_rgbd_inf_pose_filtered(tmp_path):
    """inf (not just nan) pose rows are dropped; an all-invalid poses.txt
    raises instead of yielding an empty dataset."""
    H, W, n = 24, 32, 3
    rng = np.random.default_rng(9)
    root = tmp_path / "rgbd"
    (root / "images").mkdir(parents=True)
    (root / "depth").mkdir()
    lines = []
    for i in range(n):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "images" / f"img{i}.png"), img)
        d = (rng.uniform(0.5, 3.0, (H, W)) * 1000).astype(np.uint16)
        cv2.imwrite(str(root / "depth" / f"depth{i}.png"), d)
        c2w = np.eye(4)
        if i == 1:
            c2w[1, 3] = np.inf
        for row in c2w:
            lines.append(" ".join(str(v) for v in row))
    (root / "poses.txt").write_text("\n".join(lines) + "\n")

    cfg = _base_cfg(H, W, "synthetic")
    ds = RGBDataset(cfg, str(root))
    assert len(ds) == n - 1

    (root / "poses.txt").write_text("\n".join(
        " ".join(["nan"] * 4) for _ in range(4 * n)) + "\n")
    with pytest.raises(ValueError, match="NaN/inf"):
        RGBDataset(cfg, str(root))
