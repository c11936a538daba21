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
