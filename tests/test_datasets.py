"""Dataset layer: synthetic Replica-format roundtrip through the loader."""

import numpy as np
import pytest

from coslam_tpu.data.datasets import ReplicaDataset, get_dataset
from coslam_tpu.data.synth import (AnalyticScene, make_synthetic_config,
                                   make_trajectory, render_frame,
                                   write_replica_format)
from coslam_tpu.ops.rays import get_camera_rays


@pytest.fixture(scope="module")
def synth_seq(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    datadir = str(d / "scene")
    cfg = make_synthetic_config(datadir, str(d / "out"), H=40, W=52,
                                n_frames=8)
    scene = AnalyticScene()
    poses = make_trajectory(8)
    cam = cfg["cam"]
    write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"])
    return cfg, scene, poses


def test_loader_roundtrip(synth_seq):
    cfg, scene, poses = synth_seq
    ds = get_dataset(cfg)
    assert isinstance(ds, ReplicaDataset)
    assert len(ds) == 8
    b = ds[0]
    H, W = cfg["cam"]["H"], cfg["cam"]["W"]
    assert b["rgb"].shape == (H, W, 3)
    assert b["depth"].shape == (H, W)
    assert b["direction"].shape == (H, W, 3)
    # Pose roundtrip: loader gives back the OpenGL pose we rendered with.
    np.testing.assert_allclose(b["c2w"], poses[0], atol=1e-5)
    # Depth within png quantization of the analytic render.
    rgb_ref, depth_ref = render_frame(scene, poses[0], H, W, cfg["cam"]["fx"],
                                      cfg["cam"]["fy"], cfg["cam"]["cx"],
                                      cfg["cam"]["cy"])
    np.testing.assert_allclose(b["depth"], depth_ref, atol=2e-3)
    assert np.abs(b["rgb"] - rgb_ref).mean() < 0.03  # jpeg noise


def test_rays_render_consistency(synth_seq):
    """Back-projecting loader depth along loader rays must land on the
    analytic scene surface (SDF ~ 0)."""
    cfg, scene, poses = synth_seq
    ds = get_dataset(cfg)
    b = ds[3]
    dirs = b["direction"].reshape(-1, 3)
    depth = b["depth"].reshape(-1)
    c2w = b["c2w"]
    rays_d = dirs @ c2w[:3, :3].T
    pts = c2w[:3, 3][None] + rays_d * depth[:, None]
    sd = scene.sdf(pts)
    assert np.abs(sd).mean() < 0.01


def test_camera_rays_convention():
    dirs = get_camera_rays(10, 12, fx=10.0, fy=10.0, cx=5.5, cy=4.5)
    assert dirs.shape == (10, 12, 3)
    np.testing.assert_allclose(dirs[..., 2], -1.0)
    # x increases rightwards, y decreases downwards (OpenGL)
    assert dirs[0, -1, 0] > dirs[0, 0, 0]
    assert dirs[-1, 0, 1] < dirs[0, 0, 1]

    cv = get_camera_rays(10, 12, fx=10.0, convention="OpenCV")
    np.testing.assert_allclose(cv[..., 2], 1.0)


def test_num_rays_to_save(synth_seq):
    cfg, _, _ = synth_seq
    ds = get_dataset(cfg)
    expect = int(cfg["cam"]["H"] * cfg["cam"]["W"] * cfg["mapping"]["n_pixels"])
    assert ds.num_rays_to_save == expect


def test_downsample_resizes_everything(synth_seq):
    """downsample=2 must shrink rgb/depth/direction consistently (the
    reference resizes in __getitem__, dataset.py:124-127)."""
    cfg, _, poses = synth_seq
    cfg2 = {**cfg, "data": {**cfg["data"], "downsample": 2}}
    ds = get_dataset(cfg2)
    H2, W2 = cfg["cam"]["H"] // 2, cfg["cam"]["W"] // 2
    b = ds[0]
    assert b["rgb"].shape == (H2, W2, 3)
    assert b["depth"].shape == (H2, W2)
    assert b["direction"].shape == (H2, W2, 3)
    assert ds.H == H2 and ds.W == W2
    # Intrinsics scale with the image; accessing twice must not compound.
    fx_once = ds.fx
    _ = ds[1]
    assert ds.fx == fx_once == cfg["cam"]["fx"] / 2
    # Back-projection still lands on the GT surface at half resolution.
    pts = (b["c2w"][:3, 3][None]
           + (b["direction"].reshape(-1, 3) @ b["c2w"][:3, :3].T)
           * b["depth"].reshape(-1, 1))
    from coslam_tpu.data.synth import AnalyticScene
    assert np.abs(AnalyticScene().sdf(pts)).mean() < 0.02


def test_trainskip_strides_frames(synth_seq):
    cfg, _, _ = synth_seq
    cfg2 = {**cfg, "data": {**cfg["data"], "trainskip": 2}}
    ds = get_dataset(cfg2)
    assert len(ds) == 4  # 8 frames, every 2nd
    assert ds[1]["frame_id"] == 2


def test_rgbdataset_trainskip(tmp_path):
    """RGBDataset applies trainskip (reference dataset.py:520-533)."""
    import cv2

    H, W, n = 24, 32, 6
    rng = np.random.default_rng(7)
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
        for row in c2w:
            lines.append(" ".join(f"{v}" for v in row))
    (root / "poses.txt").write_text("\n".join(lines) + "\n")

    from coslam_tpu.data.datasets import RGBDataset
    from coslam_tpu.data.synth import make_synthetic_config

    cfg = make_synthetic_config("unused", "unused", H=H, W=W)
    cfg["dataset"] = "synthetic"
    cfg["cam"]["png_depth_scale"] = 1000.0
    cfg["data"]["trainskip"] = 2
    ds = RGBDataset(cfg, str(root))
    assert len(ds) == 3  # frames 0, 2, 4
    np.testing.assert_allclose(ds[2]["c2w"][:3, 3], [0, 0.4, 0], atol=1e-6)


def test_lazyframe_fast_path_bit_identical(synth_seq):
    """The decode-through fast path (LazyFrame raw u8/u16 + lazy f32)
    must reproduce the eager loader bit-for-bit, and the raw keys must
    carry the dataset's native quantization."""
    from coslam_tpu.data.datasets import LazyFrame

    cfg, scene, poses = synth_seq
    ds = get_dataset(cfg)
    b = ds[2]
    assert isinstance(b, LazyFrame)
    assert b["rgb_u8"].dtype == np.uint8
    assert b["depth_raw"].dtype == np.uint16
    assert "rgb" not in b and "depth" not in b  # not yet materialized
    rgb_e, depth_e = ds._load_image_pair(ds.img_files[2], ds.depth_paths[2])
    assert np.array_equal(b["rgb"], rgb_e)
    assert np.array_equal(b["depth"], depth_e)
    assert "rgb" in b  # materialized exactly once, then cached
    assert b["rgb"] is b["rgb"]


def test_sample_tracking_rays_matches_cropped_gather(synth_seq):
    """The (row, col) fancy-index draw must equal the original
    crop-then-flat-gather on BOTH the raw and the materialized branch."""
    from coslam_tpu.runtime.slam import CoSLAM

    cfg, scene, poses = synth_seq
    ds = get_dataset(cfg)

    class Fake:
        config = {"tracking": {"ignore_edge_H": 4, "ignore_edge_W": 6,
                               "sample": 64}}
        _seed = 0

    def reference_draw(batch):
        iH, iW, S = 4, 6, 64
        dirs = batch["direction"][iH:-iH, iW:-iW].reshape(-1, 3)
        rgb = batch["rgb"][iH:-iH, iW:-iW].reshape(-1, 3)
        depth = batch["depth"][iH:-iH, iW:-iW].reshape(-1, 1)
        rng = np.random.default_rng((0, int(batch["frame_id"])))
        idx = rng.choice(dirs.shape[0], size=S, replace=False)
        return np.concatenate([dirs[idx], rgb[idx], depth[idx]],
                              axis=1).astype(np.float32)

    raw = CoSLAM._sample_tracking_rays(Fake(), ds[4])     # raw branch
    b = ds[4]
    _ = b["rgb"], b["depth"]                              # force f32
    f32 = CoSLAM._sample_tracking_rays(Fake(), b)
    ref = reference_draw(b)
    assert np.array_equal(f32, ref)
    assert np.array_equal(raw, ref)
