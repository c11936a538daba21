"""TUM-format synthetic protocol: handheld trajectory, Kinect-style
sensor noise, TUM on-disk layout -> TUMDataset roundtrip, and a small
end-to-end SLAM run under the TUM recipe.

This is the quality-validation harness for the TPU-tuned TUM operating
point (configs/Tum/fr1_desk_vm.yaml) — the reference validates its TUM
recipe on fr1_desk (evaluation/benchmark/tum/README.md, ATE 2.7 cm);
with zero egress we validate on a TUM-like synthetic: jerky handheld
motion + depth holes/noise, loaded through the real TUM loader.
"""

import numpy as np
import pytest

from coslam_tpu.data.datasets import get_dataset
from coslam_tpu.data.synth import (AnalyticScene, add_kinect_noise,
                                   make_handheld_trajectory,
                                   make_tum_synthetic_config,
                                   render_frame, write_tum_format)


def test_handheld_trajectory_stats():
    """Angular velocity matches TUM handheld statistics: ~1 deg/frame
    mean with jerk peaks well above it, positions inside the room."""
    poses = make_handheld_trajectory(300)
    assert poses.shape == (300, 4, 4)
    rel_angles = []
    for a, b in zip(poses[:-1], poses[1:]):
        R = a[:3, :3].T @ b[:3, :3]
        rel_angles.append(np.degrees(np.arccos(
            np.clip((np.trace(R) - 1) / 2, -1, 1))))
    rel_angles = np.array(rel_angles)
    assert 0.5 < rel_angles.mean() < 2.0
    assert rel_angles.max() < 6.0
    assert rel_angles.max() > 1.5 * rel_angles.mean()  # jerky, not smooth
    assert np.abs(poses[:, :3, 3]).max() < 2.0  # inside the +-2 room
    # Deterministic for resumable rendering.
    assert np.allclose(poses, make_handheld_trajectory(300))


def test_kinect_noise_model():
    scene = AnalyticScene()
    c2w = make_handheld_trajectory(5)[0]
    _, depth = render_frame(scene, c2w, 60, 80, 64.0, 64.0, 39.5, 29.5)
    noisy = add_kinect_noise(depth, np.random.default_rng(0))
    holes = noisy == 0.0
    # Some dropout (speckle + discontinuities), but mostly valid.
    assert 0.005 < holes.mean() < 0.30
    err = np.abs(noisy[~holes] - depth[~holes])
    assert np.median(err) < 0.02   # mm-to-cm scale axial noise
    assert err.max() > 0.0         # actually noisy


def test_tum_format_roundtrip(tmp_path):
    """write_tum_format -> TUMDataset: timestamp association keeps the
    frames, poses survive the quaternion/convention roundtrip, depth
    holes arrive as zeros."""
    scene = AnalyticScene()
    poses = make_handheld_trajectory(10)
    datadir = str(tmp_path / "tum_scene")
    H, W = 40, 52
    cfg = make_tum_synthetic_config(datadir, str(tmp_path / "out"),
                                    H=H, W=W, n_frames=10)
    cam = cfg["cam"]
    write_tum_format(datadir, scene, poses, H, W, cam["fx"], cam["fy"],
                     cam["cx"], cam["cy"],
                     png_depth_scale=cam["png_depth_scale"])
    ds = get_dataset(cfg)
    assert len(ds) >= 8  # association may drop a frame at jitter edges
    b0 = ds[0]
    assert b0["rgb"].shape == (H, W, 3)
    assert b0["depth"].shape == (H, W)
    # Loader pose ~= source pose (OpenGL convention) after the
    # quat -> matrix -> y/z-flip roundtrip.
    assert np.allclose(b0["c2w"], poses[0], atol=1e-4)
    depths = np.stack([ds[i]["depth"] for i in range(3)])
    assert (depths == 0).mean() > 0.003      # holes present
    assert (depths > 0).mean() > 0.7         # mostly valid
    exact = render_frame(scene, poses[0], H, W, cam["fx"], cam["fy"],
                         cam["cx"], cam["cy"])[1]
    valid = b0["depth"] > 0
    assert np.median(np.abs(b0["depth"][valid] - exact[valid])) < 0.02

    # Resumable: a second write keeps existing frames and the index
    # files stay consistent.
    write_tum_format(datadir, scene, poses, H, W, cam["fx"], cam["fy"],
                     cam["cx"], cam["cy"],
                     png_depth_scale=cam["png_depth_scale"])
    assert len(get_dataset(cfg)) == len(ds)


def test_tum_synth_config_recipe():
    cfg = make_tum_synthetic_config("/d", "/o", tuned=True)
    assert cfg["dataset"] == "tum"
    assert cfg["mapping"]["iters"] == 20          # TUM: 20-it BA
    assert cfg["training"]["sdf_weight"] == 5000
    assert cfg["training"]["n_importance"] == 0   # TPU-tuned point
    assert cfg["training"]["n_samples_d"] == 32
    assert cfg["grid"]["enc"] == "TensoVM"
    ref = make_tum_synthetic_config("/d", "/o", tuned=False)
    assert ref["training"]["n_importance"] == 128  # reference recipe
    assert ref["training"]["n_samples_d"] == 64
    assert ref["grid"]["enc"] == "HashGrid"


@pytest.mark.slow
def test_tum_protocol_smoke(tmp_path):
    """Small end-to-end SLAM run on the noisy handheld TUM-format scene:
    the TUM recipe tracks through jerky motion and depth holes."""
    from coslam_tpu.eval.benchmark import run_benchmark
    from tests.test_benchmark_protocol import analytic_gt_mesh

    n = 12
    datadir = str(tmp_path / "scene")
    cfg = make_tum_synthetic_config(datadir, str(tmp_path / "out"),
                                    H=44, W=58, n_frames=n)
    # Shrink compute for the CPU suite; keep the recipe's structure
    # (20-it BA, range-d concentration, noisy depth, TensoVM).
    cfg["mapping"].update(first_iters=200, sample=256, min_pixels_cur=20)
    cfg["tracking"].update(sample=128, ignore_edge_W=4, ignore_edge_H=4)
    cfg["training"]["smooth_pts"] = 8
    cfg["mesh"]["vis"] = 0
    cfg["mesh"]["voxel_final"] = 0.08
    scene = AnalyticScene()
    poses = make_handheld_trajectory(n)
    cam = cfg["cam"]
    write_tum_format(datadir, scene, poses, cam["H"], cam["W"], cam["fx"],
                     cam["fy"], cam["cx"], cam["cy"],
                     png_depth_scale=cam["png_depth_scale"])
    gt_path = str(tmp_path / "gt.ply")
    analytic_gt_mesh(scene, gt_path)

    res = run_benchmark(cfg, gt_mesh_path=gt_path,
                        culling="frustum_occlusion", n_eval_views=10)
    assert res["ate_rmse_cm"] < 8.0
    assert np.isfinite(res["depth_l1_cm"])
    assert "tracking_ms" in res and "mapping_ms" in res
