"""SyntheticRGBD (NeuralRGBD-format) protocol: write_rgbd_format ->
RGBDataset roundtrip (nan-pose filtering, trainskip, mm depth), the
SyntheticRGBD recipe config, and a small end-to-end SLAM run.

Completes protocol coverage of the reference's four benchmark families
(Replica / TUM / ScanNet / SyntheticRGBD, evaluation/README.md); with
zero egress we validate on the analytic scene loaded through the real
NeuralRGBD loader.
"""

import numpy as np
import pytest

from coslam_tpu.data.datasets import get_dataset
from coslam_tpu.data.synth import (AnalyticScene, make_rgbd_synthetic_config,
                                   make_scan_trajectory, render_frame,
                                   write_rgbd_format)


def test_rgbd_format_roundtrip(tmp_path):
    """write_rgbd_format -> RGBDataset: poses stored as-is (OpenGL, no
    column flips), nan-pose frames dropped, file/pose indices stay
    aligned, mm depth scale, residual noise but no holes."""
    sc = AnalyticScene()
    poses = make_scan_trajectory(10)
    datadir = str(tmp_path / "scene")
    H, W = 48, 64
    cfg = make_rgbd_synthetic_config(datadir, str(tmp_path / "out"),
                                     H=H, W=W, n_frames=10)
    cam = cfg["cam"]
    write_rgbd_format(datadir, sc, poses, H, W, cam["fx"], cam["fy"],
                      cam["cx"], cam["cy"],
                      png_depth_scale=cam["png_depth_scale"],
                      invalid=[3, 7])
    ds = get_dataset(cfg)
    assert len(ds) == 8                          # nan-pose frames dropped
    b0 = ds[0]
    assert b0["rgb"].shape == (H, W, 3)
    assert b0["depth"].shape == (H, W)
    assert np.allclose(b0["c2w"], poses[0], atol=1e-6)
    # Frame AFTER a dropped one maps to the right pose/image pair.
    b3 = ds[3]
    assert b3["frame_id"] == 4
    assert np.allclose(b3["c2w"], poses[4], atol=1e-6)
    exact = render_frame(sc, poses[4], H, W, cam["fx"], cam["fy"],
                         cam["cx"], cam["cy"])[1]
    valid = b3["depth"] > 0
    assert valid.mean() > 0.99                   # filtered stream: no holes
    assert np.median(np.abs(b3["depth"][valid] - exact[valid])) < 0.03

    # Resumable second write keeps frames and the frame count.
    write_rgbd_format(datadir, sc, poses, H, W, cam["fx"], cam["fy"],
                      cam["cx"], cam["cy"],
                      png_depth_scale=cam["png_depth_scale"],
                      invalid=[3, 7])
    assert len(get_dataset(cfg)) == 8

    # trainskip strides file ids, then invalid poses are filtered
    # (3 and 7 are odd, so the stride keeps all five even frames).
    cfg2 = dict(cfg, data=dict(cfg["data"], trainskip=2))
    ds2 = get_dataset(cfg2)
    assert [ds2[i]["frame_id"] for i in range(len(ds2))] == [0, 2, 4, 6, 8]


def test_rgbd_synth_config_recipe():
    cfg = make_rgbd_synthetic_config("/d", "/o", tuned=True)
    assert cfg["dataset"] == "synthetic"
    assert cfg["mapping"]["optim_cur"] is True    # SyntheticRGBD recipe
    assert cfg["mapping"]["lr_embed"] == 0.001
    assert cfg["grid"]["voxel_sdf"] == 0.01
    assert cfg["training"]["rot_rep"] == "axis_angle"
    assert cfg["training"]["rgb_missing"] == 0.05
    assert cfg["training"]["n_range_d"] == 11
    assert cfg["training"]["n_samples_d"] == 16   # TPU-tuned point
    assert cfg["grid"]["enc"] == "TensoVM"
    ref = make_rgbd_synthetic_config("/d", "/o", tuned=False)
    assert ref["training"]["n_samples_d"] == 32   # reference recipe
    assert ref["grid"]["enc"] == "HashGrid"
    assert ref["grid"]["hash_size"] == 16


@pytest.mark.slow
def test_rgbd_protocol_smoke(tmp_path):
    """Small end-to-end SLAM run through the real NeuralRGBD loader."""
    from coslam_tpu.eval.benchmark import run_benchmark
    from coslam_tpu.mesh.io import TriMesh
    from coslam_tpu.mesh.mcubes import marching_cubes

    n = 10
    datadir = str(tmp_path / "scene")
    cfg = make_rgbd_synthetic_config(datadir, str(tmp_path / "out"),
                                     H=40, W=52, n_frames=n)
    cfg["mapping"].update(first_iters=150, sample=256, min_pixels_cur=20)
    cfg["tracking"].update(sample=128, ignore_edge_W=4, ignore_edge_H=4)
    cfg["training"]["smooth_pts"] = 8
    cfg["mesh"]["vis"] = 0
    cfg["mesh"]["voxel_final"] = 0.08
    sc = AnalyticScene()
    poses = make_scan_trajectory(n)
    cam = cfg["cam"]
    write_rgbd_format(datadir, sc, poses, cam["H"], cam["W"], cam["fx"],
                      cam["fy"], cam["cx"], cam["cy"],
                      png_depth_scale=cam["png_depth_scale"])
    nax = 72
    ax = np.linspace(-2.2, 2.2, nax).astype(np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = sc.sdf(np.stack([X, Y, Z], -1)).astype(np.float32)
    v, f = marching_cubes(sdf, 0.0, truncation=5.0)
    gt_path = str(tmp_path / "gt.ply")
    TriMesh(v * (4.4 / (nax - 1)) - 2.2, f).export(gt_path)

    res = run_benchmark(cfg, gt_mesh_path=gt_path,
                        culling="frustum_occlusion", n_eval_views=8)
    assert res["ate_rmse_cm"] < 8.0
    assert np.isfinite(res["depth_l1_cm"])
