"""Metric-threshold e2e test mirroring the benchmark protocol:
SLAM -> final mesh -> culling -> Acc/Comp/Ratio vs the analytic GT mesh.
"""

import os

import numpy as np
import pytest

from coslam_tpu.data.synth import (AnalyticScene, make_synthetic_config,
                                   make_trajectory, write_replica_format)
from coslam_tpu.eval.benchmark import run_benchmark
from coslam_tpu.mesh.io import TriMesh
from coslam_tpu.mesh.mcubes import marching_cubes


def analytic_gt_mesh(scene: AnalyticScene, path: str, n: int = 96):
    ax = np.linspace(-2.2, 2.2, n).astype(np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = scene.sdf(np.stack([X, Y, Z], -1)).astype(np.float32)
    v, f = marching_cubes(sdf, 0.0, truncation=3.0)
    v = v * (4.4 / (n - 1)) - 2.2
    mesh = TriMesh(v, f)
    mesh.export(path)
    return mesh


@pytest.mark.slow
def test_benchmark_protocol(tmp_path):
    datadir = str(tmp_path / "scene")
    cfg = make_synthetic_config(datadir, str(tmp_path / "out"), H=44, W=58,
                                n_frames=16)
    cfg["mapping"]["first_iters"] = 250
    cfg["mapping"]["iters"] = 15
    cfg["mesh"]["vis"] = 0
    cfg["mesh"]["voxel_final"] = 0.08
    scene = AnalyticScene()
    poses = make_trajectory(16, orbit_fraction=0.02)
    cam = cfg["cam"]
    write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"])
    gt_path = str(tmp_path / "gt.ply")
    analytic_gt_mesh(scene, gt_path)

    res = run_benchmark(cfg, gt_mesh_path=gt_path,
                        culling="frustum_occlusion", n_eval_views=20)

    assert res["ate_rmse_cm"] < 6.0          # cm, small easy sequence
    # Reconstruction of the observed region: coarse voxel (8 cm) mesh on a
    # briefly-observed scene; bounds are sanity-level, not SOTA-level.
    assert res["acc_cm"] < 12.0
    assert res["comp_ratio_pct"] > 30.0
    assert np.isfinite(res["depth_l1_cm"])
    assert res["n_params"] > 1000
    assert "tracking_ms" in res and "mapping_ms" in res


def test_virtual_camera_generation(tmp_path):
    """create_virtual_cameras: headless greedy coverage writes {i}.txt
    poses that add coverage beyond a deliberately-limited trajectory."""
    from coslam_tpu.tools.virtual_cameras import (_coverage,
                                                  create_virtual_cameras)

    scene = AnalyticScene()
    gt_path = str(tmp_path / "gt.ply")
    mesh = analytic_gt_mesh(scene, gt_path, n=64)

    # One camera in a corner: most of the room is unseen.
    c2w = np.eye(4)
    c2w[:3, 3] = [1.5, 1.5, 0.0]
    out_dir = str(tmp_path / "virtual_cameras")
    chosen = create_virtual_cameras(mesh, [c2w], out_dir,
                                    fx=60, fy=60, cx=29, cy=22, H=44, W=58,
                                    n_candidates=24, n_select=6)
    assert len(chosen) >= 1
    files = sorted(os.listdir(out_dir))
    assert files and all(f.endswith(".txt") for f in files)
    # Each written pose is a valid 4x4 rigid transform.
    p = np.loadtxt(os.path.join(out_dir, files[0])).reshape(4, 4)
    np.testing.assert_allclose(p[3], [0, 0, 0, 1], atol=1e-8)
    R = p[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)

    rng = np.random.default_rng(0)
    surf = mesh.sample_surface(4000, rng)
    base = _coverage(mesh, surf, [c2w], 60, 60, 29, 22, 44, 58)
    full = _coverage(mesh, surf, [c2w] + chosen, 60, 60, 29, 22, 44, 58)
    assert full.sum() > base.sum()
