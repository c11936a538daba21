"""Reconstruction eval: rasterizer depth, ICP, 3D metrics, culling."""

import numpy as np
import pytest

from coslam_tpu.data.synth import AnalyticScene, make_trajectory
from coslam_tpu.eval.cull import cull_by_bounds, cull_one_mesh
from coslam_tpu.eval.recon import (calc_3d_metric, completion_ratio,
                                   icp_align)
from coslam_tpu.mesh.io import TriMesh
from coslam_tpu.mesh.mcubes import marching_cubes
from coslam_tpu.mesh.raster import opengl_to_opencv_w2c, render_depth


def sphere_mesh(n=48, r=0.5, center=(0, 0, 0)):
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2
                  + (Z - center[2]) ** 2) - r
    v, f = marching_cubes(sdf, 0.0, truncation=3.0)
    return TriMesh(v * (2 / (n - 1)) - 1.0, f)


def test_render_depth_analytic():
    """Rasterized depth of the analytic scene mesh matches exact raycast."""
    scene = AnalyticScene()
    n = 72
    ax = np.linspace(-2.2, 2.2, n).astype(np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = scene.sdf(np.stack([X, Y, Z], -1)).astype(np.float32)
    v, f = marching_cubes(sdf, 0.0, truncation=3.0)
    v = v * (4.4 / (n - 1)) - 2.2
    mesh = TriMesh(v, f)

    pose = make_trajectory(4)[0]
    H, W, fx = 60, 80, 56.0
    cx, cy = (W - 1) / 2, (H - 1) / 2
    w2c = opengl_to_opencv_w2c(pose)
    d = render_depth(mesh.vertices, mesh.faces, w2c, fx, fx, cx, cy, H, W)
    assert (d > 0).mean() > 0.95  # almost all pixels hit

    from coslam_tpu.data.synth import render_frame
    _, d_ref = render_frame(scene, pose, H, W, fx, fx, cx, cy)
    mask = d > 0
    err = np.abs(d[mask] - d_ref[mask])
    assert np.median(err) < 0.08  # within ~a voxel


def test_icp_recovers_transform(rng):
    mesh = sphere_mesh(32)
    pts = mesh.sample_surface(3000)
    from scipy.spatial.transform import Rotation
    R = Rotation.from_rotvec([0.03, -0.02, 0.04]).as_matrix()
    t = np.array([0.02, -0.015, 0.01])
    moved = pts @ R.T + t
    T = icp_align(moved, pts)
    back = moved @ T[:3, :3].T + T[:3, 3]
    assert np.abs(back - pts).mean() < 0.005


def test_calc_3d_metric_identical_mesh(tmp_path):
    mesh = sphere_mesh(40)
    p1, p2 = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
    mesh.export(p1)
    mesh.export(p2)
    m = calc_3d_metric(p1, p2, align=False, n_samples=20000)
    # Two independent 20k samplings of a r=0.5 sphere have ~0.6 cm mean
    # nearest-neighbor spacing; identical geometry must stay near that.
    assert m["acc"] < 1.0      # cm
    assert m["comp"] < 1.0
    assert m["comp ratio"] > 99.0


def test_calc_3d_metric_detects_error(tmp_path):
    m1 = sphere_mesh(40, r=0.5)
    m2 = sphere_mesh(40, r=0.55)  # 5 cm radius error
    p1, p2 = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
    m1.export(p1)
    m2.export(p2)
    m = calc_3d_metric(p1, p2, align=False, n_samples=20000)
    assert 3.0 < m["acc"] < 7.0  # ~5 cm


def test_cull_by_bounds():
    pts = np.array([[0, 0, 0], [2, 0, 0], [0.5, 0.5, 0.5]])
    bounds = np.array([[-1, -1, -1], [1, 1, 1]])
    np.testing.assert_array_equal(cull_by_bounds(pts, bounds),
                                  [True, False, True])


def test_cull_one_mesh_frustum(tmp_path):
    """A camera looking at one side of a sphere keeps roughly that side."""
    mesh = sphere_mesh(40)
    p = str(tmp_path / "s.ply")
    mesh.export(p)
    # Camera at +x looking toward origin (OpenGL: -z forward), i.e.
    # camera axes: x=(0,1,0), y=(0,0,1), z=(1,0,0) as matrix COLUMNS.
    c2w = np.eye(4)
    c2w[:3, :3] = np.array([[0, 0, 1.0], [1, 0, 0], [0, 1, 0]])
    c2w[:3, 3] = [1.5, 0, 0]
    cfg = {"cam": {"fx": 60.0, "fy": 60.0, "cx": 39.5, "cy": 29.5,
                   "H": 60, "W": 80},
           "data": {"datadir": str(tmp_path)}}
    out = str(tmp_path / "culled.ply")
    culled = cull_one_mesh(cfg, [c2w], p, out, remove_occlusion=True)
    assert 0.15 < len(culled.faces) / len(mesh.faces) < 0.75
    # Kept faces face the camera side (+x hemisphere mostly).
    used = np.unique(culled.faces)
    assert culled.vertices[used][:, 0].mean() > 0.1


def test_completion_ratio():
    a = np.random.default_rng(0).random((1000, 3))
    assert completion_ratio(a, a.copy()) == 1.0
    far = a + 10.0
    assert completion_ratio(a, far) == 0.0
