"""Marching cubes: analytic-sphere recovery, native/numpy agreement,
truncation-validity suppression, PLY roundtrip."""

import numpy as np
import pytest

from coslam_tpu.mesh.io import TriMesh, load_ply, save_ply
from coslam_tpu.mesh.mcubes import (_marching_cubes_numpy, marching_cubes)


def sphere_volume(n=48, r=0.5):
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - r, ax


def test_sphere_radius_native():
    n = 48
    sdf, ax = sphere_volume(n)
    v, f = marching_cubes(sdf, 0.0, truncation=3.0)
    assert len(v) > 500 and len(f) > 500
    r = np.linalg.norm(v * (2 / (n - 1)) - 1.0, axis=1)
    assert abs(r.mean() - 0.5) < 0.01
    assert r.std() < 0.01
    # faces index valid vertices
    assert f.max() < len(v) and f.min() >= 0


def test_native_numpy_agree():
    n = 32
    sdf, _ = sphere_volume(n)
    v1, f1 = marching_cubes(sdf, 0.0, truncation=3.0)
    v2, f2 = _marching_cubes_numpy(sdf, 0.0, 3.0)
    # same number of triangles; vertex sets match as point clouds
    assert len(f1) == len(f2)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(v2).query(v1)
    assert d.max() < 1e-3


def test_truncation_suppresses_unobserved():
    n = 48
    sdf, ax = sphere_volume(n)
    X = np.meshgrid(ax, ax, ax, indexing="ij")[0]
    v_full, f_full = marching_cubes(sdf, 0.0, truncation=3.0)
    # Mark half the surface as unobserved.
    sdf_cut = sdf.copy()
    sdf_cut[X > 0.0] = -np.inf
    v_cut, f_cut = marching_cubes(sdf_cut, 0.0, truncation=3.0)
    assert len(f_cut) < 0.7 * len(f_full)
    # Remaining surface only on the observed side (x in voxel coords < n/2+1)
    assert (v_cut[:, 0] <= n / 2 + 1).all()


def test_degenerate_inputs():
    v, f = marching_cubes(np.ones((8, 8, 8), np.float32), 0.0, 3.0)
    assert len(v) == 0 and len(f) == 0
    v, f = marching_cubes(np.full((4, 4, 4), -np.inf, np.float32), 0.0, 3.0)
    assert len(v) == 0


def test_ply_roundtrip(tmp_path):
    n = 32
    sdf, _ = sphere_volume(n)
    v, f = marching_cubes(sdf, 0.0, truncation=3.0)
    colors = np.random.default_rng(0).random((len(v), 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    save_ply(p, v, f, colors)
    mesh = load_ply(p)
    np.testing.assert_allclose(mesh.vertices, v, atol=1e-5)
    np.testing.assert_array_equal(mesh.faces, f)
    assert mesh.vertex_colors is not None
    np.testing.assert_allclose(mesh.vertex_colors, colors, atol=1 / 255 + 1e-3)


def test_surface_sampling():
    n = 32
    sdf, _ = sphere_volume(n)
    v, f = marching_cubes(sdf, 0.0, truncation=3.0)
    mesh = TriMesh(v * (2 / (n - 1)) - 1.0, f)
    pts = mesh.sample_surface(2000)
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.mean() - 0.5) < 0.02
