"""TSDF fusion (tools/tsdf_fusion.py): RGB-D frames + poses -> GT mesh.

Validates the fusion against the analytic scene: fusing exact rendered
depth at GT poses must reproduce the analytic GT mesh to within the
voxel size (the reference builds its virtual-camera GT mesh the same
way, reference: evaluation/create_virtual_cameras_replica.py:35-75).
"""

import numpy as np
import pytest

from coslam_tpu.data.synth import AnalyticScene, make_trajectory, render_frame
from coslam_tpu.eval.recon import accuracy, completion
from coslam_tpu.mesh.io import TriMesh
from coslam_tpu.mesh.mcubes import marching_cubes
from coslam_tpu.tools.tsdf_fusion import fuse_frames, tsdf_mesh

H, W, FX = 60, 80, 56.0
CX, CY = (W - 1) / 2, (H - 1) / 2
VOX = 0.06
TRUNC = 4 * VOX


@pytest.fixture(scope="module")
def fused():
    scene = AnalyticScene()
    poses = make_trajectory(24)
    frames = [render_frame(scene, p, H, W, FX, FX, CX, CY) for p in poses]
    bounds = np.array([[-2.2, 2.2]] * 3, np.float32)
    vol, color, axes = fuse_frames(
        [d for _, d in frames], poses, FX, FX, CX, CY, bounds,
        voxel_size=VOX, trunc=TRUNC, rgbs=[r for r, _ in frames])
    return scene, vol, color, axes


def _gt_mesh(scene, n=96):
    ax = np.linspace(-2.2, 2.2, n).astype(np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = scene.sdf(np.stack([X, Y, Z], -1)).astype(np.float32)
    v, f = marching_cubes(sdf, 0.0, truncation=3.0)
    return TriMesh(v * (4.4 / (n - 1)) - 2.2, f)


def test_fused_volume_matches_analytic_sdf(fused):
    """Observed cells hold the true SDF to within a voxel."""
    scene, vol, _, axes = fused
    tx, ty, tz = axes
    pts = np.stack(np.meshgrid(tx, ty, tz, indexing="ij"), -1)
    gt = scene.sdf(pts.reshape(-1, 3)).reshape(vol.shape)
    observed = np.abs(vol) < 0.99 * TRUNC
    # near-surface observed band: fused projective TSDF ~ true SDF
    band = observed & (np.abs(gt) < 0.5 * TRUNC)
    assert band.sum() > 1000
    err = np.abs(vol[band] - gt[band])
    assert np.median(err) < VOX
    assert np.mean(err) < 2 * VOX


def test_fused_mesh_acc_comp(fused):
    scene, vol, color, axes = fused
    mesh = tsdf_mesh(vol, axes, TRUNC, color)
    assert len(mesh.vertices) > 500
    gt = _gt_mesh(scene)
    rng = np.random.default_rng(0)
    rec_pc = mesh.sample_surface(50000, rng)
    gt_pc = gt.sample_surface(50000, rng)
    acc = accuracy(gt_pc, rec_pc)       # rec -> gt distance
    assert acc < VOX, f"fused-mesh accuracy {acc:.4f} m >= voxel {VOX}"
    # The 24-frame orbit does not see every GT surface (walls behind the
    # cameras): completion is only meaningful over the OBSERVED region,
    # i.e. GT points whose fused cell was integrated by some frame.
    tx, ty, tz = axes
    lo = np.array([tx[0], ty[0], tz[0]])
    idx = np.clip(np.round((gt_pc - lo) / VOX).astype(int), 0,
                  np.array(vol.shape) - 1)
    seen = np.abs(vol[idx[:, 0], idx[:, 1], idx[:, 2]]) < 0.99 * TRUNC
    assert seen.sum() > 5000
    comp_seen = completion(gt_pc[seen], rec_pc)
    assert comp_seen < 2 * VOX, f"observed-region completion {comp_seen:.4f} m"
    # vertex colors fused and sane
    assert mesh.vertex_colors is not None
    assert np.isfinite(mesh.vertex_colors).all()
    assert 0.0 <= mesh.vertex_colors.min() <= mesh.vertex_colors.max() <= 1.0


def test_unobserved_cells_invalid(fused):
    """Cells no camera saw hold exactly +trunc (invalid for mcubes)."""
    _, vol, _, axes = fused
    assert (vol == np.float32(TRUNC)).sum() > 0
    assert np.isfinite(vol).all()


def test_virtual_cameras_from_raw_rgbd(tmp_path):
    """tools/virtual_cameras.py main() starting from raw RGB-D: fuses a
    GT mesh first (no --gt_mesh), then writes {i}.txt virtual cameras —
    the reference tool's full flow (create_virtual_cameras_replica.py)."""
    import os

    from coslam_tpu.data.synth import (make_synthetic_config,
                                       write_replica_format)
    from coslam_tpu.tools.virtual_cameras import main as vc_main

    datadir = str(tmp_path / "scene")
    cfg = make_synthetic_config(datadir, str(tmp_path / "out"), H=40,
                                W=52, n_frames=6)
    cam = cfg["cam"]
    write_replica_format(datadir, AnalyticScene(), make_trajectory(6),
                         cam["H"], cam["W"], cam["fx"], cam["fy"],
                         cam["cx"], cam["cy"])
    import yaml
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    out_dir = str(tmp_path / "vcams")
    fused_ply = str(tmp_path / "fused.ply")
    chosen = vc_main(["--config", cfg_path, "--out_dir", out_dir,
                      "--save_fused", fused_ply, "--voxel_size", "0.08",
                      "--every", "2", "--n_candidates", "40",
                      "--n_select", "5"])
    assert os.path.exists(fused_ply)
    txts = [f for f in os.listdir(out_dir) if f.endswith(".txt")]
    assert len(txts) == len(chosen) and len(chosen) >= 1
    c2w = np.loadtxt(os.path.join(out_dir, "0.txt"))
    assert c2w.shape == (4, 4) and np.isfinite(c2w).all()


def test_render_cache_invalidates_on_trajectory_change(tmp_path):
    """_fresh_render_dir: cached frames from a different trajectory or
    resolution are wiped instead of silently reused (walkthrough
    trajectories are not prefix-stable in n)."""
    import os

    from coslam_tpu.data.synth import write_replica_format

    datadir = str(tmp_path / "scene")
    H, W, fx = 16, 20, 12.0
    scene = AnalyticScene()
    p300 = make_trajectory(6)
    write_replica_format(datadir, scene, p300, H, W, fx, fx,
                         (W - 1) / 2, (H - 1) / 2)
    frame0 = os.path.join(datadir, "results", "frame000000.jpg")
    t0 = os.path.getmtime(frame0)
    # Same trajectory: cache reused (no re-render).
    write_replica_format(datadir, scene, p300, H, W, fx, fx,
                         (W - 1) / 2, (H - 1) / 2)
    assert os.path.getmtime(frame0) == t0
    # Different trajectory: cache wiped and re-rendered.
    p_other = make_trajectory(6, orbit_fraction=0.5)
    write_replica_format(datadir, scene, p_other, H, W, fx, fx,
                         (W - 1) / 2, (H - 1) / 2)
    assert os.path.getmtime(frame0) > t0
