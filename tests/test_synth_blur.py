"""Motion-blur render model (data/synth.py make_blur_renderer):
sub-frame SE(3) pose interpolation, tap-averaged RGB, sharp center-tap
depth, and cache-stamp invalidation in the TUM writer."""

import glob
import os

import numpy as np
import pytest

from coslam_tpu.data.synth import (AnalyticScene, interpolate_pose,
                                   make_blur_renderer,
                                   make_handheld_trajectory,
                                   make_synthetic_config, render_frame,
                                   write_tum_format)


def _grad_energy(img):
    gy, gx = np.gradient(img.mean(-1))
    return float(np.mean(np.hypot(gx, gy)))


def test_interpolate_pose_endpoints_and_midpoint():
    poses = make_handheld_trajectory(3)
    p0, p1 = poses[0], poses[1]
    assert np.allclose(interpolate_pose(p0, p1, 0.0), p0, atol=1e-6)
    assert np.allclose(interpolate_pose(p0, p1, 1.0), p1, atol=1e-5)
    mid = interpolate_pose(p0, p1, 0.5)
    # Rotation part stays orthonormal; translation lands between the
    # endpoints (screw path, so between up to the arc's chord gap).
    assert np.allclose(mid[:3, :3] @ mid[:3, :3].T, np.eye(3), atol=1e-5)
    t0, t1, tm = p0[:3, 3], p1[:3, 3], mid[:3, 3]
    assert np.linalg.norm(tm - t0) <= np.linalg.norm(t1 - t0) + 1e-5
    assert np.linalg.norm(tm - t1) <= np.linalg.norm(t1 - t0) + 1e-5


def test_blur_softens_moving_frames_only():
    scene = AnalyticScene()
    H, W = 48, 64
    fx = fy = 40.0
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    render = lambda c2w: render_frame(scene, c2w, H, W, fx, fy, cx, cy)

    moving = make_handheld_trajectory(4, seed=0)
    blurred = make_blur_renderer(render, moving, shutter=2.0, taps=5)
    rgb_b, depth_b = blurred(1)
    rgb_s, depth_s = render(moving[1])
    # RGB blurs (strictly less edge energy), depth stays the sharp
    # center tap bit-for-bit.
    assert _grad_energy(rgb_b) < 0.97 * _grad_energy(rgb_s)
    assert np.array_equal(depth_b, depth_s)

    static = np.repeat(moving[1][None], 3, axis=0)
    blurred0 = make_blur_renderer(render, static, shutter=2.0, taps=5)
    rgb0, _ = blurred0(1)
    # No motion across the shutter window -> blur is a no-op.
    assert np.allclose(rgb0, rgb_s, atol=1e-5)


def test_tum_writer_blur_restamps(tmp_path):
    scene = AnalyticScene()
    cfg = make_synthetic_config(str(tmp_path / "d"), str(tmp_path / "o"),
                                H=32, W=40, n_frames=4)
    cam = cfg["cam"]
    datadir = str(tmp_path / "seq")
    poses = make_handheld_trajectory(4, seed=0)

    def write(blur):
        write_tum_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"],
                         motion_blur=blur)
        path = sorted(glob.glob(os.path.join(datadir, "rgb", "*.png")))[1]
        return open(path, "rb").read(), os.path.getmtime(path)

    sharp_bytes, _ = write(0.0)
    blur_bytes, mt0 = write(1.0)
    # The blur parameter joins the render stamp: same dir re-renders
    # and the pixels actually change.
    assert blur_bytes != sharp_bytes
    # Same parameters again -> resumable cache hit (files untouched).
    again_bytes, mt1 = write(1.0)
    assert again_bytes == blur_bytes and mt1 == mt0
