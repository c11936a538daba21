"""Device sphere tracer vs the numpy reference tracer.

The format writers use make_renderer, which picks DeviceRenderer on an
accelerator backend (scene generation at protocol scale is otherwise
single-core-numpy-bound: seconds per 480x640 frame). The scene methods
are array-module-generic (xp=np|jnp); these tests pin that both paths
trace the same math.
"""

import numpy as np
import pytest

from coslam_tpu.data.synth import (AnalyticApartment, AnalyticScene,
                                   DeviceRenderer, make_renderer,
                                   make_trajectory, render_frame)

CAM = dict(H=48, W=64, fx=56.0, fy=56.0, cx=32.0, cy=24.0)


@pytest.mark.parametrize("scene_cls", [AnalyticScene, AnalyticApartment])
def test_device_renderer_matches_numpy(scene_cls):
    scene = scene_cls()
    c2w = make_trajectory(8)[3]
    rgb_np, d_np = render_frame(scene, c2w, **CAM)
    dr = DeviceRenderer(scene, **CAM)
    rgb_dev, d_dev = dr(c2w)
    assert rgb_dev.shape == rgb_np.shape and d_dev.shape == d_np.shape
    # Depth agreement well under the u16 PNG quantization step
    # (1/6553.5 m = 0.15 mm); rgb under JPEG-97 noise.
    assert np.abs(d_dev - d_np).max() < 5e-4
    assert np.abs(rgb_dev - rgb_np).max() < 5e-3


def test_scene_methods_accept_jnp():
    import jax.numpy as jnp

    scene = AnalyticApartment()
    p = np.random.default_rng(0).uniform(-2, 2, (257, 3)).astype(np.float32)
    np.testing.assert_allclose(scene.sdf(jnp.asarray(p), xp=jnp),
                               scene.sdf(p), atol=1e-6)
    np.testing.assert_allclose(scene.albedo(jnp.asarray(p), xp=jnp),
                               scene.albedo(p), atol=1e-5)
    np.testing.assert_allclose(scene.shade(jnp.asarray(p), xp=jnp),
                               scene.shade(p), atol=1e-4)


def test_make_renderer_cpu_falls_back_to_numpy(monkeypatch):
    """On the CPU backend make_renderer must return the plain numpy
    tracer (bitwise frame stability for resumable rendering)."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("non-CPU backend")
    scene = AnalyticScene()
    r = make_renderer(scene, **CAM)
    c2w = make_trajectory(4)[1]
    rgb, depth = r(c2w)
    rgb2, depth2 = render_frame(scene, c2w, **CAM)
    assert np.array_equal(rgb, rgb2) and np.array_equal(depth, depth2)


def test_thin_scene_geometry_and_plain_albedo():
    """New stress scenes: thin structures actually show up in renders
    and the GT grid; the plain scene is genuinely texture-poor."""
    import numpy as np

    from coslam_tpu.data.synth import (AnalyticPlainScene, AnalyticScene,
                                       AnalyticThinScene,
                                       make_scan_trajectory, render_frame)
    from coslam_tpu.mesh.mcubes import marching_cubes

    thin = AnalyticThinScene()
    # SDF is exact near a plate face: |sdf| equals distance to the face.
    p = np.array([[-0.70 + 0.018 + 0.05, -1.45, 0.65]])  # 5 cm off plate
    assert abs(thin.sdf(p)[0] - 0.05) < 1e-5
    assert thin.sdf(np.array([[-0.70, -1.45, 0.65]]))[0] < 0  # inside

    # Rendered depth differs from the empty-room render where the thin
    # objects stand (they are visible, not lost by sphere tracing).
    pose = make_scan_trajectory(40)[20]
    H, W, fx = 60, 80, 56.0
    _, d_thin = render_frame(thin, pose, H, W, fx, fx,
                             (W - 1) / 2, (H - 1) / 2)
    _, d_room = render_frame(AnalyticScene(), pose, H, W, fx, fx,
                             (W - 1) / 2, (H - 1) / 2)
    assert (np.abs(d_thin - d_room) > 0.05).mean() > 0.02

    # Fine-grid marching cubes recovers the thin slabs (non-empty mesh
    # in the plate's AABB neighborhood).
    ax = np.linspace(-1.0, -0.4, 40).astype(np.float32)
    ay = np.linspace(-2.0, -0.9, 60).astype(np.float32)
    az = np.linspace(0.2, 1.1, 50).astype(np.float32)
    X, Y, Z = np.meshgrid(ax, ay, az, indexing="ij")
    sdf = thin.sdf(np.stack([X, Y, Z], -1)).astype(np.float32)
    v, f = marching_cubes(sdf, 0.0, truncation=3.0)
    assert len(v) > 100 and len(f) > 100

    plain = AnalyticPlainScene()
    pts = np.random.default_rng(0).uniform(-2, 2, (5000, 3))
    alb = plain.albedo(pts)
    assert alb.std() < 0.05            # texture-poor
    rich = AnalyticScene().albedo(pts)
    assert rich.std() > 3 * alb.std()  # vs the textured base scene


def test_room2_and_corridor_scenes_render():
    """New suite scenes (VERDICT r3 #9): geometry closed, camera stays
    in free space along the paired trajectory, renders are full-cover."""
    from coslam_tpu.data.synth import (AnalyticCorridor, AnalyticRoom2,
                                       make_corridor_trajectory,
                                       make_scan_trajectory, render_frame)

    for scene, traj in ((AnalyticRoom2(), make_scan_trajectory(24)),
                        (AnalyticCorridor(),
                         make_corridor_trajectory(24, seed=1))):
        eyes = traj[:, :3, 3]
        assert float(scene.sdf(eyes).min()) > 0.1  # camera in free space
        rgb, d = render_frame(scene, traj[0], 24, 32, 25.6, 25.6,
                              15.5, 11.5)
        assert rgb.shape == (24, 32, 3) and d.shape == (24, 32)
        assert (d > 0).mean() == 1.0          # closed geometry: no miss
        assert 0.05 < rgb.mean() < 0.95
    # The corridor walk is seeded (replication seeds give distinct data).
    t0 = make_corridor_trajectory(24, seed=0)
    t1 = make_corridor_trajectory(24, seed=1)
    assert np.abs(t0 - t1).max() > 1e-3
