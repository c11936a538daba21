"""Visualization tooling: colormap, camera frusta, bound estimation,
per-frame RGB-D composites (reference coslam.py:657-668 +
utils.py:208-263 + tools/vis_cameras.py + vis_bound.ipynb equivalents).
"""

import os

import numpy as np
import pytest

from coslam_tpu.data.datasets import get_dataset
from coslam_tpu.data.synth import (AnalyticScene, make_synthetic_config,
                                   make_trajectory, write_replica_format)
from coslam_tpu.tools.vis_cameras import frustum_corners, plot_cameras
from coslam_tpu.tools.viz import colormap_image, estimate_scene_bounds


@pytest.fixture(scope="module")
def synth_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("viz_synth")
    datadir = str(d / "scene")
    cfg = make_synthetic_config(datadir, str(d / "out"), H=40, W=52,
                                n_frames=6)
    cam = cfg["cam"]
    write_replica_format(datadir, AnalyticScene(), make_trajectory(6),
                         cam["H"], cam["W"], cam["fx"], cam["fy"],
                         cam["cx"], cam["cy"])
    return cfg, get_dataset(cfg)


def test_colormap_image_range_and_mask():
    img = np.linspace(0.5, 3.0, 12).reshape(3, 4).astype(np.float32)
    out = colormap_image(img)
    assert out.shape == (3, 4, 3) and out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 1.0
    mask = np.ones((3, 4), bool)
    mask[0, 0] = False
    out = colormap_image(img, mask, invalid_color=(1.0, 1.0, 1.0))
    np.testing.assert_allclose(out[0, 0], [1.0, 1.0, 1.0])
    # vmin/vmax clamp: values at/below vmin share the extreme color.
    out = colormap_image(img, vmin=1.0, vmax=2.0)
    np.testing.assert_allclose(out[0, 0], out[0, 1])


def test_frustum_corners_geometry():
    c2w = np.eye(4)
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    c = frustum_corners(c2w, scale=0.2)
    assert c.shape == (5, 3)
    np.testing.assert_allclose(c[0], [1.0, 2.0, 3.0])  # apex = camera center
    # OpenGL: image plane sits at -z in camera frame.
    assert np.allclose(c[1:, 2], 3.0 - 0.4)


def test_plot_cameras_writes_png(tmp_path, synth_ds):
    cfg, ds = synth_ds
    poses = [ds[i]["c2w"] for i in range(len(ds))]
    out = str(tmp_path / "cams.png")
    plot_cameras(poses, bounds=np.array(cfg["mapping"]["bound"]),
                 gt_poses=poses, save_path=out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_estimate_scene_bounds_brackets_room(synth_ds):
    cfg, ds = synth_ds
    bound, robust = estimate_scene_bounds(ds, every=2)
    assert bound.shape == (3, 2) and robust.shape == (3, 2)
    # The room walls are at +-2; the visible surface cloud must stay
    # inside the padded walls and span most of the room.
    assert (bound[:, 0] >= -2.0 - 0.1 - 1e-5).all()
    assert (bound[:, 1] <= 2.0 + 0.1 + 1e-5).all()
    assert (robust[:, 1] - robust[:, 0] > 1.0).all()
    # Robust percentile bound nests inside the min/max bound.
    assert (robust[:, 0] >= bound[:, 0] - 1e-5).all()
    assert (robust[:, 1] <= bound[:, 1] + 1e-5).all()


def test_visualise_frame_writes_composite(tmp_path, synth_ds):
    from coslam_tpu.runtime.slam import CoSLAM

    cfg, ds = synth_ds
    slam = CoSLAM(cfg)
    b = ds[0]
    path = slam.visualise_frame(b, 0, str(tmp_path))
    assert os.path.exists(path)
    import cv2

    img = cv2.imread(path)
    H, W = b["depth"].shape
    assert img.shape == (H, 2 * W, 3)  # [rgb | turbo-depth] side by side
