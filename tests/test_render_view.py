"""Novel-view render tool: library quality + CLI surface.

The reference exposes one-shot render evaluation only inside
ActiveCoSLAM (ac_coslam.py:703-741 test()); tools/render_view.py makes
it a standalone surface for any trained checkpoint.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from coslam_tpu.data.synth import (AnalyticScene, make_synthetic_config,
                                   make_trajectory, render_frame)
from coslam_tpu.models.scene_rep import JointEncoding
from coslam_tpu.ops.rays import get_camera_rays
from coslam_tpu.runtime.checkpoint import save_ckpt
from coslam_tpu.runtime.mapping import make_first_frame_step
from coslam_tpu.runtime.optim import make_map_optimizer
from coslam_tpu.tools import render_view


@pytest.fixture(scope="module")
def ckpt_scene(tmp_path_factory):
    """Tiny map trained on one GT-pose frame, saved as a checkpoint."""
    d = tmp_path_factory.mktemp("rv")
    cfg = make_synthetic_config(str(d / "s"), str(d / "o"), H=24, W=32)
    cfg["mapping"]["first_iters"] = 400
    scene = AnalyticScene()
    pose0 = make_trajectory(4)[0]
    cam = cfg["cam"]
    bb = np.array(cfg["mapping"]["bound"], np.float32)

    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = make_map_optimizer(cfg)
    step = make_first_frame_step(model, cfg, tx, cam["H"], cam["W"])
    rgb, depth = render_frame(scene, pose0, cam["H"], cam["W"], cam["fx"],
                              cam["fy"], cam["cx"], cam["cy"])
    dirs = get_camera_rays(cam["H"], cam["W"], cam["fx"], cam["fy"],
                           cam["cx"], cam["cy"])
    frame = np.concatenate([dirs.reshape(-1, 3), rgb.reshape(-1, 3),
                            depth.reshape(-1, 1)], 1).astype(np.float32)
    params, _, _, _ = step(params, tx.init(params), jnp.asarray(pose0),
                           jnp.asarray(frame), jax.random.PRNGKey(1))

    est = np.zeros((4, 4, 4), np.float32)
    est[0] = pose0
    ckpt = str(d / "ck.npz")
    save_ckpt(ckpt, params, est, {})
    cfg_path = str(d / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return cfg, cfg_path, ckpt, model, params, pose0, rgb, depth


def test_render_image_depth_guided(ckpt_scene):
    """Depth-guided full-image render reproduces the training frame."""
    cfg, _, _, model, params, pose0, rgb, depth = ckpt_scene
    cam = cfg["cam"]
    r, d = render_view.render_image(model, params, pose0, cam["H"],
                                    cam["W"], cam["fx"], cam["fy"],
                                    cam["cx"], cam["cy"], target_d=depth,
                                    chunk=256)
    assert r.shape == rgb.shape and d.shape == depth.shape
    mse = float(np.mean((r - rgb) ** 2))
    assert -10 * np.log10(mse) > 22.0
    assert np.median(np.abs(d - depth)) < 0.03


def test_render_view_cli_pose_file(ckpt_scene, tmp_path):
    """CLI renders a novel view from a 4x4 pose file (no dataset)."""
    cfg, cfg_path, ckpt, _, _, pose0, _, _ = ckpt_scene
    pose_path = str(tmp_path / "pose.txt")
    np.savetxt(pose_path, pose0)
    out_png = str(tmp_path / "render.png")
    result = render_view.main(["--config", cfg_path, "--ckpt", ckpt,
                               "--pose", pose_path, "--out", out_png,
                               "--chunk", "256"])
    assert os.path.exists(result["png"])
    assert os.path.exists(result["depth_png"])
    assert result["rgb"].shape == (cfg["cam"]["H"], cfg["cam"]["W"], 3)
    assert np.all(np.isfinite(result["rgb"]))
    assert np.all(np.isfinite(result["depth"]))


def test_render_view_cli_untracked_frame_errors(ckpt_scene):
    cfg, cfg_path, ckpt, *_ = ckpt_scene
    with pytest.raises(SystemExit):
        # frame 2 has an all-zero pose row in the checkpoint; the pose
        # source needs the dataset only for --gt_pose/--compare, so this
        # exercises the untracked-frame guard without data on disk.
        render_view.main(["--config", cfg_path, "--ckpt", ckpt,
                          "--frame", "2"])
