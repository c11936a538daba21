"""End-to-end integration: mapping-only quality, tracking recovery, full
SLAM loop wiring on a small analytic scene.

These mirror the reference's evaluation-as-test strategy (SURVEY §4) at
CPU-friendly sizes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.data.synth import (AnalyticScene, make_synthetic_config,
                                   make_trajectory, render_frame,
                                   write_replica_format)
from coslam_tpu.models.scene_rep import JointEncoding
from coslam_tpu.ops.rays import get_camera_rays
from coslam_tpu.runtime.mapping import make_first_frame_step
from coslam_tpu.runtime.optim import make_map_optimizer
from coslam_tpu.runtime.slam import CoSLAM
from coslam_tpu.runtime.tracking import make_tracking_step


@pytest.fixture(scope="module")
def trained_scene(tmp_path_factory):
    """Scene rep trained on one GT-pose frame (the minimum e2e slice)."""
    d = tmp_path_factory.mktemp("map")
    cfg = make_synthetic_config(str(d / "s"), str(d / "o"), H=40, W=52)
    cfg["mapping"]["first_iters"] = 400
    scene = AnalyticScene()
    pose0 = make_trajectory(4)[0]
    cam = cfg["cam"]
    bb = np.array(cfg["mapping"]["bound"], np.float32)

    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = make_map_optimizer(cfg)
    opt_state = tx.init(params)
    step = make_first_frame_step(model, cfg, tx, cam["H"], cam["W"])

    rgb, depth = render_frame(scene, pose0, cam["H"], cam["W"], cam["fx"],
                              cam["fy"], cam["cx"], cam["cy"])
    dirs = get_camera_rays(cam["H"], cam["W"], cam["fx"], cam["fy"],
                           cam["cx"], cam["cy"])
    frame = np.concatenate([dirs.reshape(-1, 3), rgb.reshape(-1, 3),
                            depth.reshape(-1, 1)], 1).astype(np.float32)
    params, _, loss, psnr = step(params, opt_state, jnp.asarray(pose0),
                                 jnp.asarray(frame), jax.random.PRNGKey(1))
    return cfg, scene, pose0, model, params, (rgb, depth, dirs), float(psnr)


def test_mapping_converges(trained_scene):
    cfg, scene, pose0, model, params, (rgb, depth, dirs), psnr = trained_scene
    assert psnr > 28.0  # RGB fits

    # Rendered depth close to sensor depth on a ray subset.
    rng = np.random.default_rng(0)
    idx = rng.choice(dirs.reshape(-1, 3).shape[0], 256, replace=False)
    dd = dirs.reshape(-1, 3)[idx]
    zz = depth.reshape(-1)[idx]
    rays_d = dd @ pose0[:3, :3].T
    rays_o = np.broadcast_to(pose0[:3, 3], rays_d.shape)
    ret = model.render_rays(params, jax.random.PRNGKey(0),
                            jnp.asarray(rays_o), jnp.asarray(rays_d),
                            jnp.asarray(zz[:, None]))
    depth_err = np.abs(np.asarray(ret["depth"]) - zz)
    assert np.median(depth_err) < 0.02  # 2 cm at scene scale


def test_mesh_from_trained_map(trained_scene, tmp_path):
    cfg, scene, pose0, model, params, (rgb, depth, dirs), _ = trained_scene
    from scipy.spatial import cKDTree

    from coslam_tpu.mesh.extract import extract_mesh

    bb = np.array(cfg["mapping"]["bound"], np.float32)
    mesh = extract_mesh(model, params, cfg, bb, color_func=model.query_color,
                        voxel_size=0.1,
                        mesh_savepath=str(tmp_path / "m.ply"))
    assert len(mesh.vertices) > 100
    assert mesh.vertex_colors is not None
    assert os.path.exists(tmp_path / "m.ply")
    # Completion: surface points observed by frame 0 must be covered by the
    # mesh. (Unobserved space stays near SDF~0 and emits spurious geometry
    # — same as the reference; that is what mesh culling is for.)
    rays_d = dirs.reshape(-1, 3) @ pose0[:3, :3].T
    surf = pose0[:3, 3][None] + rays_d * depth.reshape(-1, 1)
    d, _ = cKDTree(mesh.vertices).query(surf[::7])
    assert np.median(d) < 0.06


def test_tracking_recovers_pose(trained_scene):
    cfg, scene, pose0, model, params, (rgb, depth, dirs), _ = trained_scene
    cfg = {**cfg, "tracking": {**cfg["tracking"], "iter": 30, "best": True,
                               "lr_rot": 0.002, "lr_trans": 0.002}}
    track = make_tracking_step(model, cfg)

    rng = np.random.default_rng(3)
    pert = pose0.copy()
    pert[:3, 3] += np.array([0.01, -0.008, 0.012])
    init_err = np.abs(pert[:3] - pose0[:3]).mean()

    iH, iW = 4, 4
    dd = dirs[iH:-iH, iW:-iW].reshape(-1, 3)
    rr = rgb[iH:-iH, iW:-iW].reshape(-1, 3)
    zz = depth[iH:-iH, iW:-iW].reshape(-1, 1)
    idx = rng.choice(dd.shape[0], cfg["tracking"]["sample"], replace=False)
    rays = np.concatenate([dd[idx], rr[idx], zz[idx]], 1).astype(np.float32)

    c2w, loss, psnr = track(params, jnp.asarray(pert), jnp.asarray(rays),
                            jax.random.PRNGKey(0))
    # Judge recovery on the translation (the injected perturbation);
    # rotation jitters within the render-noise floor.
    init_terr = np.abs(pert[:3, 3] - pose0[:3, 3]).mean()
    final_terr = np.abs(np.asarray(c2w)[:3, 3] - pose0[:3, 3]).mean()
    assert final_terr < 0.5 * init_terr
    del init_err


def test_full_slam_loop(tmp_path):
    """Wiring test: 12-frame sequence through the full pipeline."""
    datadir = str(tmp_path / "scene")
    cfg = make_synthetic_config(datadir, str(tmp_path / "out"), H=40, W=52,
                                n_frames=12)
    cfg["mapping"]["first_iters"] = 150
    cfg["mesh"]["vis"] = 0
    scene = AnalyticScene()
    poses = make_trajectory(12, orbit_fraction=0.02)
    cam = cfg["cam"]
    write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"])

    slam = CoSLAM(cfg)
    res = slam.run(verbose=False, eval_ate=True)
    ate = res["absolute_translational_error.rmse"]
    assert np.isfinite(ate)
    assert ate < 0.05  # stays within 5 cm on an easy sequence
    # Keyframes registered every keyframe_every frames (+ frame 0).
    assert slam.kf_db.count == 3
    # Checkpoint + final artifacts exist.
    out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    assert any(f.startswith("checkpoint") for f in os.listdir(out))
    assert os.path.exists(os.path.join(out, "output.txt"))


def test_checkpoint_roundtrip(tmp_path, trained_scene):
    cfg, scene, pose0, model, params, _, _ = trained_scene
    from coslam_tpu.runtime.checkpoint import load_ckpt, save_ckpt

    est = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    rel = {1: np.asarray(pose0, np.float32)}
    p = str(tmp_path / "ck.npz")
    save_ckpt(p, params, est, rel)
    params2, est2, rel2, _ = load_ckpt(p)
    np.testing.assert_array_equal(est, est2)
    np.testing.assert_allclose(rel[1], rel2[1])
    l1 = jax.tree_util.tree_leaves(params)
    l2 = jax.tree_util.tree_leaves(params2)
    assert all(np.allclose(a, b) for a, b in zip(l1, l2))


def test_checkpoint_roundtrip_orbax(tmp_path, trained_scene):
    """The orbax backend (training.ckpt_backend: orbax — multi-host
    coordinated commit) stores the same payload: params + pose tables +
    pytree extras round-trip exactly, and load_ckpt auto-detects the
    directory format."""
    cfg, scene, pose0, model, params, _, _ = trained_scene
    from coslam_tpu.runtime.checkpoint import load_ckpt, save_ckpt

    est = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    rel = {1: np.asarray(pose0, np.float32)}
    extra = {"frame_cursor": np.int64(4),
             "opt_state": {"m": np.arange(3, dtype=np.float32),
                           "v": np.ones((2, 2), np.float32)}}
    p = str(tmp_path / "ck.orbax")
    save_ckpt(p, params, est, rel, extra)
    assert os.path.isdir(p)
    save_ckpt(p, params, est, rel, extra)  # overwrite (periodic re-save)
    params2, est2, rel2, extra2 = load_ckpt(p)
    np.testing.assert_array_equal(est, est2)
    np.testing.assert_allclose(rel[1], rel2[1])
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        assert np.allclose(np.asarray(a), np.asarray(b))
    assert int(extra2["frame_cursor"]) == 4
    np.testing.assert_array_equal(extra2["opt_state"]["m"],
                                  extra["opt_state"]["m"])


def test_async_checkpoint_snapshot(tmp_path, trained_scene):
    """AsyncCheckpointWriter writes the state AS OF submit time (device
    arrays are immutable; host copies are the caller's contract — here
    we mutate the caller's array after submit and the file must hold
    the pre-mutation values), atomically (no .tmp left behind)."""
    cfg, scene, pose0, model, params, _, _ = trained_scene
    from coslam_tpu.runtime.checkpoint import AsyncCheckpointWriter, load_ckpt

    est = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    rel = {1: np.asarray(pose0, np.float32)}
    p = str(tmp_path / "ck_async.npz")
    w = AsyncCheckpointWriter()
    w.submit(p, params, est.copy(), {k: v.copy() for k, v in rel.items()},
             {"frame_cursor": np.int64(6)})
    est[:] = -1.0  # racing caller-side mutation; copies were taken above
    w.wait()
    assert os.path.exists(p) and not os.path.exists(p + ".tmp")
    params2, est2, rel2, extra2 = load_ckpt(p)
    np.testing.assert_array_equal(
        est2, np.tile(np.eye(4, dtype=np.float32), (5, 1, 1)))
    np.testing.assert_allclose(rel2[1], np.asarray(pose0, np.float32))
    assert int(extra2["frame_cursor"]) == 6
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        assert np.allclose(np.asarray(a), b)


def test_ba_static_schedule_matches_masked():
    """The specialized map_accum_step=1/map_wait_step=0 BA path (direct
    optimizer step, no accumulator) must match the general masked path.
    map_wait_step=-1 keeps identical semantics ((i+1) > -1 is always
    true) while forcing the masked code path."""
    from coslam_tpu.data.synth import make_synthetic_config
    from coslam_tpu.runtime.mapping import make_ba_step
    from coslam_tpu.runtime.optim import make_map_optimizer

    cfg = make_synthetic_config("/tmp/x_ba", "/tmp/y_ba", H=32, W=40)
    cfg["mapping"]["sample"] = 64
    cfg["mapping"]["iters"] = 3
    cfg["training"]["smooth_pts"] = 8
    assert cfg["mapping"]["map_accum_step"] == 1
    assert cfg["mapping"]["map_wait_step"] == 0
    import copy
    cfg_masked = copy.deepcopy(cfg)
    cfg_masked["mapping"]["map_wait_step"] = -1

    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    map_tx = make_map_optimizer(cfg)
    opt_state = map_tx.init(params)
    max_kf, R = 4, 32
    key = jax.random.PRNGKey(2)
    kf_rays = jax.random.uniform(key, (max_kf, R, 7)).at[..., 2].set(-1.0)
    kf_poses = jnp.tile(jnp.eye(4), (max_kf, 1, 1))
    cur_rays = jax.random.uniform(key, (32 * 40, 7)).at[:, 2].set(-1.0)
    args = (params, opt_state, kf_rays, jnp.int32(3), kf_poses,
            jnp.eye(4), cur_rays, key)

    out_static = make_ba_step(model, cfg, map_tx, max_kf, R, R)(*args)
    out_masked = make_ba_step(model, cfg_masked, map_tx, max_kf, R, R)(*args)
    np.testing.assert_allclose(float(out_static[4]), float(out_masked[4]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out_static[0]),
                    jax.tree_util.tree_leaves(out_masked[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_static[2]),
                               np.asarray(out_masked[2]), atol=1e-7)


def test_resume_reproduces_straight_run(tmp_path):
    """Crash-resume equivalence: a run checkpointed at frame 6 and
    resumed with --ckpt semantics reproduces the straight run's final
    pose table EXACTLY — keyframe DB, optimizer state, and both RNG
    streams are part of the checkpoint, so the resumed trajectory is
    the same program on the same state."""
    datadir = str(tmp_path / "scene")
    cfg = make_synthetic_config(datadir, str(tmp_path / "outA"), H=40, W=52,
                                n_frames=12)
    cfg["mapping"]["first_iters"] = 100
    cfg["mesh"]["vis"] = 0
    cfg["mesh"]["voxel_final"] = 0.2
    scene = AnalyticScene()
    poses = make_trajectory(12, orbit_fraction=0.02)
    cam = cfg["cam"]
    write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"])

    slam_a = CoSLAM(cfg)
    slam_a.run(verbose=False, eval_ate=False, ckpt_every=6)
    out_a = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    ckpt = os.path.join(out_a, "checkpoint6.npz")
    assert os.path.exists(ckpt)

    cfg_b = dict(cfg, data=dict(cfg["data"], output=str(tmp_path / "outB")))
    slam_b = CoSLAM(cfg_b)
    start = slam_b.load_checkpoint(ckpt)
    assert start == 6
    assert slam_b.kf_db.count == slam_a.kf_db.count or slam_b.kf_db.count >= 2
    slam_b.run(verbose=False, eval_ate=False, start_frame=start)

    np.testing.assert_allclose(slam_b.est_c2w, slam_a.est_c2w,
                               rtol=0, atol=1e-6)


def test_current_frame_mapping_path(tmp_path):
    """mapping.cur_frame_iters > 0 enables the per-frame map-only
    refinement (reference coslam.py:209-249, grid-only optimizer): the
    loop runs it before BA and the map still converges."""
    datadir = str(tmp_path / "scene")
    cfg = make_synthetic_config(datadir, str(tmp_path / "out"), H=40, W=52,
                                n_frames=8)
    cfg["mapping"]["first_iters"] = 100
    cfg["mapping"]["cur_frame_iters"] = 2
    cfg["mesh"]["vis"] = 0
    scene = AnalyticScene()
    poses = make_trajectory(8, orbit_fraction=0.02)
    cam = cfg["cam"]
    write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"])

    slam = CoSLAM(cfg)
    assert slam._cur_map_step is not None
    res = slam.run(verbose=False, eval_ate=True)
    assert np.isfinite(res["absolute_translational_error.rmse"])
    assert res["absolute_translational_error.rmse"] < 0.05


def test_quantized_frame_block_matches_f32(tmp_path):
    """The quantized (uint8 rgb / uint16 depth) frame-block upload path
    dequantizes to within its quantization steps of the f32 path: rgb
    exact for uint8-sourced images, depth within (max depth)/65535."""
    datadir = str(tmp_path / "scene")
    cfg = make_synthetic_config(datadir, str(tmp_path / "out"), H=24,
                                W=32, n_frames=2)
    scene = AnalyticScene()
    poses = make_trajectory(2, orbit_fraction=0.01)
    cam = cfg["cam"]
    write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"])
    slam = CoSLAM(cfg)
    assert slam._quant_upload  # default on
    batch = slam.dataset[0]
    blk_q = np.asarray(slam._frame_block(batch))
    blk_f = np.asarray(slam._assemble_block_f32(
        slam._device_dirs(batch["direction"]),
        jnp.asarray(np.asarray(batch["rgb"], np.float32)),
        jnp.asarray(np.asarray(batch["depth"], np.float32))))
    assert blk_q.shape == blk_f.shape
    np.testing.assert_array_equal(blk_q[:, :3], blk_f[:, :3])  # dirs
    # rgb: loader produced u8/255, so the round-trip is exact.
    np.testing.assert_allclose(blk_q[:, 3:6], blk_f[:, 3:6], atol=1e-6)
    # depth: one quantization step at this frame's max depth.
    step = max(float(np.asarray(batch["depth"]).max()), 1e-6) / 65535.0
    np.testing.assert_allclose(blk_q[:, 6], blk_f[:, 6], atol=step)

    # The config gate restores bit-exact f32 streaming.
    cfg2 = {**cfg, "data": {**cfg["data"], "quantize_upload": False}}
    slam2 = CoSLAM(cfg2)
    blk2 = np.asarray(slam2._frame_block(slam2.dataset[0]))
    np.testing.assert_array_equal(blk2, blk_f)


def test_async_periodic_mesh_eval(tmp_path):
    """mesh.async_vis: the vis-cadence mesh+ATE jobs run on the
    background worker from submit-time snapshots, so they produce
    byte-identical artifacts to the synchronous path, and every
    periodic artifact is on disk by the time run() returns."""
    outs = {}
    for mode in ("async", "sync"):
        d = tmp_path / mode
        datadir = str(d / "scene")
        cfg = make_synthetic_config(datadir, str(d / "out"), H=40, W=52,
                                    n_frames=12)
        cfg["mapping"]["first_iters"] = 150
        cfg["mesh"]["vis"] = 5
        cfg["mesh"]["voxel_eval"] = 0.12
        cfg["mesh"]["async_vis"] = (mode == "async")
        scene = AnalyticScene()
        poses = make_trajectory(12, orbit_fraction=0.02)
        cam = cfg["cam"]
        write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                             cam["fx"], cam["fy"], cam["cx"], cam["cy"])
        slam = CoSLAM(cfg)
        slam.run(verbose=False, eval_ate=True)
        out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
        for f in ("mesh_track5.ply", "mesh_track10.ply", "output.txt",
                  "pose_5.png", "pose_r_10.png"):
            assert os.path.exists(os.path.join(out, f)), (mode, f)
        outs[mode] = out
    for f in ("mesh_track5.ply", "mesh_track10.ply", "output.txt",
              "output_relative.txt"):
        with open(os.path.join(outs["async"], f), "rb") as fa, \
                open(os.path.join(outs["sync"], f), "rb") as fb:
            assert fa.read() == fb.read(), f
