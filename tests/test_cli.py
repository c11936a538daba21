"""CLI surface: python -m coslam_tpu --config ... end-to-end on synthetic
data, plus the eval CLIs."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from coslam_tpu.data.synth import (AnalyticScene, make_synthetic_config,
                                   make_trajectory, write_replica_format)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scene_cfg(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    datadir = str(d / "scene")
    cfg = make_synthetic_config(datadir, str(d / "out"), H=36, W=44,
                                n_frames=8)
    cfg["mapping"]["first_iters"] = 40
    cfg["mesh"]["vis"] = 0
    scene = AnalyticScene()
    poses = make_trajectory(8, orbit_fraction=0.02)
    cam = cfg["cam"]
    write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"])
    cfg_path = str(d / "scene.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    return cfg, cfg_path


def _run(args, timeout=1200):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_cli_end_to_end(scene_cfg):
    cfg, cfg_path = scene_cfg
    r = _run(["-m", "coslam_tpu", "--config", cfg_path])
    assert r.returncode == 0, r.stderr[-2000:]
    out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    files = os.listdir(out)
    assert any(f.startswith("checkpoint") for f in files)
    assert any(f.startswith("mesh_track") for f in files)
    assert "output.txt" in files
    # config snapshot next to outputs
    snap_dirs = [d for d in os.listdir(cfg["data"]["output"])
                 if d.startswith(cfg["data"]["exp_name"]) and d != cfg["data"]["exp_name"]]
    assert snap_dirs
    with open(os.path.join(cfg["data"]["output"], snap_dirs[0],
                           "config.json")) as f:
        snap = json.load(f)
    assert snap["dataset"] == "replica"


def test_cli_recon_eval(scene_cfg, tmp_path):
    cfg, cfg_path = scene_cfg
    out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    meshes = [f for f in os.listdir(out) if f.startswith("mesh_track")]
    assert meshes  # produced by test_cli_end_to_end
    mesh_path = os.path.join(out, meshes[0])

    # cull CLI with GT poses
    r = _run(["-m", "coslam_tpu.eval.cli", "cull", "--config", cfg_path,
              "--input_mesh", mesh_path, "--remove_occlusion"])
    assert r.returncode == 0, r.stderr[-2000:]
    culled = mesh_path.replace(".ply", "_cull_occlusion.ply")
    assert os.path.exists(culled)

    # recon CLI (3D only, rec vs itself => near-zero error)
    r = _run(["-m", "coslam_tpu.eval.cli", "recon", "--rec_mesh", culled,
              "--gt_mesh", culled, "-3d", "--no_align"])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout[r.stdout.index("{"):])
    assert res["comp ratio"] > 95.0


def test_export_roundtrip(tmp_path):
    """jax.export serialization of the full query path (the reference's
    ONNX-export smoke equivalent, model/decoder.py:182-226)."""
    import subprocess
    import sys

    out = str(tmp_path / "model.stablehlo")
    r = subprocess.run(
        [sys.executable, "-m", "coslam_tpu.tools.export",
         "--config", "configs/Tum/fr1_desk.yaml", "--out", out,
         "--batch", "256", "--platform", "cpu"],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "finite=True" in r.stdout
    import os
    assert os.path.getsize(out) > 1000


def test_cli_pipelined_mode(scene_cfg):
    """--pipelined runs the concurrent tracker/mapper runtime from the
    product CLI (the reference's `python coslam_mp.py --config ...`
    surface) with mapper-side periodic checkpoints, and --ckpt auto
    resumes it."""
    cfg, cfg_path = scene_cfg
    out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    for f in os.listdir(out):  # isolate from the sequential runs
        if f.startswith("checkpoint"):
            os.remove(os.path.join(out, f))
    # mapper cadence map_every=5: the ckpt lands at the BA of frame 5.
    r = _run(["-m", "coslam_tpu", "--config", cfg_path, "--pipelined",
              "--ckpt_every", "5"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "checkpoint5.npz"))
    assert os.path.exists(os.path.join(out, "checkpoint7.npz"))

    r = _run(["-m", "coslam_tpu", "--config", cfg_path, "--pipelined",
              "--ckpt", os.path.join(out, "checkpoint5.npz")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "resuming from frame 6" in r.stdout


def test_cli_crash_resume(scene_cfg):
    """True crash recovery: SIGKILL the run mid-sequence (after the
    first periodic checkpoint lands — atomic tmp+rename, so the file is
    whole), then `--ckpt auto` resumes and completes the run."""
    import signal
    import time

    cfg, cfg_path = scene_cfg
    out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(out):
        if f.startswith("checkpoint"):
            os.remove(os.path.join(out, f))

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.Popen(
        [sys.executable, "-m", "coslam_tpu", "--config", cfg_path,
         "--ckpt_every", "2"], cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    ck = os.path.join(out, "checkpoint2.npz")
    deadline = time.time() + 600
    while time.time() < deadline and not os.path.exists(ck) \
            and proc.poll() is None:
        time.sleep(0.25)
    try:
        assert os.path.exists(ck), "first periodic checkpoint never landed"
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
        proc.wait()

    r = _run(["-m", "coslam_tpu", "--config", cfg_path, "--ckpt", "auto"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "resuming from frame" in r.stdout
    assert os.path.exists(os.path.join(out, "checkpoint7.npz"))
    assert os.path.exists(os.path.join(out, "output.txt"))


def test_cli_active_flag_exclusive():
    """--active + --pipelined is rejected up front (no config load)."""
    r = _run(["-m", "coslam_tpu", "--config", "configs/Active/active_tum.yaml",
              "--active", "--pipelined"])
    assert r.returncode != 0
    assert "mutually exclusive" in (r.stderr + r.stdout)


def test_cli_auto_resume(scene_cfg):
    """--ckpt_every writes mid-run checkpoints; --ckpt auto finds the
    latest one and resumes from its frame cursor."""
    cfg, cfg_path = scene_cfg
    r = _run(["-m", "coslam_tpu", "--config", cfg_path, "--ckpt_every", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    assert os.path.exists(os.path.join(out, "checkpoint4.npz"))

    r = _run(["-m", "coslam_tpu", "--config", cfg_path, "--ckpt", "auto"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "--ckpt auto ->" in r.stdout
    assert "resuming from frame" in r.stdout
