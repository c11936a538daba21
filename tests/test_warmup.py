"""Cold-start warmup (slam._warm_programs): must be inert on the CPU
backend, and on a device backend must dispatch each heavy megastep once
with live-shaped dummies — never the donated keyframe ring, never the
run's RNG stream (reference has no counterpart; this hides the
compiled-program loads behind first-frame mapping, see slam.py)."""

import numpy as np
import pytest

from coslam_tpu.data.synth import (AnalyticScene, make_synthetic_config,
                                   make_trajectory, write_replica_format)


@pytest.fixture(scope="module")
def tiny_slam(tmp_path_factory):
    d = tmp_path_factory.mktemp("warm")
    datadir = str(d / "scene")
    cfg = make_synthetic_config(datadir, str(d / "out"), H=40, W=52,
                                n_frames=8)
    scene = AnalyticScene()
    poses = make_trajectory(8, orbit_fraction=0.02)
    cam = cfg["cam"]
    write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"])
    from coslam_tpu.runtime.slam import CoSLAM
    return CoSLAM(cfg)


def test_warmup_inert_on_cpu(tiny_slam, monkeypatch):
    calls = []
    monkeypatch.setattr(tiny_slam, "_track_step",
                        lambda *a: calls.append("track"))
    monkeypatch.setattr(tiny_slam, "_ba_step", lambda *a: calls.append("ba"))
    monkeypatch.setattr(tiny_slam, "_ba_step_small",
                        lambda *a: calls.append("ba_small"))
    tiny_slam._warm_programs()
    assert calls == []  # executing dummies on CPU costs more than it hides


def test_warmup_dispatches_each_program_once(tiny_slam, monkeypatch):
    import coslam_tpu.runtime.slam as slam_mod

    cfg = tiny_slam.config
    live_ring = tiny_slam.kf_db.rays
    seed_before = tiny_slam._seed
    params_before = tiny_slam.params
    opt_before = tiny_slam.map_opt_state
    calls = []

    def rec_track(params, c2w, rays, key):
        calls.append("track")
        assert params is params_before
        assert rays.shape == (cfg["tracking"]["sample"], 7)

    def make_rec_ba(name):
        def rec_ba(params, opt, ring, count, poses, cur_pose, cur_rays, key):
            calls.append(name)
            assert params is params_before and opt is opt_before
            # NEVER the live (donated-to-add_keyframe) ring — a dummy.
            assert ring is not live_ring
            assert ring.shape == live_ring.shape
            assert not np.any(np.asarray(ring))
            assert cur_rays.shape == (tiny_slam.dataset.H
                                      * tiny_slam.dataset.W, 7)
        return rec_ba

    monkeypatch.setattr(slam_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(tiny_slam, "_track_step", rec_track)
    monkeypatch.setattr(tiny_slam, "_ba_step", make_rec_ba("ba"))
    monkeypatch.setattr(tiny_slam, "_ba_step_small", make_rec_ba("ba_small"))
    tiny_slam._warm_programs()
    assert sorted(calls) == ["ba", "ba_small", "track"]
    assert tiny_slam._seed == seed_before        # RNG stream untouched
    assert tiny_slam.params is params_before     # no state mutation
