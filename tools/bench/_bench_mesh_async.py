"""Measure the wall-clock win of async periodic mesh+ATE (mesh.async_vis).

Runs the REAL CoSLAM.run() frame loop at the flagship operating point on
a cached 480x640 synthetic scene with periodic meshing enabled
(mesh.vis cadence, reference protocol behavior) twice — synchronous vs
background-worker periodic mesh/eval — and reports total wall time and
the frame-time distribution around the mesh frames.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import os
import sys
import time

import numpy as np


def run_once(async_vis: bool, n_frames=60, H=480, W=640, vis=15):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/coslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from coslam_tpu.data.synth import (AnalyticScene, make_scan_trajectory,
                                       make_synthetic_config,
                                       write_replica_format)
    from coslam_tpu.runtime.slam import CoSLAM

    work = f"/tmp/bench_meshasync_{H}x{W}_{n_frames}"
    datadir = os.path.join(work, "scene")
    cfg = make_synthetic_config(datadir, os.path.join(
        work, "out_async" if async_vis else "out_sync"), H=H, W=W,
        n_frames=n_frames)
    cfg["grid"]["enc"] = "TensoVM"
    cfg["grid"]["triplane_levels"] = 3
    cfg["training"]["n_samples_d"] = 16
    cfg["training"]["n_range_d"] = 11
    cfg["mapping"]["first_iters"] = 200
    cfg["mapping"]["sample"] = 2048
    cfg["tracking"]["sample"] = 1024
    cfg["tracking"]["iter"] = 10
    cfg["mesh"]["vis"] = vis
    cfg["mesh"]["voxel_eval"] = 0.05
    cfg["mesh"]["async_vis"] = async_vis
    cam = cfg["cam"]
    stamp = os.path.join(datadir, ".done")
    if not os.path.exists(stamp):
        write_replica_format(datadir, AnalyticScene(),
                             make_scan_trajectory(n_frames),
                             cam["H"], cam["W"], cam["fx"], cam["fy"],
                             cam["cx"], cam["cy"])
        open(stamp, "w").close()

    slam = CoSLAM(cfg)
    t0 = time.perf_counter()
    slam.run(verbose=False, eval_ate=True)
    total = time.perf_counter() - t0
    walls = np.asarray(slam.frame_walls)
    dts = np.diff(walls) * 1e3
    # Frame times right AFTER each mesh submission (mesh frames are
    # vis, 2*vis, ...): sync blocks there, async should not.
    mesh_f = [f for f in range(vis, n_frames - 1, vis)]
    mesh_dts = [dts[f] for f in mesh_f if f < len(dts)]
    return {
        "mode": "async" if async_vis else "sync",
        "total_wall_s": round(total, 2),
        "mesh_frame_ms": [round(x, 1) for x in mesh_dts],
        "frame_ms_p50": round(float(np.percentile(dts[8:], 50)), 1),
        "frame_ms_p90": round(float(np.percentile(dts[8:], 90)), 1),
        "mesh_phase_ms": [round(x, 1) for x in slam.timings["mesh"]],
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    for async_vis in (False, True):
        print(run_once(async_vis))
