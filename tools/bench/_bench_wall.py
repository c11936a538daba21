"""Wall-clock frame-loop breakdown at protocol scale (480x640 flagship).

The pure-device cycles (bench.py: 14 ms tracking / 56 ms BA) and the
protocol-run wall times (BENCH_QUALITY_FLAGSHIP.json: 183 ms tracking /
1368 ms BA) differ by >10x — this script pins down where the wall time
goes: host-side sampling/concat, host->device uploads, device compute,
device->host readbacks, python bookkeeping.

Run on TPU: python _bench_wall.py [--frames 40]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import os
import time

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/coslam_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--hw", default="480x640")
    args = p.parse_args()
    H, W = (int(v) for v in args.hw.split("x"))

    from coslam_tpu.data.synth import (AnalyticScene, make_scan_trajectory,
                                       make_synthetic_config,
                                       write_replica_format)
    from coslam_tpu.runtime.slam import CoSLAM

    work = "/tmp/bench_wall"
    datadir = os.path.join(work, "scene")
    cfg = make_synthetic_config(datadir, os.path.join(work, "out"),
                                H=H, W=W, n_frames=args.frames)
    # Flagship operating point (configs/Replica/room0_vm.yaml class).
    cfg["grid"]["enc"] = "TensoVM"
    cfg["grid"]["triplane_levels"] = 3
    cfg["training"]["n_samples_d"] = 16
    cfg["training"]["n_range_d"] = 11
    cfg["mapping"]["first_iters"] = 200
    cfg["mapping"]["sample"] = 2048
    cfg["tracking"]["sample"] = 1024
    cfg["tracking"]["iter"] = 10
    cfg["mesh"]["vis"] = 0
    cam = cfg["cam"]
    stamp = os.path.join(datadir, f".done_{args.frames}_{H}x{W}")
    if not os.path.exists(stamp):
        print("rendering frames...", flush=True)
        write_replica_format(datadir, AnalyticScene(),
                             make_scan_trajectory(args.frames),
                             cam["H"], cam["W"], cam["fx"], cam["fy"],
                             cam["cx"], cam["cy"])
        open(stamp, "w").close()

    slam = CoSLAM(cfg)

    # ---- end-to-end run (the product path) ------------------------------
    t0 = time.perf_counter()
    slam.run(verbose=False, eval_ate=False)
    total = time.perf_counter() - t0
    print(f"run(): {total:.1f} s total for {args.frames} frames")
    for phase, vals in slam.timings.items():
        if vals:
            steady = vals[2:] if len(vals) > 2 else vals
            print(f"  {phase}: mean {np.mean(steady):.1f} ms "
                  f"({len(vals)} calls, first {vals[0]:.0f} ms)")

    # ---- micro-breakdown of one tracking + one BA invocation ------------
    batch = slam.dataset[args.frames - 1]
    i = args.frames - 1

    def t(fn, n=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    # tracking pieces
    ms_sample = t(lambda: slam._sample_tracking_rays(batch))
    rays_np = slam._sample_tracking_rays(batch)
    ms_up_rays = t(lambda: jnp.asarray(rays_np))
    c2w_init = slam.est_c2w[i - 1]
    rays_dev = jnp.asarray(rays_np)
    c2w_dev = jnp.asarray(c2w_init)
    key = jax.random.PRNGKey(7)
    ms_track_dev = t(lambda: slam._track_step(slam.params, c2w_dev,
                                              rays_dev, key))
    out = slam._track_step(slam.params, c2w_dev, rays_dev, key)
    jax.block_until_ready(out)
    ms_fetch3 = t(lambda: (np.asarray(out[0]), float(out[1]),
                           float(out[2]))[1])
    print(f"tracking pieces: host_sample {ms_sample:.1f} | upload_rays "
          f"{ms_up_rays:.1f} | device_step {ms_track_dev:.1f} | "
          f"fetch_c2w+loss+psnr {ms_fetch3:.1f} ms")

    # mapping pieces
    ms_flat = t(lambda: slam._frame_rays_flat(batch))
    flat = slam._frame_rays_flat(batch)
    ms_up_flat = t(lambda: jnp.asarray(flat))
    cur_rays = jnp.asarray(flat)
    cur_pose = jnp.asarray(slam.est_c2w[i])
    ba = (slam._ba_step_small
          if slam.kf_db.count >= slam._ba_small_min_kf else slam._ba_step)
    ms_ba_dev = t(lambda: ba(slam.params, slam.map_opt_state,
                             slam.kf_db.rays, jnp.int32(slam.kf_db.count),
                             slam.kf_poses, cur_pose, cur_rays, key)[4])
    outs = ba(slam.params, slam.map_opt_state, slam.kf_db.rays,
              jnp.int32(slam.kf_db.count), slam.kf_poses, cur_pose,
              cur_rays, key)
    jax.block_until_ready(outs)
    ms_fetch_kf = t(lambda: (np.asarray(outs[2]), np.asarray(outs[3]),
                             float(outs[4]))[2])
    # keyframe insertion (upload + donated update)
    ms_add_kf = t(lambda: slam.kf_db._add(
        jnp.array(slam.kf_db.rays), jnp.asarray(flat), jnp.int32(3),
        key, filter_depth=False), n=2)
    print(f"mapping pieces: host_flat {ms_flat:.1f} | upload_8.6MB "
          f"{ms_up_flat:.1f} | device_BA {ms_ba_dev:.1f} | "
          f"fetch_kfposes+loss {ms_fetch_kf:.1f} | add_kf {ms_add_kf:.1f} ms")


if __name__ == "__main__":
    main()
