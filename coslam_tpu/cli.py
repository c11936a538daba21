"""Command-line entry point: `python -m coslam_tpu --config <yaml>`.

Parity with the reference CLI (reference: coslam.py:725-757): loads the
YAML config (recursive inherit_from), applies --input_folder/--output
overrides, snapshots the resolved config as JSON, seeds, and runs.
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="coslam-tpu: TPU-native dense neural RGB-D SLAM")
    parser.add_argument("--config", type=str, required=True,
                        help="Path to config file.")
    parser.add_argument("--input_folder", type=str,
                        help="overrides data.datadir from the config")
    parser.add_argument("--output", type=str,
                        help="overrides data.output from the config")
    parser.add_argument("--max_frames", type=int, default=None,
                        help="process only the first N frames")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="resume from a checkpoint (.npz file or "
                             ".orbax dir; full state: map, poses, "
                             "keyframes, optimizer, RNG, frame cursor); "
                             "'auto' picks the latest checkpoint* in the "
                             "run's output dir")
    parser.add_argument("--ckpt_every", type=int, default=0,
                        help="write a resumable checkpoint every N frames "
                             "(0 = final only, like the reference)")
    parser.add_argument("--devices", type=int, default=None,
                        help="use N devices (overrides parallel.dp): "
                             "sequential mode shards ray batches over a "
                             "N-device data-parallel mesh; pipelined mode "
                             "keeps the tracker on chip 0 and gives the "
                             "mapper chips 1..N-1 (BA ray batches shard "
                             "over them when N > 2)")
    parser.add_argument("--pipelined", action="store_true",
                        help="concurrent tracker/mapper runtime (the "
                             "reference's coslam_mp.py mode); see "
                             "--devices for its multi-chip placement")
    parser.add_argument("--active", action="store_true",
                        help="ActiveCoSLAM info-gain variant (reference "
                             "ActiveCoSLAM/ac_coslam.py); auto-selected "
                             "when the config sets active.isActive")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a JAX profiler trace of steady-state "
                             "frames 10-20 into this directory "
                             "(sequential mode only)")
    args = parser.parse_args(argv)

    # Persistent compilation cache (first compile of the megasteps is slow).
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/coslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from .config import load_config
    from .runtime.slam import CoSLAM

    cfg = load_config(args.config)
    if args.input_folder is not None:
        cfg["data"]["datadir"] = args.input_folder
    if args.output is not None:
        cfg["data"]["output"] = args.output
    if args.devices is not None:
        cfg.setdefault("parallel", {})["dp"] = args.devices

    time_str = datetime.now().strftime("%m%d_%H%M")
    save_path = os.path.join(cfg["data"]["output"],
                             cfg["data"]["exp_name"] + time_str)
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "config.json"), "w",
              encoding="utf-8") as f:
        f.write(json.dumps(cfg, indent=4))

    use_active = args.active or bool(
        (cfg.get("active") or {}).get("isActive"))
    if use_active and args.pipelined:
        raise SystemExit("--active and --pipelined are mutually exclusive "
                         "(the reference's ac_coslam.py is sequential)")
    if use_active:
        from .active.slam import ActiveCoSLAM as slam_cls
    elif args.pipelined:
        from .runtime.pipeline import PipelinedCoSLAM as slam_cls
    else:
        slam_cls = CoSLAM

    slam = slam_cls(cfg)
    slam.seed_everything(0)
    start_frame = 0
    if args.ckpt:
        ckpt_path = args.ckpt
        if ckpt_path == "auto":
            # Latest periodic checkpoint in the run's output dir (by
            # frame index in the filename) — crash recovery without
            # knowing the exact path.
            import glob
            import re

            out_dir = os.path.join(cfg["data"]["output"],
                                   cfg["data"]["exp_name"])
            cands = (glob.glob(os.path.join(out_dir, "checkpoint*.npz"))
                     + glob.glob(os.path.join(out_dir, "checkpoint*.orbax")))
            if not cands:
                raise SystemExit(f"--ckpt auto: no checkpoint*.npz/.orbax "
                                 f"under {out_dir}")
            ckpt_path = max(cands, key=lambda p: int(
                re.search(r"checkpoint(\d+)", p).group(1)))
            print(f"--ckpt auto -> {ckpt_path}")
        if use_active:
            raise SystemExit("--ckpt resume is not supported for the "
                             "active variant (its train set grows "
                             "dynamically; rerun from frame 0)")
        start_frame = slam.load_checkpoint(ckpt_path)
        if start_frame:
            print(f"resuming from frame {start_frame}")
    if use_active:
        if args.ckpt_every:
            print("--ckpt_every ignored in active mode")
        slam.run(n_frames=args.max_frames)
    elif args.pipelined:
        slam.run(n_frames=args.max_frames, start_frame=start_frame,
                 ckpt_every=args.ckpt_every)
    else:
        slam.run(n_frames=args.max_frames, start_frame=start_frame,
                 ckpt_every=args.ckpt_every,
                 profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
