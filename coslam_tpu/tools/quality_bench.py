"""End-to-end quality benchmark on the analytic synthetic scene.

Runs the full SLAM pipeline (tracking + BA + keyframes + meshing) on a
procedurally rendered RGB-D sequence, then evaluates ATE and culled-mesh
Acc/Comp/Ratio/depth-L1 against the analytic ground-truth mesh. This is
the self-contained stand-in for the Replica-room0 protocol when no real
dataset is on disk.

Run: python -m coslam_tpu.tools.quality_bench [--frames 100] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--hw", type=str, default="120x160")
    p.add_argument("--out", default=None)
    p.add_argument("--workdir", default=None)
    p.add_argument("--protocol", default="replica",
                   choices=["replica", "tum", "scannet", "rgbd"],
                   help="'replica': smooth scan trajectory, exact depth, "
                        "Replica on-disk layout + recipe. 'tum': handheld "
                        "jerky trajectory, Kinect-style depth noise + "
                        "holes, TUM on-disk layout (exercises the TUM "
                        "loader's timestamp association) + the TUM "
                        "training recipe at the TPU-tuned operating "
                        "point (configs/Tum/fr1_desk_vm.yaml); "
                        "--set training.n_importance=128 etc. recovers "
                        "the reference recipe. 'scannet': two-room "
                        "apartment walkthrough (doorway traversal), "
                        "sensor noise, ScanNet on-disk layout + recipe "
                        "at the TPU-tuned operating point. 'rgbd': "
                        "SyntheticRGBD — scan trajectory, residual "
                        "simulated depth noise (no holes), NeuralRGBD "
                        "on-disk layout (poses.txt with nan-pose "
                        "filtering) + recipe")
    p.add_argument("--dagger", action="store_true",
                   help="the reference's dagger protocol: double tracking "
                        "iterations + best-pose selection (configs/"
                        "Tum_dagger vs configs/Tum: iter 10->20, best on)")
    p.add_argument("--pipelined", action="store_true",
                   help="run the concurrent tracker/mapper pipeline "
                        "(the coslam_mp.py-equivalent execution mode: "
                        "two host threads, mapper owns params, tracker "
                        "reads published snapshots) instead of the "
                        "sequential runtime")
    p.add_argument("--active", action="store_true",
                   help="run the ActiveCoSLAM research variant instead of "
                        "the fixed keyframe cadence: uncertainty (beta) "
                        "head + info-gain frame selection growing the "
                        "train set (reference ActiveCoSLAM/active_tum.yaml "
                        "active section defaults)")
    p.add_argument("--enc", default=None,
                   help="override grid.enc (e.g. TriPlane) to validate "
                        "alternative parametric encodings end-to-end")
    p.add_argument("--samples_d", type=int, default=None,
                   help="override training.n_samples_d (uniform stratum "
                        "points/ray) to validate TPU-tuned operating "
                        "points like configs/Replica/room0_tpu.yaml")
    p.add_argument("--set", action="append", default=[],
                   metavar="SECTION.KEY=VALUE",
                   help="ad-hoc config override, e.g. "
                        "--set grid.triplane_levels=5 (repeatable)")
    p.add_argument("--culling", default="coslam",
                   choices=["frustum", "frustum_occlusion", "coslam"],
                   help="mesh culling strategy; 'coslam' (default) is the "
                        "reference protocol: frustum + occlusion + virtual "
                        "cameras (evaluation/README.md)")
    p.add_argument("--eval_views", type=int, default=50,
                   help="virtual views for the 2D depth-L1 (the "
                        "reference uses 1000; 50 keeps runtime down but "
                        "is noticeably view-sampling-noisy once the "
                        "unseen set is small — use >=200 for tables)")
    p.add_argument("--scene", default=None,
                   choices=["room", "apartment", "thin", "plain",
                            "room2", "corridor"],
                   help="analytic scene override (default: by protocol — "
                        "scannet->apartment, else room). 'thin' = "
                        "cm-scale plates/rod/table (the reference's "
                        "worst RGBD case), 'plain' = texture-poor room "
                        "(photometric-degenerate tracking)")
    p.add_argument("--exposure_drift", type=float, default=0.0,
                   help="per-frame exposure random-walk std applied to "
                        "the rendered RGB (replica protocol only) — the "
                        "adversarial protocol behind training.frame_align")
    p.add_argument("--motion_blur", type=float, default=0.0,
                   help="camera motion blur shutter fraction for the "
                        "rendered RGB (tum protocol only) — the "
                        "handheld fast-motion failure mode "
                        "(data/synth.py make_blur_renderer)")
    p.add_argument("--tag", default=None,
                   help="suffix appended to the SLAM output dir only "
                        "(NOT the rendered data dir): A/B arms that "
                        "differ only by --set overrides share one "
                        "render cache without overwriting each other's "
                        "meshes/checkpoints")
    p.add_argument("--seed", type=int, default=0,
                   help="replication seed: varies the SLAM RNG streams "
                        "(param init, ray draws) AND the rendered "
                        "dataset where the protocol is stochastic "
                        "(handheld/walkthrough trajectories, sensor "
                        "noise); the seed-replication table runs each "
                        "scene at several seeds")
    args = p.parse_args(argv)

    # Perturbation flags are protocol-specific renders; silently
    # accepting them elsewhere would stamp a result artifact with a
    # perturbation that was never rendered.
    if args.motion_blur and args.protocol != "tum":
        p.error(f"--motion_blur only renders under --protocol tum "
                f"(got {args.protocol})")
    if args.exposure_drift and args.protocol != "replica":
        p.error(f"--exposure_drift only renders under --protocol replica "
                f"(got {args.protocol})")

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/coslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import numpy as np

    from ..data.synth import (AnalyticApartment, AnalyticScene,
                              make_handheld_trajectory,
                              make_rgbd_synthetic_config,
                              make_scan_trajectory,
                              make_scannet_synthetic_config,
                              make_synthetic_config,
                              make_tum_synthetic_config,
                              make_walkthrough_trajectory,
                              write_replica_format, write_rgbd_format,
                              write_scannet_format, write_tum_format)
    from ..eval.benchmark import run_benchmark
    from ..mesh.io import TriMesh
    from ..mesh.mcubes import marching_cubes

    H, W = (int(v) for v in args.hw.split("x"))
    work = args.workdir or tempfile.mkdtemp(prefix="coslam_quality_")
    default_scene = "apartment" if args.protocol == "scannet" else "room"
    scene_name = args.scene or default_scene
    # Scene/protocol-suffixed data dir so a persistent --workdir never
    # mixes renders of different scenes OR on-disk formats (the replica
    # default keeps the legacy name for cached workdirs).
    if args.protocol == "replica" and scene_name == "room" \
            and args.seed == 0 and not args.exposure_drift:
        datadir = os.path.join(work, "scene")
        outdir = os.path.join(work, "out"
                              + (f"_{args.tag}" if args.tag else ""))
        gt_name = "gt.ply"
    else:
        suffix = f"{args.protocol}_{scene_name}"
        if args.seed:
            suffix += f"_s{args.seed}"
        if args.exposure_drift:
            suffix += f"_xd{args.exposure_drift}"
        if args.motion_blur:
            suffix += f"_mb{args.motion_blur}"
        datadir = os.path.join(work, f"scene_{suffix}")
        outdir = os.path.join(work, f"out_{suffix}"
                              + (f"_{args.tag}" if args.tag else ""))
        gt_name = f"gt_{args.protocol}_{scene_name}.ply"
    if args.protocol == "tum":
        cfg = make_tum_synthetic_config(datadir, outdir,
                                        H=H, W=W, n_frames=args.frames)
    elif args.protocol == "scannet":
        cfg = make_scannet_synthetic_config(
            datadir, outdir, H=H, W=W,
            n_frames=args.frames)
    elif args.protocol == "rgbd":
        cfg = make_rgbd_synthetic_config(
            datadir, outdir, H=H, W=W,
            n_frames=args.frames)
    else:
        cfg = make_synthetic_config(datadir, outdir,
                                    H=H, W=W, n_frames=args.frames)
        cfg["mapping"]["first_iters"] = 500
        cfg["mapping"]["sample"] = 2048
        cfg["tracking"]["sample"] = 1024
        cfg["tracking"]["iter"] = 15
        cfg["tracking"]["lr_rot"] = 0.004
        cfg["tracking"]["lr_trans"] = 0.004
    cfg["mesh"]["vis"] = 0
    cfg["mesh"]["voxel_final"] = 0.05
    if args.active:
        # Reference proportions (ac_coslam.py:962 hardcodes init 200 of
        # ~600-frame sequences, topK 1): a contiguous init segment, then
        # a sparse info-gain tail — 2 of each 5-frame window (quality
        # validated at this point: ATE 4.9 cm at 300f, STATUS.md).
        cfg["active"] = {"isActive": True, "check_info_gain_every": 5,
                         "init_image": max(10, args.frames // 2),
                         "choose_k": 2, "w": 0.01,
                         "downsample_rate": 2, "beta_min": 0.01}
    if args.dagger:
        cfg["tracking"]["iter"] *= 2
        cfg["tracking"]["best"] = True
    if args.samples_d is not None:
        cfg["training"]["n_samples_d"] = args.samples_d
    if args.enc is not None:
        cfg["grid"]["enc"] = args.enc
    for kv in args.set:
        path, _, raw = kv.partition("=")
        sec, _, key = path.partition(".")
        try:
            val = int(raw)
        except ValueError:
            try:
                val = float(raw)
            except ValueError:
                val = raw
        cfg.setdefault(sec, {})[key] = val

    from ..data.synth import (AnalyticCorridor, AnalyticPlainScene,
                              AnalyticRoom2, AnalyticThinScene,
                              make_corridor_trajectory)
    scene = {"room": AnalyticScene, "apartment": AnalyticApartment,
             "thin": AnalyticThinScene, "plain": AnalyticPlainScene,
             "room2": AnalyticRoom2,
             "corridor": AnalyticCorridor}[scene_name]()
    cfg["seed"] = args.seed
    cam = cfg["cam"]
    print(f"rendering {args.frames} frames at {H}x{W}...", flush=True)
    if args.protocol == "tum":
        poses = make_handheld_trajectory(args.frames, seed=args.seed)
        write_tum_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"],
                         png_depth_scale=cam["png_depth_scale"],
                         seed=args.seed, motion_blur=args.motion_blur)
    elif args.protocol == "scannet":
        poses = make_walkthrough_trajectory(args.frames, seed=args.seed)
        write_scannet_format(datadir, scene, poses, cam["H"], cam["W"],
                             cam["fx"], cam["fy"], cam["cx"], cam["cy"],
                             png_depth_scale=cam["png_depth_scale"],
                             seed=args.seed)
    elif args.protocol == "rgbd":
        poses = make_scan_trajectory(args.frames)
        write_rgbd_format(datadir, scene, poses, cam["H"], cam["W"],
                          cam["fx"], cam["fy"], cam["cx"], cam["cy"],
                          png_depth_scale=cam["png_depth_scale"],
                          seed=args.seed)
    else:
        poses = (make_corridor_trajectory(args.frames, seed=args.seed)
                 if scene_name == "corridor"
                 else make_scan_trajectory(args.frames))
        write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                             cam["fx"], cam["fy"], cam["cx"], cam["cy"],
                             exposure_drift=args.exposure_drift,
                             exposure_seed=args.seed)

    # Analytic GT mesh over the scene's bound (~3.4 cm grid spacing,
    # the single-room protocol's historical 128-point resolution; the
    # thin scene needs a finer grid or its cm-scale slabs fall between
    # grid points and the GT mesh itself grows holes).
    spacing = 4.4 / 255 if scene_name == "thin" else 4.4 / 127
    lo = scene.bound[:, 0]
    axes = [np.linspace(l, h, int(round((h - l) / spacing)) + 1
                        ).astype(np.float32) for l, h in scene.bound]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    sdf = scene.sdf(np.stack([X, Y, Z], -1)).astype(np.float32)
    v, f = marching_cubes(sdf, 0.0, truncation=5.0)
    sp = np.array([ax[1] - ax[0] for ax in axes], np.float32)
    gt_path = os.path.join(work, gt_name)
    TriMesh(v * sp[None, :] + lo[None, :], f).export(gt_path)

    print("running SLAM...", flush=True)
    slam_cls = None
    if args.active:
        from ..active.slam import ActiveCoSLAM
        slam_cls = ActiveCoSLAM
    elif args.pipelined:
        from ..runtime.pipeline import PipelinedCoSLAM
        slam_cls = PipelinedCoSLAM
    res = run_benchmark(cfg, gt_mesh_path=gt_path,
                        culling=args.culling, n_eval_views=args.eval_views,
                        slam_cls=slam_cls)
    res["culling"] = args.culling
    res["active"] = bool(args.active)
    res["pipelined"] = bool(args.pipelined)
    res["protocol"] = args.protocol
    res["scene"] = scene_name
    res["n_frames"] = args.frames
    res["resolution"] = f"{H}x{W}"
    res["dagger"] = bool(args.dagger)
    res["n_samples_d"] = cfg["training"]["n_samples_d"]
    res["enc"] = cfg["grid"]["enc"]
    res["device"] = str(jax.devices()[0])
    res["seed"] = args.seed
    if args.motion_blur:
        res["motion_blur"] = args.motion_blur
    if args.exposure_drift:
        res["exposure_drift"] = args.exposure_drift
    if args.set:
        # A/B arms differ only by these; without them the artifact
        # cannot be told apart from a defaults run.
        res["overrides"] = list(args.set)
    from ..data.synth import dataset_content_hash
    res["dataset_sha1"] = dataset_content_hash(datadir)
    print(json.dumps(res, indent=2))
    if args.out:
        with open(args.out, "w") as fo:
            json.dump(res, fo, indent=2)
    return res


if __name__ == "__main__":
    main()
