"""Pinned-eval-protocol re-evaluation of the fixed-data suite rows
(VERDICT r4 #6 closure).

r5 found that the headless virtual-camera generation used the run's
ESTIMATED trajectory for its initial coverage mask, so greedy
tie-breaking amplified cm-scale pose differences into a DIFFERENT
virtual-camera set per seed — folding eval-PROTOCOL variance into the
seed spread of every mesh metric on rows whose rendered data is
identical (r5 suite run: room per-seed data hashes differ only in
virtual_cameras/*.txt; the 600 rendered frames are byte-identical).
eval/benchmark.py now builds the cameras from the GT trajectory (the
reference ships fixed per-scene virtual cameras with its benchmark,
evaluation/create_virtual_cameras_replica.py).

This script re-scores the ALREADY-RUN fixed-data suite results (room /
room2 / plain x 3 seeds) under one pinned per-scene camera set, reusing
each run's saved reconstruction mesh and estimated trajectory — pure
CPU, no SLAM re-run — and reports per-seed depth-L1/acc/comp before vs
after, attributing how much of the seed spread was eval protocol vs
true map-surface variance. Writes results/PINNED_EVAL.{json,md}.

Run from repo root: python tools/bench/reeval_pinned_vcams.py
  [--workdir /tmp/coslam_qs_r5] [--scenes room,room2,plain]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import json
import os

import numpy as np

SCENES = ["room", "room2", "plain"]
LAST = 299  # 300-frame suite protocol


def _datadir(wd, scene, seed):
    if scene == "room" and seed == 0:
        return os.path.join(wd, "scene")
    suf = f"replica_{scene}" + (f"_s{seed}" if seed else "")
    return os.path.join(wd, f"scene_{suf}")


def _outdir(wd, scene, seed):
    if scene == "room" and seed == 0:
        return os.path.join(wd, "out", "synth")
    suf = f"replica_{scene}" + (f"_s{seed}" if seed else "")
    return os.path.join(wd, f"out_{suf}", "synth")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/coslam_qs_r5")
    p.add_argument("--scenes", default=",".join(SCENES))
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--eval_views", type=int, default=200)
    args = p.parse_args()

    from coslam_tpu.data.synth import make_synthetic_config
    from coslam_tpu.eval.cull import cull_one_mesh
    from coslam_tpu.eval.recon import calc_2d_metric, calc_3d_metric
    from coslam_tpu.mesh.io import load_ply
    from coslam_tpu.tools.virtual_cameras import create_virtual_cameras

    here = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    wd = args.workdir
    seeds = [int(s) for s in args.seeds.split(",")]
    report = {}
    for scene in args.scenes.split(","):
        gt_path = os.path.join(wd, f"gt_replica_{scene}.ply")
        if not os.path.exists(gt_path):
            gt_path = os.path.join(wd, "gt.ply")
        gt_mesh = load_ply(gt_path)

        # The replica-recipe config quality_bench used for these runs
        # (only cam intrinsics + bounds are consumed here).
        cfg = make_synthetic_config(_datadir(wd, scene, 0),
                                    os.path.join(wd, "out"),
                                    H=120, W=160, n_frames=300)
        cam = cfg["cam"]
        bounds = np.array(cfg["mapping"]["marching_cubes_bound"])
        sb = np.stack([bounds[:, 0], bounds[:, 1]])

        # GT trajectory: identical across the fixed-data seeds
        # (verified byte-identical traj.txt) — ONE pinned camera set.
        traj = np.loadtxt(os.path.join(_datadir(wd, scene, 0),
                                       "traj.txt")).reshape(-1, 4, 4)
        gt_poses = [traj[i] for i in range(len(traj))]
        vdir = os.path.join(wd, f"pinned_vcams_{scene}")
        if not os.path.exists(os.path.join(vdir, "0.txt")):
            create_virtual_cameras(gt_mesh, gt_poses, vdir,
                                   cam["fx"], cam["fy"], cam["cx"],
                                   cam["cy"], cam["H"], cam["W"],
                                   n_candidates=64, n_select=16)

        rows = []
        for seed in seeds:
            od = _outdir(wd, scene, seed)
            rec = os.path.join(od, f"mesh_track{LAST}.ply")
            ckpt = np.load(os.path.join(od, f"checkpoint{LAST}.npz"),
                           allow_pickle=True)
            est = ckpt["pose"]
            est_poses = [est[i] for i in range(len(est))
                         if np.any(est[i] != 0)]
            gt_culled = os.path.join(od, "gt_culled.ply")
            # cull_one_mesh names the unseen pointcloud after the first
            # '_'-token of the culled mesh ('mesh_pc_unseen.npy' for
            # every mesh_track* path) — both passes below rewrite it,
            # so each eval reads ITS OWN culling's unseen set, exactly
            # as the suite's eval did.
            unseen = os.path.join(od, "mesh_pc_unseen.npy")

            def _score(culled_path, cam_dir):
                cull_one_mesh(cfg, est_poses, rec, culled_path,
                              save_unseen=True, remove_occlusion=True,
                              virtual_cameras=True,
                              virt_cam_path=cam_dir, scene_bounds=sb)
                m3 = calc_3d_metric(culled_path, gt_culled, align=False)
                m2 = calc_2d_metric(
                    culled_path, gt_culled, unseen_gt_pcd_file=unseen,
                    align=False, n_imgs=args.eval_views)
                return {
                    "acc_cm": round(m3["acc"], 3),
                    "comp_cm": round(m3["comp"], 3),
                    "comp_ratio_pct": round(m3["comp ratio"], 2),
                    "depth_l1_cm": round(m2["depth l1"], 3),
                    "depth_l1_surface_cm":
                        round(m2["depth l1 surface"], 3),
                }

            # Pass 1 — REPRODUCTION: this run's own per-seed cameras
            # (the est-trajectory-derived set the suite eval used).
            # Must match the suite's recorded numbers, validating the
            # re-scoring pipeline end-to-end.
            own_cams = os.path.join(_datadir(wd, scene, seed),
                                    "virtual_cameras")
            repro = _score(os.path.join(
                od, f"mesh_track{LAST}_reorig.ply"), own_cams)
            # Pass 2 — PINNED: one GT-trajectory-derived set per scene.
            pinned = _score(os.path.join(
                od, f"mesh_track{LAST}_pinned.ply"), vdir)

            old = json.load(open(os.path.join(
                wd, f"result_{scene}_s{seed}.json")))
            rows.append({
                "seed": seed,
                "old": {k: old[k] for k in
                        ("acc_cm", "comp_cm", "comp_ratio_pct",
                         "depth_l1_cm", "depth_l1_surface_cm")},
                "repro": repro,
                "pinned": pinned,
            })
            print(f"{scene} s{seed}: depth-L1 suite "
                  f"{old['depth_l1_cm']:.2f} repro "
                  f"{repro['depth_l1_cm']:.2f} pinned "
                  f"{pinned['depth_l1_cm']:.2f}", flush=True)
        report[scene] = rows

    def spread(vals):
        return (max(vals) - min(vals)) / 2.0

    md = [
        "# Pinned-eval-protocol re-scoring (fixed-data rows)",
        "",
        "Same reconstructions, same estimated trajectories — only the "
        "virtual-camera set is pinned per scene (built from the GT "
        "trajectory, as the reference's shipped per-scene cameras "
        "are). Differences vs the suite table isolate eval-PROTOCOL "
        "variance from true map-surface variance.",
        "",
        "| scene | depth-L1 per seed (suite) | repro (own cams) | "
        "pinned (GT cams) | half-spread suite -> pinned |",
        "|---|---|---|---|---|",
    ]
    for scene, rows in report.items():
        o = [r["old"]["depth_l1_cm"] for r in rows]
        rp = [r["repro"]["depth_l1_cm"] for r in rows]
        n = [r["pinned"]["depth_l1_cm"] for r in rows]
        md.append(
            f"| {scene} | {', '.join(f'{v:.2f}' for v in o)} | "
            f"{', '.join(f'{v:.2f}' for v in rp)} | "
            f"{', '.join(f'{v:.2f}' for v in n)} | "
            f"{spread(o):.2f} -> {spread(n):.2f} |")
    md.append("")
    out_json = os.path.join(here, "results", "PINNED_EVAL.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)
    with open(os.path.join(here, "results", "PINNED_EVAL.md"),
              "w") as f:
        f.write("\n".join(md))
    print("\n".join(md))


if __name__ == "__main__":
    main()
