"""Full benchmark protocol: SLAM -> mesh culling -> Acc/Comp/Ratio/L1 + ATE.

Automates the reference's manual evaluation recipe (reference:
evaluation/README.md "Run Evaluation": cull_mesh.py with the Co-SLAM
strategy, then eval_recon.py -2d -3d, plus eval_ate during the run) into
one callable that produces the benchmark-table numbers.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


def run_benchmark(config: Dict, gt_mesh_path: Optional[str] = None,
                  n_frames: Optional[int] = None,
                  culling: str = "frustum_occlusion",
                  n_eval_views: int = 200, out_path: Optional[str] = None,
                  slam_cls=None) -> Dict:
    """Run SLAM on a scene and evaluate trajectory + reconstruction.

    culling: 'frustum' | 'frustum_occlusion' | 'coslam' (adds virtual
    cameras, requires <datadir>/virtual_cameras). Returns the metric dict
    {ate_rmse_cm, acc_cm, comp_cm, comp_ratio_pct, depth_l1_cm,
    runtime_s, tracking_ms, mapping_ms, n_params}.
    """
    from ..runtime.slam import CoSLAM
    from .cull import cull_one_mesh
    from .recon import calc_2d_metric, calc_3d_metric

    slam_cls = slam_cls or CoSLAM
    slam = slam_cls(config)
    t0 = time.perf_counter()
    ate = slam.run(n_frames=n_frames, verbose=False, eval_ate=True)
    runtime = time.perf_counter() - t0

    out_dir = os.path.join(config["data"]["output"],
                           config["data"]["exp_name"])
    last = (n_frames or len(slam.dataset)) - 1
    rec_mesh = os.path.join(out_dir, f"mesh_track{last}.ply")

    results = {
        "runtime_s": round(runtime, 1),
        "n_params": int(sum(np.asarray(x).size for x in
                            _tree_leaves(slam.params))),
    }
    # Split the wall into startup (first-frame mapping + one-time
    # compiled-program loads, tunnel-RPC sensitive), the frame loop,
    # and the tail (final checkpoint + mesh + ATE) so runtime_s
    # variance is attributable.
    walls = getattr(slam, "frame_walls", None)
    if walls and len(walls) >= 3:
        # walls[k] is stamped at the TOP of frame k's iteration, so
        # walls[1]-t0 spans init + frame 0 = first-frame mapping and
        # the one-time compiled-program loads.
        results["startup_s"] = round(walls[1] - t0, 1)
        results["loop_s"] = round(walls[-1] - walls[1], 1)
        results["tail_s"] = round(runtime - (walls[-1] - t0), 1)
    if ate is not None:
        results["ate_rmse_cm"] = round(
            ate["absolute_translational_error.rmse"] * 100, 3)
        results["ate_rmse_noalign_cm"] = round(
            ate["absolute_translational_error.rmse_noalign"] * 100, 3)
    for phase in ("tracking", "mapping"):
        vals = slam.timings[phase][1:] or slam.timings[phase]
        if vals:
            results[f"{phase}_ms"] = round(float(np.mean(vals)), 2)

    if gt_mesh_path and os.path.exists(rec_mesh):
        # Skip never-tracked frames (all-zero slots — e.g. the frames an
        # ActiveCoSLAM run's info-gain selection left out).
        poses = [slam.est_c2w[i] for i in range(len(slam.est_c2w))
                 if np.any(slam.est_c2w[i] != 0)]
        culled = rec_mesh.replace(".ply", "_culled.ply")
        bounds = np.array(config["mapping"]["marching_cubes_bound"])
        if culling == "coslam":
            # The Co-SLAM protocol needs <datadir>/virtual_cameras; the
            # reference creates them interactively from the GT mesh
            # (evaluation/create_virtual_cameras_replica.py) — generate
            # them headlessly here when absent.
            import glob as _glob

            from ..mesh.io import load_ply
            from ..tools.virtual_cameras import create_virtual_cameras

            vdir = os.path.join(config["data"]["datadir"],
                                "virtual_cameras")
            if not _glob.glob(os.path.join(vdir, "*.txt")):
                cam = config["cam"]
                # Coverage from the GT trajectory, NOT the run's
                # estimate: the virtual cameras are a fixed per-scene
                # eval input (the reference creates them once from the
                # GT mesh and ships them with the benchmark,
                # evaluation/create_virtual_cameras_replica.py) — using
                # the run's estimated poses let greedy tie-breaking
                # amplify cm-scale pose differences into a DIFFERENT
                # camera set per seed, folding eval-protocol variance
                # into the seed spread of every mesh metric (r5 item 6).
                gt_traj = [np.asarray(p) for p in slam.dataset.poses]
                create_virtual_cameras(
                    load_ply(gt_mesh_path), gt_traj, vdir,
                    cam["fx"], cam["fy"], cam["cx"], cam["cy"],
                    cam["H"], cam["W"], n_candidates=64, n_select=16)
        cull_one_mesh(config, poses, rec_mesh, culled,
                      save_unseen=True,
                      remove_occlusion=(culling != "frustum"),
                      virtual_cameras=(culling == "coslam"),
                      scene_bounds=np.stack([bounds[:, 0], bounds[:, 1]]))
        # Cull the GT mesh with the GT trajectory so completion is
        # measured over the observed region only (the reference evaluates
        # against pre-culled GT meshes, evaluation/README.md).
        gt_poses = [np.asarray(p) for p in slam.dataset.poses]
        gt_culled = os.path.join(out_dir, "gt_culled.ply")
        cull_one_mesh(config, gt_poses, gt_mesh_path, gt_culled,
                      remove_occlusion=(culling != "frustum"),
                      scene_bounds=np.stack([bounds[:, 0], bounds[:, 1]]))
        gt_mesh_path = gt_culled
        m3 = calc_3d_metric(culled, gt_mesh_path, align=False)
        results.update(acc_cm=round(m3["acc"], 3),
                       comp_cm=round(m3["comp"], 3),
                       comp_ratio_pct=round(m3["comp ratio"], 2))
        scene_name = os.path.basename(culled).split("_")[0]
        unseen = os.path.join(os.path.dirname(culled),
                              f"{scene_name}_pc_unseen.npy")
        m2 = calc_2d_metric(culled, gt_mesh_path,
                            unseen_gt_pcd_file=unseen if os.path.exists(unseen)
                            else None,
                            align=False, n_imgs=n_eval_views)
        results["depth_l1_cm"] = round(m2["depth l1"], 3)
        if "depth l1 surface" in m2:
            # surface = both-hit pixels only; hole_px_pct = gt-valid
            # pixels the culled reconstruction misses (coverage, not
            # geometry, inflates the protocol number via |gt - 0|).
            results["depth_l1_surface_cm"] = round(m2["depth l1 surface"], 3)
            results["rec_hole_px_pct"] = m2["hole_px_pct"]

    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    return results


def _tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def main():
    import argparse

    from ..config import load_config

    p = argparse.ArgumentParser(description="full benchmark protocol")
    p.add_argument("--config", required=True)
    p.add_argument("--gt_mesh", default=None)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--culling", default="frustum_occlusion",
                   choices=["frustum", "frustum_occlusion", "coslam"])
    p.add_argument("--out", default=None)
    args = p.parse_args()
    res = run_benchmark(load_config(args.config), args.gt_mesh,
                        n_frames=args.max_frames, culling=args.culling,
                        out_path=args.out)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
