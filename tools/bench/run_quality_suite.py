"""Multi-scene, seed-replicated quality suite (VERDICT r3 #1 + #9).

Rows (7, vs the reference's 8-scene Replica average):
  room      AnalyticScene,      Replica recipe (the headline protocol)
  room2     rearranged room,    Replica recipe (second room variant)
  plain     texture-poor room,  Replica recipe (photometric-degenerate)
  corridor  textureless hallway, Replica recipe, corridor walk (forward-
                                translation degenerate)
  thin      cm-scale plates,    SyntheticRGBD recipe (the reference's
                                worst RGBD case is "thin geometry")
  room_tum  room via the TUM handheld recipe (500f) — 4th family
  apartment two-room walkthrough, ScanNet recipe (full 800f protocol)

Every scene runs at --seeds replication seeds (default 0,1,2): the seed
varies the SLAM RNG streams everywhere and additionally the rendered
data where the protocol is stochastic (handheld/walkthrough
trajectories, sensor noise). Each per-run JSON carries a
dataset_content_hash of the exact rendered pixels. The table reports
mean +- half-spread ((max-min)/2) per metric; spread/mean quantifies the
run-to-run stability VERDICT r3 flagged (3x silent ATE swings).

Writes results/BENCH_QUALITY_MULTI.json + .md. Run from repo root on
TPU:
  python tools/bench/run_quality_suite.py [--frames 300] [--workdir D]
      [--seeds 0,1,2] [--scenes room,thin]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import json
import os

# (row key, scene, protocol, extra args, frames override, extra seeds).
# The apartment walkthrough needs its full 800-frame protocol — at 300
# frames the trajectory is mid-doorway and the map of room B barely
# exists. room_tum runs the room through the TUM handheld recipe so all
# FOUR benchmark families get seed replication; it renders a DIFFERENT
# handheld trajectory per seed, so it runs 5 seeds (VERDICT r4 #7) and
# the table reports per-seed trajectory difficulty alongside.
RUNS = [
    ("room", "room", "replica", [], None, []),
    ("room2", "room2", "replica", [], None, []),
    ("plain", "plain", "replica", [], None, []),
    ("corridor", "corridor", "replica", [], None, []),
    ("thin", "thin", "rgbd", [], None, []),
    ("room_tum", "room", "tum", [], 500, [3, 4]),
    ("apartment", "apartment", "scannet", ["--hw", "480x640"], 800, []),
]

METRICS = ["ate_rmse_cm", "acc_cm", "comp_cm", "comp_ratio_pct",
           "depth_l1_cm", "depth_l1_surface_cm", "rec_hole_px_pct"]
TABLE_METRICS = METRICS[:5]


def _traj_difficulty(protocol, scene_key, n_frames, seed):
    """Per-seed trajectory difficulty for rows whose DATA varies with
    the seed: path length (m) and mean angular step (deg/frame),
    computed from the same generator the render used (VERDICT r4 #7:
    separate content difficulty from run-to-run variance)."""
    import numpy as np

    from coslam_tpu.data.synth import (make_corridor_trajectory,
                                       make_handheld_trajectory,
                                       make_scan_trajectory,
                                       make_walkthrough_trajectory)

    if protocol == "tum":
        poses = make_handheld_trajectory(n_frames, seed=seed)
    elif protocol == "scannet":
        poses = make_walkthrough_trajectory(n_frames, seed=seed)
    elif scene_key == "corridor":
        poses = make_corridor_trajectory(n_frames, seed=seed)
    else:
        poses = make_scan_trajectory(n_frames)
    t = poses[:, :3, 3]
    path_m = float(np.linalg.norm(np.diff(t, axis=0), axis=1).sum())
    # Angular step per frame from the relative rotation's trace.
    rel = np.einsum("nij,nkj->nik", poses[1:, :3, :3], poses[:-1, :3, :3])
    cos = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    deg = float(np.degrees(np.arccos(cos)).mean())
    return {"path_m": round(path_m, 2), "deg_per_frame": round(deg, 3)}


def _agg(runs):
    """Per-metric mean / half-spread over a scene's seed replicas."""
    out = {}
    for m in METRICS:
        vals = [r[m] for r in runs if m in r]
        if not vals:
            continue
        mean = sum(vals) / len(vals)
        half = (max(vals) - min(vals)) / 2.0
        out[m] = {"mean": mean, "half_spread": half,
                  "spread_over_mean_pct":
                      round(100 * 2 * half / max(abs(mean), 1e-9), 1),
                  "values": vals}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--hw", default="120x160")
    p.add_argument("--workdir", default="/tmp/coslam_quality_suite")
    p.add_argument("--scenes", default=None,
                   help="comma list subset, e.g. thin,plain")
    p.add_argument("--seeds", default="0,1,2",
                   help="replication seeds per scene")
    args = p.parse_args()

    from coslam_tpu.tools.quality_bench import main as qb_main

    here = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    seeds = [int(s) for s in args.seeds.split(",")]
    sel = set(args.scenes.split(",")) if args.scenes else None
    for key, scene, protocol, extra, frames, extra_seeds in RUNS:
        if sel and key not in sel:
            continue
        for seed in seeds + extra_seeds:
            out = os.path.join(args.workdir,
                               f"result_{key}_s{seed}.json")
            if os.path.exists(out):
                print(f"=== {key} seed {seed}: cached ===", flush=True)
                continue
            print(f"=== {key}: scene {scene} ({protocol}) seed {seed} "
                  "===", flush=True)
            qb_main(["--frames", str(frames or args.frames)]
                    + (["--hw", args.hw] if "--hw" not in extra else [])
                    + ["--workdir", args.workdir, "--scene", scene,
                       "--protocol", protocol, "--out", out,
                       "--eval_views", "200", "--seed", str(seed)]
                    + extra)

    # Aggregate everything present in the workdir (the suite can run
    # scene-by-scene across sessions).
    results = {}
    for key, scene, protocol, _, frames, extra_seeds in RUNS:
        runs = []
        for seed in seeds + extra_seeds:
            f = os.path.join(args.workdir, f"result_{key}_s{seed}.json")
            if os.path.exists(f):
                runs.append(json.load(open(f)))
        # Legacy single-seed artifact name.
        f0 = os.path.join(args.workdir, f"result_{key}.json")
        if not runs and os.path.exists(f0):
            runs.append(json.load(open(f0)))
        if runs:
            results[key] = {
                "agg": _agg(runs), "n_runs": len(runs),
                "seeds": [r.get("seed", 0) for r in runs],
                "dataset_sha1": [r.get("dataset_sha1") for r in runs],
                "n_frames": runs[0].get("n_frames"),
                "resolution": runs[0].get("resolution"),
            }
            if protocol in ("tum", "scannet") or key == "corridor":
                results[key]["per_seed_difficulty"] = {
                    str(r.get("seed", 0)): _traj_difficulty(
                        protocol, key, frames or args.frames,
                        r.get("seed", 0))
                    for r in runs}

    if not results:
        return
    mean = {m: sum(r["agg"][m]["mean"] for r in results.values())
            / len(results)
            for m in METRICS
            if all(m in r["agg"] for r in results.values())}
    worst_spread = max((r["agg"][m]["spread_over_mean_pct"]
                        for r in results.values()
                        for m in ("ate_rmse_cm",) if m in r["agg"]),
                       default=0.0)
    table = {"scenes": results, "mean": mean,
             "worst_ate_spread_over_mean_pct": worst_spread,
             "n_frames": args.frames, "hw": args.hw,
             "seeds": seeds}
    os.makedirs(os.path.join(here, "results"), exist_ok=True)
    with open(os.path.join(here, "results/BENCH_QUALITY_MULTI.json"),
              "w") as f:
        json.dump(table, f, indent=2)

    lines = [
        "# Multi-scene seed-replicated quality table",
        "",
        f"{len(results)} analytic scenes x their matching benchmark-"
        f"family recipes, {len(seeds)} replication seeds each "
        "(room_tum: 5 — its per-seed handheld trajectories differ, see "
        "the difficulty table) "
        "(mean ± half-spread), full Co-SLAM culling protocol, 200 eval "
        "views. Per-run JSONs carry a content hash of the rendered "
        "dataset. Reference anchors (its own real-data averages): "
        "Replica 2.10/2.08 cm 93.44% 1.51 cm; SyntheticRGBD "
        "2.95/2.96 cm 86.88% 3.02 cm; its worst RGBD case (thin "
        "geometry) 3.38/2.74 cm 86.74% 4.66 cm (BASELINE.md).",
        "",
        "Rows whose protocol renders seed-varying DATA "
        "(tum/scannet/rgbd: per-seed trajectories and/or sensor noise) "
        "mix content difficulty into the spread; replica rows render "
        "identical pixels every seed, so their spread is pure SLAM "
        "run-to-run stochasticity.",
        "",
        "| scene | protocol | data/seed | frames | res | runs | "
        "ATE (cm) | Acc (cm) | Comp (cm) | Ratio (%) | Depth-L1 (cm) |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    proto = {k: pr for k, _, pr, _, _, _ in RUNS}
    data_kind = {k: ("fixed" if pr == "replica" and k != "corridor"
                     else "varies")
                 for k, _, pr, _, _, _ in RUNS}

    def fmt(agg, m):
        if m not in agg:
            return "—"
        a = agg[m]
        return f"{a['mean']:.2f} ± {a['half_spread']:.2f}"

    for s, r in results.items():
        a = r["agg"]
        lines.append(
            f"| {s} | {proto.get(s, '?')} | {data_kind.get(s, '?')} | "
            f"{r.get('n_frames', '?')} | "
            f"{r.get('resolution', '?')} | {r['n_runs']} | "
            f"{fmt(a, 'ate_rmse_cm')} | {fmt(a, 'acc_cm')} | "
            f"{fmt(a, 'comp_cm')} | {fmt(a, 'comp_ratio_pct')} | "
            f"{fmt(a, 'depth_l1_cm')} |")
    if mean:
        lines.append(
            f"| **mean** | — | — | — | — | — | "
            f"{mean['ate_rmse_cm']:.2f} | "
            f"{mean['acc_cm']:.2f} | {mean['comp_cm']:.2f} | "
            f"{mean['comp_ratio_pct']:.2f} | {mean['depth_l1_cm']:.2f} |")
    lines += ["",
              f"Worst per-scene ATE spread/mean: {worst_spread:.1f}%.",
              ""]

    # Depth-L1 decomposition (VERDICT r4 #6): SURFACE error (pixels both
    # meshes hit) vs COVERAGE error (rec-mesh holes), per scene with
    # per-seed values, so depth-L1 seed spread is attributable.
    if any("depth_l1_surface_cm" in r["agg"] for r in results.values()):
        lines += [
            "## Depth-L1 decomposition (surface vs coverage)",
            "",
            "`depth-L1 = surface error + holes paying the full GT "
            "depth`. If the per-seed spread lives in the hole column, "
            "the variance is mesh-extraction coverage, not geometry "
            "accuracy.",
            "",
            "| scene | depth-L1 (cm) | surface-only (cm) | hole px % | "
            "per-seed depth-L1 | per-seed hole % |",
            "|---|---|---|---|---|---|",
        ]
        for s, r in results.items():
            a = r["agg"]
            if "depth_l1_surface_cm" not in a:
                continue
            vals = ", ".join(f"{v:.2f}"
                             for v in a["depth_l1_cm"]["values"])
            holes = ", ".join(f"{v:.1f}"
                              for v in a["rec_hole_px_pct"]["values"])
            lines.append(
                f"| {s} | {fmt(a, 'depth_l1_cm')} | "
                f"{fmt(a, 'depth_l1_surface_cm')} | "
                f"{fmt(a, 'rec_hole_px_pct')} | {vals} | {holes} |")
        lines.append("")

    # Per-seed trajectory difficulty for data-varying rows (VERDICT r4
    # #7): separates content difficulty from run variance.
    diff_rows = {s: r["per_seed_difficulty"] for s, r in results.items()
                 if "per_seed_difficulty" in r}
    if diff_rows:
        lines += [
            "## Per-seed trajectory difficulty (data-varying rows)",
            "",
            "Each seed of a tum/scannet/corridor row renders a "
            "DIFFERENT trajectory; path length and mean angular step "
            "quantify how hard each capture is, so a hard seed reads "
            "as content difficulty rather than run-to-run noise.",
            "",
            "| scene | seed | path (m) | deg/frame | ATE (cm) |",
            "|---|---|---|---|---|",
        ]
        for s, d in diff_rows.items():
            ates = {str(sd): v for sd, v in zip(
                results[s]["seeds"],
                results[s]["agg"]["ate_rmse_cm"]["values"])}
            for sd, t in sorted(d.items(), key=lambda kv: int(kv[0])):
                lines.append(
                    f"| {s} | {sd} | {t['path_m']} | "
                    f"{t['deg_per_frame']} | "
                    f"{ates.get(sd, float('nan')):.2f} |")
        lines.append("")
    with open(os.path.join(here, "results/BENCH_QUALITY_MULTI.md"),
              "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
