"""Corridor-observability A/B (VERDICT r4 #4): the textureless-hallway
forward walk is degenerate for pure render-loss tracking — the loss is
nearly flat along the forward axis, and r4 measured 13-15 cm ATE with
either kernel. Two algorithmic levers (both EXCEED the reference, whose
tracker is uniform-draw pure render loss, coslam.py:131-138,531-567):

  info   tracking.sample_info_frac — information-weighted tracking-ray
         sampling (gradient-biased draw toward pillar silhouettes /
         wall junctions instead of blank walls)
  prior  tracking.prior_trans/prior_rot — constant-velocity motion
         prior holding the loss-flat direction at the predicted
         velocity

run on the corridor scene at the suite's protocol (replica recipe,
300 frames, 3 seeds), with the shipped Huber kernel on everywhere.
Writes results/CORRIDOR_AB.json + .md. Run from repo root on TPU:
  python tools/bench/run_corridor_ab.py [--frames 300] [--seeds 0,1,2]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import json
import os

ARMS = [
    ("base", []),
    ("info", ["--set", "tracking.sample_info_frac=0.5"]),
    ("prior", ["--set", "tracking.prior_trans=10.0",
               "--set", "tracking.prior_rot=1.0"]),
    ("info+prior", ["--set", "tracking.sample_info_frac=0.5",
                    "--set", "tracking.prior_trans=10.0",
                    "--set", "tracking.prior_rot=1.0"]),
]

METRICS = ["ate_rmse_cm", "acc_cm", "comp_cm", "comp_ratio_pct",
           "depth_l1_cm"]


def _agg(runs):
    out = {}
    for m in METRICS:
        vals = [r[m] for r in runs if m in r]
        if vals:
            mean = sum(vals) / len(vals)
            out[m] = {"mean": mean,
                      "half_spread": (max(vals) - min(vals)) / 2.0,
                      "values": vals}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--hw", default="120x160")
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--arms", default=None,
                   help="comma subset of arm names, e.g. base,prior")
    p.add_argument("--workdir", default="/tmp/coslam_corridor_ab")
    args = p.parse_args()

    from coslam_tpu.tools.quality_bench import main as qb_main

    here = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    seeds = [int(s) for s in args.seeds.split(",")]
    sel = set(args.arms.split(",")) if args.arms else None
    results = {}
    for name, extra in ARMS:
        if sel and name not in sel:
            continue
        runs = []
        for seed in seeds:
            out = os.path.join(args.workdir,
                               f"result_{name.replace('+', '_')}"
                               f"_s{seed}.json")
            if os.path.exists(out):
                runs.append(json.load(open(out)))
                print(f"=== arm {name} seed {seed}: cached ===", flush=True)
                continue
            print(f"=== arm {name} seed {seed} ===", flush=True)
            runs.append(qb_main(
                ["--frames", str(args.frames), "--hw", args.hw,
                 "--workdir", args.workdir, "--protocol", "replica",
                 "--scene", "corridor", "--out", out,
                 "--eval_views", "200", "--seed", str(seed),
                 "--tag", name.replace("+", "_")] + extra))
        results[name] = {"agg": _agg(runs), "n_runs": len(runs),
                         "seeds": seeds}

    table = {"arms": results, "n_frames": args.frames, "hw": args.hw,
             "seeds": seeds,
             "overrides": {n: e for n, e in ARMS}}
    os.makedirs(os.path.join(here, "results"), exist_ok=True)
    with open(os.path.join(here, "results/CORRIDOR_AB.json"), "w") as f:
        json.dump(table, f, indent=2)

    lines = [
        "# Corridor observability A/B (textureless forward walk)",
        "",
        f"AnalyticCorridor + make_corridor_trajectory, replica recipe, "
        f"{args.frames} frames at {args.hw}, seeds {seeds} (per-seed "
        "trajectory phases differ). All arms run the shipped Huber "
        "tracking kernel. 'info' = tracking.sample_info_frac 0.5 "
        "(gradient-weighted tracking-ray draw); 'prior' = "
        "tracking.prior_trans 10 / prior_rot 1 (constant-velocity "
        "motion prior).",
        "",
        "| arm | ATE (cm) | Acc (cm) | Comp (cm) | Ratio (%) | "
        "Depth-L1 (cm) |",
        "|---|---|---|---|---|---|",
    ]

    def fmt(agg, m):
        if m not in agg:
            return "—"
        a = agg[m]
        return f"{a['mean']:.2f} ± {a['half_spread']:.2f}"

    for name, r in results.items():
        a = r["agg"]
        lines.append(
            f"| {name} | {fmt(a, 'ate_rmse_cm')} | {fmt(a, 'acc_cm')} | "
            f"{fmt(a, 'comp_cm')} | {fmt(a, 'comp_ratio_pct')} | "
            f"{fmt(a, 'depth_l1_cm')} |")
    lines.append("")
    with open(os.path.join(here, "results/CORRIDOR_AB.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
