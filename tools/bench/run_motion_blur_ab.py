"""Motion-blur robustness A/B (VERDICT r3 missing #1: harden the
synthetic protocol toward real-sensor failure modes — blur named
alongside the shipped exposure drift and occlusion-boundary holes):
the TUM-recipe handheld protocol rendered WITH camera motion blur
(data/synth.py make_blur_renderer — tap-averaged RGB over a sub-frame
shutter window, sharp ToF depth), run three ways — sharp baseline,
blurred (both on the shipped Huber tracking kernel, the r5 default),
and blurred with the kernel ablated back to the reference's plain MSE
(tracking.robust_delta=0) to isolate the kernel's contribution under
blur. Each arm gets its own SLAM output dir (--tag) while arms of the
same shutter share one rendered dataset per seed; every arm is
seed-replicated (per-seed handheld trajectories differ, so single-seed
TUM comparisons are content-noise-dominated).

Writes results/MOTION_BLUR_AB.json + .md. Run from repo root on TPU:
  python tools/bench/run_motion_blur_ab.py [--frames 300] [--shutter 1.0]
      [--seeds 0,1,2]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import json
import os

ARMS = [
    ("sharp", 0.0, []),
    ("blur", None, []),
    ("blur+mse", None, ["--set", "tracking.robust_delta=0.0"]),
]

METRICS = ["ate_rmse_cm", "acc_cm", "comp_cm", "comp_ratio_pct",
           "depth_l1_cm"]


def _agg(runs):
    out = {}
    for m in METRICS:
        vals = [r[m] for r in runs if m in r]
        if vals:
            out[m] = {"mean": sum(vals) / len(vals),
                      "half_spread": (max(vals) - min(vals)) / 2.0,
                      "values": vals}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--hw", default="120x160")
    p.add_argument("--shutter", type=float, default=1.0)
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--workdir", default="/tmp/coslam_motion_blur_ab")
    args = p.parse_args()

    from coslam_tpu.tools.quality_bench import main as qb_main

    here = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    seeds = [int(s) for s in args.seeds.split(",")]
    results = {}
    for name, shutter, extra in ARMS:
        s = args.shutter if shutter is None else shutter
        runs = []
        for seed in seeds:
            out = os.path.join(args.workdir,
                               f"result_{name.replace('+', '_')}"
                               f"_s{seed}.json")
            # Legacy single-seed artifact name (pre-replication).
            legacy = os.path.join(args.workdir, f"result_{name}.json")
            if not os.path.exists(out) and seed == 0 \
                    and os.path.exists(legacy):
                os.rename(legacy, out)
            if os.path.exists(out):
                runs.append(json.load(open(out)))
                print(f"=== arm {name} seed {seed}: cached ===", flush=True)
                continue
            print(f"=== arm {name} (shutter {s}) seed {seed} ===",
                  flush=True)
            runs.append(qb_main(
                ["--frames", str(args.frames), "--hw", args.hw,
                 "--workdir", args.workdir, "--protocol", "tum",
                 "--out", out, "--eval_views", "200",
                 "--seed", str(seed),
                 "--tag", name.replace("+", "_"),
                 "--motion_blur", str(s)] + extra))
        results[name] = {"agg": _agg(runs), "n_runs": len(runs),
                         "seeds": seeds}

    table = {"arms": results, "shutter": args.shutter,
             "n_frames": args.frames, "hw": args.hw, "seeds": seeds}
    os.makedirs(os.path.join(here, "results"), exist_ok=True)
    with open(os.path.join(here, "results/MOTION_BLUR_AB.json"), "w") as f:
        json.dump(table, f, indent=2)

    lines = [
        "# Motion-blur robustness A/B (handheld TUM protocol)",
        "",
        f"TUM-recipe handheld protocol, {args.frames} frames at "
        f"{args.hw}, seeds {seeds} (each seed is a DIFFERENT handheld "
        "trajectory + sensor noise; arms share renders within a seed); "
        f"'blur' arms render the SAME trajectory with the RGB shutter "
        f"open for {args.shutter} frame interval(s) "
        "(data/synth.py make_blur_renderer: 5 taps interpolated "
        "between neighbor poses, averaged; depth keeps the sharp "
        "center tap like a pulsed ToF/structured-light sensor). "
        "This is the failure mode the real TUM fr1 handheld captures "
        "exhibit that a sharp renderer cannot: photometric edges "
        "smear along the motion direction while depth stays crisp. "
        "'sharp'/'blur' run the shipped Huber tracking kernel "
        "(tracking.robust_delta 0.1, the r5 default); 'blur+mse' "
        "ablates it to the reference's plain MSE kernel.",
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
    with open(os.path.join(here, "results/MOTION_BLUR_AB.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
