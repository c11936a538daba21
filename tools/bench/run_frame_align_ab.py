"""Frame-align A/B artifact (VERDICT r3 #6): the Replica-recipe scan
protocol rendered WITH a per-frame exposure random walk, run four ways —
baseline, training.frame_align, tracking.robust_delta (Huber), and both.
Shows (a) exposure drift degrades the baseline, (b) the wired
PerFrameAlignment equivalent recovers it.

Writes results/FRAME_ALIGN_AB.json + .md. Run from repo root on TPU:
  python tools/bench/run_frame_align_ab.py [--frames 300] [--drift 0.02]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import json
import os

# Since r5 the Huber kernel (tracking.robust_delta 0.1) is the shipped
# default, so the unsuffixed arms run WITH it; the +mse arm ablates it
# back to the reference's plain MSE kernel. (The r4 artifact named the
# huber arms explicitly; numbers are comparable by kernel, not by name.)
ARMS = [
    ("clean", 0.0, []),
    ("drift", None, []),
    ("drift+align", None, ["--set", "training.frame_align=1"]),
    ("drift+mse", None, ["--set", "tracking.robust_delta=0.0"]),
    ("drift+align+mse", None, ["--set", "training.frame_align=1",
                               "--set", "tracking.robust_delta=0.0"]),
]

METRICS = ["ate_rmse_cm", "acc_cm", "comp_cm", "comp_ratio_pct",
           "depth_l1_cm"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--hw", default="120x160")
    p.add_argument("--drift", type=float, default=0.02)
    p.add_argument("--workdir", default="/tmp/coslam_frame_align_ab")
    args = p.parse_args()

    from coslam_tpu.tools.quality_bench import main as qb_main

    here = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    results = {}
    for name, drift, extra in ARMS:
        d = args.drift if drift is None else drift
        out = os.path.join(args.workdir, f"result_{name}.json")
        if os.path.exists(out):
            results[name] = json.load(open(out))
            print(f"=== arm {name}: cached ===", flush=True)
            continue
        print(f"=== arm {name} (drift {d}) ===", flush=True)
        results[name] = qb_main(
            ["--frames", str(args.frames), "--hw", args.hw,
             "--workdir", args.workdir, "--protocol", "replica",
             "--out", out, "--eval_views", "200",
             "--tag", name.replace("+", "_"),
             "--exposure_drift", str(d)] + extra)

    table = {"arms": results, "drift": args.drift,
             "n_frames": args.frames, "hw": args.hw}
    os.makedirs(os.path.join(here, "results"), exist_ok=True)
    with open(os.path.join(here, "results/FRAME_ALIGN_AB.json"), "w") as f:
        json.dump(table, f, indent=2)

    lines = [
        "# Exposure-drift robustness A/B (frame_align / robust tracking)",
        "",
        f"Replica-recipe scan protocol, {args.frames} frames at "
        f"{args.hw}; 'drift' arms render the SAME scene through a "
        f"per-frame exposure random walk (std {args.drift}/frame, "
        "data/synth.py exposure_drift_walk — gains wander ±"
        f"{round(100 * (2.718 ** (args.drift * args.frames ** 0.5) - 1))}"
        "% over the run). training.frame_align is the wired equivalent "
        "of the reference's unfinished PerFrameAlignment "
        "(optimization/frame_align.py).",
        "",
        "| arm | ATE (cm) | Acc (cm) | Comp (cm) | Ratio (%) | "
        "Depth-L1 (cm) |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | {r['ate_rmse_cm']:.2f} | {r['acc_cm']:.2f} | "
            f"{r['comp_cm']:.2f} | {r['comp_ratio_pct']:.2f} | "
            f"{r['depth_l1_cm']:.2f} |")
    lines.append("")
    with open(os.path.join(here, "results/FRAME_ALIGN_AB.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
