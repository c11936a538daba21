"""Motion-blur robustness A/B (VERDICT r3 missing #1: harden the
synthetic protocol toward real-sensor failure modes — blur named
alongside the shipped exposure drift and occlusion-boundary holes):
the TUM-recipe handheld protocol rendered WITH camera motion blur
(data/synth.py make_blur_renderer — tap-averaged RGB over a sub-frame
SE(3) shutter window, sharp ToF depth), run three ways — sharp
baseline, blurred, and blurred + Huber tracking kernel.

Writes results/MOTION_BLUR_AB.json + .md. Run from repo root on TPU:
  python tools/bench/run_motion_blur_ab.py [--frames 300] [--shutter 1.0]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import json
import os

ARMS = [
    ("sharp", 0.0, []),
    ("blur", None, []),
    ("blur+huber", None, ["--set", "tracking.robust_delta=0.1"]),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=300)
    p.add_argument("--hw", default="120x160")
    p.add_argument("--shutter", type=float, default=1.0)
    p.add_argument("--workdir", default="/tmp/coslam_motion_blur_ab")
    args = p.parse_args()

    from coslam_tpu.tools.quality_bench import main as qb_main

    here = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    results = {}
    for name, shutter, extra in ARMS:
        s = args.shutter if shutter is None else shutter
        out = os.path.join(args.workdir, f"result_{name}.json")
        if os.path.exists(out):
            results[name] = json.load(open(out))
            print(f"=== arm {name}: cached ===", flush=True)
            continue
        print(f"=== arm {name} (shutter {s}) ===", flush=True)
        results[name] = qb_main(
            ["--frames", str(args.frames), "--hw", args.hw,
             "--workdir", args.workdir, "--protocol", "tum",
             "--out", out, "--eval_views", "200",
             "--motion_blur", str(s)] + extra)

    table = {"arms": results, "shutter": args.shutter,
             "n_frames": args.frames, "hw": args.hw}
    os.makedirs(os.path.join(here, "results"), exist_ok=True)
    with open(os.path.join(here, "results/MOTION_BLUR_AB.json"), "w") as f:
        json.dump(table, f, indent=2)

    lines = [
        "# Motion-blur robustness A/B (handheld TUM protocol)",
        "",
        f"TUM-recipe handheld protocol, {args.frames} frames at "
        f"{args.hw}; 'blur' arms render the SAME trajectory with the "
        f"RGB shutter open for {args.shutter} frame interval(s) "
        "(data/synth.py make_blur_renderer: 5 taps screw-interpolated "
        "between neighbor poses, averaged; depth keeps the sharp "
        "center tap like a pulsed ToF/structured-light sensor). "
        "This is the failure mode the real TUM fr1 handheld captures "
        "exhibit that a sharp renderer cannot: photometric edges "
        "smear along the motion direction while depth stays crisp.",
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
    with open(os.path.join(here, "results/MOTION_BLUR_AB.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
