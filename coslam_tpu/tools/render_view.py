"""Novel-view RGB-D rendering from a trained checkpoint.

Standalone CLI surface for the reference's one-shot render evaluation
(reference ActiveCoSLAM/ac_coslam.py:703-741 ``test()``), generalized to
any trained model: volume-render a full RGB + depth image from a chosen
pose and save an [rgb | turbo-depth] composite — a way to inspect a map
without extracting a mesh. With ``--frame --compare`` it also reports
PSNR and depth-L1 against the dataset's sensor frame, like the
reference test()'s loss readout.

Rendering is deterministic (``training.perturb`` forced to 0). Without
``--use_depth`` the z samples are the uniform near..far stratum only —
a true novel view has no sensor depth to guide sampling; ``--use_depth``
adds the training-time depth-guided band from the dataset frame.

Pose sources, in precedence order: ``--pose FILE`` (whitespace 4x4
c2w), ``--gt_pose --frame N`` (dataset trajectory), ``--frame N``
(the checkpoint's estimated pose).

Usage:
  python -m coslam_tpu.tools.render_view --config configs/Replica/room0.yaml \
      --ckpt out/room0/checkpoint1999.npz --frame 500 --compare
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import numpy as np


def render_image(model, params, c2w: np.ndarray, H: int, W: int,
                 fx: float, fy: float, cx: float, cy: float, *,
                 target_d: Optional[np.ndarray] = None,
                 chunk: int = 2 ** 14, key=None):
    """Full-image volume render: returns (rgb [H, W, 3], depth [H, W]).

    Rays are rendered in fixed-shape ``chunk``-row batches through ONE
    jitted program (the tail chunk is padded), so image size changes
    never recompile per-row remainders.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.rays import get_camera_rays

    dirs = get_camera_rays(H, W, fx, fy, cx, cy).reshape(-1, 3)
    c2w = np.asarray(c2w, np.float32)
    n = dirs.shape[0]
    key = jax.random.PRNGKey(0) if key is None else key
    use_d = target_d is not None
    td_flat = (np.asarray(target_d, np.float32).reshape(-1, 1)
               if use_d else None)

    rot = jnp.asarray(c2w[:3, :3])
    origin = jnp.asarray(c2w[:3, 3])

    @jax.jit
    def _render(params, dirs_c, td, key):
        rays_d = dirs_c @ rot.T
        rays_o = jnp.broadcast_to(origin, rays_d.shape)
        ret = model.render_rays(params, key, rays_o, rays_d,
                                td if use_d else None)
        return ret["rgb"], ret["depth"]

    rgb_parts, depth_parts = [], []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        pad = chunk - (hi - lo)
        dc = np.pad(dirs[lo:hi], ((0, pad), (0, 0)), mode="edge")
        tc = (np.pad(td_flat[lo:hi], ((0, pad), (0, 0)), mode="edge")
              if use_d else np.zeros((chunk, 1), np.float32))
        key, sub = jax.random.split(key)
        rgb_c, depth_c = _render(params, jnp.asarray(dc), jnp.asarray(tc),
                                 sub)
        rgb_parts.append(np.asarray(rgb_c)[:hi - lo])
        depth_parts.append(np.asarray(depth_c)[:hi - lo])
    rgb = np.concatenate(rgb_parts).reshape(H, W, 3)
    depth = np.concatenate(depth_parts).reshape(H, W)
    return rgb, depth


def _save_outputs(out_png: str, rgb: np.ndarray, depth: np.ndarray,
                  depth_trunc: float, png_depth_scale: float) -> Dict:
    import cv2

    from .viz import colormap_image

    mask = (depth > 0) & (depth < depth_trunc)
    if not mask.any():
        # Degenerate/under-trained map: no valid depth pixel to scale the
        # colormap by — render the raw depth instead of crashing on an
        # empty masked array.
        mask = None
    dvis = colormap_image(depth, mask, invalid_color=(1.0, 1.0, 1.0))
    comp = np.hstack([np.clip(rgb, 0, 1), dvis])
    os.makedirs(os.path.dirname(os.path.abspath(out_png)), exist_ok=True)
    cv2.imwrite(out_png, cv2.cvtColor((comp * 255).astype(np.uint8),
                                      cv2.COLOR_RGB2BGR))
    depth_png = out_png.rsplit(".", 1)[0] + "_depth.png"
    cv2.imwrite(depth_png, np.clip(depth * png_depth_scale, 0,
                                   65535).astype(np.uint16))
    return {"png": out_png, "depth_png": depth_png}


def main(argv=None) -> Dict:
    p = argparse.ArgumentParser(
        description="render an RGB-D view from a trained checkpoint")
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--frame", type=int, default=None,
                   help="frame index for the pose (and --compare target)")
    p.add_argument("--pose", default=None,
                   help="whitespace 4x4 c2w text file (overrides --frame)")
    p.add_argument("--gt_pose", action="store_true",
                   help="pose from the dataset GT trajectory instead of "
                        "the checkpoint's estimate")
    p.add_argument("--out", default=None,
                   help="output PNG path (default: next to the checkpoint)")
    p.add_argument("--chunk", type=int, default=2 ** 14)
    p.add_argument("--use_depth", action="store_true",
                   help="depth-guided sampling from the dataset frame "
                        "(training-time sampler; needs --frame)")
    p.add_argument("--compare", action="store_true",
                   help="report PSNR / depth-L1 vs the dataset frame "
                        "(needs --frame)")
    args = p.parse_args(argv)

    if args.frame is None:
        # These flags are meaningless without a dataset frame; erroring
        # beats silently rendering without the requested comparison.
        for flag in ("compare", "use_depth", "gt_pose"):
            if getattr(args, flag):
                p.error(f"--{flag} requires --frame")

    import jax
    import jax.numpy as jnp

    from ..config import load_config
    from ..models.scene_rep import JointEncoding
    from ..runtime.checkpoint import load_ckpt

    cfg = load_config(args.config)
    cfg["training"]["perturb"] = 0.0  # deterministic render
    bound = np.array(cfg["mapping"]["bound"], np.float32)
    if (cfg.get("active") or {}).get("isActive"):
        from ..active.scene_rep import ActiveJointEncoding as ModelCls
    else:
        ModelCls = JointEncoding
    model = ModelCls(cfg, bound)
    params, est_c2w, _, _ = load_ckpt(args.ckpt)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # Camera + optional dataset frame. The loader applies downsample /
    # crop to the config intrinsics, so any --frame render uses the
    # dataset's H/W/fx... when the data is on disk (keeping the camera
    # identical across --frame invocations regardless of other flags);
    # a pure --pose render — or a --frame render with the dataset
    # missing — uses the raw config camera.
    cam = cfg["cam"]
    H, W = cam["H"], cam["W"]
    fx, fy, cx, cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    batch = None
    if args.frame is not None:
        from ..data import get_dataset

        need_data = args.compare or args.use_depth or args.gt_pose
        try:
            ds = get_dataset(cfg)
            H, W, fx, fy, cx, cy = ds.H, ds.W, ds.fx, ds.fy, ds.cx, ds.cy
            batch = ds[args.frame]
        except Exception as e:
            if need_data:
                raise SystemExit(
                    f"--compare/--use_depth/--gt_pose need the dataset at "
                    f"{cfg['data'].get('datadir')}: {e}")
            print(f"note: dataset unavailable ({e}); rendering with raw "
                  "config intrinsics")

    if args.pose is not None:
        c2w = np.loadtxt(args.pose).reshape(4, 4).astype(np.float32)
    elif args.frame is None:
        p.error("need --pose or --frame")
    elif args.gt_pose:
        c2w = np.asarray(batch["c2w"], np.float32)
    else:
        if args.frame >= len(est_c2w) or not np.any(est_c2w[args.frame]):
            raise SystemExit(f"frame {args.frame} has no estimated pose "
                             f"in {args.ckpt} (untracked)")
        c2w = np.asarray(est_c2w[args.frame], np.float32)

    target_d = np.asarray(batch["depth"]) if (args.use_depth and batch
                                              is not None) else None
    rgb, depth = render_image(model, params, c2w, H, W, fx, fy, cx, cy,
                              target_d=target_d, chunk=args.chunk)

    tag = ("pose" if args.pose is not None else f"{args.frame:05d}")
    out_png = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.ckpt)), f"render_{tag}.png")
    result = _save_outputs(out_png, rgb, depth, cam["depth_trunc"],
                           cam.get("png_depth_scale", 6553.5))
    result.update(rgb=rgb, depth=depth)

    if args.compare and batch is not None:
        gt_rgb = np.asarray(batch["rgb"], np.float32)
        gt_d = np.asarray(batch["depth"], np.float32)
        valid = (gt_d > 0) & (gt_d < cam["depth_trunc"])
        mse = float(np.mean((rgb - gt_rgb) ** 2))
        result["psnr"] = -10.0 * np.log10(max(mse, 1e-12))
        result["depth_l1"] = float(np.abs(depth - gt_d)[valid].mean())
        print(json.dumps({"frame": args.frame,
                          "psnr": round(result["psnr"], 3),
                          "depth_l1": round(result["depth_l1"], 5),
                          "png": out_png}))
    else:
        print(f"render saved to {out_png}")
    return result


if __name__ == "__main__":
    main()
