"""Virtual-camera creation for the Co-SLAM culling protocol.

The reference tool (reference:
evaluation/create_virtual_cameras_replica.py) TSDF-fuses a GT mesh and
has a human interactively pick extra viewpoints covering regions the
trajectory missed; each view is saved as `{i}.txt` (c2w) + screenshot.
Headless equivalent: sample candidate viewpoints in the scene's free
interior, keep those that observe surface regions NOT covered by the
trajectory (maximizing newly-seen area), and write the same
`virtual_cameras/{i}.txt` layout consumed by eval/cull.py.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..eval.recon import viewmatrix
from ..mesh.io import TriMesh
from ..mesh.raster import render_depth


def _coverage(mesh: TriMesh, surf_pts: np.ndarray, poses, fx, fy, cx, cy,
              H, W, eps=0.03) -> np.ndarray:
    """Boolean mask of surf_pts observed by any pose (frustum+occlusion)."""
    seen = np.zeros(len(surf_pts), bool)
    for c2w in poses:
        cv = np.asarray(c2w, np.float64).copy()
        cv[:3, 1] *= -1
        cv[:3, 2] *= -1
        w2c = np.linalg.inv(cv)
        depth = render_depth(mesh.vertices, mesh.faces,
                             w2c.astype(np.float32), fx, fy, cx, cy, H, W)
        cam = surf_pts @ w2c[:3, :3].T + w2c[:3, 3]
        pz = cam[:, 2] + 1e-8
        px = fx * cam[:, 0] / pz + cx
        py = fy * cam[:, 1] / pz + cy
        inside = (0 <= px) & (px <= W - 1) & (0 <= py) & (py <= H - 1) & (pz > 0)
        u = np.clip(px, 0, W - 1).astype(int)
        v = np.clip(py, 0, H - 1).astype(int)
        seen |= inside & (pz < depth[v, u] + eps)
    return seen


def create_virtual_cameras(gt_mesh: TriMesh, traj_poses: List[np.ndarray],
                           out_dir: str, fx, fy, cx, cy, H, W,
                           n_candidates: int = 200, n_select: int = 20,
                           seed: int = 0) -> List[np.ndarray]:
    """Greedy max-new-coverage viewpoint selection; writes {i}.txt files."""
    rng = np.random.default_rng(seed)
    surf = gt_mesh.sample_surface(20000, rng)
    seen = _coverage(gt_mesh, surf, traj_poses, fx, fy, cx, cy, H, W)

    lo, hi = gt_mesh.vertices.min(0), gt_mesh.vertices.max(0)
    center, half = 0.5 * (lo + hi), 0.35 * (hi - lo)

    candidates = []
    for _ in range(n_candidates):
        origin = center + rng.uniform(-1, 1, 3) * half
        target = surf[rng.integers(len(surf))]
        c2w = np.eye(4)
        # viewmatrix yields +z-forward; flip to OpenGL for the protocol.
        m = viewmatrix(target - origin, [0, 0, -1], origin)
        c2w[:3, :] = m
        c2w[:3, 1] *= -1
        c2w[:3, 2] *= -1
        candidates.append(c2w)

    # Precompute each candidate's coverage mask once (one depth render
    # per candidate); the greedy loop is then pure boolean algebra
    # instead of n_select * n_candidates re-renders.
    cov = np.stack([_coverage(gt_mesh, surf, [c2w], fx, fy, cx, cy, H, W)
                    for c2w in candidates]) if candidates else \
        np.zeros((0, len(surf)), bool)

    chosen = []
    unseen = ~seen
    for _ in range(n_select):
        gains = (cov & unseen).sum(axis=1)
        i = int(gains.argmax()) if len(gains) else 0
        if len(gains) == 0 or gains[i] == 0:
            break
        chosen.append(candidates[i])
        unseen &= ~cov[i]

    os.makedirs(out_dir, exist_ok=True)
    for i, c2w in enumerate(chosen):
        np.savetxt(os.path.join(out_dir, f"{i}.txt"), c2w)
    return chosen


def main(argv=None):
    """CLI: create virtual cameras for a dataset, starting from either a
    ready GT mesh (--gt_mesh) or RAW RGB-D — in which case the stream is
    first TSDF-fused into a GT mesh (tools/tsdf_fusion.py), matching the
    reference tool's flow (reference:
    evaluation/create_virtual_cameras_replica.py:35-117, which fuses
    with open3d before the interactive viewpoint capture)."""
    import argparse

    p = argparse.ArgumentParser(
        description="virtual-camera creation for the Co-SLAM culling "
                    "protocol (headless greedy-coverage selection)")
    p.add_argument("--config", required=True)
    p.add_argument("--gt_mesh", default=None,
                   help="existing GT mesh .ply; omitted -> TSDF-fuse the "
                        "dataset's RGB-D stream first")
    p.add_argument("--out_dir", default=None,
                   help="default: <datadir>/virtual_cameras")
    p.add_argument("--save_fused", default=None,
                   help="also save the fused GT mesh here (.ply)")
    p.add_argument("--voxel_size", type=float, default=0.02)
    p.add_argument("--every", type=int, default=5,
                   help="fuse every Nth frame when building the GT mesh")
    p.add_argument("--n_candidates", type=int, default=200)
    p.add_argument("--n_select", type=int, default=20)
    args = p.parse_args(argv)

    from ..config import load_config
    from ..data import get_dataset
    from ..mesh.io import load_ply

    cfg = load_config(args.config)
    ds = get_dataset(cfg)
    poses = [np.asarray(ds[i]["c2w"], np.float64)
             for i in range(0, len(ds), max(args.every, 1))]

    if args.gt_mesh:
        gt_mesh = load_ply(args.gt_mesh)
    else:
        from .tsdf_fusion import fuse_frames, tsdf_mesh

        trunc = 4 * args.voxel_size
        depths = [np.asarray(ds[i]["depth"], np.float32)
                  for i in range(0, len(ds), max(args.every, 1))]
        vol, _, axes = fuse_frames(
            depths, poses, ds.fx, ds.fy, ds.cx, ds.cy,
            np.asarray(cfg["mapping"]["bound"], np.float32),
            args.voxel_size, trunc,
            depth_trunc=cfg["cam"]["depth_trunc"], verbose=True)
        gt_mesh = tsdf_mesh(vol, axes, trunc)
        print(f"TSDF-fused GT mesh: {len(gt_mesh.vertices)} verts")
        if args.save_fused:
            gt_mesh.export(args.save_fused)

    out_dir = args.out_dir or os.path.join(
        cfg["data"]["datadir"], "virtual_cameras")
    chosen = create_virtual_cameras(
        gt_mesh, poses, out_dir, ds.fx, ds.fy, ds.cx, ds.cy, ds.H, ds.W,
        n_candidates=args.n_candidates, n_select=args.n_select)
    print(f"wrote {len(chosen)} virtual cameras to {out_dir}")
    return chosen


if __name__ == "__main__":
    main()
