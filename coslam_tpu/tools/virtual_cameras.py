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
