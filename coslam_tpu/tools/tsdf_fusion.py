"""TSDF fusion: RGB-D frames + poses -> fused ground-truth mesh.

TPU-native equivalent of the reference virtual-camera tool's fusion
step (reference: evaluation/create_virtual_cameras_replica.py:35-75,
which feeds every RGB-D frame into an open3d ScalableTSDFVolume and
extracts the fused triangle mesh). Instead of a C++ voxel-hash volume,
the fusion runs as one jitted XLA update per frame over a dense
[Nx, Ny, Nz] TSDF + weight grid (donated buffers, so the volume never
round-trips the host), and the mesh comes out of the same native
marching-cubes extension the rest of the framework uses
(mesh/mcubes.py), with truncation-validity semantics: unobserved cells
hold exactly +trunc, which marching_cubes treats as invalid.

This gives real-capture pipelines (Azure / RealSense / iPhone) a
GT-mesh builder: fuse the sensor stream at GT or estimated poses, then
hand the mesh to tools/virtual_cameras.py and eval/recon.py.

Usage:
  python -m coslam_tpu.tools.tsdf_fusion --config configs/Replica/room0.yaml \
      --out fused.ply --voxel_size 0.02 [--every 5] [--ckpt run/checkpoint.npz]
"""

from __future__ import annotations

import argparse
from functools import partial
from typing import Optional, Tuple

import numpy as np


def _update_step(tsdf, weight, rgb_acc, depth_img, rgb_img, w2c_cv, axes,
                 intr, trunc: float, depth_trunc: float):
    """One frame's TSDF integration (pure; jitted by fuse_frames).

    tsdf/weight: [Nx, Ny, Nz] running weighted-average state.
    rgb_acc: [Nx, Ny, Nz, 3] color accumulator (zeros if unused).
    axes: (tx [Nx], ty [Ny], tz [Nz]) voxel-center world coordinates.
    w2c_cv: [4, 4] world->camera in OpenCV convention (+z forward).
    intr: (fx, fy, cx, cy) as a [4] array.
    """
    import jax.numpy as jnp

    tx, ty, tz = axes
    H, W = depth_img.shape
    R, t = w2c_cv[:3, :3], w2c_cv[:3, 3]
    # Camera coords of every voxel center, built by broadcasting the
    # separable axes (never materializes a [N, 3] matmul operand).
    X = tx[:, None, None]
    Y = ty[None, :, None]
    Z = tz[None, None, :]
    cam = [R[i, 0] * X + R[i, 1] * Y + R[i, 2] * Z + t[i] for i in range(3)]
    z = cam[2]
    u = intr[0] * cam[0] / jnp.maximum(z, 1e-9) + intr[2]
    v = intr[1] * cam[1] / jnp.maximum(z, 1e-9) + intr[3]
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    d = depth_img[vi, ui]
    valid = ((z > 1e-6) & (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
             & (d > 0) & (d < depth_trunc))

    sdf = d - z
    # Integrate every observation in front of (or within trunc behind)
    # the surface; clamp to the open interval so fused cells stay VALID
    # under the marching-cubes truncation rule.
    integrate = valid & (sdf > -trunc)
    tsdf_obs = jnp.clip(sdf, -0.999 * trunc, 0.999 * trunc)
    w = integrate.astype(jnp.float32)

    tsdf = tsdf + jnp.where(integrate, tsdf_obs, 0.0)
    weight = weight + w
    if rgb_img is not None:
        near_surf = integrate & (jnp.abs(sdf) < trunc)
        cw = near_surf.astype(jnp.float32)[..., None]
        rgb_acc = rgb_acc + cw * rgb_img[vi, ui]
    return tsdf, weight, rgb_acc


def fuse_frames(depths, c2ws, fx, fy, cx, cy, bounds, voxel_size: float,
                trunc: float, rgbs=None, depth_trunc: float = 100.0,
                verbose: bool = False):
    """Fuse RGB-D frames into a dense TSDF volume.

    depths: iterable of [H, W] float depth maps (meters).
    c2ws: matching [4, 4] camera-to-world poses, OpenGL convention
      (-z forward, like every loader in data/datasets.py).
    bounds: [3, 2] metric volume bounds.
    rgbs: optional matching [H, W, 3] float RGB in [0, 1].

    Returns (tsdf [Nx, Ny, Nz], color [Nx, Ny, Nz, 3] | None,
    (tx, ty, tz)). Unobserved cells hold exactly +trunc (invalid for
    mesh/mcubes.marching_cubes(..., truncation=trunc)).
    """
    import jax
    import jax.numpy as jnp

    from ..mesh.extract import get_voxels

    b = np.asarray(bounds, np.float32)
    tx, ty, tz = get_voxels(b[0, 1], b[0, 0], b[1, 1], b[1, 0],
                            b[2, 1], b[2, 0], voxel_size=voxel_size)
    shape = (len(tx), len(ty), len(tz))
    axes = (jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(tz))
    intr = jnp.asarray([fx, fy, cx, cy], jnp.float32)
    with_rgb = rgbs is not None

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(tsdf, weight, rgb_acc, depth_img, rgb_img, w2c_cv):
        return _update_step(tsdf, weight, rgb_acc, depth_img,
                            rgb_img if with_rgb else None, w2c_cv, axes,
                            intr, float(trunc), float(depth_trunc))

    tsdf = jnp.zeros(shape, jnp.float32)
    weight = jnp.zeros(shape, jnp.float32)
    rgb_acc = jnp.zeros(shape + (3,) if with_rgb else (1, 1, 1, 3),
                        jnp.float32)

    n = len(depths) if hasattr(depths, "__len__") else None
    for i, (depth, c2w) in enumerate(zip(depths, c2ws)):
        c2w_cv = np.asarray(c2w, np.float64).copy()
        c2w_cv[:3, 1] *= -1  # OpenGL -> OpenCV
        c2w_cv[:3, 2] *= -1
        w2c = np.linalg.inv(c2w_cv).astype(np.float32)
        rgb_img = (jnp.asarray(np.asarray(rgbs[i], np.float32))
                   if with_rgb else jnp.zeros((1, 1, 3)))
        tsdf, weight, rgb_acc = step(
            tsdf, weight, rgb_acc,
            jnp.asarray(np.asarray(depth, np.float32)), rgb_img, w2c)
        if verbose and (i % 50 == 0):
            print(f"fused frame {i}{f'/{n}' if n else ''}")

    w = np.asarray(weight)
    vol = np.asarray(tsdf)
    with np.errstate(invalid="ignore"):
        vol = np.where(w > 0, vol / np.maximum(w, 1e-12),
                       np.float32(trunc))
    color = None
    if with_rgb:
        color = np.asarray(rgb_acc) / np.maximum(w[..., None], 1e-12)
        color = np.where(w[..., None] > 0, color, 0.0).astype(np.float32)
    return vol.astype(np.float32), color, (tx, ty, tz)


def tsdf_mesh(vol: np.ndarray, axes: Tuple[np.ndarray, ...],
              trunc: float, color_vol: Optional[np.ndarray] = None):
    """Marching-cubes the fused volume back to a metric TriMesh."""
    from ..mesh.io import TriMesh
    from ..mesh.mcubes import marching_cubes

    tx, ty, tz = axes
    verts, faces = marching_cubes(vol, 0.0, truncation=float(trunc))
    scale = np.array([tx[-1] - tx[0], ty[-1] - ty[0], tz[-1] - tz[0]],
                     np.float32)
    div = np.array([len(tx) - 1, len(ty) - 1, len(tz) - 1], np.float32)
    verts_m = verts / div[None] * scale[None] + np.array(
        [tx[0], ty[0], tz[0]], np.float32)[None]

    colors = None
    if color_vol is not None and len(verts):
        idx = np.clip(np.round(verts).astype(int), 0,
                      (div - 0).astype(int))
        colors = color_vol[idx[:, 0], idx[:, 1], idx[:, 2]]
    return TriMesh(verts_m, faces, colors)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="fuse a dataset's RGB-D stream into a GT mesh")
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True, help="output .ply path")
    p.add_argument("--voxel_size", type=float, default=0.02)
    p.add_argument("--trunc", type=float, default=None,
                   help="SDF truncation in meters (default 4*voxel_size)")
    p.add_argument("--every", type=int, default=1,
                   help="fuse every Nth frame")
    p.add_argument("--n_frames", type=int, default=None)
    p.add_argument("--ckpt", default=None,
                   help="fuse at a checkpoint's ESTIMATED poses instead "
                        "of dataset GT poses")
    p.add_argument("--no_color", action="store_true")
    args = p.parse_args(argv)

    from ..config import load_config
    from ..data import get_dataset

    cfg = load_config(args.config)
    ds = get_dataset(cfg)
    trunc = args.trunc if args.trunc is not None else 4 * args.voxel_size
    bounds = np.asarray(cfg["mapping"]["bound"], np.float32)

    est = None
    if args.ckpt:
        from ..runtime.checkpoint import load_ckpt
        _, est, _, _ = load_ckpt(args.ckpt)

    n = len(ds) if args.n_frames is None else min(args.n_frames, len(ds))
    ids = list(range(0, n, args.every))

    def frames():
        for i in ids:
            fr = ds[i]
            pose = (est[i] if est is not None
                    else np.asarray(fr["c2w"], np.float64))
            yield (np.asarray(fr["depth"], np.float32),
                   None if args.no_color
                   else np.asarray(fr["rgb"], np.float32), pose)

    depths, rgbs, poses = [], [], []
    for d, c, pose in frames():
        depths.append(d)
        rgbs.append(c)
        poses.append(pose)

    vol, color, axes = fuse_frames(
        depths, poses, ds.fx, ds.fy, ds.cx, ds.cy, bounds,
        args.voxel_size, trunc,
        rgbs=None if args.no_color else rgbs,
        depth_trunc=cfg["cam"]["depth_trunc"], verbose=True)
    mesh = tsdf_mesh(vol, axes, trunc, color)
    mesh.export(args.out)
    print(f"fused {len(ids)} frames -> {args.out} "
          f"({len(mesh.vertices)} verts, {len(mesh.faces)} faces)")
    return mesh


if __name__ == "__main__":
    main()
