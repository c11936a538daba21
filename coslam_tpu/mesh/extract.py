"""Mesh extraction: dense SDF grid query (jitted, chunked) + marching cubes.

Port of the reference pipeline (reference: utils.py:29-201 getVoxels /
extract_mesh): build the voxel grid from marching_cubes_bound, query the
SDF on normalized coordinates in fixed-size chunks through one jitted
function, run the native marching-cubes, rescale vertices to metric
units, and color vertices by query_color (or render_surface_color along
vertex normals).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .io import TriMesh
from .mcubes import marching_cubes

CHUNK = 1024 * 64


def _model_jit(model, name: str, build):
    """Per-model cache of the jitted query functions, with params passed
    as an ARGUMENT. Closing over the params pytree instead (the obvious
    `jax.jit(lambda p: model.query_sdf(params, p))`) bakes the arrays in
    as trace constants, so every extraction with updated parameters — in
    a SLAM run, every single one — misses the jit cache and recompiles
    the query (~seconds per periodic mesh on a slow host)."""
    cache = getattr(model, "_mesh_jit_cache", None)
    if cache is None:
        cache = model._mesh_jit_cache = {}
    fn = cache.get(name)
    if fn is None:
        fn = cache[name] = jax.jit(build())
    return fn


def get_voxels(x_max, x_min, y_max, y_min, z_max, z_min,
               voxel_size: Optional[float] = None,
               resolution: Optional[int] = None):
    """Grid axis coordinates (reference utils.py:29-54)."""
    if voxel_size is not None:
        Nx = round((x_max - x_min) / voxel_size + 0.0005)
        Ny = round((y_max - y_min) / voxel_size + 0.0005)
        Nz = round((z_max - z_min) / voxel_size + 0.0005)
        tx = np.linspace(x_min, x_max, Nx + 1, dtype=np.float32)
        ty = np.linspace(y_min, y_max, Ny + 1, dtype=np.float32)
        tz = np.linspace(z_min, z_max, Nz + 1, dtype=np.float32)
    else:
        tx = np.linspace(x_min, x_max, resolution, dtype=np.float32)
        ty = np.linspace(y_min, y_max, resolution, dtype=np.float32)
        tz = np.linspace(z_min, z_max, resolution, dtype=np.float32)
    return tx, ty, tz


def _chunked_query(fn, pts_norm: np.ndarray, out_dim: int) -> np.ndarray:
    """Apply a jitted point query in fixed CHUNK-sized blocks (pad last)."""
    n = pts_norm.shape[0]
    outs = []
    for i in range(0, n, CHUNK):
        block = pts_norm[i:i + CHUNK]
        pad = CHUNK - block.shape[0]
        if pad > 0:
            block = np.concatenate(
                [block, np.zeros((pad, 3), np.float32)], axis=0)
        res = np.asarray(fn(jnp.asarray(block)))
        if pad > 0:
            res = res[:CHUNK - pad]
        outs.append(res)
    return np.concatenate(outs, axis=0)


def extract_mesh(model, params, config: Dict, bounding_box: np.ndarray,
                 marching_cube_bound: Optional[np.ndarray] = None,
                 color_func=None, voxel_size: Optional[float] = None,
                 resolution: Optional[int] = None, isolevel: float = 0.0,
                 mesh_savepath: str = "") -> TriMesh:
    """Extract a colored mesh from the scene SDF (reference utils.py:79-201)."""
    if marching_cube_bound is None:
        marching_cube_bound = bounding_box
    bb = np.asarray(bounding_box, np.float32)
    mcb = np.asarray(marching_cube_bound, np.float32)

    tx, ty, tz = get_voxels(mcb[0, 1], mcb[0, 0], mcb[1, 1], mcb[1, 0],
                            mcb[2, 1], mcb[2, 0],
                            voxel_size=voxel_size, resolution=resolution)
    grid = np.stack(np.meshgrid(tx, ty, tz, indexing="ij"), axis=-1)
    flat = grid.reshape(-1, 3)
    # Normalize to the scene bounding box (tcnn convention).
    flat_norm = (flat - bb[:, 0]) / (bb[:, 1] - bb[:, 0])

    sdf_jit = _model_jit(model, "query_sdf",
                         lambda: (lambda pr, p: model.query_sdf(pr, p)))
    raw = _chunked_query(lambda p: sdf_jit(params, p),
                         flat_norm.astype(np.float32), 1)
    volume = raw.reshape(len(tx), len(ty), len(tz))

    vertices, triangles = marching_cubes(volume, isolevel, truncation=3.0)

    # Voxel-index -> metric coordinates.
    vertices = vertices / np.array([[len(tx) - 1, len(ty) - 1, len(tz) - 1]],
                                   np.float32)
    scale = np.array([tx[-1] - tx[0], ty[-1] - ty[0], tz[-1] - tz[0]],
                     np.float32)
    offset = np.array([tx[0], ty[0], tz[0]], np.float32)
    vertices = vertices * scale[None] + offset[None]
    vertices = (vertices / config["data"]["sc_factor"]
                - config["data"]["translation"])

    vertex_colors = None
    cf_name = getattr(color_func, "__name__", "color_func")
    if color_func is not None and not config["mesh"]["render_color"]:
        vert_norm = (vertices - bb[:, 0]) / (bb[:, 1] - bb[:, 0])
        color_jit = _model_jit(model, f"pt:{cf_name}",
                               lambda: (lambda pr, p: color_func(pr, p)))
        vertex_colors = _chunked_query(lambda p: color_jit(params, p),
                                       vert_norm.astype(np.float32), 3)
    elif color_func is not None and config["mesh"]["render_color"]:
        mesh_tmp = TriMesh(vertices, triangles)
        normals = mesh_tmp.vertex_normals.astype(np.float32)
        surf_query_jit = _model_jit(
            model, f"surf:{cf_name}",
            lambda: (lambda pr, p, nrm: color_func(pr, p[:, None, :], nrm)))
        surf_query = lambda p, nrm: surf_query_jit(params, p, nrm)  # noqa: E731
        n = vertices.shape[0]
        cols = []
        for i in range(0, n, CHUNK):
            v = jnp.asarray(vertices[i:i + CHUNK])
            nr = jnp.asarray(normals[i:i + CHUNK])
            cols.append(np.asarray(surf_query(v, nr)))
        vertex_colors = np.concatenate(cols, axis=0)

    mesh = TriMesh(vertices, triangles, vertex_colors)
    if mesh_savepath:
        mesh.export(mesh_savepath)
    return mesh
