"""TriPlane multiresolution encoding — a TPU-first alternative to the
hash grid (optional; `grid.enc: TriPlane`).

Why it exists: the hash grid's table gradient is a serial scatter on the
TPU scalar core (~173M pair-updates/s measured; see ops/hash_packed.py),
and its forward needs 4 xy-corner gathers per (point, level). Both are
*issue*-bound, so the only way past them is fewer issues. A factorized
tri-plane representation (TensoRF/EG3D family) projects each 3-D point
onto the xy/xz/yz planes of a small pyramid of DENSE 2-D feature planes:

- each (point, level, plane) touches 2 u-corners (not 4), and the
  v-corner pair is made adjacent by the same v-linear packing trick the
  hash encoder uses for z — so forward = 2 wide gathers and backward =
  2 pair-RMWs per (point, level, plane);
- with the default 4-level pyramid that is 6 gathers + 6 pair-updates
  per point vs the hash grid's 64 + 64: ~10x fewer serial issues;
- planes are dense, so there are no hash collisions, and the gradient
  is MXU-matmul-able in a future upgrade (two-hot outer products).

Semantics: feature(x) at pyramid level l = sum over the three planes of
the bilinear interpolation of that plane at the projected coordinates;
the per-level features are concatenated (out_dim = levels * F), matching
the joint-encoding contract of reference model/scene_rep.py:155-171
(the decoder adapts to input_ch automatically).

Storage/layout notes: all planes of all levels live in one logical
[T, F] table (sections per (level, plane)); the packed bf16 mirror and
the pair gather/scatter kernels are shared with ops/hash_packed.py via
spec duck-typing (offsets/sizes/row_offsets/n_rows fields). Plane
resolutions are capped so one section fits the scatter kernel's VMEM
accumulator (hash_packed._MAX_GROUP_ROWS rows) in a single pass.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from . import hash_packed as HP

# Projection axes per plane: (u axis, v axis).
_PLANES = ((0, 1), (0, 2), (1, 2))


@dataclass(frozen=True)
class TriPlaneSpec:
    """Static layout. `n_levels` counts SECTIONS (= 3 * pyr_levels) so
    the hash_packed grouping/packing helpers can be reused unchanged."""

    pyr_levels: int
    n_levels: int                    # sections = pyr_levels * 3
    n_features: int
    resolutions: Tuple[int, ...]     # per section (repeated per plane)
    offsets: Tuple[int, ...]         # per section start row (logical)
    sizes: Tuple[int, ...]           # per section logical rows
    row_offsets: Tuple[int, ...]     # per section start row (packed)
    n_rows: Tuple[int, ...]          # per section packed rows
    total_entries: int
    total_rows: int

    @property
    def out_dim(self) -> int:
        return self.pyr_levels * self.n_features


def make_triplane_spec(desired_resolution: int, n_levels: int = 4,
                       n_features: int = 2,
                       base_resolution: int = 32) -> TriPlaneSpec:
    """Geometric pyramid base..desired over `n_levels` levels. The top
    resolution is capped so a (r+1)^2 plane fits one scatter-kernel
    accumulator pass (r <= 287 for the 96k-row budget)."""
    r_cap = int(math.isqrt(HP._MAX_GROUP_ROWS)) - 2
    desired = max(base_resolution, min(int(desired_resolution), r_cap))
    if n_levels > 1:
        growth = math.exp2(
            math.log2(desired / base_resolution) / (n_levels - 1))
    else:
        growth = 1.0

    resolutions, offsets, sizes, row_offsets, n_rows = [], [], [], [], []
    off = row_off = 0
    for lvl in range(n_levels):
        res = max(int(round(base_resolution * growth ** lvl)), 1)
        size = (res + 1) ** 2
        rows = (size - 2) // HP._STRIDE + 1
        for _ in range(3):
            resolutions.append(res)
            offsets.append(off)
            sizes.append(size)
            row_offsets.append(row_off)
            n_rows.append(rows)
            off += size
            row_off += rows

    return TriPlaneSpec(
        pyr_levels=n_levels, n_levels=n_levels * 3, n_features=n_features,
        resolutions=tuple(resolutions), offsets=tuple(offsets),
        sizes=tuple(sizes), row_offsets=tuple(row_offsets),
        n_rows=tuple(n_rows), total_entries=off, total_rows=row_off)


def init_triplane(key, spec: TriPlaneSpec, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4), same scale as the hash table init."""
    return jax.random.uniform(key, (spec.total_entries, spec.n_features),
                              dtype=dtype, minval=-1e-4, maxval=1e-4)


# ---------------------------------------------------------------------------
# Index / weight computation (transpose-major like hash_packed)
# ---------------------------------------------------------------------------

def _project(spec: TriPlaneSpec, x: jnp.ndarray):
    """x [N, 3] in [0,1] -> (e [S, 2, N] logical v0-entries for the two
    u-corners, wu [S, 2, N] u-corner weights, wv [S, N] v weights)."""
    xt = jnp.clip(x, 0.0, 1.0).T                               # [3, N]
    S = spec.n_levels
    res = jnp.array(spec.resolutions, dtype=x.dtype)[:, None]  # [S, 1]
    resi = jnp.array(spec.resolutions, jnp.int32)[:, None]
    offs = jnp.array(spec.offsets, jnp.int32)[:, None]
    ua = jnp.array([_PLANES[s % 3][0] for s in range(S)])
    va = jnp.array([_PLANES[s % 3][1] for s in range(S)])

    u = res * xt[ua]                                           # [S, N]
    v = res * xt[va]
    cu = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, resi - 1)
    cv = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, resi - 1)
    wu1 = u - cu.astype(x.dtype)                               # in [0, 1]
    wv = v - cv.astype(x.dtype)

    r1 = resi + 1
    e0 = cu * r1 + cv + offs                                   # u corner 0
    e1 = jnp.minimum(cu + 1, resi) * r1 + cv + offs            # u corner 1
    e = jnp.stack([e0, e1], axis=1)                            # [S, 2, N]
    wu = jnp.stack([1.0 - wu1, wu1], axis=1)                   # [S, 2, N]
    return e, wu, wv


def _combine(spec: TriPlaneSpec, p0, p1, wu, wv):
    """(p0, p1) [F, S, 2, N] v-pair features -> enc [N, L*F] (planes of a
    level summed, levels concatenated)."""
    featv = p0 * (1.0 - wv)[None, :, None] + p1 * wv[None, :, None]
    feats = jnp.sum(featv * wu[None], axis=2)                  # [F, S, N]
    F, S, n = feats.shape
    per_level = feats.reshape(F, spec.pyr_levels, 3, n).sum(axis=2)
    return per_level.transpose(2, 1, 0).reshape(n, -1)         # [N, L*F]


def _plane_grid_feats(spec: TriPlaneSpec, table: jnp.ndarray,
                      axes: jnp.ndarray):
    """Bilinear plane features on a SEPARABLE lattice.

    axes: [3, g] normalized per-axis coordinates; the lattice is their
    outer product (meshgrid 'ij'). Each plane section only depends on 2
    of the 3 axes, so it is evaluated at its g^2 unique projections
    instead of all g^3 lattice points (~g-fold fewer gathers/scatters —
    the win that makes the BA smoothness term ~free for factorized
    encodings). Returns a list over sections of [g_u, g_v, F] features.
    Pure XLA and autodiffable: at g^2-scale the serial autodiff scatter
    is negligible.
    """
    g = axes.shape[1]
    ax = jnp.clip(axes, 0.0, 1.0)
    feats = []
    for s in range(spec.n_levels):
        ua, va = _PLANES[s % 3]
        r = spec.resolutions[s]
        res = jnp.asarray(r, axes.dtype)
        u = ax[ua] * res                                       # [g]
        v = ax[va] * res
        cu = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, r - 1)
        cv = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, r - 1)
        wu = (u - cu)[:, None, None]                           # [g, 1, 1]
        wv = (v - cv)[None, :, None]                           # [1, g, 1]
        r1 = r + 1
        base = spec.offsets[s]
        e00 = base + cu[:, None] * r1 + cv[None, :]            # [g, g]
        p00 = table[e00]
        p01 = table[e00 + 1]
        p10 = table[e00 + r1]
        p11 = table[e00 + r1 + 1]
        feats.append((p00 * (1 - wu) + p10 * wu) * (1 - wv)
                     + (p01 * (1 - wu) + p11 * wu) * wv)       # [g, g, F]
    return feats


def _broadcast_plane(s_mod: int, pf: jnp.ndarray) -> jnp.ndarray:
    """[g_u, g_v, F] plane grid -> [g, g, g, F] lattice broadcast."""
    if s_mod == 0:                                             # (x, y)
        return pf[:, :, None, :]
    if s_mod == 1:                                             # (x, z)
        return pf[:, None, :, :]
    return pf[None, :, :, :]                                   # (y, z)


def triplane_lattice_encode(spec: TriPlaneSpec, table: jnp.ndarray,
                            axes: jnp.ndarray) -> jnp.ndarray:
    """Additive tri-plane encoding of a separable lattice.

    axes: [3, g] normalized per-axis coords -> [g, g, g, L*F] features,
    numerically identical to encoding the full meshgrid pointwise.
    """
    g = axes.shape[1]
    feats = _plane_grid_feats(spec, table, axes)
    levels = []
    for lvl in range(spec.pyr_levels):
        acc = 0.0
        for s_mod in range(3):
            acc = acc + _broadcast_plane(s_mod, feats[3 * lvl + s_mod])
        levels.append(jnp.broadcast_to(acc, (g, g, g, spec.n_features)))
    return jnp.concatenate(levels, axis=-1)


def triplane_encode_fwd_only(spec: TriPlaneSpec, table: jnp.ndarray,
                             x: jnp.ndarray,
                             compute_dtype=None) -> jnp.ndarray:
    """Pure-XLA forward (CPU path and the numeric oracle in tests —
    gradients via XLA autodiff scatter)."""
    dtype = x.dtype
    e, wu, wv = _project(spec, x)
    t = table if compute_dtype is None else table.astype(compute_dtype)
    p0 = jnp.moveaxis(t[e].astype(dtype), -1, 0)               # [F, S, 2, N]
    p1 = jnp.moveaxis(t[e + 1].astype(dtype), -1, 0)
    return _combine(spec, p0, p1, wu, wv)


# ---------------------------------------------------------------------------
# Custom-VJP encoder on the packed storage (TPU fast path)
# ---------------------------------------------------------------------------

def make_triplane_encode(spec: TriPlaneSpec, compute_dtype=jnp.bfloat16,
                         interpret: bool = False):
    """encode(table, x) -> [N, L*F]; forward = 2 wide v-window gathers
    per (point, section), bwd dtable = pair-RMW Pallas scatter, bwd dx =
    vector math on saved pair features (no re-gather)."""

    @jax.custom_vjp
    def encode(table, x):
        out, _ = fwd(table, x)
        return out

    def fwd(table, x):
        storage = HP.pack_storage(spec, table, compute_dtype)
        e, wu, wv = _project(spec, x)
        rows, offs = HP._rows_offs(spec, e)
        p0, p1 = HP._gather_pairs(spec, storage, rows, offs, x.dtype)
        out = _combine(spec, p0, p1, wu, wv)
        return out, (x, e, p0.astype(compute_dtype), p1.astype(compute_dtype))

    def bwd(res, g):
        x, e, p0c, p1c = res
        p0 = p0c.astype(x.dtype)
        p1 = p1c.astype(x.dtype)
        n = x.shape[0]
        L, F, S = spec.pyr_levels, spec.n_features, spec.n_levels
        _, wu, wv = _project(spec, x)

        # Per-section upstream grad: level grads broadcast to the 3
        # planes (they were summed in _combine).
        gl = g.reshape(n, L, F).transpose(2, 1, 0)             # [F, L, N]
        gs = jnp.repeat(gl, 3, axis=1)                         # [F, S, N]

        featv = p0 * (1 - wv)[None, :, None] + p1 * wv[None, :, None]
        diffv = p1 - p0                                        # [F, S, 2, N]

        # --- dx --------------------------------------------------------
        dwu = jnp.sum(featv * gs[:, :, None], axis=0)          # [S, 2, N]
        dwv = jnp.sum(jnp.sum(diffv * gs[:, :, None], axis=0) * wu, axis=1)
        du = dwu[:, 1] - dwu[:, 0]                             # [S, N]
        res_f = jnp.array(spec.resolutions, dtype=x.dtype)[:, None]
        du = du * res_f
        dv = dwv * res_f
        dx = jnp.zeros((3, n), x.dtype)
        for s_mod in range(3):
            a, b = _PLANES[s_mod]
            dx = dx.at[a].add(jnp.sum(du[s_mod::3], axis=0))
            dx = dx.at[b].add(jnp.sum(dv[s_mod::3], axis=0))
        dx = dx.T * ((x >= 0.0) & (x <= 1.0)).astype(x.dtype)

        # --- dtable (pair scatter, shared kernel) ----------------------
        gw = gs[:, :, None] * wu[None]                         # [F, S, 2, N]
        v0 = gw * (1 - wv)[None, :, None]
        v1 = gw * wv[None, :, None]
        streams = tuple(v0[f] for f in range(F)) + tuple(
            v1[f] for f in range(F))
        dtable = HP._scatter_table_grad(spec, e, streams, interpret)
        return dtable, dx

    encode.defvjp(fwd, bwd)
    return encode
