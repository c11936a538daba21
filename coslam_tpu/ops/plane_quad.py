"""Quad plane kernels: ONE gather row and ONE serial RMW per
(point, plane-section) bilinear cell.

The pair machinery in ops/hash_packed.py costs 2 gather rows + 2
pair-RMWs per (point, section): one per u-corner, each fetching/updating
a v-adjacent pair. Both paths are serial-ISSUE-bound on the TPU scalar
core, so halving the issues halves the time. This module packs each
plane so a cell's full 2x2 corner patch is reachable in one issue:

- GATHER: storage rows hold a [2 u-lines x 8 v-entries] tile
  (u-windows of 2 with stride 1, v-windows of 8 with stride 7 — the
  same overlap trick as hash_packed, applied on both axes). One 32-value
  bf16 row (64 B — still within the free-gather width) yields all four
  corners (p00, p01, p10, p11).
- SCATTER: Mosaic only lowers dynamic-start slices on the SUBLANE axis
  with full lane-row coverage (a [2, 2F] patch at a dynamic (u, v*F)
  start fails "index in dimension 0 is a multiple of 8"), so the
  gradient kernel uses a CELL-ROW accumulator instead: one [r^2, 4F]
  VMEM buffer per section in which row (cu*r + cv) holds the cell's
  whole 2x2xF corner update — a full-width row at a dynamic sublane
  start, the exact pattern the pair kernel already compiles. ONE RMW
  per (point, section) cell (measured: a block RMW costs the same ~1
  serial issue as a pair RMW), then the overlap is resolved OUTSIDE the
  serial kernel by 4 vectorized shifted adds (pure bandwidth,
  ~table-sized traffic).

Used by the TensoVM flagship encoding (ops/tensovm.py); the pair path
remains the reference implementation and the comparison baseline.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import triplane as TP

_VW = 8    # v-entries per storage tile
_VS = 7    # v stride between tiles (overlap 1)


# ---------------------------------------------------------------------------
# Layout derived from a TriPlaneSpec
# ---------------------------------------------------------------------------

def _uv_layout(spec: TP.TriPlaneSpec):
    """Per-section (n_vw tiles, row offset) for the u-pair storage and
    (u base row) for the scatter accumulator; plus totals."""
    nvw, row_off, u_off = [], [], []
    rows = ubase = 0
    for s in range(spec.n_levels):
        r = spec.resolutions[s]
        r1 = r + 1
        n = (r1 - 2) // _VS + 1
        nvw.append(n)
        row_off.append(rows)
        u_off.append(ubase)
        rows += r * n          # u-windows: u in [0, r-1], stride 1
        ubase += r1
    return tuple(nvw), tuple(row_off), tuple(u_off), rows, ubase


def pack_uv_storage(spec: TP.TriPlaneSpec, table: jnp.ndarray,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """[Tp, F] logical plane table -> [2*_VW*F, R_uv] transposed storage.

    storage[(iu * _VW + k) * F + f, row_off[s] + u * nvw + t] =
        table[offset[s] + (u + iu) * r1 + t*_VS + k, f]
    """
    F = spec.n_features
    nvw, _, _, _, _ = _uv_layout(spec)
    parts = []
    for s in range(spec.n_levels):
        r = spec.resolutions[s]
        r1 = r + 1
        t = table[spec.offsets[s]:spec.offsets[s] + spec.sizes[s]]
        plane = t.reshape(r1, r1, F)
        # v-windows: pad v to nvw*_VS + 1, window k covers [k*_VS, +_VW)
        vpad = nvw[s] * _VS + 1 - r1
        plane = jnp.pad(plane, ((0, 0), (0, max(vpad, 0)), (0, 0)))
        main = plane[:, :nvw[s] * _VS].reshape(r1, nvw[s], _VS, F)
        extra = plane[:, _VS::_VS][:, :nvw[s]].reshape(r1, nvw[s], 1, F)
        vt = jnp.concatenate([main, extra], axis=2)   # [r1, nvw, 8, F]
        # u-pairs: window u covers rows (u, u+1), u in [0, r-1]
        pair = jnp.stack([vt[:-1], vt[1:]], axis=2)   # [r, nvw, 2, 8, F]
        parts.append(pair.reshape(r * nvw[s], 2 * _VW * F))
    st = jnp.concatenate(parts, axis=0)               # [R_uv, 16F]
    return st.T.astype(dtype)


def _cell_project(spec: TP.TriPlaneSpec, x: jnp.ndarray):
    """x [N, 3] -> (cu, cv int32 [S, N], wu, wv [S, N])."""
    xt = jnp.clip(x, 0.0, 1.0).T
    S = spec.n_levels
    res = jnp.array(spec.resolutions, dtype=x.dtype)[:, None]
    resi = jnp.array(spec.resolutions, jnp.int32)[:, None]
    ua = jnp.array([TP._PLANES[s % 3][0] for s in range(S)])
    va = jnp.array([TP._PLANES[s % 3][1] for s in range(S)])
    u = res * xt[ua]
    v = res * xt[va]
    cu = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, resi - 1)
    cv = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, resi - 1)
    return cu, cv, u - cu.astype(x.dtype), v - cv.astype(x.dtype)


def gather_quads(spec: TP.TriPlaneSpec, storage: jnp.ndarray,
                 cu: jnp.ndarray, cv: jnp.ndarray, dtype):
    """One row gather per (point, section) -> corner features
    p00, p01, p10, p11, each [F, S, N] (u index first, v second)."""
    F = spec.n_features
    nvw, row_off, _, _, _ = _uv_layout(spec)
    nvw_a = jnp.array(nvw, jnp.int32)[:, None]
    roff_a = jnp.array(row_off, jnp.int32)[:, None]
    rows = roff_a + cu * nvw_a + cv // _VS           # [S, N]
    offs = cv % _VS

    g = storage[:, rows]                             # [16F, S, N] (bf16)
    zero = jnp.zeros((), g.dtype)
    out = [[None] * F for _ in range(4)]             # p00 p01 p10 p11
    for k in range(_VW):
        m0 = offs == k
        m1 = offs == k - 1
        for iu in range(2):
            for f in range(F):
                lane = (iu * _VW + k) * F + f
                t0 = jnp.where(m0, g[lane], zero)
                t1 = jnp.where(m1, g[lane], zero)
                c0 = out[2 * iu][f]
                c1 = out[2 * iu + 1][f]
                out[2 * iu][f] = t0 if c0 is None else c0 + t0
                out[2 * iu + 1][f] = t1 if c1 is None else c1 + t1
    return tuple(jnp.stack(o).astype(dtype) for o in out)


# Max cell rows per accumulator pass: 97k rows x 128 padded lanes x 4 B
# = ~50 MB VMEM, the same envelope the pair kernel already runs in.
_MAX_CELL_ROWS = 98 * 1024


def _cell_groups(spec: TP.TriPlaneSpec):
    """Group consecutive sections so each group's total r^2 cell rows
    fit one accumulator pass. The top level (r <= 311 by the spec cap)
    always fits alone."""
    groups = []
    s = 0
    while s < spec.n_levels:
        rows = spec.resolutions[s] ** 2
        e = s + 1
        while e < spec.n_levels and \
                rows + spec.resolutions[e] ** 2 <= _MAX_CELL_ROWS:
            rows += spec.resolutions[e] ** 2
            e += 1
        groups.append((s, e, rows))
        s = e
    return tuple(groups)


def cell_scatter_grad(spec: TP.TriPlaneSpec, cu: jnp.ndarray,
                      cv: jnp.ndarray, streams,
                      interpret: bool = False) -> jnp.ndarray:
    """cu/cv [S, N] cell coords; streams = 4F arrays [S, N] in lane
    order (c00 f0.., c01 f0.., c10 f0.., c11 f0..). ONE serial RMW per
    (point, section) — the update row is read as a VECTOR from a VMEM
    value matrix (ops/serial_scatter.py; scalar-assembled rows scale
    with width). Corner overlap between neighboring cells is resolved
    afterwards by 4 vectorized shifted adds per section. Returns
    dtable [Tp, F] f32."""
    from .serial_scatter import row_accum

    F = spec.n_features
    width = 4 * F

    # Per-section accumulator slices.
    sec_cells = [r * r for r in spec.resolutions]
    acc_parts = []
    for (s0, s1, rows) in _cell_groups(spec):
        base = 0
        idx_parts, val_parts = [], [[] for _ in range(width)]
        for s in range(s0, s1):
            r = spec.resolutions[s]
            idx_parts.append((cu[s] * r + cv[s] + base).reshape(-1))
            for w in range(width):
                val_parts[w].append(streams[w][s].reshape(-1))
            base += sec_cells[s]
        idx = jnp.concatenate(idx_parts)
        vals = [jnp.concatenate(v) for v in val_parts]
        acc = row_accum(idx, vals, rows, interpret)
        acc_parts.append((s0, s1, acc))

    # Unpack: dtable[u, v, f] = sum over the <=4 cells containing (u, v)
    # of their corresponding corner value (vectorized shifted adds).
    parts = []
    for (s0, s1, acc) in acc_parts:
        base = 0
        for s in range(s0, s1):
            r = spec.resolutions[s]
            r1 = r + 1
            cell = acc[base:base + r * r].reshape(r, r, 4, F)
            base += r * r
            d = jnp.zeros((r1, r1, F), jnp.float32)
            d = d.at[:r, :r].add(cell[:, :, 0])      # c00 at (cu, cv)
            d = d.at[:r, 1:].add(cell[:, :, 1])      # c01 at (cu, cv+1)
            d = d.at[1:, :r].add(cell[:, :, 2])      # c10 at (cu+1, cv)
            d = d.at[1:, 1:].add(cell[:, :, 3])      # c11
            parts.append(d.reshape(r1 * r1, F))
    return jnp.concatenate(parts, axis=0)


def _mm_level_grad(r: int, u: jnp.ndarray, v: jnp.ndarray,
                   g: jnp.ndarray) -> jnp.ndarray:
    """Table gradient of one pyramid level's 3 plane sections as MXU
    matmuls (ZERO serial issues): dT[s,i,j,f] = sum_n hu[s,n,i] *
    hv[s,n,j] * g[s,n,f] computed as a two-step contraction — the
    [S, N, r1, F] inner product E = hv * g is a fused elementwise
    producer of one batched dot over n. u/v [3, N] scaled in-cell
    coords (cu + wu), g [3, N, F] -> [3, r1, r1, F] f32.

    Matches the bilinear corner weights exactly: hu[n, cu] = 1 - wu,
    hu[n, cu + 1] = wu and 0 elsewhere, so the dot reproduces the four
    corner updates the cell-RMW kernel would apply (f32 accumulation,
    different summation order only).
    """
    r1 = r + 1
    s, n = u.shape
    f = g.shape[-1]
    j = jnp.arange(r1, dtype=u.dtype)
    hu = jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - j))   # [3, N, r1]
    hv = jnp.maximum(0.0, 1.0 - jnp.abs(v[..., None] - j))
    e = hv[:, :, :, None] * g[:, :, None, :]                 # [3, N, r1, F]
    dt = jax.lax.dot_general(hu, e.reshape(s, n, r1 * f),
                             (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    return dt.reshape(s, r1, r1, f)


# Levels with r <= the rcut take the matmul table-grad: the serial
# kernel's per-update issue cost is flat in r while the matmul scales as
# N*r1*F inner-product traffic + N*r1^2*F MXU FLOPs (A/B-tuned on the
# full BA cycle; COSLAM_MM_RCUT overrides at trace time).
_MM_RCUT = 128


def _mm_rcut() -> int:
    import os
    return int(os.environ.get("COSLAM_MM_RCUT", _MM_RCUT))


def quad_table_grad(spec: TP.TriPlaneSpec, cu, cv, wu, wv, gs,
                    interpret: bool = False,
                    mm_rcut: int = None) -> jnp.ndarray:
    """Full plane-table gradient [Tp, F] f32 from per-section cell
    coords/weights ([S, N] each) and cotangents gs [F, S, N].

    Pyramid levels with r <= mm_rcut go through the batched two-hot
    matmul (_mm_level_grad, no serial issues); finer levels through the
    cell-RMW serial kernel (cell_scatter_grad)."""
    F = spec.n_features
    if mm_rcut is None:
        mm_rcut = _mm_rcut()
    mm_levels = [l for l in range(spec.pyr_levels)
                 if spec.resolutions[3 * l] <= mm_rcut]
    sc_sections = [s for s in range(spec.n_levels)
                   if spec.resolutions[s] > mm_rcut]

    sec_grads = [None] * spec.n_levels
    for l in mm_levels:
        sl = slice(3 * l, 3 * l + 3)
        r = spec.resolutions[3 * l]
        u = cu[sl].astype(gs.dtype) + wu[sl]
        v = cv[sl].astype(gs.dtype) + wv[sl]
        g3 = gs[:, sl].transpose(1, 2, 0)                    # [3, N, F]
        dt = _mm_level_grad(r, u, v, g3)                     # [3,r1,r1,F]
        for s_mod in range(3):
            sec_grads[3 * l + s_mod] = dt[s_mod].reshape(-1, F)

    if sc_sections:
        w00 = (1 - wu) * (1 - wv)
        w01 = (1 - wu) * wv
        w10 = wu * (1 - wv)
        w11 = wu * wv
        streams = []
        for w in (w00, w01, w10, w11):
            for f in range(F):
                streams.append(gs[f] * w)
        sub = _section_subset(spec, sc_sections)
        dsub = cell_scatter_grad(sub, cu[jnp.array(sc_sections)],
                                 cv[jnp.array(sc_sections)],
                                 [st[jnp.array(sc_sections)]
                                  for st in streams], interpret)
        off = 0
        for s in sc_sections:
            sec_grads[s] = dsub[off:off + spec.sizes[s]]
            off += spec.sizes[s]

    return jnp.concatenate(sec_grads, axis=0)


def _section_subset(spec: TP.TriPlaneSpec, sections) -> TP.TriPlaneSpec:
    """A TriPlaneSpec view over a subset of sections (for routing only
    those sections through the scatter accumulator). Offsets are
    recomputed densely; pyr_levels is a fiction (unused by
    cell_scatter_grad beyond iteration bounds)."""
    res = tuple(spec.resolutions[s] for s in sections)
    sizes = tuple(spec.sizes[s] for s in sections)
    offs, off = [], 0
    for sz in sizes:
        offs.append(off)
        off += sz
    return TP.TriPlaneSpec(
        pyr_levels=len(sections), n_levels=len(sections),
        n_features=spec.n_features, resolutions=res, offsets=tuple(offs),
        sizes=sizes, row_offsets=spec.row_offsets, n_rows=spec.n_rows,
        total_entries=off, total_rows=spec.total_rows)


# ---------------------------------------------------------------------------
# Separable-lattice plane grids with the cell-RMW backward (custom VJP)
# ---------------------------------------------------------------------------

def make_plane_grid_feats(spec: TP.TriPlaneSpec, interpret: bool = False):
    """grid_feats(planes, axes [3, g]) -> [S, g, g, F] per-section
    bilinear plane features on the separable smoothness lattice.

    Forward: direct XLA gathers (g^2 rows/section — tiny). Backward:
    table gradient through the cell-RMW kernel instead of XLA's serial
    autodiff scatter (~130 ms per 1M updates on TPU). The lattice axes
    get a ZERO cotangent: the smoothness grid is a random constant,
    never optimized (asserted by the smoothness call sites, which
    differentiate w.r.t. params only)."""

    def _project_axes(axes):
        ax = jnp.clip(axes, 0.0, 1.0)
        cus, cvs, wus, wvs = [], [], [], []
        for s in range(spec.n_levels):
            ua, va = TP._PLANES[s % 3]
            r = spec.resolutions[s]
            res = jnp.asarray(r, axes.dtype)
            u = ax[ua] * res
            v = ax[va] * res
            cu = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, r - 1)
            cv = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, r - 1)
            cus.append(cu)
            cvs.append(cv)
            wus.append(u - cu.astype(axes.dtype))
            wvs.append(v - cv.astype(axes.dtype))
        return cus, cvs, wus, wvs

    @jax.custom_vjp
    def grid_feats(planes, axes):
        out, _ = fwd(planes, axes)
        return out

    def fwd(planes, axes):
        cus, cvs, wus, wvs = _project_axes(axes)
        feats = []
        for s in range(spec.n_levels):
            r1 = spec.resolutions[s] + 1
            e00 = (spec.offsets[s] + cus[s][:, None] * r1
                   + cvs[s][None, :])                       # [g, g]
            wu = wus[s][:, None, None]
            wv = wvs[s][None, :, None]
            p00 = planes[e00]
            p01 = planes[e00 + 1]
            p10 = planes[e00 + r1]
            p11 = planes[e00 + r1 + 1]
            feats.append((p00 * (1 - wu) + p10 * wu) * (1 - wv)
                         + (p01 * (1 - wu) + p11 * wu) * wv)
        return jnp.stack(feats), axes

    def bwd(res, g):
        axes = res
        F = spec.n_features
        cus, cvs, wus, wvs = _project_axes(axes)
        # Outer-product cell coords / corner streams per section.
        cu = jnp.stack([jnp.broadcast_to(c[:, None], g.shape[1:3])
                        for c in cus]).reshape(spec.n_levels, -1)
        cv = jnp.stack([jnp.broadcast_to(c[None, :], g.shape[1:3])
                        for c in cvs]).reshape(spec.n_levels, -1)
        wu = jnp.stack([jnp.broadcast_to(w[:, None], g.shape[1:3])
                        for w in wus]).reshape(spec.n_levels, -1)
        wv = jnp.stack([jnp.broadcast_to(w[None, :], g.shape[1:3])
                        for w in wvs]).reshape(spec.n_levels, -1)
        gsec = g.reshape(spec.n_levels, -1, F)              # [S, g*g, F]
        w00 = (1 - wu) * (1 - wv)
        w01 = (1 - wu) * wv
        w10 = wu * (1 - wv)
        w11 = wu * wv
        streams = []
        for w in (w00, w01, w10, w11):
            for f in range(F):
                streams.append(gsec[..., f] * w)
        dplanes = cell_scatter_grad(spec, cu, cv, streams, interpret)
        return dplanes, jnp.zeros_like(axes)

    grid_feats.defvjp(fwd, bwd)
    return grid_feats


# ---------------------------------------------------------------------------
# Per-section plane features with the quad fast path (custom VJP)
# ---------------------------------------------------------------------------

def make_plane_sections_quad(spec: TP.TriPlaneSpec,
                             compute_dtype=jnp.bfloat16,
                             interpret: bool = False):
    """plane_sections(planes, x) -> [F, S, N]; forward = 1 quad-row
    gather per (point, section), backward = 1 full-width cell-row RMW
    per (point, section) + vector-math dx on the saved corner features.
    Half the serial gather AND scatter issues of the pair path."""

    @jax.custom_vjp
    def plane_sections(planes, x):
        out, _ = fwd(planes, x)
        return out

    def fwd(planes, x):
        storage = pack_uv_storage(spec, planes, compute_dtype)
        cu, cv, wu, wv = _cell_project(spec, x)
        p00, p01, p10, p11 = gather_quads(spec, storage, cu, cv, x.dtype)
        featv0 = p00 * (1 - wv) + p01 * wv           # u0, v-interp
        featv1 = p10 * (1 - wv) + p11 * wv
        feats = featv0 * (1 - wu) + featv1 * wu      # [F, S, N]
        return feats, (x, cu, cv,
                       p00.astype(compute_dtype), p01.astype(compute_dtype),
                       p10.astype(compute_dtype), p11.astype(compute_dtype))

    def bwd(res, g):
        x, cu, cv, p00c, p01c, p10c, p11c = res
        p00 = p00c.astype(x.dtype)
        p01 = p01c.astype(x.dtype)
        p10 = p10c.astype(x.dtype)
        p11 = p11c.astype(x.dtype)
        n = x.shape[0]
        F = spec.n_features
        _, _, wu, wv = _cell_project(spec, x)
        gs = g                                        # [F, S, N]

        featv0 = p00 * (1 - wv) + p01 * wv
        featv1 = p10 * (1 - wv) + p11 * wv
        res_f = jnp.array(spec.resolutions, dtype=x.dtype)[:, None]
        du = jnp.sum(gs * (featv1 - featv0), axis=0) * res_f     # [S, N]
        dv = jnp.sum(gs * ((p01 - p00) * (1 - wu)
                           + (p11 - p10) * wu), axis=0) * res_f
        dx = jnp.zeros((3, n), x.dtype)
        for s_mod in range(3):
            a, b = TP._PLANES[s_mod]
            dx = dx.at[a].add(jnp.sum(du[s_mod::3], axis=0))
            dx = dx.at[b].add(jnp.sum(dv[s_mod::3], axis=0))
        dx = dx.T * ((x >= 0.0) & (x <= 1.0)).astype(x.dtype)

        dplanes = quad_table_grad(spec, cu, cv, wu, wv, gs, interpret)
        return dplanes, dx

    plane_sections.defvjp(fwd, bwd)
    return plane_sections
