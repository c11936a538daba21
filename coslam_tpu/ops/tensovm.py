"""TensoVM encoding — TensoRF-style vector-matrix factorization, the
TPU-first successor to TriPlaneHybrid (`grid.enc: TensoVM`).

Why it exists: additive tri-planes leak projected features into
unobserved space (a plane feature at (x, y) affects EVERY z in that
column), which TriPlaneHybrid fixed with a dense TRUE-3D coarse pyramid
— at the cost of 12 extra gather rows + 12 extra pair-RMW scatter issues
per point (the dense base is ~1/3 of the BA cycle's serial-issue
budget). The VM decomposition (TensoRF, arXiv 2203.09517) removes the
ambiguity *multiplicatively* instead:

    feature_l(x) = sum over planes p of
        bilinear(P_{l,p}, u, v) * linear(V_{l,p}, w)      (per channel)

where V_{l,p} is a 1-D line factor along the axis the plane discards.
A feature in plane column (x, y) now only appears at depths z where the
line factor is non-zero — the same disambiguation the dense base bought,
with parameters O(r) instead of O(r^3).

The TPU trick that makes the lines ~free: line tables are tiny
(<= r+1 <= 257 rows), so both their evaluation and their gradients run
as SKINNY MXU MATMULS with the two-hot interpolation matrix

    A[n, j] = max(0, 1 - |w_n * r - j|)                   [N, r+1]

constructed on the fly from a broadcasted iota — a cheap elementwise
producer XLA fuses into the dot operand, so A never exists in HBM.
Forward = A @ V, dV = A^T @ g, dw = (dA/dw @ V) . g — three fused
matmuls, ZERO serial gather/scatter issues. (Serial RMW issues are the
hard budget on TPU: ~173M pair-updates/s on the scalar core, measured
in tools/microbench.py; the MXU runs these matmuls in ~1 ms/cycle.)

Per (point, level): 6 gather rows + 6 pair-RMWs (planes only) vs the
hybrid's ~9 + 9 including its dense base — and the scatter accumulator
passes for the 3 dense levels disappear entirely.

Initialization: planes ~ U(-1e-4, 1e-4) (tiny-cuda-nn convention),
lines = 1. At init the encoding therefore equals the additive TriPlane
exactly, and the lines learn to gate features along the third axis.

Storage duck-types ops/triplane.TriPlaneSpec for the plane part so the
packed pair gather/scatter kernels in ops/hash_packed.py are shared
unchanged. Reference surface parity: this is an additional encoder
behind the same `make_encoder` factory that mirrors the reference's
get_encoder (reference model/encodings.py:6-97); no reference
counterpart exists (the reference's only parametric encoder is the CUDA
hash grid).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import hash_packed as HP
from . import triplane as TP

# Line axis per plane: the coordinate axis plane (u, v) discards.
_LINE_AXES = (2, 1, 0)   # planes (0,1), (0,2), (1,2)


def make_tensovm_spec(desired_resolution: int, n_levels: int = 4,
                      n_features: int = 2,
                      base_resolution: int = 32) -> TP.TriPlaneSpec:
    """The plane layout IS a TriPlaneSpec; line tables derive their
    layout from spec.resolutions (one (r+1)-row table per section)."""
    return TP.make_triplane_spec(desired_resolution, n_levels=n_levels,
                                 n_features=n_features,
                                 base_resolution=base_resolution)


def line_total_rows(spec: TP.TriPlaneSpec) -> int:
    return sum(r + 1 for r in spec.resolutions)


def init_tensovm(key, spec: TP.TriPlaneSpec, dtype=jnp.float32):
    """{'planes': U(-1e-4, 1e-4) [Tp, F], 'lines': ones [Tl, F]}."""
    return {
        "planes": TP.init_triplane(key, spec, dtype),
        "lines": jnp.ones((line_total_rows(spec), spec.n_features), dtype),
    }


def _pad_line_tables(spec: TP.TriPlaneSpec, lines: jnp.ndarray):
    """Flat [Tl, F] -> padded [S, r1max, F] (zeros beyond each level's
    r+1 rows; padded rows are never addressed by in-range hats)."""
    r1max = max(spec.resolutions) + 1
    parts = []
    off = 0
    for lvl in range(spec.pyr_levels):
        r1 = spec.resolutions[3 * lvl] + 1
        blk = lines[off:off + 3 * r1].reshape(3, r1, -1)
        parts.append(jnp.pad(blk, ((0, 0), (0, r1max - r1), (0, 0))))
        off += 3 * r1
    return jnp.concatenate(parts, axis=0)                     # [S, r1max, F]


def _unpad_line_grads(spec: TP.TriPlaneSpec, dpad: jnp.ndarray):
    """[S, r1max, F] -> flat [Tl, F]."""
    parts = []
    for lvl in range(spec.pyr_levels):
        r1 = spec.resolutions[3 * lvl] + 1
        parts.append(dpad[3 * lvl:3 * lvl + 3, :r1].reshape(3 * r1, -1))
    return jnp.concatenate(parts, axis=0)


def _line_coords(spec: TP.TriPlaneSpec, x: jnp.ndarray) -> jnp.ndarray:
    """x [N, 3] -> all-section scaled line coordinates [S, N]."""
    xt = jnp.clip(x, 0.0, 1.0).T                              # [3, N]
    axes = jnp.array([_LINE_AXES[s % 3] for s in range(spec.n_levels)])
    res = jnp.array(spec.resolutions, dtype=x.dtype)[:, None]
    return xt[axes] * res                                     # [S, N]


def _two_hot(w: jnp.ndarray, r1: int, dtype) -> jnp.ndarray:
    """Fused-producer interpolation matrix: [.., N] -> [.., N, r1]."""
    j = jnp.arange(r1, dtype=w.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(w[..., None] - j)).astype(dtype)


def _dtwo_hot(w: jnp.ndarray, r1: int, dtype) -> jnp.ndarray:
    """d two_hot / d w (a.e.): -sign(w - j) on the hat support."""
    j = jnp.arange(r1, dtype=w.dtype)
    d = w[..., None] - j
    return jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0).astype(dtype)


def _batched_dot(a, b):
    """[S, N, K] @ [S, K, F] -> [S, N, F] (f32 accumulation on MXU)."""
    return jax.lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def make_line_eval(spec: TP.TriPlaneSpec, compute_dtype=jnp.bfloat16):
    """line_eval(lines, x) -> [F, S, N] line-factor values.

    ONE batched dot per direction over all S sections at once (measured:
    a 12-section batched dot runs at ~0.36 ms/section-of-524k-points vs
    ~4.2 ms for an XLA gather — per-section dots are overhead-bound, the
    batch amortizes it). Custom VJP so no direction materializes an
    [N, r1] cotangent: dlines is the transposed two-hot matmul, dx goes
    through the hat derivative — all with fused on-the-fly operands.
    """
    r1max = max(spec.resolutions) + 1

    @jax.custom_vjp
    def line_eval(lines, x):
        ws = _line_coords(spec, x)                            # [S, N]
        tabs = _pad_line_tables(spec, lines).astype(compute_dtype)
        a = _two_hot(ws, r1max, compute_dtype)                # [S, N, r1max]
        f = _batched_dot(a, tabs)                             # [S, N, F]
        return f.astype(x.dtype).transpose(2, 0, 1)           # [F, S, N]

    def fwd(lines, x):
        return line_eval(lines, x), (lines, x)

    def bwd(res, g):
        lines, x = res
        ws = _line_coords(spec, x)
        tabs = _pad_line_tables(spec, lines).astype(compute_dtype)
        gs = g.transpose(1, 2, 0)                             # [S, N, F]
        gc = gs.astype(compute_dtype)

        # dV = A^T @ g : [S, r1max, N] @ [S, N, F]
        a = _two_hot(ws, r1max, compute_dtype)
        dpad = jax.lax.dot_general(a, gc, (((1,), (1,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)
        dlines = _unpad_line_grads(spec, dpad).astype(lines.dtype)

        # dw = sum_f (dA/dw @ V) * g, scaled by d w / d x = res.
        da = _dtwo_hot(ws, r1max, compute_dtype)
        dv_dw = _batched_dot(da, tabs).astype(x.dtype)        # [S, N, F]
        res_f = jnp.array(spec.resolutions, dtype=x.dtype)[:, None]
        dw = jnp.sum(dv_dw * gs, axis=-1) * res_f             # [S, N]
        dx = jnp.zeros((3, x.shape[0]), x.dtype)
        for s_mod in range(3):
            dx = dx.at[_LINE_AXES[s_mod]].add(
                jnp.sum(dw[s_mod::3], axis=0))
        dx = dx.T * ((x >= 0.0) & (x <= 1.0)).astype(x.dtype)
        return dlines, dx

    line_eval.defvjp(fwd, bwd)
    return line_eval


def line_eval_fwd_only(spec: TP.TriPlaneSpec, lines: jnp.ndarray,
                       x: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA gather-based oracle (CPU path / tests); autodiffable."""
    xt = jnp.clip(x, 0.0, 1.0).T
    n = x.shape[0]
    feats = []
    off = 0
    for lvl in range(spec.pyr_levels):
        r = spec.resolutions[3 * lvl]
        r1 = r + 1
        tab = lines[off:off + 3 * r1].reshape(3, r1, -1)
        w = xt[jnp.array(_LINE_AXES)] * jnp.asarray(r, x.dtype)   # [3, N]
        i0 = jnp.clip(jnp.floor(w).astype(jnp.int32), 0, r - 1)
        f = w - i0.astype(x.dtype)
        p0 = jnp.take_along_axis(tab, i0[:, :, None], axis=1)
        p1 = jnp.take_along_axis(tab, (i0 + 1)[:, :, None], axis=1)
        feats.append(p0 * (1 - f)[:, :, None] + p1 * f[:, :, None])
        off += 3 * r1
    f = jnp.stack(feats, axis=0)                              # [L, 3, N, F]
    return f.transpose(3, 0, 1, 2).reshape(spec.n_features,
                                           spec.n_levels, n)


# ---------------------------------------------------------------------------
# Plane sections: per-section bilinear features with pair-RMW backward
# ---------------------------------------------------------------------------

def make_plane_sections(spec: TP.TriPlaneSpec, compute_dtype=jnp.bfloat16,
                        interpret: bool = False):
    """plane_sections(planes, x) -> [F, S, N] per-section bilinear
    features (no cross-plane sum — the VM product needs them separately).
    Forward/backward reuse the packed pair gather / pair-RMW scatter
    machinery of ops/hash_packed.py via the TriPlaneSpec duck-typing."""

    @jax.custom_vjp
    def plane_sections(planes, x):
        out, _ = fwd(planes, x)
        return out

    def fwd(planes, x):
        storage = HP.pack_storage(spec, planes, compute_dtype)
        e, wu, wv = TP._project(spec, x)
        rows, offs = HP._rows_offs(spec, e)
        p0, p1 = HP._gather_pairs(spec, storage, rows, offs, x.dtype)
        featv = p0 * (1.0 - wv)[None, :, None] + p1 * wv[None, :, None]
        feats = jnp.sum(featv * wu[None], axis=2)             # [F, S, N]
        return feats, (x, e, p0.astype(compute_dtype),
                       p1.astype(compute_dtype))

    def bwd(res, g):
        x, e, p0c, p1c = res
        p0 = p0c.astype(x.dtype)
        p1 = p1c.astype(x.dtype)
        n = x.shape[0]
        F = spec.n_features
        _, wu, wv = TP._project(spec, x)
        gs = g.reshape(F, spec.n_levels, n)                   # [F, S, N]

        featv = p0 * (1 - wv)[None, :, None] + p1 * wv[None, :, None]
        diffv = p1 - p0

        dwu = jnp.sum(featv * gs[:, :, None], axis=0)         # [S, 2, N]
        dwv = jnp.sum(jnp.sum(diffv * gs[:, :, None], axis=0) * wu, axis=1)
        res_f = jnp.array(spec.resolutions, dtype=x.dtype)[:, None]
        du = (dwu[:, 1] - dwu[:, 0]) * res_f
        dv = dwv * res_f
        dx = jnp.zeros((3, n), x.dtype)
        for s_mod in range(3):
            a, b = TP._PLANES[s_mod]
            dx = dx.at[a].add(jnp.sum(du[s_mod::3], axis=0))
            dx = dx.at[b].add(jnp.sum(dv[s_mod::3], axis=0))
        dx = dx.T * ((x >= 0.0) & (x <= 1.0)).astype(x.dtype)

        gw = gs[:, :, None] * wu[None]                        # [F, S, 2, N]
        v0 = gw * (1 - wv)[None, :, None]
        v1 = gw * wv[None, :, None]
        streams = tuple(v0[f] for f in range(F)) + tuple(
            v1[f] for f in range(F))
        dplanes = HP._scatter_table_grad(spec, e, streams, interpret)
        return dplanes, dx

    plane_sections.defvjp(fwd, bwd)
    return plane_sections


def plane_sections_fwd_only(spec: TP.TriPlaneSpec, planes: jnp.ndarray,
                            x: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA per-section plane features [F, S, N] (oracle/CPU)."""
    e, wu, wv = TP._project(spec, x)
    p0 = jnp.moveaxis(planes[e].astype(x.dtype), -1, 0)       # [F, S, 2, N]
    p1 = jnp.moveaxis(planes[e + 1].astype(x.dtype), -1, 0)
    featv = p0 * (1.0 - wv)[None, :, None] + p1 * wv[None, :, None]
    return jnp.sum(featv * wu[None], axis=2)


# ---------------------------------------------------------------------------
# The VM encoder
# ---------------------------------------------------------------------------

def _vm_combine(spec: TP.TriPlaneSpec, plane_f: jnp.ndarray,
                line_f: jnp.ndarray) -> jnp.ndarray:
    """[F, S, N] x [F, S, N] -> [N, L*F]: product per section, planes of
    a level summed, levels concatenated. Plain autodiff (cotangents are
    [F, S, N] — small)."""
    prod = plane_f * line_f
    F, S, n = prod.shape
    per_level = prod.reshape(F, spec.pyr_levels, 3, n).sum(axis=2)
    return per_level.transpose(2, 1, 0).reshape(n, -1)


def make_tensovm_encode(spec: TP.TriPlaneSpec, compute_dtype=jnp.bfloat16,
                        interpret: bool = False, plane_impl: str = "quad"):
    """encode(params, x) -> [N, L*F] with params = {'planes', 'lines'}.

    plane_impl: 'quad' (default) — 1 gather row + 1 [2, 2F] block RMW
    per (point, section) via ops/plane_quad.py (~2x the pair path's
    serial-issue budget); 'pair' — the hash_packed pair machinery
    (reference implementation / comparison baseline)."""
    if plane_impl == "quad":
        from . import plane_quad as PQ
        planes_fn = PQ.make_plane_sections_quad(spec, compute_dtype,
                                                interpret)
    else:
        planes_fn = make_plane_sections(spec, compute_dtype, interpret)
    lines_fn = make_line_eval(spec, compute_dtype)

    def encode(params, x):
        return _vm_combine(spec, planes_fn(params["planes"], x),
                           lines_fn(params["lines"], x))

    return encode


def tensovm_encode_fwd_only(spec: TP.TriPlaneSpec, params,
                            x: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA oracle (CPU path; table grads via XLA autodiff)."""
    return _vm_combine(spec, plane_sections_fwd_only(spec, params["planes"], x),
                       line_eval_fwd_only(spec, params["lines"], x))


def _lattice_line_vals(spec: TP.TriPlaneSpec, lines: jnp.ndarray,
                       axes: jnp.ndarray):
    """Per-section linear-interpolated line values on the lattice axes:
    list over S sections of [g, F] (section 3*lvl + s_mod evaluates its
    line axis _LINE_AXES[s_mod])."""
    ax = jnp.clip(axes, 0.0, 1.0)
    vals = []
    off = 0
    for lvl in range(spec.pyr_levels):
        r = spec.resolutions[3 * lvl]
        r1 = r + 1
        tab = lines[off:off + 3 * r1].reshape(3, r1, -1)
        off += 3 * r1
        for s_mod in range(3):
            w = ax[_LINE_AXES[s_mod]] * jnp.asarray(r, axes.dtype)  # [g]
            i0 = jnp.clip(jnp.floor(w).astype(jnp.int32), 0, r - 1)
            f = (w - i0)[:, None]
            vals.append(tab[s_mod][i0] * (1 - f)
                        + tab[s_mod][i0 + 1] * f)                   # [g, F]
    return vals


def _lattice_combine(spec: TP.TriPlaneSpec, pfeats, lines: jnp.ndarray,
                     axes: jnp.ndarray) -> jnp.ndarray:
    """pfeats: per-section [g, g, F] plane grids (list or stacked
    array); lines flat table; axes [3, g] -> [g, g, g, L*F]."""
    g = axes.shape[1]
    lvals = _lattice_line_vals(spec, lines, axes)
    levels = []
    for lvl in range(spec.pyr_levels):
        acc = 0.0
        for s_mod in range(3):
            lf = lvals[3 * lvl + s_mod]                             # [g, F]
            if s_mod == 0:      # xy-plane, z-line
                lv = lf[None, None, :, :]
            elif s_mod == 1:    # xz-plane, y-line
                lv = lf[None, :, None, :]
            else:               # yz-plane, x-line
                lv = lf[:, None, None, :]
            acc = acc + TP._broadcast_plane(s_mod, pfeats[3 * lvl + s_mod]) * lv
        levels.append(jnp.broadcast_to(acc, (g, g, g, spec.n_features)))
    return jnp.concatenate(levels, axis=-1)


def tensovm_lattice_encode(spec: TP.TriPlaneSpec, params,
                           axes: jnp.ndarray) -> jnp.ndarray:
    """VM encoding of a SEPARABLE lattice (axes [3, g] normalized).

    Planes are evaluated at their g^2 unique projections and lines at
    their g unique coordinates, then broadcast-multiplied to the
    [g, g, g, L*F] lattice — numerically identical to pointwise encoding
    of the meshgrid at ~g-fold fewer table accesses. Used by the BA
    smoothness term (reference coslam.py:251-274 samples a regular
    jittered grid, which is exactly such a lattice). Pure-XLA gathers
    (autodiff backward); the TPU fast path is make_tensovm_lattice."""
    return _lattice_combine(spec, TP._plane_grid_feats(spec,
                                                       params["planes"],
                                                       axes),
                            params["lines"], axes)


def make_tensovm_lattice(spec: TP.TriPlaneSpec, fast: bool = True,
                         interpret: bool = False):
    """Lattice encode factory. fast=True routes the plane-grid table
    gradient through the cell-RMW Pallas kernel (ops/plane_quad.py) —
    XLA's autodiff scatter serializes at ~130 ms per 1M updates on TPU,
    which made the lattice backward the residual smoothness cost. The
    lattice axes are treated as non-differentiable constants on the
    fast path (they are random draws, never optimized)."""
    if not fast:
        return lambda params, axes: tensovm_lattice_encode(spec, params,
                                                           axes)
    from . import plane_quad as PQ
    grid_feats = PQ.make_plane_grid_feats(spec, interpret=interpret)

    def encode(params, axes):
        return _lattice_combine(spec, grid_feats(params["planes"], axes),
                                params["lines"], axes)

    return encode


# ---------------------------------------------------------------------------
# Analytic separable TV: the smoothness term in O(g^2) instead of O(g^3)
# ---------------------------------------------------------------------------

def _tv_dir(dA, dB, C, lA, lB, dl):
    """One axis direction of the factorized TV sum.

    The axis-difference of a VM level on a separable lattice is
        d[i, m, n] = dA[i, m] * lA[n] + dB[i, n] * lB[m] + C[m, n] * dl[i]
    (i = diff axis, m/n = the other two). sum(d^2) expands into six
    terms, each a product/contraction of 2-D and 1-D sums — O(g^2)
    work, no g^3 volume. All arrays carry a trailing F axis.
    """
    t11 = jnp.einsum("imf,imf->f", dA, dA) * jnp.einsum("nf,nf->f", lA, lA)
    t22 = jnp.einsum("inf,inf->f", dB, dB) * jnp.einsum("mf,mf->f", lB, lB)
    t33 = jnp.einsum("mnf,mnf->f", C, C) * jnp.einsum("if,if->f", dl, dl)
    u = jnp.einsum("imf,mf->if", dA, lB)
    v = jnp.einsum("inf,nf->if", dB, lA)
    t12 = jnp.einsum("if,if->f", u, v)
    w = jnp.einsum("mnf,nf->mf", C, lA)
    t13 = jnp.einsum("if,imf,mf->f", dl, dA, w)
    z = jnp.einsum("mnf,mf->nf", C, lB)
    t23 = jnp.einsum("if,inf,nf->f", dl, dB, z)
    return jnp.sum(t11 + t22 + t33 + 2.0 * (t12 + t13 + t23))


def _plane_grid_twohot(spec: TP.TriPlaneSpec, planes: jnp.ndarray,
                       axes: jnp.ndarray) -> jnp.ndarray:
    """Bilinear plane grids on the separable lattice as PURE MATMULS:
    A_s = U_s @ table_s @ V_s^T with U/V the per-axis two-hot hat
    matrices ([g, r+1], fused iota producers). Numerically equal to the
    gathered bilinear grid; forward AND autodiff backward are fused MXU
    contractions — zero gathers, zero serial scatter, no Pallas. The
    right evaluation path whenever the point set is a separable lattice
    (the smoothness grid): g^2 outputs against r^2 table rows is
    matmul-shaped, not gather-shaped. Returns [S, g, g, F]."""
    ax = jnp.clip(axes, 0.0, 1.0)
    out = []
    for lvl in range(spec.pyr_levels):
        r = spec.resolutions[3 * lvl]
        r1 = r + 1
        tabs, us, vs = [], [], []
        for s_mod in range(3):
            s = 3 * lvl + s_mod
            ua, va = TP._PLANES[s_mod]
            res = jnp.asarray(r, axes.dtype)
            us.append(_two_hot(ax[ua] * res, r1, axes.dtype))   # [g, r1]
            vs.append(_two_hot(ax[va] * res, r1, axes.dtype))
            tabs.append(planes[spec.offsets[s]:spec.offsets[s]
                               + spec.sizes[s]].reshape(r1, r1, -1))
        A = jnp.einsum("sgu,suvf,shv->sghf", jnp.stack(us),
                       jnp.stack(tabs), jnp.stack(vs))
        out.append(A)
    return jnp.concatenate(out, axis=0)                         # [S, g, g, F]


def make_tensovm_lattice_tv(spec: TP.TriPlaneSpec, fast: bool = True,
                            interpret: bool = False):
    """tv(params, axes [3, g], sample_points) -> scalar; numerically
    identical to ops/losses.smoothness_tv over the lattice encode, but
    computed from the factorization directly: per (level, direction)
    six O(g^2) contractions of the plane grids and line values. The
    g^3 feature volume (and its backward) never exists, and the plane
    grids come from the two-hot matmul form — the whole term is a
    handful of fused MXU contractions (no gathers, no Pallas; `fast`/
    `interpret` kept for signature compatibility, the path is identical
    on every backend).

    Level feature on the lattice: F = A0[i,j] b0[k] + A1[i,k] b1[j]
    + A2[j,k] b2[i] (sections 3l+0/1/2 with lines along z/y/x,
    reference smoothness semantics coslam.py:251-274)."""
    del fast, interpret

    def tv(params, axes, sample_points):
        pf = _plane_grid_twohot(spec, params["planes"], axes)  # [S,g,g,F]
        lv = _lattice_line_vals(spec, params["lines"], axes)
        total = 0.0
        for lvl in range(spec.pyr_levels):
            A0, A1, A2 = pf[3 * lvl], pf[3 * lvl + 1], pf[3 * lvl + 2]
            b0, b1, b2 = (lv[3 * lvl], lv[3 * lvl + 1], lv[3 * lvl + 2])
            dx0 = A0[1:] - A0[:-1]                       # d/di [g-1, j, F]
            dx1 = A1[1:] - A1[:-1]                       # d/di [g-1, k, F]
            dy0 = (A0[:, 1:] - A0[:, :-1]).transpose(1, 0, 2)  # [g-1(j), i, F]
            dy2 = A2[1:] - A2[:-1]                       # d/dj [g-1, k, F]
            dz1 = (A1[:, 1:] - A1[:, :-1]).transpose(1, 0, 2)  # [g-1(k), i, F]
            dz2 = (A2[:, 1:] - A2[:, :-1]).transpose(1, 0, 2)  # [g-1(k), j, F]
            total = total + _tv_dir(dx0, dx1, A2, b0, b1, b2[1:] - b2[:-1])
            total = total + _tv_dir(dy0, dy2, A1, b0, b2, b1[1:] - b1[:-1])
            total = total + _tv_dir(dz1, dz2, A0, b1, b2, b0[1:] - b0[:-1])
        return total / (sample_points ** 3)

    return tv
