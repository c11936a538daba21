"""Packed z-linear multiresolution hash encoding — the TPU fast path.

TPU-native replacement for tiny-cuda-nn's HashGrid (reference
model/encodings.py:16-55) designed around two measured hardware facts of
TPU gathers and scatters (see tools/microbench.py):

1. XLA gathers are ISSUE-bound (~250M rows/s) regardless of row width up
   to ~64 B — fetching 16 values per index costs the same as fetching 2.
2. TPUs have no atomic scatter; a serial Pallas read-modify-write runs at
   ~140M ops/s independent of operand width — one (2, F) update costs the
   same as one (1, F) update.

Both facts reward making the two z-corners of every interpolation cell
ADJACENT table rows. We therefore replace Instant-NGP's 3-prime XOR hash
with a z-linear hash

    index(x, y, z) = ((x * P1) ^ (y * P2)) & (2**S - 1) + z

(dense levels are z-minor, hence already z-linear). Each cell's corner
pair (z, z+1) is then one contiguous row pair, so:

- forward gathers fetch an 8-entry z-window per (point, level,
  xy-corner): 4 wide gathers instead of 8 narrow ones;
- the table-gradient kernel applies one [1, 2F] pair-row
  read-modify-write per (point, level, xy-corner): half the
  serial-scatter issues, with the update row READ AS A VECTOR from a
  VMEM value matrix (ops/serial_scatter.py) and the z+1 offset
  resolved by one shifted add per level outside the kernel.

DENSE levels (the coarse prefix, where the full (res+1)^3 cube fits
the hash budget) skip the z-window machinery entirely: a cell-layout
storage gives ONE 8F-value gather row and ONE [1, 8F] cell-row RMW per
(point, level) — 4x fewer serial issues each way than the xy-corner
pair path (see "Dense-level cell path" below).

The z-window storage uses overlapping windows of 8 entries with stride 7
(window r holds logical entries 7r..7r+7), so every pair (e, e+1) lies
fully inside window floor(e/7). The overlap column is derived data —
parameters and gradients live in the flat "logical" table; the packed
[8F, R] bf16 mirror is rebuilt inside the forward pass (cheap reshapes).

Hash-collision quality: the z-linear hash distributes as uniformly as the
XOR hash for the access patterns here (two cells collide iff their
(x, y)-hashes differ by exactly their z difference, probability 1/2**S,
same as XOR); columns of cells map to contiguous rows, which additionally
improves gather locality. Validated end-to-end by tools/quality_bench.py.

Hashed levels address 2**S + res + 1 logical rows (the + z overflow);
this adds <1% parameters over the reference's 2**S budget and is
documented in DOCUMENTATION.md.
"""

from __future__ import annotations

import os
import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Instant-NGP spatial-hash primes, used for the x/y axes.
_P1 = 2654435761
_P2 = 805459861

_WINDOW = 8   # z-entries per packed storage row
_STRIDE = 7   # logical stride between windows (overlap 1)

# Serial-scatter chunk: 8192 updates/grid step measured fastest.
_CHUNK = 8192
_UNROLL = 8


@dataclass(frozen=True)
class PackedGridSpec:
    """Static layout of a packed z-linear multiresolution grid."""

    n_levels: int
    n_features: int
    base_resolution: int
    log2_hashmap_size: int
    desired_resolution: int
    resolutions: Tuple[int, ...]      # per-level grid resolution
    hashed: Tuple[bool, ...]          # per-level dense vs hashed
    offsets: Tuple[int, ...]          # per-level start row in logical table
    sizes: Tuple[int, ...]            # per-level logical rows
    row_offsets: Tuple[int, ...]      # per-level start row in packed storage
    n_rows: Tuple[int, ...]           # per-level packed rows
    total_entries: int                # logical rows total
    total_rows: int                   # packed rows total

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def make_packed_spec(desired_resolution: int, log2_hashmap_size: int = 19,
                     n_levels: int = 16, n_features: int = 2,
                     base_resolution: int = 16,
                     dense_only: bool = False) -> PackedGridSpec:
    """per_level_scale = exp2(log2(desired/base)/(L-1)), identical to the
    reference (model/encodings.py:33); a level stores densely when its
    full (res+1)^3 grid fits the 2**S hash budget."""
    if n_levels > 1:
        growth = math.exp2(
            math.log2(desired_resolution / base_resolution) / (n_levels - 1))
    else:
        growth = 1.0
    max_hash = 2 ** log2_hashmap_size

    resolutions, hashed, offsets, sizes, row_offsets, n_rows = \
        [], [], [], [], [], []
    off = row_off = 0
    for lvl in range(n_levels):
        res = max(int(math.floor(base_resolution * growth ** lvl)), 1)
        n_dense = (res + 1) ** 3
        use_hash = (not dense_only) and (n_dense > max_hash)
        # Hashed levels need +res+1 rows so base + z never wraps.
        size = (max_hash + res + 1) if use_hash else n_dense
        rows = (size - 2) // _STRIDE + 1  # windows covering pairs (e, e+1)
        resolutions.append(res)
        hashed.append(use_hash)
        offsets.append(off)
        sizes.append(size)
        row_offsets.append(row_off)
        n_rows.append(rows)
        off += size
        row_off += rows

    return PackedGridSpec(
        n_levels=n_levels, n_features=n_features,
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        desired_resolution=desired_resolution,
        resolutions=tuple(resolutions), hashed=tuple(hashed),
        offsets=tuple(offsets), sizes=tuple(sizes),
        row_offsets=tuple(row_offsets), n_rows=tuple(n_rows),
        total_entries=off, total_rows=row_off)


def init_packed(key, spec: PackedGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) logical-table init (tiny-cuda-nn default)."""
    return jax.random.uniform(key, (spec.total_entries, spec.n_features),
                              dtype=dtype, minval=-1e-4, maxval=1e-4)


# ---------------------------------------------------------------------------
# Packing: logical [T, F] -> storage [WINDOW*F, R] (features minor per entry)
# ---------------------------------------------------------------------------

def pack_storage(spec: PackedGridSpec, table: jnp.ndarray,
                 dtype=jnp.bfloat16) -> jnp.ndarray:
    """Build the transposed packed mirror for lane-axis gathers.

    storage[k * F + f, row_offsets[l] + r] = table[offsets[l] + 7r + k, f]
    """
    F = spec.n_features
    parts = []
    for lvl in range(spec.n_levels):
        t = table[spec.offsets[lvl]:spec.offsets[lvl] + spec.sizes[lvl]]
        rows = spec.n_rows[lvl]
        pad = rows * _STRIDE + 1 - t.shape[0]
        tp = jnp.pad(t, ((0, pad), (0, 0)))
        main = tp[:rows * _STRIDE].reshape(rows, _STRIDE, F)
        extra = tp[_STRIDE::_STRIDE][:rows].reshape(rows, 1, F)
        parts.append(jnp.concatenate([main, extra], axis=1))  # [rows, 8, F]
    st = jnp.concatenate(parts, axis=0)                       # [R, 8, F]
    return st.reshape(spec.total_rows, _WINDOW * F).T.astype(dtype)


# ---------------------------------------------------------------------------
# Index / weight computation (transpose-major: the big point axis stays minor)
# ---------------------------------------------------------------------------

def _cells_and_weights(spec: PackedGridSpec, x: jnp.ndarray):
    """x [N, 3] in [0,1] -> (cell int32 [L, 3, N], w float [L, 3, N])."""
    xt = jnp.clip(x, 0.0, 1.0).T                             # [3, N]
    res = jnp.array(spec.resolutions, dtype=x.dtype)         # [L]
    pos = res[:, None, None] * xt[None]                      # [L, 3, N]
    resi = jnp.array(spec.resolutions, jnp.int32)
    cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0,
                    resi[:, None, None] - 1)
    w = pos - cell.astype(x.dtype)                           # in [0, 1]
    return cell, w


def _corner_entries(spec: PackedGridSpec, cell: jnp.ndarray) -> jnp.ndarray:
    """Logical z-corner-0 entries for the 4 xy corners.

    cell: int32 [L, 3, N]. Returns e int32 [L, 4, N] — the logical table
    row of corner (xc, yc, z); corner (xc, yc, z+1) is always e + 1.
    """
    resi = jnp.array(spec.resolutions, jnp.int32)[:, None]   # [L, 1]
    mask = jnp.uint32(2 ** spec.log2_hashmap_size - 1)
    hashed = jnp.array(spec.hashed, dtype=bool)[:, None]
    offs = jnp.array(spec.offsets, jnp.int32)[:, None]
    r1 = resi + 1

    cx, cy, cz = cell[:, 0], cell[:, 1], cell[:, 2]          # [L, N]
    es = []
    for c in range(4):
        xc = jnp.minimum(cx + (c >> 1), resi)
        yc = jnp.minimum(cy + (c & 1), resi)
        h = ((xc.astype(jnp.uint32) * jnp.uint32(_P1))
             ^ (yc.astype(jnp.uint32) * jnp.uint32(_P2))) & mask
        dense = (xc * r1 + yc) * r1
        base = jnp.where(hashed, h.astype(jnp.int32), dense)
        es.append(base + cz)
    return jnp.stack(es, axis=1) + offs[:, None]             # [L, 4, N]


def _rows_offs(spec: PackedGridSpec, e: jnp.ndarray):
    """Logical entry [L, 4, N] -> (packed row, in-window offset)."""
    loff = jnp.array(spec.offsets, jnp.int32)[:, None, None]
    roff = jnp.array(spec.row_offsets, jnp.int32)[:, None, None]
    el = e - loff
    return el // _STRIDE + roff, el % _STRIDE


def _xy_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Trilinear xy-corner weights [L, 4, N] from w [L, 3, N]."""
    wx, wy = w[:, 0], w[:, 1]
    return jnp.stack([(1 - wx) * (1 - wy), (1 - wx) * wy,
                      wx * (1 - wy), wx * wy], axis=1)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _gather_pairs(spec: PackedGridSpec, storage: jnp.ndarray,
                  rows: jnp.ndarray, offs: jnp.ndarray, dtype):
    """Gather z-windows and select the (z, z+1) feature pair.

    storage [8F, R]; rows/offs [L, 4, N]. Returns p0, p1 [F, L, 4, N].

    The select stays in the storage dtype and is written as 8 unrolled
    masked accumulations — a reshape/astype of the full [8F, L, 4, N]
    gather block would materialize ~180 MB of f32 through HBM. (A
    row-layout variant doing the select in the gather's native [M, 8F]
    layout was measured SLOWER in situ — 69.3 vs 58.8 ms parity tracking
    megastep; the narrow [M, F] outputs relayout worse than the window
    block. See tools/bench/_bench_gather_layout.py.)
    """
    F = spec.n_features
    g = storage[:, rows]                      # [8F, L, 4, N] (bf16)
    zero = jnp.zeros((), g.dtype)
    p0 = [None] * F
    p1 = [None] * F
    for k in range(_WINDOW):
        m0 = offs == k
        m1 = offs == k - 1
        for f in range(F):
            t0 = jnp.where(m0, g[k * F + f], zero)
            t1 = jnp.where(m1, g[k * F + f], zero)
            p0[f] = t0 if p0[f] is None else p0[f] + t0
            p1[f] = t1 if p1[f] is None else p1[f] + t1
    return (jnp.stack(p0).astype(dtype), jnp.stack(p1).astype(dtype))


# Pair-select tile: rows per Pallas grid step of the fused
# select+transpose kernel (VMEM per step: TM*16*2 B in + 2*F*TM*2 B out).
_SEL_TILE = 2048


def _pair_select_kernel(n_feat: int, g_ref, offs_ref, p0_ref, p1_ref):
    """One tile: g [TM, 8F] gathered window rows (native gather layout),
    offs [TM] -> p0/p1 [F, TM] selected pair features, TRANSPOSED.

    The in-VMEM transpose happens once per tile; the 8-way z-select then
    runs at full lane width on [TM] vectors. This replaces an XLA-chosen
    62 MB HBM relayout copy of the whole window block (r4 trace:
    0.67 ms/iter, `copy.1099`) with ~0 extra HBM traffic: the kernel
    reads the gather output once and writes only the selected pairs."""
    gt = g_ref[:].astype(jnp.float32).T        # [8F, TM]
    o = offs_ref[:]                            # [TM] int32
    zero = jnp.zeros_like(gt[0])
    p0 = [zero] * n_feat
    p1 = [zero] * n_feat
    for k in range(_WINDOW):
        m0 = o == k
        m1 = o == k - 1
        for f in range(n_feat):
            row = gt[k * n_feat + f]
            if k < _STRIDE:            # offs ranges 0.._STRIDE-1
                p0[f] = p0[f] + jnp.where(m0, row, zero)
            if k > 0:
                p1[f] = p1[f] + jnp.where(m1, row, zero)
    p0_ref[:] = jnp.stack(p0).astype(p0_ref.dtype)
    p1_ref[:] = jnp.stack(p1).astype(p1_ref.dtype)


def _gather_pairs_rows(spec: PackedGridSpec, storage: jnp.ndarray,
                       rows: jnp.ndarray, offs: jnp.ndarray, dtype,
                       interpret: bool = False):
    """Row-layout gather + Pallas select (the TPU default path).

    Numerically identical to :func:`_gather_pairs` (pure selection — no
    arithmetic), but the gather output stays in its NATIVE [M, 8F] row
    layout and the z-select+transpose runs as one Pallas pass, instead
    of XLA relayouting the full window block to feature-major before an
    8-way masked select (the 0.67 ms/iter `copy.1099` in the r4 parity
    tracking trace — STATUS r4 §2)."""
    F = spec.n_features
    L4 = rows.shape[0] * rows.shape[1]
    n = rows.shape[2]
    m = L4 * n
    m_pad = -(-m // _SEL_TILE) * _SEL_TILE
    # storage is built as [...].T (pack_storage), so storage.T folds back
    # to the natural [R, 8F] row table — XLA emits the same wide-row
    # gather fusion, now without a consumer forcing a relayout.
    g = jnp.take(storage.T, rows.reshape(-1), axis=0)       # [M, 8F]
    o = offs.reshape(-1).astype(jnp.int32)
    if m_pad != m:
        g = jnp.concatenate(
            [g, jnp.zeros((m_pad - m, g.shape[1]), g.dtype)])
        o = jnp.concatenate([o, jnp.zeros((m_pad - m,), jnp.int32)])
    p0, p1 = pl.pallas_call(
        partial(_pair_select_kernel, F),
        grid=(m_pad // _SEL_TILE,),
        in_specs=[pl.BlockSpec((_SEL_TILE, _WINDOW * F), lambda i: (i, 0)),
                  pl.BlockSpec((_SEL_TILE,), lambda i: (i,))],
        out_specs=[pl.BlockSpec((F, _SEL_TILE), lambda i: (0, i)),
                   pl.BlockSpec((F, _SEL_TILE), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct((F, m_pad), dtype)] * 2,
        interpret=interpret,
    )(g, o)
    shape = (F,) + rows.shape
    return (p0[:, :m].reshape(shape), p1[:, :m].reshape(shape))


def _combine(p0, p1, wz, wxy):
    """(p0, p1) [F, L, 4, N], wz [L, N], wxy [L, 4, N] -> enc [N, L*F]."""
    featz = p0 * (1.0 - wz)[None, :, None] + p1 * wz[None, :, None]
    enc = jnp.sum(featz * wxy[None], axis=2)  # [F, L, N]
    n = enc.shape[-1]
    return enc.transpose(2, 1, 0).reshape(n, -1)


def packed_encode_fwd_only(spec: PackedGridSpec, table: jnp.ndarray,
                           x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Differentiable-by-XLA forward (reference semantics; used on CPU and
    as the numeric oracle in tests — table grads via XLA scatter)."""
    dtype = x.dtype
    cell, w = _cells_and_weights(spec, x)
    e = _corner_entries(spec, cell)
    t = table if compute_dtype is None else table.astype(compute_dtype)
    p0 = t[e].astype(dtype)                  # [L, 4, N, F]
    p1 = t[e + 1].astype(dtype)
    p0 = jnp.moveaxis(p0, -1, 0)
    p1 = jnp.moveaxis(p1, -1, 0)
    return _combine(p0, p1, w[:, 2], _xy_weights(w))


# ---------------------------------------------------------------------------
# Pair-scatter Pallas kernel (table gradient)
# ---------------------------------------------------------------------------

def _pair_scatter_kernel(chunk: int, n_feat: int, *refs):
    """refs = (idx, v00..v{1,F-1}, out). One [2, F] read-modify-write per
    update; updates stream through SMEM (1-D blocks — 2-D value layouts
    lane-pad catastrophically), the accumulator lives in VMEM."""
    idx_ref = refs[0]
    val_refs = refs[1:1 + 2 * n_feat]
    out_ref = refs[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    n_rows = out_ref.shape[0]

    def body(i, c):
        base = i * _UNROLL
        for u in range(_UNROLL):
            m = base + u
            j = idx_ref[m]  # pre-clipped in XLA by pair_scatter
            upd = jnp.array(
                [[val_refs[f][m] for f in range(n_feat)],
                 [val_refs[n_feat + f][m] for f in range(n_feat)]],
            )
            cur = out_ref[pl.ds(j, 2), :]
            out_ref[pl.ds(j, 2), :] = cur + upd
        return c

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)


def pair_scatter(idx: jnp.ndarray, val_streams, n_rows: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Deterministic pair scatter-add: out[idx[m]] += v0[m], out[idx[m]+1]
    += v1[m]. idx [M] int32; val_streams = (v00.., v10..): 2F 1-D [M]
    arrays. Returns [n_rows, F] f32; the accumulator (plus one slack row
    targeted by padding) must fit VMEM."""
    m = idx.shape[0]
    f = len(val_streams) // 2
    m_pad = -(-m // _CHUNK) * _CHUNK
    # Clip HERE (one vectorized XLA op) so the serial kernel loop issues
    # no per-update clamp; the slack row n_rows absorbs out-of-range.
    idx = jnp.clip(idx, 0, n_rows)
    if m_pad != m:
        idx = jnp.concatenate([idx, jnp.full((m_pad - m,), n_rows, jnp.int32)])
        val_streams = [jnp.concatenate([v, jnp.zeros((m_pad - m,), v.dtype)])
                       for v in val_streams]

    out = pl.pallas_call(
        partial(_pair_scatter_kernel, _CHUNK, f),
        grid=(m_pad // _CHUNK,),
        in_specs=[pl.BlockSpec((_CHUNK,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * (1 + 2 * f),
        out_specs=pl.BlockSpec((n_rows + 2, f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows + 2, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx.astype(jnp.int32),
      *[v.astype(jnp.float32) for v in val_streams])
    return out[:n_rows]


# Max logical rows per scatter-kernel group (accumulator VMEM budget).
_MAX_GROUP_ROWS = 96 * 1024


def _level_groups(spec: PackedGridSpec, l_start: int = 0):
    """Pack consecutive levels (from l_start) into row ranges fitting
    one accumulator."""
    groups = []
    lvl = l_start
    while lvl < spec.n_levels:
        start = spec.offsets[lvl]
        end = lvl + 1
        while end < spec.n_levels and (
                spec.offsets[end] + spec.sizes[end] - start <= _MAX_GROUP_ROWS):
            end += 1
        groups.append((lvl, end, start,
                       spec.offsets[end - 1] + spec.sizes[end - 1] - start))
        lvl = end
    return tuple(groups)


_INTERLEAVE_K = 64


def _stride_interleave(idx, streams, n_rows):
    """Permute the update stream by a [M/K, K] transpose so consecutive
    updates rarely target the same accumulator row.

    The serial RMW kernel is ordering-sensitive: same-row back-to-back
    updates stall its read-modify-write pipeline (measured 1.86M
    updates: random order 129M upd/s, 8-long duplicate runs 90M;
    interleaved 125M INCLUDING this permute's cost). Ray-ordered BA
    streams produce exactly those duplicate runs at coarse hash levels
    (worst under depth-concentrated recipes: the TUM importance bands).
    In-situ A/B on full BA cycles: TUM parity 11.10 -> 9.35 s,
    Replica parity 664 -> 619 ms; ON by default, opt out with
    COSLAM_SCATTER_INTERLEAVE=0. Exact modulo f32 accumulation order
    (the permutation is fixed, so runs stay deterministic)."""
    m = idx.shape[0]
    k = _INTERLEAVE_K
    m_pad = -(-m // k) * k
    if m_pad != m:
        idx = jnp.concatenate(
            [idx, jnp.full((m_pad - m,), n_rows, jnp.int32)])
        streams = [jnp.concatenate([v, jnp.zeros((m_pad - m,), v.dtype)])
                   for v in streams]

    def perm(a):
        return a.reshape(m_pad // k, k).T.reshape(-1)

    return perm(idx), [perm(v) for v in streams]


def _scatter_table_grad(spec: PackedGridSpec, e, streams, interpret,
                        l_start: int = 0):
    """e [L - l_start, 4, N] logical z0 entries for levels l_start..;
    streams: 2F arrays of the same leading shape. Scatters per level
    group with the [2, F] pair-RMW kernel; returns dtable
    [T - offsets[l_start], F] f32.

    NOTE: measured A/B (_bench_pair_ab.py) keeps the scalar-assembled
    [2, F] pair kernel here — at width 4 it runs 153M upd/s in situ vs
    123M for the [1, 2F] vector-read row form (stack relayout + per-call
    overhead exceed the small per-update win at this width). The wide
    cell paths (4F/8F rows) DO use the vector-read kernel."""
    interleave = os.environ.get("COSLAM_SCATTER_INTERLEAVE", "1") != "0"
    parts = []
    for (l0, l1, row_start, rows) in _level_groups(spec, l_start):
        idx_g = (e[l0 - l_start:l1 - l_start] - row_start).reshape(-1)
        st_g = [s[l0 - l_start:l1 - l_start].reshape(-1) for s in streams]
        if interleave:
            idx_g = jnp.clip(idx_g, 0, rows)
            idx_g, st_g = _stride_interleave(idx_g, st_g, rows)
        if rows <= _MAX_GROUP_ROWS:
            parts.append(pair_scatter(idx_g, st_g, rows, interpret=interpret))
        else:
            # A single level exceeding the VMEM accumulator (hash_size >=
            # 18): multi-pass over row ranges overlapping by one row (a
            # pair on the seam contributes its second row to the next
            # pass's first row); out-of-range updates go to the slack row.
            total = jnp.zeros((rows, len(st_g) // 2), jnp.float32)
            start = 0
            while start < rows - 1:
                size = min(_MAX_GROUP_ROWS, rows - start)
                local = idx_g - start
                in_r = (local >= 0) & (local <= size - 2)
                local = jnp.where(in_r, local, size)
                part = pair_scatter(local, st_g, size, interpret=interpret)
                total = total.at[start:start + size].add(part)
                start += size - 1
            parts.append(total)
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# Dense-level cell path: ONE gather row / ONE cell-row RMW per (point, level)
# ---------------------------------------------------------------------------
#
# Dense levels form a PREFIX of the level list (hashed-ness is monotone
# in resolution), and their full (r+1)^3 cube is materializable, so the
# z-window machinery above is overkill for them: pack each trilinear
# cell's complete 2x2x2xF corner patch into its own storage row
# (lane k*F+f, k = 4*xbit + 2*ybit + zbit). Then the forward needs ONE
# 16F-value row gather per (point, dense level) — no in-window select
# at all — and the table gradient ONE full-width cell-row RMW
# (ops/serial_scatter.py), 4x fewer serial issues each way than the 4
# xy-corner pair operations. Corner overlap between neighboring cells
# is resolved outside the kernel by 8 vectorized shifted adds.

def _n_dense(spec: PackedGridSpec) -> int:
    n = 0
    for h in spec.hashed:
        if h:
            break
        n += 1
    return n


def _cell_layout(spec: PackedGridSpec, nd: int):
    """Per-dense-level cell-row offsets + total cell rows."""
    offs, tot = [], 0
    for l in range(nd):
        offs.append(tot)
        tot += spec.resolutions[l] ** 3
    return tuple(offs), tot


def pack_cell_storage(spec: PackedGridSpec, table: jnp.ndarray, nd: int,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """[T, F] logical -> [8F, total_cells] transposed cell storage for
    the dense prefix: column (cell_off[l] + (cx*r + cy)*r + cz) holds
    the cell's 8 corner features, lane (4a + 2b + c)*F + f =
    cube[cx+a, cy+b, cz+c, f]."""
    F = spec.n_features
    parts = []
    for l in range(nd):
        r = spec.resolutions[l]
        r1 = r + 1
        cube = table[spec.offsets[l]:spec.offsets[l] + r1 ** 3]
        cube = cube.reshape(r1, r1, r1, F)
        corners = [cube[a:a + r, b:b + r, c:c + r].reshape(r ** 3, F)
                   for a in (0, 1) for b in (0, 1) for c in (0, 1)]
        parts.append(jnp.concatenate(corners, axis=-1))       # [r^3, 8F]
    return jnp.concatenate(parts, axis=0).T.astype(dtype)


def _cell_rows(spec: PackedGridSpec, cell: jnp.ndarray, nd: int):
    """cell [L, 3, N] -> dense cell-storage rows [nd, N]."""
    coffs, _ = _cell_layout(spec, nd)
    rows = []
    for l in range(nd):
        r = spec.resolutions[l]
        cx, cy, cz = cell[l, 0], cell[l, 1], cell[l, 2]
        rows.append(coffs[l] + (cx * r + cy) * r + cz)
    return jnp.stack(rows)


def _gather_cells(spec: PackedGridSpec, cstorage: jnp.ndarray,
                  crows: jnp.ndarray, dtype):
    """One row gather per (point, dense level) -> p0, p1 [F, nd, 4, N]
    (xy-corner order matching _xy_weights, z = 0/1)."""
    F = spec.n_features
    g = cstorage[:, crows]                        # [8F, nd, N]
    p0 = jnp.stack([jnp.stack([g[(xy * 2) * F + f] for xy in range(4)],
                              axis=1) for f in range(F)])
    p1 = jnp.stack([jnp.stack([g[(xy * 2 + 1) * F + f] for xy in range(4)],
                              axis=1) for f in range(F)])
    return p0.astype(dtype), p1.astype(dtype)


def _cell_groups3d(spec: PackedGridSpec, nd: int):
    """Group consecutive dense levels so each group's r^3 cell rows fit
    one accumulator pass."""
    from .serial_scatter import MAX_ROWS
    groups = []
    l = 0
    while l < nd:
        rows = spec.resolutions[l] ** 3
        e = l + 1
        while e < nd and rows + spec.resolutions[e] ** 3 <= MAX_ROWS:
            rows += spec.resolutions[e] ** 3
            e += 1
        groups.append((l, e, rows))
        l = e
    return tuple(groups)


def _cell_table_grad(spec: PackedGridSpec, crows: jnp.ndarray, streams,
                     nd: int, interpret: bool) -> jnp.ndarray:
    """crows [nd, N] cell-storage rows; streams: 8F arrays [nd, N] in
    lane order (k*F + f). Returns dtable rows for the dense prefix
    [offsets[nd], F] f32."""
    from .serial_scatter import MAX_ROWS, row_accum, row_accum_mat
    F = spec.n_features
    coffs, _ = _cell_layout(spec, nd)
    parts = []
    for (l0, l1, rows) in _cell_groups3d(spec, nd):
        idx = (crows[l0:l1] - coffs[l0]).reshape(-1)
        st = [s[l0:l1].reshape(-1) for s in streams]
        if rows <= MAX_ROWS:
            acc = row_accum(idx, st, rows, interpret)
        else:
            # One dense level can exceed the VMEM accumulator (hash_size
            # >= 18 lets dense r grow to 63 -> 250k cell rows): disjoint
            # multi-pass, same as the hashed branch.
            vals = jnp.stack(st, axis=-1)
            acc = jnp.zeros((rows + 1, len(st)), jnp.float32)
            start = 0
            while start < rows:
                size = min(MAX_ROWS, rows - start)
                local = idx - start
                local = jnp.where((local >= 0) & (local < size), local,
                                  size)
                part = row_accum_mat(local, vals, size, interpret)[:size]
                acc = acc.at[start:start + size].add(part)
                start += size
        base = 0
        for l in range(l0, l1):
            r = spec.resolutions[l]
            r1 = r + 1
            cellacc = acc[base:base + r ** 3].reshape(r, r, r, 8, F)
            base += r ** 3
            d = jnp.zeros((r1, r1, r1, F), jnp.float32)
            k = 0
            for a in (0, 1):
                for b in (0, 1):
                    for c in (0, 1):
                        d = d.at[a:a + r, b:b + r, c:c + r].add(
                            cellacc[:, :, :, k, :])
                        k += 1
            parts.append(d.reshape(r1 ** 3, F))
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# The encoder: custom VJP around gather-fused forward + pair-scatter bwd
# ---------------------------------------------------------------------------

def make_packed_encode_frozen(spec: PackedGridSpec,
                              compute_dtype=jnp.bfloat16,
                              cell_dense: bool = True):
    """Frozen-table encode: (prepack, encode) for callers that never
    differentiate the TABLE — per-frame tracking, whose megastep runs
    10 scan iterations against CONSTANT params (reference
    coslam.py:502-594 likewise freezes the map during tracking).

    The stock :func:`make_packed_encode` rebuilds the packed bf16
    mirrors from the logical table inside every forward call; under
    `lax.scan` XLA does not hoist that loop-invariant chain, which the
    r4 parity-tracking trace priced at ~0.27 ms/iter (pack_storage
    reshape/copy fusions, hash_packed.py:161-173). Here ``prepack``
    builds the mirrors ONCE per megastep (outside the scan) and
    ``encode(packed, x)`` reuses them; gather/select/combine and the dx
    backward are the identical ops, so outputs are bit-equal. The
    table cotangent is structurally zero (the caller never asks for
    it)."""
    nd = _n_dense(spec) if cell_dense else 0
    nh = spec.n_levels - nd

    def prepack(table):
        packed = {}
        if nd:
            packed["cell"] = pack_cell_storage(spec, table, nd,
                                               compute_dtype)
        if nh:
            packed["win"] = pack_storage(spec, table, compute_dtype)
        return packed

    def _forward(packed, x):
        cell, w = _cells_and_weights(spec, x)
        parts0, parts1 = [], []
        if nd:
            crows = _cell_rows(spec, cell, nd)
            p0d, p1d = _gather_cells(spec, packed["cell"], crows, x.dtype)
            parts0.append(p0d)
            parts1.append(p1d)
        if nh:
            e = _corner_entries(spec, cell)
            rows, offs = _rows_offs(spec, e)
            p0h, p1h = _gather_pairs(spec, packed["win"], rows[nd:],
                                     offs[nd:], x.dtype)
            parts0.append(p0h)
            parts1.append(p1h)
        p0 = parts0[0] if len(parts0) == 1 else jnp.concatenate(parts0, 1)
        p1 = parts1[0] if len(parts1) == 1 else jnp.concatenate(parts1, 1)
        return _combine(p0, p1, w[:, 2], _xy_weights(w)), (p0, p1)

    @jax.custom_vjp
    def encode(packed, x):
        return _forward(packed, x)[0]

    def fwd(packed, x):
        out, (p0, p1) = _forward(packed, x)
        return out, (packed, x, p0.astype(compute_dtype),
                     p1.astype(compute_dtype))

    def bwd(res, g):
        packed, x, p0c, p1c = res
        p0 = p0c.astype(x.dtype)
        p1 = p1c.astype(x.dtype)
        n = x.shape[0]
        L, F = spec.n_levels, spec.n_features
        cell, w = _cells_and_weights(spec, x)
        wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
        wxy = _xy_weights(w)
        gl = g.reshape(n, L, F).transpose(2, 1, 0)
        featz = p0 * (1 - wz)[None, :, None] + p1 * wz[None, :, None]
        diffz = p1 - p0
        dwxy = jnp.sum(featz * gl[:, :, None], axis=0)
        dwz = jnp.sum(jnp.sum(diffz * gl[:, :, None], axis=0) * wxy,
                      axis=1)
        dwx = (-dwxy[:, 0] * (1 - wy) - dwxy[:, 1] * wy
               + dwxy[:, 2] * (1 - wy) + dwxy[:, 3] * wy)
        dwy = (-dwxy[:, 0] * (1 - wx) + dwxy[:, 1] * (1 - wx)
               - dwxy[:, 2] * wx + dwxy[:, 3] * wx)
        res_f = jnp.array(spec.resolutions, dtype=x.dtype)[:, None]
        dx = jnp.stack([jnp.sum(dwx * res_f, 0),
                        jnp.sum(dwy * res_f, 0),
                        jnp.sum(dwz * res_f, 0)], axis=-1)
        dx = dx * ((x >= 0.0) & (x <= 1.0)).astype(x.dtype)
        # The frozen-table caller never requests a table gradient; a
        # structural zero keeps the vjp signature honest and is DCE'd.
        dpacked = jax.tree_util.tree_map(jnp.zeros_like, packed)
        return dpacked, dx

    encode.defvjp(fwd, bwd)
    return prepack, encode


def make_packed_encode(spec: PackedGridSpec, compute_dtype=jnp.bfloat16,
                       interpret: bool = False, cell_dense: bool = True,
                       need_dx: bool = True):
    """Returns encode(table, x) -> [N, L*F] with:

    - forward: pack -> wide lane-gathers (ONE per (point, level) on the
      dense prefix via the cell layout, 4 per level on hashed levels)
      -> fused z-select + trilinear combine (all [., N]-minor);
    - bwd dx: vector math on saved pair features (no re-gather);
    - bwd dtable: serial row-RMW Pallas kernels (deterministic f32) —
      one cell-row per (point, dense level), one [2, F] pair per
      (point, hashed level, xy corner).

    cell_dense=False falls back to the all-pair path (comparison
    baseline; no numeric difference).
    need_dx=False returns ZERO input gradients and skips the whole dx
    reduction chain in the backward — for callers whose points are
    constants (the BA smoothness lattice), where the dx math is pure
    waste (XLA cannot DCE it through the custom_vjp boundary).
    """
    nd = _n_dense(spec) if cell_dense else 0
    nh = spec.n_levels - nd

    def _forward(table, x):
        cell, w = _cells_and_weights(spec, x)
        parts0, parts1 = [], []
        crows = e_h = None
        if nd:
            cstorage = pack_cell_storage(spec, table, nd, compute_dtype)
            crows = _cell_rows(spec, cell, nd)
            p0d, p1d = _gather_cells(spec, cstorage, crows, x.dtype)
            parts0.append(p0d)
            parts1.append(p1d)
        if nh:
            storage = pack_storage(spec, table, compute_dtype)
            e = _corner_entries(spec, cell)
            rows, offs = _rows_offs(spec, e)
            # COSLAM_PAIR_SELECT=pallas routes the z-select through the
            # fused row-layout Pallas kernel (_gather_pairs_rows);
            # default is the XLA feature-major path (measured faster in
            # situ — see tools/bench/_bench_pair_select.py).
            if os.environ.get("COSLAM_PAIR_SELECT") == "pallas" \
                    and not interpret:
                p0h, p1h = _gather_pairs_rows(spec, storage, rows[nd:],
                                              offs[nd:], x.dtype)
            else:
                p0h, p1h = _gather_pairs(spec, storage, rows[nd:],
                                         offs[nd:], x.dtype)
            e_h = e[nd:]
            parts0.append(p0h)
            parts1.append(p1h)
        p0 = parts0[0] if len(parts0) == 1 else jnp.concatenate(parts0, 1)
        p1 = parts1[0] if len(parts1) == 1 else jnp.concatenate(parts1, 1)
        out = _combine(p0, p1, w[:, 2], _xy_weights(w))
        return out, (crows, e_h, p0, p1)

    @jax.custom_vjp
    def encode(table, x):
        out, _ = _forward(table, x)
        return out

    def fwd(table, x):
        out, (crows, e_h, p0, p1) = _forward(table, x)
        # Residuals: x is tiny; pair features saved in compute dtype.
        # The pair features only feed the dx chain — skip them entirely
        # for need_dx=False callers.
        if not need_dx:
            return out, (x, crows, e_h, None, None)
        return out, (x, crows, e_h,
                     p0.astype(compute_dtype), p1.astype(compute_dtype))

    def bwd(res, g):
        x, crows, e, p0c, p1c = res
        if need_dx:
            p0 = p0c.astype(x.dtype)
            p1 = p1c.astype(x.dtype)
        n = x.shape[0]
        L, F = spec.n_levels, spec.n_features
        # Recompute weights from x (vector math, no HBM gather).
        cell, w = _cells_and_weights(spec, x)
        wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
        wxy = _xy_weights(w)                                   # [L, 4, N]
        gl = g.reshape(n, L, F).transpose(2, 1, 0)             # [F, L, N]

        if need_dx:
            featz = p0 * (1 - wz)[None, :, None] + p1 * wz[None, :, None]
            diffz = p1 - p0                                    # [F, L, 4, N]

            # --- dx -----------------------------------------------------
            # d enc/d wxy_c = sum_f featz[f,l,c] * gl[f,l]
            dwxy = jnp.sum(featz * gl[:, :, None], axis=0)     # [L, 4, N]
            # d enc/d wz = sum_{f,c} wxy_c * diffz * gl
            dwz = jnp.sum(jnp.sum(diffz * gl[:, :, None], axis=0) * wxy,
                          axis=1)
            # wxy corners: [(1-wx)(1-wy), (1-wx)wy, wx(1-wy), wx wy]
            dwx = (-dwxy[:, 0] * (1 - wy) - dwxy[:, 1] * wy
                   + dwxy[:, 2] * (1 - wy) + dwxy[:, 3] * wy)
            dwy = (-dwxy[:, 0] * (1 - wx) + dwxy[:, 1] * (1 - wx)
                   - dwxy[:, 2] * wx + dwxy[:, 3] * wx)
            res_f = jnp.array(spec.resolutions, dtype=x.dtype)[:, None]
            # d pos/d x = res; w = pos - cell (cell piecewise const).
            dx = jnp.stack([jnp.sum(dwx * res_f, 0),
                            jnp.sum(dwy * res_f, 0),
                            jnp.sum(dwz * res_f, 0)], axis=-1)  # [N, 3]
            # Zero dx where x was clipped outside [0, 1].
            dx = dx * ((x >= 0.0) & (x <= 1.0)).astype(x.dtype)
        else:
            dx = jnp.zeros_like(x)

        # --- dtable (cell-RMW on the dense prefix, pair-scatter on the
        # hashed suffix) --------------------------------------------------
        gw = gl[:, :, None] * wxy[None]                        # [F, L, 4, N]
        v0 = gw * (1 - wz)[None, :, None]
        v1 = gw * wz[None, :, None]
        parts = []
        if nd:
            # Cell-storage lane order: k = xy*2 + zc, stream (k, f).
            cstreams = [(v1 if zc else v0)[f, :nd, xy]
                        for xy in range(4) for zc in (0, 1)
                        for f in range(F)]
            parts.append(_cell_table_grad(spec, crows, cstreams, nd,
                                          interpret))
        if nh:
            streams = tuple(v0[f, nd:] for f in range(F)) + tuple(
                v1[f, nd:] for f in range(F))
            parts.append(_scatter_table_grad(spec, e, streams, interpret,
                                             l_start=nd))
        dtable = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        return dtable, dx

    encode.defvjp(fwd, bwd)
    return encode
