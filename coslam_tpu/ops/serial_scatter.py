"""Generic serial row-RMW scatter accumulator (Pallas, TPU).

The one primitive every exact table-gradient path here reduces to:
`out[idx[m], :] += streams[:][m]` with a full-width row per update.
TPUs have no atomic scatter; a serial scalar-core loop is the fastest
exact form and is ISSUE-bound (~170M row-RMW/s regardless of row width
up to ~64 B — see STATUS.md chip characterization). Wider rows are
therefore free: callers pack as much of an update as possible into one
row (a z-pair [2, F] in ops/hash_packed.py, a bilinear cell's 2x2xF
patch in ops/plane_quad.py, a trilinear cell's 2x2x2xF patch for dense
hash levels) and resolve corner overlap OUTSIDE the kernel with a few
vectorized shifted adds.

Only the INDEX streams travel through SMEM; the update VALUES stream
through VMEM as a [chunk, W] block and each update row is read AS A
VECTOR (one dynamic-sublane read). Assembling the row from W scalar
SMEM loads instead makes the loop cost scale with W (vector-insert
chain: 147/105/70M upd/s at W = 4/8/16, measured in
_bench_row_rates.py) while the vector-read form is width-independent
(~165-177M upd/s) and exactly f32. The accumulator row count must fit
the ~50 MB VMEM envelope (rows x 128 padded lanes x 4 B).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 8192
_UNROLL = 8

# Max accumulator rows per pass (~50 MB VMEM at 128 padded lanes, f32).
MAX_ROWS = 98 * 1024


def _row_kernel(chunk: int, idx_ref, val_ref, out_ref):
    """idx [chunk] SMEM; vals [chunk, W] VMEM; out [rows, W] VMEM."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, c):
        base = i * _UNROLL
        for u in range(_UNROLL):
            m = base + u
            j = idx_ref[m]
            upd = val_ref[pl.ds(m, 1), :]
            out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + upd
        return c

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)


def row_accum_mat(idx: jnp.ndarray, vals: jnp.ndarray, rows: int,
                  interpret: bool = False) -> jnp.ndarray:
    """out[rows+1, W] f32 with out[idx[m]] += vals[m].

    idx [M] int32 (values outside [0, rows] are clipped into the slack
    row `rows`, which also absorbs the chunk padding); vals [M, W].
    The caller drops the slack row.
    """
    m, width = vals.shape
    m_pad = -(-m // _CHUNK) * _CHUNK
    idx = jnp.clip(idx, 0, rows)
    vals = vals.astype(jnp.float32)
    if m_pad != m:
        idx = jnp.concatenate(
            [idx, jnp.full((m_pad - m,), rows, jnp.int32)])
        vals = jnp.concatenate(
            [vals, jnp.zeros((m_pad - m, width), jnp.float32)])

    return pl.pallas_call(
        partial(_row_kernel, _CHUNK),
        grid=(m_pad // _CHUNK,),
        in_specs=[pl.BlockSpec((_CHUNK,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((_CHUNK, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows + 1, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + 1, width), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx.astype(jnp.int32), vals)


def row_accum(idx: jnp.ndarray, streams, rows: int,
              interpret: bool = False) -> jnp.ndarray:
    """Stream-list convenience wrapper: stacks W 1-D [M] streams into
    the [M, W] value matrix (one bandwidth-bound relayout, dwarfed by
    the serial-issue savings) and calls row_accum_mat."""
    return row_accum_mat(idx, jnp.stack(streams, axis=-1), rows, interpret)
