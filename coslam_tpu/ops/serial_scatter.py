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

Streams travel through SMEM as 1-D blocks (2-D value layouts lane-pad
catastrophically); the accumulator row count must fit the ~50 MB VMEM
envelope (rows x 128 padded lanes x 4 B).
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


def _row_kernel(chunk: int, width: int, *refs):
    """refs = (idx, `width` value streams, out [rows, width])."""
    idx_ref = refs[0]
    val_refs = refs[1:1 + width]
    out_ref = refs[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, c):
        base = i * _UNROLL
        for u in range(_UNROLL):
            m = base + u
            j = idx_ref[m]
            upd = jnp.array([[val_refs[w][m] for w in range(width)]])
            out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + upd
        return c

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)


def row_accum(idx: jnp.ndarray, streams, rows: int,
              interpret: bool = False) -> jnp.ndarray:
    """out[rows+1, W] f32 with out[idx[m]] += [s[m] for s in streams].

    idx [M] int32 (values outside [0, rows] are clipped into the slack
    row `rows`, which also absorbs the chunk padding); streams: W 1-D
    [M] arrays. The caller drops the slack row.
    """
    width = len(streams)
    # SMEM budget: (1 + width) double-buffered f32 stream windows must
    # fit 1 MB — chunk 8192 holds up to 9 streams (measured fastest),
    # wider rows drop to 4096.
    chunk = _CHUNK if width <= 8 else _CHUNK // 2
    m = idx.shape[0]
    m_pad = -(-m // chunk) * chunk
    idx = jnp.clip(idx, 0, rows)
    if m_pad != m:
        idx = jnp.concatenate(
            [idx, jnp.full((m_pad - m,), rows, jnp.int32)])
        streams = [jnp.concatenate([v, jnp.zeros((m_pad - m,), v.dtype)])
                   for v in streams]

    return pl.pallas_call(
        partial(_row_kernel, chunk, width),
        grid=(m_pad // chunk,),
        in_specs=[pl.BlockSpec((chunk,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * (1 + width),
        out_specs=pl.BlockSpec((rows + 1, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + 1, width), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx.astype(jnp.int32),
      *[v.astype(jnp.float32) for v in streams])
