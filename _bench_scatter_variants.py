"""Pair-scatter kernel variants: what sets the ~140M updates/s ceiling?

Hypothesis: the serial [2,F] read-modify-write chain is LATENCY-bound
(each RMW to the single VMEM accumulator must retire before the next
dependent one issues), not issue-bound. If so, C independent accumulator
copies with round-robin update distribution should overlap the chains
and scale throughput up to the true issue rate.

Variants, at the BA workload scale (M = 6.34M pair-updates, 64k rows):
  base      — current pair_scatter (1 accumulator)
  copies=C  — C scratch accumulators, reduced on the last grid step
  writeonly — no read (races; timing only): pure issue-rate ceiling
Run on TPU from repo root: python _bench_scatter_variants.py
"""

import os
import time
from functools import partial

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/coslam_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coslam_tpu.ops.hash_packed import pair_scatter

_CHUNK = 8192
_UNROLL = 8


def _kernel_copies(chunk, n_feat, n_copies, last_step, *refs):
    idx_ref = refs[0]
    val_refs = refs[1:1 + 2 * n_feat]
    out_ref = refs[1 + 2 * n_feat]
    acc_ref = refs[-1]   # scratch [n_copies, rows+2, F]

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_rows = out_ref.shape[0]

    def body(i, c):
        base = i * _UNROLL
        for u in range(_UNROLL):
            m = base + u
            cp = u % n_copies
            j = jnp.clip(idx_ref[m], 0, n_rows - 2)
            upd = jnp.array(
                [[val_refs[f][m] for f in range(n_feat)],
                 [val_refs[n_feat + f][m] for f in range(n_feat)]])
            cur = acc_ref[cp, pl.ds(j, 2), :]
            acc_ref[cp, pl.ds(j, 2), :] = cur + upd
        return c

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)

    @pl.when(pl.program_id(0) == last_step)
    def _():
        out_ref[:] = jnp.sum(acc_ref[:], axis=0)


def pair_scatter_copies(idx, val_streams, n_rows, n_copies):
    m = idx.shape[0]
    f = len(val_streams) // 2
    m_pad = -(-m // _CHUNK) * _CHUNK
    if m_pad != m:
        idx = jnp.concatenate([idx, jnp.full((m_pad - m,), n_rows, jnp.int32)])
        val_streams = [jnp.concatenate([v, jnp.zeros((m_pad - m,), v.dtype)])
                       for v in val_streams]
    steps = m_pad // _CHUNK
    out = pl.pallas_call(
        partial(_kernel_copies, _CHUNK, f, n_copies, steps - 1),
        grid=(steps,),
        in_specs=[pl.BlockSpec((_CHUNK,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * (1 + 2 * f),
        out_specs=pl.BlockSpec((n_rows + 2, f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows + 2, f), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_copies, n_rows + 2, f), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(idx.astype(jnp.int32), *[v.astype(jnp.float32) for v in val_streams])
    return out[:n_rows]


def _kernel_writeonly(chunk, n_feat, *refs):
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
            j = jnp.clip(idx_ref[m], 0, n_rows - 2)
            upd = jnp.array(
                [[val_refs[f][m] for f in range(n_feat)],
                 [val_refs[n_feat + f][m] for f in range(n_feat)]])
            out_ref[pl.ds(j, 2), :] = upd
        return c

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)


def pair_scatter_writeonly(idx, val_streams, n_rows):
    m = idx.shape[0]
    f = len(val_streams) // 2
    return pl.pallas_call(
        partial(_kernel_writeonly, _CHUNK, f),
        grid=(m // _CHUNK,),
        in_specs=[pl.BlockSpec((_CHUNK,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * (1 + 2 * f),
        out_specs=pl.BlockSpec((n_rows + 2, f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows + 2, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(idx.astype(jnp.int32), *[v.astype(jnp.float32) for v in val_streams])


def timeit(name, fn, n=10):
    out = fn()
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n
    return dt


def main():
    key = jax.random.PRNGKey(0)
    n_rows = 64 * 1024
    m = 6_340_608  # 99072 pts x 16 levels x 4 corners
    m = -(-m // _CHUNK) * _CHUNK
    idx = jax.random.randint(key, (m,), 0, n_rows - 2)
    streams = tuple(jax.random.normal(jax.random.PRNGKey(i), (m,))
                    for i in range(4))

    ref = None
    base = jax.jit(lambda: pair_scatter(idx, streams, n_rows))
    dt = timeit("base", base)
    ref = base()
    print(f"base: {dt*1e3:.1f} ms = {m/dt/1e6:.0f}M upd/s")

    for c in (2, 4, 8):
        fn = jax.jit(partial(pair_scatter_copies, idx, streams, n_rows, c))
        dt = timeit(f"copies{c}", fn)
        err = float(jnp.max(jnp.abs(fn() - ref)))
        print(f"copies={c}: {dt*1e3:.1f} ms = {m/dt/1e6:.0f}M upd/s "
              f"(max err vs base {err:.2e})")

    fn = jax.jit(lambda: pair_scatter_writeonly(idx, streams, n_rows))
    dt = timeit("writeonly", fn)
    print(f"writeonly: {dt*1e3:.1f} ms = {m/dt/1e6:.0f}M upd/s (issue ceiling)")


if __name__ == "__main__":
    main()
