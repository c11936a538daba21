"""Pair-scatter chunk-size tuning at TUM scale.

The TUM profile shows the pair kernels at ~125M upd/s for M=1.86M
updates/call vs 183M at Replica's M=0.4M — suggesting per-grid-step
overhead (fixed _CHUNK=8192 -> 227 steps/call at TUM scale). Measure
rates across chunk sizes and M. SMEM bounds the chunk: 5 streams x
chunk x 4 B must fit.

Run from repo root on TPU: python tools/bench/_bench_chunk_tune.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

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

from coslam_tpu.ops import hash_packed as HP

ROWS = 65700


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, n=6):
    sync(fn()); sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def scatter_with_chunk(chunk, unroll, n_rows, idx, vals):
    m = idx.shape[0]
    f = len(vals) // 2
    m_pad = -(-m // chunk) * chunk
    idx = jnp.clip(idx, 0, n_rows)
    if m_pad != m:
        idx = jnp.concatenate([idx, jnp.full((m_pad - m,), n_rows,
                                             jnp.int32)])
        vals = [jnp.concatenate([v, jnp.zeros((m_pad - m,), v.dtype)])
                for v in vals]

    def kernel(*refs):
        idx_ref = refs[0]
        val_refs = refs[1:1 + 2 * f]
        out_ref = refs[-1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, c):
            base = i * unroll
            for u in range(unroll):
                mm = base + u
                j = idx_ref[mm]
                upd = jnp.array(
                    [[val_refs[k][mm] for k in range(f)],
                     [val_refs[f + k][mm] for k in range(f)]])
                cur = out_ref[pl.ds(j, 2), :]
                out_ref[pl.ds(j, 2), :] = cur + upd
            return c

        jax.lax.fori_loop(0, chunk // unroll, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(m_pad // chunk,),
        in_specs=[pl.BlockSpec((chunk,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * (1 + 2 * f),
        out_specs=pl.BlockSpec((n_rows + 2, f), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows + 2, f), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx.astype(jnp.int32), *[v.astype(jnp.float32) for v in vals])
    return out[:n_rows]


def main():
    key = jax.random.PRNGKey(0)
    for m in (401408, 1859584):
        idx = jax.random.randint(key, (m,), 0, ROWS - 2)
        vals = tuple(jax.random.normal(jax.random.PRNGKey(i), (m,))
                     for i in range(4))
        for chunk in (4096, 8192, 16384, 32768):
            for unroll in (8, 16):
                try:
                    fn = jax.jit(partial(scatter_with_chunk, chunk,
                                         unroll, ROWS))
                    ms = timeit(lambda: jnp.sum(fn(idx, vals)))
                    print(f"M={m/1e6:5.2f}M chunk={chunk:6d} "
                          f"unroll={unroll:2d}: {ms:7.2f} ms "
                          f"({m/ms/1e3:.0f}M upd/s)", flush=True)
                except Exception as e:
                    print(f"M={m/1e6:5.2f}M chunk={chunk:6d} "
                          f"unroll={unroll:2d}: {type(e).__name__} "
                          f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
