"""Serial row-RMW rate vs row width vs value-stream packing.

Hypothesis (from _bench_cell_merge + _bench_hash_cell): the serial
scatter loop is bound by per-update SMEM scalar LOADS (1 idx + width
value words), not by the RMW row op — width-4 pair kernels hit ~173M
upd/s while width-8 rows drop to ~95M and width-16 to ~45M. If so,
packing two bf16 values per i32 SMEM word (unpacked in-register with
shift/mask + same-width bitcast — Mosaic can't change bitwidths) should
nearly double wide-row rates.

Run on TPU from repo root: python _bench_row_rates.py
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

_UNROLL = 8
_MASK = -65536  # 0xFFFF0000 as a Python int (jnp constants get captured)


def _kernel_f32(chunk, width, *refs):
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


def _kernel_pk(chunk, width, *refs):
    """Values arrive as width//2 i32 streams, each an (even, odd) bf16
    pair; unpack via shift/mask into f32 bit patterns (same-width
    bitcast only)."""
    idx_ref = refs[0]
    pk_refs = refs[1:1 + width // 2]
    out_ref = refs[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, c):
        base = i * _UNROLL
        for u in range(_UNROLL):
            m = base + u
            j = idx_ref[m]
            bits = []
            for p in range(width // 2):
                w32 = pk_refs[p][m]
                bits.append(w32 << 16)     # even element (low bf16)
                bits.append(w32 & _MASK)   # odd element (high bf16)
            upd = jax.lax.bitcast_convert_type(
                jnp.array([bits]), jnp.float32)
            out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + upd
        return c

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)


def _kernel_vec(chunk, width, idx_ref, val_ref, out_ref):
    """Values as a [chunk, width] VMEM block: the update row is READ AS
    A VECTOR (one dynamic-sublane read) instead of being assembled from
    `width` scalar inserts — the insert chain is what scales with width
    in the SMEM kernels."""

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


def _call_vec(chunk, rows, width, idx, vals2d):
    m = idx.shape[0]
    return pl.pallas_call(
        partial(_kernel_vec, chunk, width),
        grid=(m // chunk,),
        in_specs=[pl.BlockSpec((chunk,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((chunk, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows + 1, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + 1, width), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, vals2d)


def _call(kernel, nin, chunk, rows, width, idx, streams):
    m = idx.shape[0]
    return pl.pallas_call(
        partial(kernel, chunk, width),
        grid=(m // chunk,),
        in_specs=[pl.BlockSpec((chunk,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * nin,
        out_specs=pl.BlockSpec((rows + 1, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + 1, width), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, *streams)


def timeit(fn, n=20):
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rows = 64 * 1024
    n = 1024 * 1024
    idx = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, rows)

    for width in (4, 8, 16):
        streams = [jax.random.normal(jax.random.PRNGKey(i + 1), (n,))
                   for i in range(width)]
        # SMEM budget per variant.
        ch_f32 = 8192 if width <= 8 else 4096
        f32 = jax.jit(lambda: _call(_kernel_f32, 1 + width, ch_f32, rows,
                                    width, idx, streams))

        pk = [jax.lax.bitcast_convert_type(
            jnp.stack([streams[2 * p].astype(jnp.bfloat16),
                       streams[2 * p + 1].astype(jnp.bfloat16)], -1),
            jnp.int32) for p in range(width // 2)]
        pkj = jax.jit(lambda: _call(_kernel_pk, 1 + width // 2, 8192,
                                    rows, width, idx, pk))

        vals2d = jnp.stack(streams, axis=-1)          # [n, width]
        vec = jax.jit(lambda: _call_vec(8192, rows, width, idx, vals2d))

        a = np.asarray(f32())
        b = np.asarray(pkj())
        c = np.asarray(vec())
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
        errv = np.abs(a - c).max() / max(np.abs(a).max(), 1e-9)
        t_f = timeit(f32)
        t_p = timeit(pkj)
        t_v = timeit(vec)
        print(f"width {width:2d}: f32 {t_f:6.2f} ms ({n / t_f / 1e3:4.0f}M"
              f" upd/s)  packed-bf16 {t_p:6.2f} ms ({n / t_p / 1e3:4.0f}M"
              f" upd/s, err {err:.1e})  vec-vmem {t_v:6.2f} ms "
              f"({n / t_v / 1e3:4.0f}M upd/s, err {errv:.1e})", flush=True)


if __name__ == "__main__":
    main()
