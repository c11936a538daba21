"""Predicated pair-merge for the serial cell-RMW kernel.

Hypothesis: the cell kernel is scalar-ISSUE-bound (~173M RMW/s), and
BA sample streams contain 2-9-long runs of DUPLICATE cell indices at
coarse plane levels (consecutive ray samples land in the same bilinear
cell). A vectorized pre-pass merges each adjacent pair (2i, 2i+1) when
they share a cell; the kernel then does N/2 unconditional RMWs plus
N/2 PREDICATED RMWs (taken only when the pair straddled two cells).
If Mosaic's scalar branch-skip costs less than the RMW it skips, the
duplicate fraction converts into wall-clock.

MEASURED (v5e, 512k updates, 96k rows): REFUTED, decisively —
  random: base 5.54 ms (95M upd/s)   merged 124.19 ms  (0.04x)
  runs:   base 6.08 ms (dup=0.67)    merged 122.70 ms  (0.05x)
A data-dependent @pl.when inside the unrolled update loop makes the
kernel ~22x SLOWER regardless of how often it's taken: the branch
breaks the scalar core's pipelined issue stream. Serial scatter
kernels must stay branch-free; keep slack-row no-op writes instead.

Run on TPU from repo root: python _bench_cell_merge.py
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

_CHUNK = 8192
_UNROLL = 8
WIDTH = 8      # 4 corners x F=2 streams


def _kernel_base(chunk, width, *refs):
    """Shipped cell kernel: one unconditional row RMW per update."""
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


def _kernel_merged(chunk, width, *refs):
    """Pair-merged: refs = (idx1, take2, idx2, width primary streams,
    width secondary streams, out). One unconditional RMW + one
    predicated RMW per PAIR."""
    idx1_ref = refs[0]
    take2_ref = refs[1]
    idx2_ref = refs[2]
    v1 = refs[3:3 + width]
    v2 = refs[3 + width:3 + 2 * width]
    out_ref = refs[-1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, c):
        base = i * _UNROLL
        for u in range(_UNROLL):
            m = base + u
            j = idx1_ref[m]
            upd = jnp.array([[v1[w][m] for w in range(width)]])
            out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + upd

            @pl.when(take2_ref[m] != 0)
            def _():
                j2 = idx2_ref[m]
                upd2 = jnp.array([[v2[w][m] for w in range(width)]])
                out_ref[pl.ds(j2, 1), :] = out_ref[pl.ds(j2, 1), :] + upd2
        return c

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)


def run_base(idx, vals, rows):
    n = idx.shape[0]
    return pl.pallas_call(
        partial(_kernel_base, _CHUNK, WIDTH),
        grid=(n // _CHUNK,),
        in_specs=[pl.BlockSpec((_CHUNK,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * (1 + WIDTH),
        out_specs=pl.BlockSpec((rows + 1, WIDTH), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + 1, WIDTH), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, *vals)


def run_merged(idx, vals, rows):
    """Vector pre-pass (pure XLA) + merged kernel."""
    i1 = idx[0::2]
    i2 = idx[1::2]
    same = (i1 == i2)
    v1 = [v[0::2] + jnp.where(same, v[1::2], 0.0) for v in vals]
    v2 = [jnp.where(same, 0.0, v[1::2]) for v in vals]
    take2 = (~same).astype(jnp.int32)
    n2 = i1.shape[0]
    chunk = _CHUNK // 2  # 19 SMEM streams: halve the chunk to fit 1MB SMEM
    return pl.pallas_call(
        partial(_kernel_merged, chunk, WIDTH),
        grid=(n2 // chunk,),
        in_specs=[pl.BlockSpec((chunk,), lambda i: (i,),
                               memory_space=pltpu.SMEM)] * (3 + 2 * WIDTH),
        out_specs=pl.BlockSpec((rows + 1, WIDTH), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + 1, WIDTH), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(i1, take2, i2, *v1, *v2)


def timeit(fn, n=20):
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rows = 96 * 1024
    n = 512 * 1024
    key = jax.random.PRNGKey(0)

    # Runs of duplicate indices with geometric-ish lengths (mean ~3),
    # mimicking coarse-level BA streams sorted along rays.
    rng = np.random.default_rng(0)
    reps = rng.integers(1, 6, size=n)                  # 1..5
    base_ids = rng.integers(0, rows, size=n)
    run_idx = np.repeat(base_ids, reps)[:n].astype(np.int32)

    vals = [jax.random.normal(jax.random.PRNGKey(i), (n,)) for i in
            range(WIDTH)]
    vals = [jax.device_put(v) for v in vals]

    for name, ids_np in (("random", base_ids.astype(np.int32)),
                         ("runs", run_idx)):
        dup = float(np.mean(ids_np[0::2] == ids_np[1::2]))
        ids = jax.device_put(jnp.asarray(ids_np))
        b = jax.jit(lambda i, v: run_base(i, v, rows))
        m = jax.jit(lambda i, v: run_merged(i, v, rows))
        # Correctness first.
        ob = np.asarray(b(ids, vals))
        om = np.asarray(m(ids, vals))
        np.testing.assert_allclose(om, ob, rtol=1e-4, atol=1e-3)
        tb = timeit(lambda: b(ids, vals))
        tm = timeit(lambda: m(ids, vals))
        print(f"{name}: dup_pair_frac={dup:.2f}  base {tb:.2f} ms "
              f"({n / tb / 1e3:.0f}M upd/s)  merged {tm:.2f} ms  "
              f"speedup {tb / tm:.2f}x")


if __name__ == "__main__":
    main()
