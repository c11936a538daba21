"""Run-merging in the serial row-RMW scatter: can duplicate-adjacent
cell indices (range-d samples along a ray crossing the same plane cell)
buy back serial issues?

The shipped kernel (ops/serial_scatter.py) is ISSUE-bound at ~170M
row-RMW/s. Real BA index streams are ray-ordered: consecutive samples
along a ray often project to the SAME plane cell at section resolutions
below the sample spacing. Two candidate exploits, both exact in f32:

  merge   in-kernel flush-on-change: carry (cur_idx, acc_row) in
          SMEM/VMEM scratch; equal-index updates accumulate into the
          static-address scratch row (no dynamic RMW), the RMW fires
          once per run boundary.
  skip    outside the kernel, a segmented shift-scan (4 vectorized
          rounds for runs up to 16) sums each run into its LAST entry
          and marks the others with a sentinel index; the kernel
          branches past sentinel entries (no val read, no RMW).

This script measures (a) the adjacent-duplicate fraction of realistic
ray-structured streams at flagship section resolutions, (b) kernel
rates for shipped/merge/skip on those streams, (c) numeric parity.

Run from repo root on TPU: python _bench_run_merge.py
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

from coslam_tpu.ops.serial_scatter import _CHUNK, _UNROLL, row_accum_mat

W = 8          # 4 corners x F=2, the cell-scatter width


# ---------------------------------------------------------------------------
# Realistic ray-structured streams (flagship BA geometry)
# ---------------------------------------------------------------------------

def make_stream(r: int, n_rays=2304, n_uniform=16, n_range=11,
                bound_m=6.0, range_d_m=0.1, seed=0):
    """Project depth-guided ray samples onto one plane section at
    resolution r, exactly as ops/plane_quad._cell_project does, and
    return the flattened ray-ordered cell-index stream + value matrix."""
    rng = np.random.default_rng(seed)
    # Rays: origin near one face, direction into the box.
    o = rng.uniform(0.2, 0.8, (n_rays, 1, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    depth = rng.uniform(0.5, 3.0, (n_rays, 1)).astype(np.float32)
    zu = np.sort(rng.uniform(0.05, 4.0, (n_rays, n_uniform)), axis=1)
    zr = depth + np.sort(
        rng.uniform(-range_d_m, range_d_m, (n_rays, n_range)), axis=1)
    # merge-sorted like render_rays
    z = np.sort(np.concatenate([zu, zr], axis=1), axis=1)   # [R, S]
    pts = o + z[..., None] * d[:, None, :] / bound_m        # normalized
    pts = np.clip(pts, 0.0, 1.0).reshape(-1, 3)
    u = np.clip((pts[:, 0] * r).astype(np.int64), 0, r - 1)
    v = np.clip((pts[:, 1] * r).astype(np.int64), 0, r - 1)
    idx = (u * r + v).astype(np.int32)
    vals = rng.normal(size=(idx.shape[0], W)).astype(np.float32)
    return idx, vals


# ---------------------------------------------------------------------------
# merge: in-kernel flush-on-change
# ---------------------------------------------------------------------------

def _merge_kernel(chunk, rows, idx_ref, val_ref, out_ref, acc_ref, cur_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        cur_ref[0] = rows    # slack row; initial acc is zero

    def body(i, c):
        base = i * _UNROLL
        for u in range(_UNROLL):
            m = base + u
            j = idx_ref[m]
            same = j == cur_ref[0]

            @pl.when(same)
            def _():
                acc_ref[:] = acc_ref[:] + val_ref[pl.ds(m, 1), :]

            @pl.when(jnp.logical_not(same))
            def _():
                cur = cur_ref[0]
                out_ref[pl.ds(cur, 1), :] = (out_ref[pl.ds(cur, 1), :]
                                             + acc_ref[:])
                cur_ref[0] = j
                acc_ref[:] = val_ref[pl.ds(m, 1), :]
        return c

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        cur = cur_ref[0]
        out_ref[pl.ds(cur, 1), :] = out_ref[pl.ds(cur, 1), :] + acc_ref[:]


def merge_accum(idx, vals, rows):
    m, width = vals.shape
    m_pad = -(-m // _CHUNK) * _CHUNK
    idx = jnp.clip(idx, 0, rows)
    if m_pad != m:
        idx = jnp.concatenate([idx, jnp.full((m_pad - m,), rows, jnp.int32)])
        vals = jnp.concatenate(
            [vals, jnp.zeros((m_pad - m, width), jnp.float32)])
    return pl.pallas_call(
        partial(_merge_kernel, _CHUNK, rows),
        grid=(m_pad // _CHUNK,),
        in_specs=[pl.BlockSpec((_CHUNK,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((_CHUNK, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows + 1, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + 1, width), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, width), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx.astype(jnp.int32), vals)


# ---------------------------------------------------------------------------
# skip: segmented shift-scan outside + sentinel branch inside
# ---------------------------------------------------------------------------

def run_merge_outside(idx, vals, rows, rounds=5):
    """Segmented Hillis-Steele SUFFIX scan: after R rounds, v[m] holds
    the sum of entries m..min(run_end, m + 2^R - 1); the run's FIRST
    entry therefore carries the whole run total (exact for runs up to
    2^rounds). Non-first entries get idx = rows+1 (the kernel's skip
    sentinel). Runs longer than 2^rounds would truncate — callers must
    bound the run length (the bench asserts parity)."""
    w = vals.shape[1]
    idx = jnp.clip(idx, 0, rows)
    v = vals
    # f[m]: m and m+1 are in the same run (span-1 link)
    f = jnp.concatenate([idx[1:] == idx[:-1], jnp.zeros((1,), bool)])
    for _ in range(rounds):
        s = 2 ** _
        v_up = jnp.concatenate([v[s:], jnp.zeros((s, w), v.dtype)])
        f_up = jnp.concatenate([f[s:], jnp.zeros((s,), bool)])
        v = v + jnp.where(f[:, None], v_up, 0.0)
        f = jnp.logical_and(f, f_up)
    is_first = jnp.concatenate([jnp.ones((1,), bool), idx[1:] != idx[:-1]])
    out_idx = jnp.where(is_first, idx, rows + 1).astype(jnp.int32)
    return out_idx, v


def _skip_kernel(chunk, rows, idx_ref, val_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, c):
        base = i * _UNROLL
        for u in range(_UNROLL):
            m = base + u
            j = idx_ref[m]

            @pl.when(j <= rows)
            def _():
                out_ref[pl.ds(j, 1), :] = (out_ref[pl.ds(j, 1), :]
                                           + val_ref[pl.ds(m, 1), :])
        return c

    jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)


def skip_accum(idx, vals, rows):
    """idx entries == rows+1 are skipped (callers pre-merge runs)."""
    m, width = vals.shape
    m_pad = -(-m // _CHUNK) * _CHUNK
    if m_pad != m:
        idx = jnp.concatenate(
            [idx, jnp.full((m_pad - m,), rows + 1, jnp.int32)])
        vals = jnp.concatenate(
            [vals, jnp.zeros((m_pad - m, width), jnp.float32)])
    return pl.pallas_call(
        partial(_skip_kernel, _CHUNK, rows),
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
    )(idx, vals)


# ---------------------------------------------------------------------------


def timeit(fn, n=20):
    fn().block_until_ready()
    fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    out.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("device:", jax.devices()[0])
    for r in (140, 311):
        idx_np, vals_np = make_stream(r)
        rows = r * r
        m = idx_np.shape[0]
        dup = float(np.mean(idx_np[1:] == idx_np[:-1]))
        # run-length stats
        runs = np.diff(np.flatnonzero(
            np.concatenate([[True], idx_np[1:] != idx_np[:-1], [True]])))
        print(f"\nr={r}: M={m}, adjacent-dup={dup:.3f}, "
              f"mean run={runs.mean():.2f}, p95 run={np.percentile(runs, 95):.0f}, "
              f"max run={runs.max()}")
        idx = jnp.asarray(idx_np)
        vals = jnp.asarray(vals_np)

        base = jax.jit(lambda i, v: row_accum_mat(i, v, rows))
        merg = jax.jit(lambda i, v: merge_accum(i, v, rows))

        def skip_full(i, v):
            si, sv = run_merge_outside(i, v, rows)
            return skip_accum(si, sv, rows)
        skip = jax.jit(skip_full)

        o0 = np.asarray(base(idx, vals))[:rows]
        o1 = np.asarray(merg(idx, vals))[:rows]
        o2 = np.asarray(skip(idx, vals))[:rows]
        print(f"  parity merge={np.abs(o1 - o0).max():.2e} "
              f"skip={np.abs(o2 - o0).max():.2e}")

        t0 = timeit(lambda: base(idx, vals))
        t1 = timeit(lambda: merg(idx, vals))
        t2 = timeit(lambda: skip(idx, vals))
        print(f"  shipped {t0:.3f} ms ({m / t0 / 1e3:.0f}M upd/s)   "
              f"merge {t1:.3f} ms ({t0 / t1:.2f}x)   "
              f"skip {t2:.3f} ms ({t0 / t2:.2f}x)")


if __name__ == "__main__":
    main()
