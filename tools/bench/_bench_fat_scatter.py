"""Two micro-experiments behind the r3 BA-overhead fixes:

1. FAT SCATTER: one pair_scatter call with an 11-level 723k-row VMEM
   accumulator vs 11 per-level calls (the shipped grouping, capped at
   96k rows) — same 4.4M updates. If the big accumulator RMWs at the
   same rate, the per-level slicing/padding/call overhead (~4 ms/iter
   in the D2 profile) is free to remove.

2. PAIR-MIRROR GATHER: rows from a [T, 2F] shifted-pair mirror
   (row e = entries e, e+1; one 8 B row-gather per (point, level,
   corner), zero select) vs the shipped z-window storage gather +
   8-way masked select. Measures the full fwd value path to p0/p1 in
   [F, L, 4, N] layout.

Run from repo root on TPU: python tools/bench/_bench_fat_scatter.py
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

from coslam_tpu.ops import hash_packed as HP

N_LV = 11
ROWS_LV = 65700
N_PT = 99072
M_LV = N_PT * 4


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, n=8):
    sync(fn()); sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:34s}: {dt:8.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    idx_lv = jax.random.randint(ks[0], (N_LV, M_LV), 0, ROWS_LV - 2)
    offs = (jnp.arange(N_LV) * ROWS_LV)[:, None]
    vals = [jax.random.normal(k, (N_LV, M_LV)) for k in ks[1:5]]

    # The [rows, F] f32 accumulator pads every logical row to a full
    # 128-lane VMEM row (512 B/row; v5e VMEM = 128 MB), so ~190k rows is
    # the hard cap — group 2 levels per call instead of 11 separate.
    @jax.jit
    def two_level(idx_lv, *vals):
        acc = 0.0
        for g0 in range(0, N_LV - 1, 2):
            idx = jnp.concatenate([idx_lv[g0], idx_lv[g0 + 1] + ROWS_LV])
            st = [jnp.concatenate([v[g0], v[g0 + 1]]) for v in vals]
            acc += jnp.sum(HP.pair_scatter(idx, st, 2 * ROWS_LV))
        st = [v[N_LV - 1] for v in vals]
        acc += jnp.sum(HP.pair_scatter(idx_lv[N_LV - 1], st, ROWS_LV))
        return acc

    @jax.jit
    def perlevel(idx_lv, *vals):
        acc = 0.0
        for l in range(N_LV):
            st = [v[l] for v in vals]
            acc += jnp.sum(HP.pair_scatter(idx_lv[l], st, ROWS_LV))
        return acc

    t_fat = timeit(f"2-level-group scatter ({2 * ROWS_LV} rows)",
                   lambda: two_level(idx_lv, *vals))
    t_pl = timeit(f"per-level {N_LV}x{M_LV / 1e6:.2f}M upd",
                  lambda: perlevel(idx_lv, *vals))
    tot = N_LV * M_LV
    print(f"2-level: {tot / t_fat / 1e3:.0f}M upd/s   "
          f"per-level: {tot / t_pl / 1e3:.0f}M upd/s")

    # ---- pair-mirror vs window gather+select ---------------------------
    spec = HP.make_packed_spec(400, log2_hashmap_size=16, n_levels=16,
                               base_resolution=16)
    table = jax.random.normal(ks[5], (spec.total_entries, spec.n_features))
    x = jax.random.uniform(ks[6], (N_PT, 3))
    nd = HP._n_dense(spec)

    @jax.jit
    def window_path(table, x):
        cell, w = HP._cells_and_weights(spec, x)
        storage = HP.pack_storage(spec, table, jnp.bfloat16)
        e = HP._corner_entries(spec, cell)
        rows, offs2 = HP._rows_offs(spec, e)
        p0, p1 = HP._gather_pairs(spec, storage, rows[nd:], offs2[nd:],
                                  x.dtype)
        return jnp.sum(p0) + jnp.sum(p1)

    @jax.jit
    def pair_path(table, x):
        cell, w = HP._cells_and_weights(spec, x)
        t2 = jnp.concatenate([table, table[-1:]], axis=0)
        pairs = jnp.concatenate([t2[:-1], t2[1:]], axis=1
                                ).astype(jnp.bfloat16)     # [T, 2F]
        e = HP._corner_entries(spec, cell)[nd:]
        g = pairs[e]                                       # [Lh, 4, N, 2F]
        gt = jnp.moveaxis(g, -1, 0).astype(x.dtype)        # [2F, Lh, 4, N]
        F = spec.n_features
        return jnp.sum(gt[:F]) + jnp.sum(gt[F:])

    t_w = timeit("window gather + select", lambda: window_path(table, x))
    t_p = timeit("pair-mirror gather", lambda: pair_path(table, x))
    rows_n = (spec.n_levels - nd) * 4 * N_PT
    print(f"window: {rows_n / t_w / 1e3:.0f}M rows/s   "
          f"pair: {rows_n / t_p / 1e3:.0f}M rows/s")


if __name__ == "__main__":
    main()
