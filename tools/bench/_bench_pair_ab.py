"""A/B: old [2, F] pair-RMW kernel vs new [1, 2F] pair-row vector-read
kernel for the hashed-level table gradient, at in-situ BA conditions
(Replica: 11 hashed levels x 4 corners x 99k points, 65.7k rows/level).

The _bench_row_rates.py microbench said vector-read rows win at every
width; _bench_hash_cell.py says the integrated path got SLOWER
(39.8 -> 48.7 ms fwd+dtable). This isolates the scatter stage.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import os
import time

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/coslam_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from coslam_tpu.ops import hash_packed as HP
from coslam_tpu.ops.serial_scatter import row_accum


def timeit(fn, n=10):
    float(jnp.sum(fn()))
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    n_levels = 11
    n = 99072 * 4                    # (point, corner) updates per level
    rows = 65536 + 101               # hashed level rows (hash16 + r + 1)
    key = jax.random.PRNGKey(0)
    e = jax.random.randint(key, (n_levels, n), 0, rows - 1)
    streams = [jax.random.normal(jax.random.PRNGKey(i + 1), (n_levels, n))
               for i in range(4)]

    def old(e, streams):
        parts = []
        for l in range(n_levels):
            parts.append(HP.pair_scatter(
                e[l], [s[l] for s in streams], rows))
        return jnp.concatenate(parts)

    def new(e, streams):
        parts = []
        for l in range(n_levels):
            acc = row_accum(e[l], [s[l] for s in streams], rows)[:rows]
            d = acc[:, :2]
            d = d.at[1:].add(acc[:-1, 2:])
            parts.append(d)
        return jnp.concatenate(parts)

    o = jax.jit(old)
    m = jax.jit(new)
    a = np.asarray(o(e, streams))
    b = np.asarray(m(e, streams))
    print("parity:", np.abs(a - b).max(), flush=True)
    to = timeit(lambda: o(e, streams))
    tm = timeit(lambda: m(e, streams))
    tot = n_levels * n
    print(f"old pair [2,F]: {to:.2f} ms ({tot / to / 1e3:.0f}M upd/s)",
          flush=True)
    print(f"new row  [1,2F]: {tm:.2f} ms ({tot / tm / 1e3:.0f}M upd/s)",
          flush=True)


if __name__ == "__main__":
    main()
