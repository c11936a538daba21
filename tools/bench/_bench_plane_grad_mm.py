"""A/B: plane-section table gradient via two-step MXU matmul vs the
serial cell-RMW kernel, per resolution, at BA point counts.

matmul form (no serial issues):
    E[n, v, f] = hatV[n, v] * g[n, f]          (fused producer)
    dT[u, v, f] = sum_n hatU[n, u] * E[n, v, f]  (one dot, contract n)

Run on TPU: python _bench_plane_grad_mm.py
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

from coslam_tpu.ops.serial_scatter import row_accum


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=20):
    sync(fn())
    sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    N = 85248          # ~ (2048 + 256) rays x 37 samples
    F = 2
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, N))         # (u, v) in [0, 1]
    g = jax.random.normal(key, (N, F))

    for r in (32, 64, 96, 128, 192, 287):
        r1 = r + 1

        def mm_grad(x=x, g=g, r=r, r1=r1):
            u = x[0] * r
            v = x[1] * r
            j = jnp.arange(r1, dtype=x.dtype)
            hu = jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - j))  # [N, r1]
            hv = jnp.maximum(0.0, 1.0 - jnp.abs(v[:, None] - j))
            e = hv[:, :, None] * g[:, None, :]                    # [N, r1, F]
            dt = jax.lax.dot_general(
                hu, e.reshape(N, r1 * F), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dt.reshape(r1, r1, F)

        mm_j = jax.jit(mm_grad)
        t_mm = timeit(lambda: mm_j())

        # Serial cell-RMW equivalent: one [4F] row per point into r*r cells.
        cu = jnp.clip((x[0] * r).astype(jnp.int32), 0, r - 1)
        cv = jnp.clip((x[1] * r).astype(jnp.int32), 0, r - 1)
        idx = cu * r + cv
        streams = tuple(g[:, f % F] for f in range(4 * F))

        def serial(idx=idx, streams=streams, r=r):
            return row_accum(idx, streams, r * r)

        s_j = jax.jit(serial)
        t_s = timeit(lambda: s_j())

        # 3-section batched matmul (one level = 3 planes).
        def mm3(x=x, g=g, r=r, r1=r1):
            u = jnp.stack([x[0] * r] * 3)
            v = jnp.stack([x[1] * r] * 3)
            j = jnp.arange(r1, dtype=x.dtype)
            hu = jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - j))
            hv = jnp.maximum(0.0, 1.0 - jnp.abs(v[..., None] - j))
            e = hv[:, :, :, None] * g[None, :, None, :]
            dt = jax.lax.dot_general(
                hu, e.reshape(3, N, r1 * F), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return dt
        mm3_j = jax.jit(mm3)
        t_mm3 = timeit(lambda: mm3_j())

        print(f"r={r:3d}: matmul {t_mm:6.3f} ms  batched3 {t_mm3:6.3f} "
              f"(/sec {t_mm3/3:6.3f})  serial {t_s:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
