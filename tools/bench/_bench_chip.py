"""What can THIS chip actually do? MXU matmul rate, HBM bandwidth,
XLA gather rate, XLA sort rate at BA scale. Steers the table-grad design.
All arrays passed as jit args (closures constant-fold into the compile
payload and blow the remote-compile size limit on tunneled devices).
Run: python _bench_chip.py
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


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, n=10):
    _sync(fn(*args))
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)

    # MXU: bf16 matmul at increasing sizes (isolates dispatch overhead)
    for n in (4096, 8192):
        a = jax.random.normal(key, (n, n), jnp.bfloat16)
        b = jax.random.normal(key, (n, n), jnp.bfloat16)
        f = jax.jit(lambda a, b: a @ b)
        dt = timeit(f, a, b)
        print(f"matmul bf16 {n}^3: {dt*1e3:.2f} ms = "
              f"{2*n**3/dt/1e12:.2f} TFLOP/s", flush=True)

    # HBM BW: big elementwise (read+write 512 MB)
    x = jax.random.normal(key, (64 * 1024 * 1024,), jnp.float32)
    f = jax.jit(lambda x: x * 1.0001)
    dt = timeit(f, x)
    print(f"hbm stream: {2*x.nbytes/dt/1e9:.0f} GB/s", flush=True)

    m = 6_340_608
    idx = jax.random.randint(key, (m,), 0, 150_000)

    # XLA gather, lane-minor table (the packed-encoder layout)
    tbl = jax.random.normal(key, (16, 150_000), jnp.bfloat16)
    f = jax.jit(lambda t, i: t[:, i])
    dt = timeit(f, tbl, idx)
    print(f"gather (lane-axis) {m/1e6:.1f}M x 32B: {dt*1e3:.1f} ms = "
          f"{m/dt/1e6:.0f}M/s", flush=True)

    # XLA gather, sublane-major table
    tbl2 = jax.random.normal(key, (150_000, 16), jnp.bfloat16)
    f = jax.jit(lambda t, i: t[i])
    dt = timeit(f, tbl2, idx)
    print(f"gather (sublane-axis) {m/1e6:.1f}M x 32B: {dt*1e3:.1f} ms = "
          f"{m/dt/1e6:.0f}M/s", flush=True)

    # sort_key_val at BA scale
    vals = jax.random.normal(key, (m,), jnp.float32)
    f = jax.jit(lambda k_, v: jax.lax.sort_key_val(k_, v))
    dt = timeit(f, idx, vals, n=3)
    print(f"sort_key_val {m/1e6:.1f}M: {dt*1e3:.1f} ms", flush=True)

    # segment_sum on sorted keys
    skeys = jnp.sort(idx)
    f = jax.jit(lambda v, k_: jax.ops.segment_sum(v, k_,
                                                  num_segments=150_000))
    dt = timeit(f, vals, skeys)
    print(f"segment_sum 6.34M->150k (sorted): {dt*1e3:.1f} ms", flush=True)

    # XLA native scatter-add
    f = jax.jit(lambda i, v: jnp.zeros((150_000,), jnp.float32).at[i].add(v))
    dt = timeit(f, idx, vals, n=3)
    print(f"xla scatter-add {m/1e6:.1f}M: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
