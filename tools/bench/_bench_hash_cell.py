"""Dense-prefix cell path vs all-pair path for the packed hash encoder
at Replica BA scale. Run on TPU from repo root."""

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


def timeit(fn, n=10):
    float(jnp.sum(fn()))
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    # Replica room0 grid: hash_size 16, 16 levels, base 16, desired ~340.
    spec = HP.make_packed_spec(340, log2_hashmap_size=16, n_levels=16,
                               base_resolution=16)
    nd = HP._n_dense(spec)
    print(f"dense prefix: {nd}/{spec.n_levels} levels, "
          f"res {spec.resolutions[:nd]}")
    key = jax.random.PRNGKey(0)
    table = HP.init_packed(key, spec)
    n_pts = 2304 * 43          # BA rays x samples
    x = jax.random.uniform(jax.random.PRNGKey(1), (n_pts, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (n_pts, spec.out_dim))

    for cell in (False, True):
        enc = HP.make_packed_encode(spec, cell_dense=cell)
        f_j = jax.jit(lambda t: jnp.sum(enc(t, x)))
        d_j = jax.jit(lambda t: sum(
            jnp.sum(l) for l in jax.tree_util.tree_leaves(
                jax.grad(lambda tt: jnp.sum(enc(tt, x) * g))(t))))
        fwd = timeit(lambda: f_j(table))
        bwd = timeit(lambda: d_j(table))
        print(f"cell_dense={cell}: encode_fwd {fwd:.2f} ms, "
              f"fwd+dtable {bwd:.2f} ms")

    # numeric parity on-device
    e0 = HP.make_packed_encode(spec, cell_dense=False)
    e1 = HP.make_packed_encode(spec, cell_dense=True)
    o0 = np.asarray(jax.jit(e0)(table, x[:4096]))
    o1 = np.asarray(jax.jit(e1)(table, x[:4096]))
    print("fwd parity:", np.abs(o0 - o1).max())


if __name__ == "__main__":
    main()
