"""A/B the z-window pair-select implementations at parity tracking and
BA scales (VERDICT r4 #5: the tracking megastep carries ~0.67 ms/iter of
XLA relayout copies at the gather/select boundary — `copy.1099` in the
r4 xplane trace, hash_packed.py:251):

  xla     storage[:, rows] feature-major gather block + 8-way masked
          select (the shipped r4 path; XLA inserts a full-block HBM
          relayout copy between gather and select)
  pallas  native [M, 8F] row gather + one Pallas tile pass doing the
          in-VMEM transpose + select (_gather_pairs_rows)

Checks bit-equality of p0/p1 and times both standalone. Run from repo
root on TPU."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  _os.path.expanduser("~/.cache/coslam_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from coslam_tpu.ops import hash_packed as hp


def bench(fn, *args, n=20):
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3, out


def run_scale(name, L, n_pts, key):
    spec = hp.make_packed_spec(desired_resolution=407,
                               log2_hashmap_size=16)
    F = spec.n_features
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (spec.total_entries, F), jnp.float32)
    storage = jax.jit(lambda t: hp.pack_storage(spec, t, jnp.bfloat16))(table)
    rows = jax.random.randint(k2, (L, 4, n_pts), 0, spec.total_rows - 1)
    offs = jax.random.randint(k3, (L, 4, n_pts), 0, hp._STRIDE)

    ms_x, out_x = bench(
        lambda s, r, o: hp._gather_pairs(spec, s, r, o, jnp.float32),
        storage, rows, offs)
    ms_p, out_p = bench(
        lambda s, r, o: hp._gather_pairs_rows(spec, s, r, o, jnp.float32),
        storage, rows, offs)

    eq0 = bool(jnp.all(out_x[0] == out_p[0]))
    eq1 = bool(jnp.all(out_x[1] == out_p[1]))
    m = L * 4 * n_pts
    print(f"{name}: M={m/1e6:.2f}M  xla {ms_x:.2f} ms  "
          f"pallas {ms_p:.2f} ms  ({ms_x/ms_p:.2f}x)  "
          f"bit-equal p0={eq0} p1={eq1}", flush=True)
    return eq0 and eq1


def main():
    key = jax.random.PRNGKey(0)
    ok = True
    # Parity tracking scale: 1024 rays x 43 samples, 11 hashed levels.
    ok &= run_scale("track", 11, 1024 * 43, key)
    # Parity BA scale: 2304 rays x 43 samples.
    ok &= run_scale("ba", 11, 2304 * 43, jax.random.PRNGKey(1))
    print("OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
