"""Pinpoint the packed-hash encoder's backward cost at BA scale.

_bench_cycle_profile.py measured (Replica room0, 99072 points/iter):
  enc_fwd 13.1, enc_dtable(const cotangent) 17.2 marginal,
  enc_head_dtable (real data-dependent cotangent) 30.3 marginal.
The const-cotangent number lets XLA DCE the forward gathers (dtable
streams need only weights + cotangent), so the real backward is ~13 ms
more expensive than the microbench suggested. This script times each
bwd piece with FIXED residuals inside a 10-iter scan to locate the gap:
  pack        storage (re)pack, pair + cell layouts
  gather      pair + cell gathers
  combine     trilinear combine from pairs
  wmath       bwd vector math: weights -> gw/v0/v1 streams + dx
  scatter     serial RMW kernels from precomputed streams
  vjp_full    the real bwd closure via jax.vjp

Run from repo root on TPU: python _bench_packed_bwd.py
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

from coslam_tpu.ops import hash_packed as HP

N_IT = 10
N = 99072
key = jax.random.PRNGKey(0)
spec = HP.make_packed_spec(400, 16, 16, 2, 16)
table = jax.random.normal(key, (spec.total_entries, 2)) * 0.1
x0 = jax.random.uniform(key, (N, 3))
g = jax.random.normal(key, (N, spec.n_levels * spec.n_features))
nd = HP._n_dense(spec)
nh = spec.n_levels - nd
F = spec.n_features
L = spec.n_levels
print(f"levels={L} dense={nd} hashed={nh} N={N}")


def tsum(t):
    return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(t))


def sync(v):
    return float(jnp.sum(jax.tree_util.tree_leaves(v)[0]))


def timeit(name, fn, n=5):
    sync(fn())
    sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:12s}: {dt:8.2f} ms  ({dt / N_IT:6.2f} /iter)")
    return dt


def scanned(inner):
    @jax.jit
    def run(k):
        def body(c, kk):
            xx = x0 + 1e-6 * jax.random.uniform(kk, (1,))
            return c + inner(xx), None
        out, _ = jax.lax.scan(body, 0.0, jax.random.split(k, N_IT))
        return out
    return lambda: run(key)


# Fixed packed storages (hoisted out of the scan on purpose for the
# piecewise timings; the pack itself is timed separately).
cstorage = HP.pack_cell_storage(spec, table, nd, jnp.bfloat16)
storage = HP.pack_storage(spec, table, jnp.bfloat16)


def pieces(xx):
    cell, w = HP._cells_and_weights(spec, xx)
    crows = HP._cell_rows(spec, cell, nd)
    e = HP._corner_entries(spec, cell)
    rows, offs = HP._rows_offs(spec, e)
    return cell, w, crows, e, rows, offs


def do_gather(xx):
    cell, w, crows, e, rows, offs = pieces(xx)
    p0d, p1d = HP._gather_cells(spec, cstorage, crows, xx.dtype)
    p0h, p1h = HP._gather_pairs(spec, storage, rows[nd:], offs[nd:], xx.dtype)
    return (jnp.concatenate([p0d, p0h], 1), jnp.concatenate([p1d, p1h], 1),
            w, crows, e)


def do_combine(xx):
    p0, p1, w, crows, e = do_gather(xx)
    return jnp.sum(HP._combine(p0, p1, w[:, 2], HP._xy_weights(w)))


def streams_math(xx, with_dx=True):
    p0, p1, w, crows, e = do_gather(xx)
    wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
    wxy = HP._xy_weights(w)
    gl = g.reshape(N, L, F).transpose(2, 1, 0)
    gw = gl[:, :, None] * wxy[None]
    v0 = gw * (1 - wz)[None, :, None]
    v1 = gw * wz[None, :, None]
    acc = jnp.sum(v0[0, 0]) + jnp.sum(v1[0, 0])
    if with_dx:
        featz = p0 * (1 - wz)[None, :, None] + p1 * wz[None, :, None]
        diffz = p1 - p0
        dwxy = jnp.sum(featz * gl[:, :, None], axis=0)
        dwz = jnp.sum(jnp.sum(diffz * gl[:, :, None], axis=0) * wxy, axis=1)
        acc = acc + jnp.sum(dwxy) + jnp.sum(dwz)
    return acc, (crows, e, v0, v1)


def do_scatter(xx):
    _, (crows, e, v0, v1) = streams_math(xx, with_dx=False)
    cstreams = [(v1 if zc else v0)[f, :nd, xy]
                for xy in range(4) for zc in (0, 1) for f in range(F)]
    dt1 = HP._cell_table_grad(spec, crows, cstreams, nd, False)
    streams = tuple(v0[f, nd:] for f in range(F)) + tuple(
        v1[f, nd:] for f in range(F))
    dt2 = HP._scatter_table_grad(spec, e, streams, False, l_start=nd)
    return jnp.sum(dt1) + jnp.sum(dt2)


enc = HP.make_packed_encode(spec, jnp.bfloat16)


def vjp_full(xx):
    out, vfn = jax.vjp(enc, table, xx)
    dt, dx = vfn(g * jnp.tanh(out))
    return tsum(dt) + jnp.sum(dx)


def do_pack(xx):
    cs = HP.pack_cell_storage(spec, table + xx[0, 0], nd, jnp.bfloat16)
    s = HP.pack_storage(spec, table + xx[0, 0], jnp.bfloat16)
    return jnp.sum(cs[:4].astype(jnp.float32)) + jnp.sum(
        s[:4].astype(jnp.float32))


timeit("pack", scanned(do_pack))
timeit("gather", scanned(lambda xx: jnp.sum(do_gather(xx)[0][0])))
timeit("combine", scanned(do_combine))
timeit("wmath", scanned(lambda xx: streams_math(xx)[0]))
timeit("wmath_nodx", scanned(lambda xx: streams_math(xx, False)[0]))
timeit("scatter", scanned(do_scatter))
timeit("vjp_full", scanned(vjp_full))

# Bisect vs _bench_cycle_profile.py's enc_head_dtable (measured 43 ms/iter
# through model._grid_apply vs 17 here): exact same formulation.
w_head = jax.random.normal(key, (spec.out_dim, 1)) * 0.1
table_small = jax.random.uniform(key, (spec.total_entries, 2),
                                 minval=-1e-4, maxval=1e-4)


def head_dtable(tab):
    def inner(xx):
        return tsum(jax.grad(
            lambda t: jnp.sum(jnp.tanh(enc(t, xx) @ w_head)))(tab))
    return inner


timeit("head_dt_n01", scanned(head_dtable(table)))
timeit("head_dt_tiny", scanned(head_dtable(table_small)))


def vjp_fullsum(xx):
    out, vfn = jax.vjp(enc, table, xx)
    dt, dx = vfn(g * jnp.tanh(out))
    return tsum(dt) + jnp.sum(dx)


def vjp_headcot(xx):
    out, vfn = jax.vjp(enc, table, xx)
    h = jnp.tanh(out @ w_head)
    cot = (1.0 - h * h) @ w_head.T
    dt, dx = vfn(cot)
    return tsum(dt) + jnp.sum(dx)


def grad_elemwise(xx):
    return tsum(jax.grad(
        lambda t: jnp.sum(jnp.tanh(enc(t, xx)) * g))(table))


timeit("vjp_fullsum", scanned(vjp_fullsum))
timeit("vjp_headcot", scanned(vjp_headcot))
timeit("grad_elem", scanned(grad_elemwise))


def vjp_paironly(xx):
    out, vfn = jax.vjp(enc, table, xx)
    dt, dx = vfn(g * jnp.tanh(out))
    return tsum(dt) + jnp.sum(dx)  # (was dt[-8:]: DCE hole)


def scatter_cell_only(xx):
    _, (crows, e, v0, v1) = streams_math(xx, with_dx=False)
    cstreams = [(v1 if zc else v0)[f, :nd, xy]
                for xy in range(4) for zc in (0, 1) for f in range(F)]
    dt1 = HP._cell_table_grad(spec, crows, cstreams, nd, False)
    return jnp.sum(dt1)


def scatter_pair_only(xx):
    _, (crows, e, v0, v1) = streams_math(xx, with_dx=False)
    streams = tuple(v0[f, nd:] for f in range(F)) + tuple(
        v1[f, nd:] for f in range(F))
    dt2 = HP._scatter_table_grad(spec, e, streams, False, l_start=nd)
    return jnp.sum(dt2)


timeit("vjp_paironly", scanned(vjp_paironly))
timeit("scat_cell", scanned(scatter_cell_only))
timeit("scat_pair", scanned(scatter_pair_only))


def vjp_dt_nodx(xx):
    out, vfn = jax.vjp(enc, table, xx)
    dt, dx = vfn(g * jnp.tanh(out))
    return tsum(dt)


def scatter_both_plus_gather(xx):
    # Both kernels + live gathers (consume p0) but NO dx math.
    p0, p1, w, crows, e = do_gather(xx)
    wxy = HP._xy_weights(w)
    wz = w[:, 2]
    gl = g.reshape(N, L, F).transpose(2, 1, 0)
    gw = gl[:, :, None] * wxy[None]
    v0 = gw * (1 - wz)[None, :, None]
    v1 = gw * wz[None, :, None]
    cstreams = [(v1 if zc else v0)[f, :nd, xy]
                for xy in range(4) for zc in (0, 1) for f in range(F)]
    dt1 = HP._cell_table_grad(spec, crows, cstreams, nd, False)
    streams = tuple(v0[f, nd:] for f in range(F)) + tuple(
        v1[f, nd:] for f in range(F))
    dt2 = HP._scatter_table_grad(spec, e, streams, False, l_start=nd)
    return jnp.sum(dt1) + jnp.sum(dt2) + jnp.sum(p0[0, 0])


timeit("vjp_dt_nodx", scanned(vjp_dt_nodx))
timeit("scat_gather", scanned(scatter_both_plus_gather))


def scat_gather_datadep(xx):
    # Same as scat_gather but the cotangent depends on the forward output
    # (like the real bwd): forces per-iter transpose + serialization.
    p0, p1, w, crows, e = do_gather(xx)
    wxy = HP._xy_weights(w)
    wz = w[:, 2]
    out = HP._combine(p0, p1, wz, wxy)
    g2 = g * jnp.tanh(out)
    gl = g2.reshape(N, L, F).transpose(2, 1, 0)
    gw = gl[:, :, None] * wxy[None]
    v0 = gw * (1 - wz)[None, :, None]
    v1 = gw * wz[None, :, None]
    cstreams = [(v1 if zc else v0)[f, :nd, xy]
                for xy in range(4) for zc in (0, 1) for f in range(F)]
    dt1 = HP._cell_table_grad(spec, crows, cstreams, nd, False)
    streams = tuple(v0[f, nd:] for f in range(F)) + tuple(
        v1[f, nd:] for f in range(F))
    dt2 = HP._scatter_table_grad(spec, e, streams, False, l_start=nd)
    return jnp.sum(dt1) + jnp.sum(dt2)


def transpose_only(xx):
    g2 = g * xx[:, :1]
    gl = g2.reshape(N, L, F).transpose(2, 1, 0)
    return jnp.sum(gl[0, 0])


timeit("scat_datadep", scanned(scat_gather_datadep))
timeit("transp_only", scanned(transpose_only))
