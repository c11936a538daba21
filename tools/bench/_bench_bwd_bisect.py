"""Bisect the parity BA backward: where do 19 ms/iter beyond the encode
table-gradient go?

_bench_cycle_profile measured (scan-amortized, 99k pts/iter):
  fwd 12.96 = encode fwd; enc fwd+dtable 30.2; fwd_bwd_map 49.6.
The ~19 ms gap is in decoder/render/loss backward — absurd for
[2304, 43]-scale math. This probe times grad-wrt-map of nested layers:

  A  sum(raw)            enc + OneBlob + decoder MLPs
  B  sum(render outs)    + raw2outputs (sdf2weights volume rendering)
  C  total_loss          + rgb/depth/fs/sdf losses (masks, sdf bands)

Run from repo root on TPU: python tools/bench/_bench_bwd_bisect.py
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

from coslam_tpu.config import load_config
from coslam_tpu.models.scene_rep import JointEncoding
from coslam_tpu.ops import losses as L
from coslam_tpu.ops import render as R

N_IT = 10


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, n=8):
    sync(fn())
    sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:26s}: {dt:8.2f} ms  ({dt / N_IT:6.2f} /iter)", flush=True)
    return dt


def main():
    here = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    cfg = load_config(os.path.join(here, "configs/Replica/room0.yaml"))
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    tr = cfg["training"]

    n_rays = cfg["mapping"]["sample"] + 256
    n_samp = tr["n_samples_d"] + tr["n_range_d"]
    k1, k2, k3 = jax.random.split(key, 3)
    dirs = jnp.concatenate(
        [jax.random.uniform(k1, (n_rays, 2), minval=-0.8, maxval=0.8),
         -jnp.ones((n_rays, 1))], -1)
    rgb = jax.random.uniform(k2, (n_rays, 3))
    target_d = jax.random.uniform(k3, (n_rays, 1), minval=0.5, maxval=4.0)
    z_vals = jnp.linspace(0.05, 4.5, n_samp)[None, :].repeat(n_rays, 0)
    pts = dirs[:, None, :] * z_vals[..., None]          # [R, S, 3]
    flat = model.normalize_coords(pts.reshape(-1, 3))

    g = jax.random.normal(key, (flat.shape[0], model.input_ch))

    def tsum(t):
        return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(t))

    # All big arrays ride as jit ARGUMENTS — closures constant-fold into
    # the compile payload and choke the tunneled remote-compile service.
    def scanned(loss):
        @jax.jit
        def run(mp, flat, z_vals, rgb, target_d, g, k):
            def body(c, kk):
                sh = 1e-7 * jax.random.uniform(kk, (1,))
                grads = jax.grad(loss)(mp, flat + sh, z_vals, rgb,
                                       target_d, g)
                return c + tsum(grads), None
            out, _ = jax.lax.scan(body, 0.0, jax.random.split(k, N_IT))
            return out
        return lambda: run(params, flat, z_vals, rgb, target_d, g, key)

    def raw_of(mp, flat):
        return model.query_color_sdf(mp, flat).reshape(n_rays, n_samp, 4)

    def loss_A(mp, flat, z_vals, rgb, target_d, g):
        return jnp.sum(raw_of(mp, flat)) * 1e-6

    def loss_B(mp, flat, z_vals, rgb, target_d, g):
        raw = raw_of(mp, flat)
        rgb_map, disp, acc, weights, depth, dvar = R.raw2outputs(
            raw, z_vals, tr["trunc"], cfg["data"]["sc_factor"],
            tr["white_bkgd"])
        return (jnp.sum(rgb_map) + jnp.sum(depth) + jnp.sum(dvar)) * 1e-6

    def loss_C(mp, flat, z_vals, rgb, target_d, g):
        raw = raw_of(mp, flat)
        rgb_map, disp, acc, weights, depth, dvar = R.raw2outputs(
            raw, z_vals, tr["trunc"], cfg["data"]["sc_factor"],
            tr["white_bkgd"])
        rgb_l = L.compute_loss(rgb_map, rgb)
        dep_l = L.compute_loss(depth, target_d[:, 0])
        fs_l, sdf_l = L.get_sdf_loss(z_vals, target_d, raw[..., -1],
                                     tr["trunc"], "l2")
        return (tr["rgb_weight"] * rgb_l + tr["depth_weight"] * dep_l
                + tr["fs_weight"] * fs_l + tr["sdf_weight"] * sdf_l)

    enc = model._grid_apply

    def enc_only(mp, flat, z_vals, rgb, target_d, g):
        return jnp.sum(enc(mp["grid"], flat) * g) * 1e-6

    def enc_blob(mp, flat, z_vals, rgb, target_d, g):
        e = enc(mp["grid"], flat)
        pe = model._pos_apply(None, flat)
        return (jnp.sum(e * g) + jnp.sum(pe)) * 1e-6

    e1 = timeit("A1 encode-only grad", scanned(enc_only))
    a = timeit("A enc+blob+mlp grad", scanned(loss_A))
    b = timeit("B + raw2outputs grad", scanned(loss_B))
    c = timeit("C + losses grad", scanned(loss_C))
    e2 = timeit("A2 + OneBlob grad", scanned(enc_blob))
    print(f"render bwd cost : {(b - a) / N_IT:6.2f} ms/iter")
    print(f"loss bwd cost   : {(c - b) / N_IT:6.2f} ms/iter")
    print(f"decoder fwd+bwd : {(a - e2) / N_IT:6.2f} ms/iter")
    print(f"oneblob fwd     : {(e2 - e1) / N_IT:6.2f} ms/iter")


if __name__ == "__main__":
    main()
