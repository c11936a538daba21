"""Decoder-cost hypothesis test: 13 ms/iter for two tiny MLPs at 99k
points (_bench_bwd_bisect) cannot be FLOPs (~3 GFLOP). Hypothesis: the
packed encoder emits its output as transpose(2,1,0) of an [F, L, N]
value, XLA fuses that transpose into the consumers, and the decoder
matmuls read a strided operand (MXU efficiency collapse).

  D1  decoder grad alone, inputs as plain [N, C] args     (clean layout)
  D2  enc + blob + decoder grad (the bisect's A baseline)
  D3  D2 + optimization_barrier on the encode output      (forced
      materialization in default layout before the MLP)

Run from repo root on TPU: python tools/bench/_bench_decoder_layout.py
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
    print(f"{name:34s}: {dt:8.2f} ms  ({dt / N_IT:6.2f} /iter)",
          flush=True)
    return dt


def main():
    here = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    cfg = load_config(os.path.join(here, "configs/Replica/room0.yaml"))
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)

    n_pts = (cfg["mapping"]["sample"] + 256) * 43
    flat = jax.random.uniform(key, (n_pts, 3))
    e_arg = jax.random.normal(key, (n_pts, model.input_ch))
    ep_arg = jax.random.normal(key, (n_pts, model.input_ch_pos))

    def tsum(t):
        return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(t))

    def scanned(loss):
        @jax.jit
        def run(mp, flat, e, ep, k):
            def body(c, kk):
                sh = 1e-7 * jax.random.uniform(kk, (1,))
                return c + tsum(jax.grad(loss)(mp, flat + sh, e, ep)), None
            out, _ = jax.lax.scan(body, 0.0, jax.random.split(k, N_IT))
            return out
        return lambda: run(params, flat, e_arg, ep_arg, key)

    dec = model.decoder

    def d1(mp, flat, e, ep):
        return jnp.sum(dec(mp["decoder"], e, ep)) * 1e-6

    def d2(mp, flat, e, ep):
        emb = model._grid_apply(mp["grid"], flat)
        epos = model._pos_apply(None, flat)
        return jnp.sum(dec(mp["decoder"], emb, epos)) * 1e-6

    def d3(mp, flat, e, ep):
        emb = jax.lax.optimization_barrier(
            model._grid_apply(mp["grid"], flat))
        epos = model._pos_apply(None, flat)
        return jnp.sum(dec(mp["decoder"], emb, epos)) * 1e-6

    t1 = timeit("D1 decoder-only grad (clean args)", scanned(d1))
    t2 = timeit("D2 enc+blob+decoder grad", scanned(d2))
    t3 = timeit("D3 D2 + barrier on encode out", scanned(d3))
    print(f"decoder alone      : {t1 / N_IT:6.2f} ms/iter")
    print(f"interaction cost   : {(t2 - t1) / N_IT:6.2f} ms/iter "
          f"(includes encode fwd+bwd)")
    print(f"barrier effect     : {(t3 - t2) / N_IT:6.2f} ms/iter")


if __name__ == "__main__":
    main()
