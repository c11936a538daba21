"""Scan-amortized per-iteration profile of the BA cycle.

Standalone phase timings on the tunneled dev chip carry ~2-4 ms of
dispatch overhead each, which swamps the real numbers at flagship scale
(7.7 ms/iter). This script times each piece INSIDE a 10-iteration
lax.scan (fresh rng per iter, loss-carried dependency), so the per-iter
figures are true marginal costs comparable with the full BA cycle.

Pieces (all at BA batch size = mapping.sample + 256 rays):
  full            the exact make_ba_step megastep (10 it)
  fwd             forward loss only
  fwd_bwd_map     value_and_grad wrt map params
  fwd_bwd_pose    value_and_grad wrt per-ray pose rows (dx chain)
  fwd_bwd_both    wrt both (= full minus optimizer/smooth/sampling)
  smooth          smoothness grad
  opt             map optimizer update alone
  enc_fwd         encode fwd at the BA point count
  enc_dtable      encode fwd + table grad
  enc_dx          encode fwd + dx grad

ENC/SAMPLES_D/RANGE_D/TRIPLANE_LEVELS env knobs as _bench_ba_breakdown.
Run from repo root on TPU: python _bench_cycle_profile.py
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
from coslam_tpu.runtime.mapping import make_ba_step
from coslam_tpu.runtime.optim import make_map_optimizer

N_IT = 10


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, n=10):
    sync(fn())
    sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:18s}: {dt:8.2f} ms  ({dt / N_IT:6.2f} /iter)")
    return dt


def main():
    here = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    cfg = load_config(os.path.join(here, "configs", "Replica", "room0.yaml"))
    if os.environ.get("ENC"):
        cfg["grid"]["enc"] = os.environ["ENC"]
    if os.environ.get("SAMPLES_D"):
        cfg["training"]["n_samples_d"] = int(os.environ["SAMPLES_D"])
    if os.environ.get("RANGE_D"):
        cfg["training"]["n_range_d"] = int(os.environ["RANGE_D"])
    if os.environ.get("TRIPLANE_LEVELS"):
        cfg["grid"]["triplane_levels"] = int(os.environ["TRIPLANE_LEVELS"])
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    map_tx = make_map_optimizer(cfg)
    opt_state = map_tx.init(params)
    tr = cfg["training"]

    H, W = cfg["cam"]["H"], cfg["cam"]["W"]
    num_kf = 2000 // cfg["mapping"]["keyframe_every"] + 1
    rays_per_kf = int(H * W * cfg["mapping"]["n_pixels"])

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def rand_rays(k, n):
        k1, k2, k3 = jax.random.split(k, 3)
        dirs = jnp.concatenate(
            [jax.random.uniform(k1, (n, 2), minval=-0.8, maxval=0.8),
             -jnp.ones((n, 1))], axis=-1)
        return jnp.concatenate([dirs, jax.random.uniform(k2, (n, 3)),
                                jax.random.uniform(k3, (n, 1), minval=0.5,
                                                   maxval=4.0)], -1)

    from coslam_tpu.runtime.keyframe import RAY_CHUNK, pack_rays
    rays_per_kf -= rays_per_kf % RAY_CHUNK
    kf_rays = jax.jit(pack_rays)(
        rand_rays(jax.random.PRNGKey(1),
                  num_kf * rays_per_kf).reshape(num_kf, rays_per_kf, 7))
    kf_poses = jnp.tile(jnp.eye(4), (num_kf, 1, 1)).astype(jnp.float32)
    cur_pose = jnp.eye(4, dtype=jnp.float32)
    cur_rays = rand_rays(jax.random.PRNGKey(2), H * W)
    kf_count = jnp.int32(100)

    ba = make_ba_step(model, cfg, map_tx, num_kf, rays_per_kf, rays_per_kf,
                      maxcur=256)
    timeit("full", lambda: ba(
        params, opt_state, kf_rays, kf_count, kf_poses, cur_pose, cur_rays,
        key)[4])

    sample = cfg["mapping"]["sample"] + 256
    rays = rand_rays(jax.random.PRNGKey(3), sample)
    n_pts = sample * (tr["n_samples_d"] + tr["n_range_d"])

    # Per-ray pose rows as differentiable inputs reproduce the pose-grad
    # chain (dx through the encoder + ray-transform jacobians).
    pose_rows = jnp.tile(jnp.eye(3, 4, dtype=jnp.float32), (sample, 1, 1))

    def loss_fn(mp, prows, k):
        model.remat = True
        Rm = prows[:, :, :3]
        t = prows[:, :, 3]
        rays_d = jnp.einsum("nij,nj->ni", Rm, rays[:, :3])
        ret = model.forward(mp, k, t, rays_d, rays[:, 3:6], rays[:, 6:7])
        return L.total_loss(ret, tr)

    def scanned(inner):
        @jax.jit
        def run(mp, k):
            def body(c, kk):
                return c + inner(mp, kk), None
            out, _ = jax.lax.scan(body, 0.0, jax.random.split(k, N_IT))
            return out
        return lambda: run(params, key)

    def tsum(t):
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(t))

    timeit("fwd", scanned(lambda mp, k: loss_fn(mp, pose_rows, k)))
    timeit("fwd_bwd_map", scanned(
        lambda mp, k: tsum(jax.grad(loss_fn)(mp, pose_rows, k))))
    timeit("fwd_bwd_pose", scanned(
        lambda mp, k: tsum(jax.grad(loss_fn, argnums=1)(mp, pose_rows, k))))
    timeit("fwd_bwd_both", scanned(
        lambda mp, k: tsum(jax.grad(loss_fn, argnums=(0, 1))(
            mp, pose_rows, k)[0])))
    timeit("smooth", scanned(
        lambda mp, k: tsum(jax.grad(lambda m, kk: model.smoothness(
            m, kk, tr["smooth_pts"], tr["smooth_vox"],
            tr["smooth_margin"]))(mp, k))))

    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def opt_scan(g, s):
        def body(c, _):
            st, acc = c
            up, st = map_tx.update(g, st, params)
            return (st, acc + tsum(up)), None
        (s, acc), _ = jax.lax.scan(body, (s, 0.0), None, length=N_IT)
        return acc
    timeit("opt", lambda: opt_scan(grads, opt_state))

    x = jax.random.uniform(key, (n_pts, 3))
    g = jax.random.normal(key, (n_pts, model.input_ch))
    enc = model._grid_apply
    gp = params["grid"]

    def enc_scan(inner):
        @jax.jit
        def run(k):
            def body(c, kk):
                xx = x + 1e-6 * jax.random.uniform(kk, (1,))
                return c + inner(xx), None
            out, _ = jax.lax.scan(body, 0.0, jax.random.split(k, N_IT))
            return out
        return lambda: run(key)

    timeit("enc_fwd", enc_scan(lambda xx: jnp.sum(enc(gp, xx))))
    timeit("enc_dtable", enc_scan(
        lambda xx: tsum(jax.grad(lambda t: jnp.sum(enc(t, xx) * g))(gp))))
    timeit("enc_dx", enc_scan(
        lambda xx: jnp.sum(jax.grad(lambda z: jnp.sum(enc(gp, z) * g))(xx))))

    print(f"\nconfig: enc={cfg['grid']['enc']} "
          f"samples={tr['n_samples_d']}+{tr['n_range_d']} "
          f"pts={n_pts} sample={sample}")


if __name__ == "__main__":
    main()
