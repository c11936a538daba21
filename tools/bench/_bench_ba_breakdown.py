"""Where does the BA megastep cycle go? Per-phase timing at Replica scale.

Times (on the current default packed encoder):
  - full BA cycle (10 it, as bench.py)
  - BA with smooth_weight=0 (isolates the smoothness-term cost)
  - forward-only loss (no grad) x10
  - value_and_grad wrt map params only x10 (no pose grads, no optimizer)
  - encode fwd / fwd+dtable / fwd+dx at the BA point count
Run from repo root on TPU: python _bench_ba_breakdown.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import copy
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
    print(f"{name}: {dt:.2f} ms")
    return dt


def main():
    here = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    cfg = load_config(os.path.join(here, "configs", "Replica", "room0.yaml"))
    # ENC=TensoVM / TriPlane / TriPlaneHybrid selects the encoding;
    # SAMPLES_D overrides training.n_samples_d (TPU operating point).
    if os.environ.get("ENC"):
        cfg["grid"]["enc"] = os.environ["ENC"]
    if os.environ.get("SAMPLES_D"):
        cfg["training"]["n_samples_d"] = int(os.environ["SAMPLES_D"])
    if os.environ.get("TRIPLANE_LEVELS"):
        cfg["grid"]["triplane_levels"] = int(os.environ["TRIPLANE_LEVELS"])
    if os.environ.get("RANGE_D"):
        cfg["training"]["n_range_d"] = int(os.environ["RANGE_D"])
    if os.environ.get("DECODER_DTYPE"):
        cfg["decoder"]["dtype"] = os.environ["DECODER_DTYPE"]
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    map_tx = make_map_optimizer(cfg)
    opt_state = map_tx.init(params)

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

    kf_rays = rand_rays(jax.random.PRNGKey(1),
                        num_kf * rays_per_kf).reshape(num_kf, rays_per_kf, 7)
    kf_poses = jnp.tile(jnp.eye(4), (num_kf, 1, 1)).astype(jnp.float32)
    cur_pose = jnp.eye(4, dtype=jnp.float32)
    cur_rays = rand_rays(jax.random.PRNGKey(2), H * W)
    kf_count = jnp.int32(100)

    ba = make_ba_step(model, cfg, map_tx, num_kf, rays_per_kf, rays_per_kf,
                      maxcur=256)
    full = timeit("full_ba_cycle(10it)", lambda: ba(
        params, opt_state, kf_rays, kf_count, kf_poses, cur_pose, cur_rays,
        key)[4])

    cfg_ns = copy.deepcopy(cfg)
    cfg_ns["training"]["smooth_weight"] = 0.0
    model_ns = JointEncoding(cfg_ns, bb)
    ba_ns = make_ba_step(model_ns, cfg_ns, map_tx, num_kf, rays_per_kf,
                         rays_per_kf, maxcur=256)
    timeit("ba_cycle_no_smooth(10it)", lambda: ba_ns(
        params, opt_state, kf_rays, kf_count, kf_poses, cur_pose, cur_rays,
        key)[4])

    # Single-iteration pieces at BA batch size (2048 + 256 rays).
    sample = cfg["mapping"]["sample"] + 256
    rays = rand_rays(jax.random.PRNGKey(3), sample)
    rays_o = jnp.zeros((sample, 3))

    def fwd_loss(mp, k):
        ret = model.forward(mp, k, rays_o, rays[:, :3], rays[:, 3:6],
                            rays[:, 6:7])
        return L.total_loss(ret, cfg["training"])

    f_j = jax.jit(fwd_loss)
    timeit("forward_loss_x1", lambda: f_j(params, key))
    g_j = jax.jit(jax.grad(fwd_loss))
    timeit("map_grad_x1", lambda: g_j(params, key))

    # Smoothness term alone (fwd+grad).
    tr = cfg["training"]
    sm_j = jax.jit(jax.grad(lambda mp, k: model.smoothness(
        mp, k, tr["smooth_pts"], tr["smooth_vox"], tr["smooth_margin"])))
    timeit("smoothness_grad_x1", lambda: sm_j(params, key))

    # Encoder alone at the BA point count.
    n_pts = sample * (tr["n_samples_d"] + tr["n_range_d"])
    x = jax.random.uniform(key, (n_pts, 3))
    g = jax.random.normal(key, (n_pts, model.input_ch))
    enc = model._grid_apply
    gp = params["grid"]
    def tree_sum(t):
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(t))

    timeit(f"encode_fwd_{n_pts}", jax.jit(
        lambda: jnp.sum(enc(gp, x))))
    timeit(f"encode_fwd_dtable_{n_pts}", jax.jit(
        lambda: tree_sum(jax.grad(
            lambda t: jnp.sum(enc(t, x) * g))(gp))))
    timeit(f"encode_fwd_dx_{n_pts}", jax.jit(
        lambda: jnp.sum(jax.grad(
            lambda z: jnp.sum(enc(gp, z) * g))(x))))

    # Optimizer alone.
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    opt_j = jax.jit(lambda g_, s: map_tx.update(g_, s, params))
    timeit("optimizer_update_x1", lambda: opt_j(grads, opt_state))

    print(f"\nimplied per-iter: {full / 10:.1f} ms")


if __name__ == "__main__":
    main()
