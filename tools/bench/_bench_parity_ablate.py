"""Ablation decomposition of the HashGrid-parity BA iteration.

The round-2 breakdown left ~20 ms/iter of the 65 ms parity BA cycle
unattributed (forward_loss 16.5 + dtable ~16 + smoothness 20.7 do not
compose into the measured 65). This probe times scan-amortized variants
that add one BA ingredient at a time:

  A  grad wrt map params only, rays CONSTANT (no pose chain), no smooth
  B  + rays built from pose tangents, grad wrt (pose, map)  [dx chain]
  C  + smoothness term in the same loss                      [TV chain]
  D  the shipped make_ba_step megastep (reference protocol)

Run from repo root on TPU: python tools/bench/_bench_parity_ablate.py
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
import optax

from coslam_tpu.config import load_config
from coslam_tpu.models.scene_rep import JointEncoding
from coslam_tpu.ops import losses as L
from coslam_tpu.ops import pose as P
from coslam_tpu.runtime.optim import make_map_optimizer

ITERS = 10


def timeit(fn, n=5, warm=2):
    for _ in range(warm):
        float(jnp.sum(jax.tree_util.tree_leaves(fn())[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "..")
    cfg = load_config(os.path.join(here, "configs/Replica/room0.yaml"))
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    tr = cfg["training"]
    map_tx = make_map_optimizer(cfg)
    opt_state = map_tx.init(params)

    n_rays = cfg["mapping"]["sample"] + 128
    k1, k2, k3 = jax.random.split(key, 3)
    dirs = jnp.concatenate(
        [jax.random.uniform(k1, (n_rays, 2), minval=-0.8, maxval=0.8),
         -jnp.ones((n_rays, 1))], axis=-1)
    rgb = jax.random.uniform(k2, (n_rays, 3))
    depth = jax.random.uniform(k3, (n_rays, 1), minval=0.5, maxval=4.0)
    ray_data = jnp.concatenate([dirs, rgb, depth], -1)

    max_kf = 401
    mat_to_tensor, mat_from_tensor = P.get_pose_representation(
        tr["rot_rep"])
    poses0 = jnp.tile(jnp.eye(4), (max_kf + 1, 1, 1))
    pp0 = {"rot": mat_to_tensor(poses0[:, :3, :3]),
           "trans": poses0[:, :3, 3]}
    ray_ids = jax.random.randint(key, (n_rays,), 0, max_kf)

    def fwd_map_only(mp, k):
        ret = model.forward(mp, k, jnp.zeros((n_rays, 3)), dirs, rgb, depth)
        return L.total_loss(ret, tr)

    def fwd_posed(pp, mp, k):
        mats = mat_from_tensor(pp["rot"], pp["trans"])
        onehot = (ray_ids[:, None] ==
                  jnp.arange(max_kf + 1)[None, :]).astype(mats.dtype)
        rows = (onehot @ mats[:, :3, :].reshape(max_kf + 1, 12)
                ).reshape(-1, 3, 4)
        rays_d = jnp.einsum("nij,nj->ni", rows[:, :, :3], dirs)
        ret = model.forward(mp, k, rows[:, :, 3], rays_d, rgb, depth)
        return L.total_loss(ret, tr)

    def fwd_posed_smooth(pp, mp, k):
        k1, k2 = jax.random.split(k)
        base = fwd_posed(pp, mp, k1)
        sm = model.smoothness(mp, k2, tr["smooth_pts"], tr["smooth_vox"],
                              tr["smooth_margin"])
        return base + tr["smooth_weight"] * sm

    def scan_of(loss_fn, with_pose):
        @jax.jit
        def run(mp, opt_state, key):
            def body(carry, k):
                mp, opt_state = carry
                if with_pose:
                    pose_g, map_g = jax.grad(
                        loss_fn, argnums=(0, 1))(pp0, mp, k)
                    # consume pose grads so they are not DCE'd
                    map_g = jax.tree_util.tree_map(
                        lambda x: x + 0.0 * jnp.sum(pose_g["rot"]), map_g)
                else:
                    map_g = jax.grad(loss_fn)(mp, k)
                updates, opt_state = map_tx.update(map_g, opt_state, mp)
                mp = optax.apply_updates(mp, updates)
                return (mp, opt_state), 0.0
            keys = jax.random.split(key, ITERS)
            (mp, opt_state), _ = jax.lax.scan(body, (mp, opt_state), keys)
            return jax.tree_util.tree_leaves(mp)[0]
        return run

    runA = scan_of(fwd_map_only, with_pose=False)
    runB = scan_of(fwd_posed, with_pose=True)
    runC = scan_of(fwd_posed_smooth, with_pose=True)

    a = timeit(lambda: runA(params, opt_state, key))
    print(f"A map-grad only, const rays, no smooth : {a:7.1f} ms "
          f"({a/ITERS:5.2f}/iter)")
    b = timeit(lambda: runB(params, opt_state, key))
    print(f"B + pose chain (grad wrt pp too)       : {b:7.1f} ms "
          f"({b/ITERS:5.2f}/iter)")
    c = timeit(lambda: runC(params, opt_state, key))
    print(f"C + smoothness in loss                 : {c:7.1f} ms "
          f"({c/ITERS:5.2f}/iter)")
    print(f"   pose-chain cost  : {(b-a)/ITERS:5.2f} ms/iter")
    print(f"   smoothness cost  : {(c-b)/ITERS:5.2f} ms/iter")

    # Standalone pieces at the same scale, for the roofline table.
    smooth_g = jax.jit(jax.grad(
        lambda mp, k: model.smoothness(mp, k, tr["smooth_pts"],
                                       tr["smooth_vox"],
                                       tr["smooth_margin"])))
    sg = timeit(lambda: smooth_g(params, key))
    print(f"standalone smoothness grad             : {sg:7.2f} ms")

    n_pts = n_rays * (tr["n_samples_d"] + tr["n_range_d"])
    xpts = jax.random.uniform(key, (n_pts, 3))
    gout = jax.random.normal(key, (n_pts, model.input_ch))
    enc = model._grid_apply
    gp = params["grid"]
    e_fwd = timeit(lambda: jax.jit(
        lambda t, x: jnp.sum(enc(t, x)))(gp, xpts))
    e_dt = timeit(lambda: jax.jit(lambda t, x, g: jnp.sum(jax.grad(
        lambda tt: jnp.sum(enc(tt, x) * g))(t)))(gp, xpts, gout))
    e_dtdx = timeit(lambda: jax.jit(lambda t, x, g: tuple(
        jnp.sum(v) for v in jax.grad(
            lambda tt, xx: jnp.sum(enc(tt, xx) * g),
            argnums=(0, 1))(t, x)))(gp, xpts, gout))
    print(f"encode fwd {n_pts} pts                 : {e_fwd:7.2f} ms")
    print(f"encode fwd+dtable                      : {e_dt:7.2f} ms")
    print(f"encode fwd+dtable+dx                   : {e_dtdx:7.2f} ms")


if __name__ == "__main__":
    main()
