"""Flagship BA operating-point A/B: pyramid levels / maxcur block /
samples. Full BA cycle + tracking cycle per variant. Run on TPU."""

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
from coslam_tpu.runtime.mapping import make_ba_step
from coslam_tpu.runtime.optim import make_map_optimizer
from coslam_tpu.runtime.tracking import make_tracking_step


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(fn, n=10):
    sync(fn())
    sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    here = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    base = load_config(os.path.join(here, "configs", "Replica",
                                    "room0.yaml"))
    base["grid"]["enc"] = "TensoVM"
    base["training"]["n_samples_d"] = 16

    H, W = base["cam"]["H"], base["cam"]["W"]
    num_kf = 2000 // base["mapping"]["keyframe_every"] + 1
    rays_per_kf = int(H * W * base["mapping"]["n_pixels"])

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
    track_rays = rand_rays(jax.random.PRNGKey(3),
                           base["tracking"]["sample"])
    kf_count = jnp.int32(100)
    key = jax.random.PRNGKey(0)
    c2w = jnp.eye(4, dtype=jnp.float32)

    variants = [
        ("L4 mc256", {}, 256),
        ("L4 mc128", {}, 128),
        ("L3 mc256", {"triplane_levels": 3}, 256),
        ("L3f4 mc256", {"triplane_levels": 3, "triplane_features": 4}, 256),
        ("L4 s14 mc128", {"n_samples_d": 14}, 128),
    ]
    for name, over, maxcur in variants:
        cfg = copy.deepcopy(base)
        for k, v in over.items():
            if k.startswith("triplane"):
                cfg["grid"][k] = v
            else:
                cfg["training"][k] = v
        bb = np.array(cfg["mapping"]["bound"], np.float32)
        model = JointEncoding(cfg, bb)
        params = model.init_params(jax.random.PRNGKey(0))
        tx = make_map_optimizer(cfg)
        opt = tx.init(params)
        track = make_tracking_step(model, cfg)
        ba = make_ba_step(model, cfg, tx, num_kf, rays_per_kf, rays_per_kf,
                          maxcur=maxcur)
        tms = timeit(lambda: track(params, c2w, track_rays, key)[1])
        bms = timeit(lambda: ba(params, opt, kf_rays, kf_count, kf_poses,
                                cur_pose, cur_rays, key)[4], n=5)
        npar = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"{name}: tracking {tms:6.2f} ms  BA {bms:7.2f} ms  "
              f"params {npar}", flush=True)


if __name__ == "__main__":
    main()
