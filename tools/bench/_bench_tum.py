"""TUM fr1_desk protocol cycle bench (the reference's second headline
table): tracking 10 it x 1024 rays, mapping/BA 20 it x 2048 rays, with
the TUM sampling stack — n_samples_d 64 + n_range_d 21 + **n_importance
128** (the hierarchical sample_pdf path, unexercised by the Replica
bench) — at 480x640 / hash_size 16.

Reference baseline (BASELINE.md / evaluation/README.md TUM table, RTX
3090 Ti): tracking 7.5 ms x 10 it = 13.33 FPS; mapping 19.0 ms x 20 it
= 2.63 FPS.

Run on TPU from the repo root: python _bench_tum.py
Prints one JSON line (not the driver artifact — bench.py is; this is
supplementary protocol-breadth evidence, recorded in README.md).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/coslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from coslam_tpu.config import load_config
    from coslam_tpu.models.scene_rep import JointEncoding
    from coslam_tpu.runtime.mapping import make_ba_step
    from coslam_tpu.runtime.optim import make_map_optimizer
    from coslam_tpu.runtime.tracking import make_tracking_step

    here = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    cfg = load_config(os.path.join(here, "configs", "Tum", "fr1_desk.yaml"))

    H, W = cfg["cam"]["H"], cfg["cam"]["W"]
    bb = np.array(cfg["mapping"]["bound"], np.float32)

    # fr1_desk is ~600 frames; keyframe every 5.
    n_frames = 600
    num_kf = n_frames // cfg["mapping"]["keyframe_every"] + 1
    rays_per_kf = int(H * W * cfg["mapping"]["n_pixels"])

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def rand_rays(key, n):
        k1, k2, k3 = jax.random.split(key, 3)
        dirs = jnp.concatenate(
            [jax.random.uniform(k1, (n, 2), minval=-0.8, maxval=0.8),
             -jnp.ones((n, 1))], axis=-1)
        return jnp.concatenate(
            [dirs, jax.random.uniform(k2, (n, 3)),
             jax.random.uniform(k3, (n, 1), minval=0.5, maxval=4.0)], -1)

    kf_rays = rand_rays(jax.random.PRNGKey(1),
                        num_kf * rays_per_kf).reshape(num_kf, rays_per_kf, 7)
    kf_poses = jnp.tile(jnp.eye(4), (num_kf, 1, 1)).astype(jnp.float32)
    cur_pose = jnp.eye(4, dtype=jnp.float32)
    cur_rays = rand_rays(jax.random.PRNGKey(2), H * W)
    c2w_init = jnp.eye(4, dtype=jnp.float32)
    track_rays = rand_rays(jax.random.PRNGKey(3), cfg["tracking"]["sample"])
    key = jax.random.PRNGKey(0)
    kf_count = jnp.int32(60)  # mid-sequence occupancy

    def _sync(out):
        return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    def time_fn(fn, n_warmup=1, n_iter=5):
        for _ in range(n_warmup):
            _sync(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fn()
        _sync(out)
        return (time.perf_counter() - t0) / n_iter * 1e3

    import copy
    results = {}
    map_tx = make_map_optimizer(cfg)
    for enc in ("HashGrid", "TensoVM"):
        ecfg = copy.deepcopy(cfg)
        ecfg["grid"]["enc"] = enc
        model = JointEncoding(ecfg, bb)
        params = model.init_params(jax.random.PRNGKey(0))
        opt_state = map_tx.init(params)
        track = make_tracking_step(model, ecfg)
        ba = make_ba_step(model, ecfg, map_tx, num_kf, rays_per_kf,
                          rays_per_kf, maxcur=128)
        t_ms = time_fn(lambda: track(params, c2w_init, track_rays, key)[1])
        b_ms = time_fn(lambda: ba(params, opt_state, kf_rays, kf_count,
                                  kf_poses, cur_pose, cur_rays, key)[4],
                       n_iter=3)
        results[enc] = (t_ms, b_ms)

    t_hg, b_hg = results["HashGrid"]
    t_vm, b_vm = results["TensoVM"]
    print(json.dumps({
        "metric": "tum_fr1desk_cycles",
        "protocol": "tracking 10it x 1024 rays; BA 20it x 2048+cur rays; "
                    "64+21 strat + 128 importance samples/ray; 480x640",
        "hashgrid_tracking_ms": round(t_hg, 2),
        "hashgrid_tracking_fps_vs_baseline": round(1000 / t_hg / 13.33, 3),
        "hashgrid_mapping_ms": round(b_hg, 2),
        "hashgrid_mapping_fps_vs_baseline": round(1000 / b_hg / 2.63, 3),
        "tensovm_tracking_ms": round(t_vm, 2),
        "tensovm_tracking_fps_vs_baseline": round(1000 / t_vm / 13.33, 3),
        "tensovm_mapping_ms": round(b_vm, 2),
        "tensovm_mapping_fps_vs_baseline": round(1000 / b_vm / 2.63, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
