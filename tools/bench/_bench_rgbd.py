"""SyntheticRGBD (NeuralRGBD) protocol cycle bench: tracking 10 it x
1024 rays, mapping/BA 10 it x 2048 rays with optim_cur, the
SyntheticRGBD sampling stack — n_samples_d 32 + n_range_d 11, range_d
0.1 — at 480x640 / hash_size 16 / voxel_sdf 0.01, plus the TPU-tuned
operating point (configs/Synthetic/br_vm.yaml: TensoVM 3-level
pyramid, n_samples_d 16).

Reference baseline (BASELINE.md / evaluation/README.md SyntheticRGBD
table, RTX 3090 Ti): tracking 6.4 ms x 10 it = 15.63 FPS; mapping
10.4 ms x 10 it = 9.62 FPS.

Run on TPU from the repo root: python _bench_rgbd.py
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
    n_frames = 1000  # breakfast-room-class sequence; keyframe every 5

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

    results = {}
    for name, cfg_path in (
            ("reference", os.path.join(here, "configs", "Synthetic",
                                       "br.yaml")),
            ("tuned", os.path.join(here, "configs", "Synthetic",
                                   "br_vm.yaml"))):
        cfg = load_config(cfg_path)
        H, W = cfg["cam"]["H"], cfg["cam"]["W"]
        bb = np.array(cfg["mapping"]["bound"], np.float32)
        num_kf = n_frames // cfg["mapping"]["keyframe_every"] + 1
        rays_per_kf = int(H * W * cfg["mapping"]["n_pixels"])

        kf_rays = rand_rays(jax.random.PRNGKey(1), num_kf * rays_per_kf
                            ).reshape(num_kf, rays_per_kf, 7)
        kf_poses = jnp.tile(jnp.eye(4), (num_kf, 1, 1)).astype(jnp.float32)
        cur_pose = jnp.eye(4, dtype=jnp.float32)
        cur_rays = rand_rays(jax.random.PRNGKey(2), H * W)
        c2w_init = jnp.eye(4, dtype=jnp.float32)
        track_rays = rand_rays(jax.random.PRNGKey(3),
                               cfg["tracking"]["sample"])
        key = jax.random.PRNGKey(0)
        kf_count = jnp.int32(num_kf // 2)  # mid-sequence occupancy

        map_tx = make_map_optimizer(cfg)
        model = JointEncoding(cfg, bb)
        params = model.init_params(jax.random.PRNGKey(0))
        opt_state = map_tx.init(params)
        track = make_tracking_step(model, cfg)
        ba = make_ba_step(model, cfg, map_tx, num_kf, rays_per_kf,
                          rays_per_kf, maxcur=128)
        t_ms = time_fn(lambda: track(params, c2w_init, track_rays, key)[1])
        b_ms = time_fn(lambda: ba(params, opt_state, kf_rays, kf_count,
                                  kf_poses, cur_pose, cur_rays, key)[4],
                       n_iter=3)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        results[name] = (t_ms, b_ms, n_params)

    t_hg, b_hg, p_hg = results["reference"]
    t_vm, b_vm, p_vm = results["tuned"]
    print(json.dumps({
        "metric": "rgbd_breakfast_room_cycles",
        "protocol": "tracking 10it x 1024 rays; BA 10it x 2048+cur rays "
                    "with optim_cur; 32+11 strat samples/ray (tuned: "
                    "16+11); 480x640",
        "reference_recipe_tracking_ms": round(t_hg, 2),
        "reference_recipe_tracking_fps_vs_baseline":
            round(1000 / t_hg / 15.63, 3),
        "reference_recipe_mapping_ms": round(b_hg, 2),
        "reference_recipe_mapping_fps_vs_baseline":
            round(1000 / b_hg / 9.62, 3),
        "reference_recipe_n_params": p_hg,
        "tuned_tracking_ms": round(t_vm, 2),
        "tuned_tracking_fps_vs_baseline": round(1000 / t_vm / 15.63, 3),
        "tuned_mapping_ms": round(b_vm, 2),
        "tuned_mapping_fps_vs_baseline": round(1000 / b_vm / 9.62, 3),
        "tuned_n_params": p_vm,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
