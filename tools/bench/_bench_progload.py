"""Probe: compiled-program load cost, sequential vs concurrent.

The frame loop's startup segment is dominated by one-time loads of the
compiled megastep programs (XLA persistent-cache deserialize + program
upload over the tunneled device link, measured 5-20 s each — see
STATUS.md session 10). _warm_programs currently loads them from ONE
background thread, i.e. sequentially. This probe measures whether the
PJRT client overlaps loads issued from multiple threads.

Usage:
    python _bench_progload.py seq   # one thread, loads back-to-back
    python _bench_progload.py par   # one thread per program

Run each mode in a FRESH process (the in-process executable cache would
hide the second measurement).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import os
import sys
import threading
import time

import numpy as np


def main(mode: str):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/coslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from coslam_tpu.config import load_config
    from coslam_tpu.models.scene_rep import JointEncoding
    from coslam_tpu.runtime.mapping import make_ba_step, make_first_frame_step
    from coslam_tpu.runtime.optim import make_map_optimizer
    from coslam_tpu.runtime.tracking import make_tracking_step

    here = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    cfg = load_config(os.path.join(here, "configs", "Replica",
                                   "room0_vm.yaml"))
    H, W = cfg["cam"]["H"], cfg["cam"]["W"]
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    map_tx = make_map_optimizer(cfg)
    opt_state = map_tx.init(params)

    num_kf = 2000 // cfg["mapping"]["keyframe_every"] + 1
    rays_per_kf = int(H * W * cfg["mapping"]["n_pixels"])
    rays_per_kf -= rays_per_kf % 16

    track = make_tracking_step(model, cfg)
    ff = make_first_frame_step(model, cfg, map_tx, H, W)
    ba_big = make_ba_step(model, cfg, map_tx, num_kf, rays_per_kf,
                          rays_per_kf)
    ba_small = make_ba_step(model, cfg, map_tx, num_kf, rays_per_kf,
                            rays_per_kf, maxcur=128)

    eye = jnp.eye(4, dtype=jnp.float32)
    rays_t = jnp.zeros((cfg["tracking"]["sample"], 7), jnp.float32)
    ring = jnp.zeros((num_kf, rays_per_kf // 16, 128), jnp.float32)
    poses = jnp.tile(eye, (num_kf, 1, 1))
    cur = jnp.zeros((H * W, 7), jnp.float32)

    jobs = {
        "track": lambda: track(params, eye, rays_t, key),
        "ba_small": lambda: ba_small(params, opt_state, ring, jnp.int32(2),
                                     poses, eye, cur, key),
        "ba_big": lambda: ba_big(params, opt_state, ring, jnp.int32(2),
                                 poses, eye, cur, key),
        "first": lambda: ff(params, opt_state, eye, cur, key),
    }

    # Force one tiny transfer first so client/tunnel setup isn't charged
    # to the first program.
    float(jnp.sum(rays_t))

    t0 = time.perf_counter()
    if mode == "seq":
        for name, fn in jobs.items():
            t = time.perf_counter()
            out = fn()
            float(jnp.sum(jax.tree_util.tree_leaves(out)[-1]))
            print(f"  {name}: {time.perf_counter() - t:.1f}s", flush=True)
    else:
        done = {}

        def run(name, fn):
            t = time.perf_counter()
            out = fn()
            float(jnp.sum(jax.tree_util.tree_leaves(out)[-1]))
            done[name] = time.perf_counter() - t

        threads = [threading.Thread(target=run, args=(n, f))
                   for n, f in jobs.items()]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for n, d in done.items():
            print(f"  {n}: {d:.1f}s (incl. queueing)", flush=True)
    print(f"{mode}: total {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "seq")
