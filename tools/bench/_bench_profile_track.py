"""Profile the HashGrid-parity TRACKING megastep per-op (the BA
counterpart is _bench_profile_d2.py). Captures an xplane trace of the
10-iteration tracking scan at Replica parity scale (1024 rays x 43
samples) and aggregates device time by op category. Run from repo root
on TPU."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import glob
import os

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/coslam_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import load_config
from coslam_tpu.models.scene_rep import JointEncoding
from coslam_tpu.runtime.tracking import make_tracking_step

LOGDIR = "/tmp/jaxprof_track"


def main():
    here = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    cfg = load_config(os.path.join(here, "configs/Replica/room0.yaml"))
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)

    n_rays = cfg["tracking"]["sample"]
    k1, k2 = jax.random.split(key)
    dirs = jax.random.normal(k1, (n_rays, 3)) * jnp.array([0.3, 0.3, 0.0]) \
        + jnp.array([0.0, 0.0, -1.0])
    rays = jnp.concatenate([
        dirs, jax.random.uniform(k2, (n_rays, 3)),
        jax.random.uniform(k2, (n_rays, 1), minval=0.5, maxval=2.0)], axis=1)
    c2w = jnp.eye(4, dtype=jnp.float32)

    track = make_tracking_step(model, cfg)

    import time
    float(track(params, c2w, rays, key)[1])  # compile + warm

    def run_once():
        return float(track(params, c2w, rays, key)[1])

    run_once()
    t0 = time.perf_counter()
    n_rep = 20
    for _ in range(n_rep):
        run_once()
    ms = (time.perf_counter() - t0) / n_rep * 1e3
    print(f"tracking megastep: {ms:.2f} ms / frame "
          f"({ms / cfg['tracking']['iter']:.2f} ms/iter)", flush=True)

    with jax.profiler.trace(LOGDIR):
        for _ in range(5):
            out = track(params, c2w, rays, key)[1]
        float(out)
    print("trace captured", flush=True)

    xs = sorted(glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                          recursive=True))
    if not xs:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xs[-1]], "framework_op_stats^", {})
        open("/tmp/track_opstats.csv", "wb").write(
            data if isinstance(data, bytes) else data.encode())
        print("wrote /tmp/track_opstats.csv")
    except Exception as e:
        print(f"op_stats failed: {e}")


if __name__ == "__main__":
    main()
