"""Profile the TUM-parity BA megastep (importance-sampling recipe) and
aggregate per-op device time — the cycle runs at ~2x its serial-issue
floor, so something beyond the encode kernels is expensive (suspects:
the 213-sample z sort, sample_pdf's searchsorted). Shapes mirror
bench._measure_tum exactly so the XLA cache from a bench run is warm.

Run from repo root on TPU: python tools/bench/_bench_profile_tum.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import glob
import os
from collections import defaultdict

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/coslam_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import load_config
from coslam_tpu.models.scene_rep import JointEncoding
from coslam_tpu.runtime.keyframe import RAY_CHUNK, pack_rays
from coslam_tpu.runtime.mapping import make_ba_step
from coslam_tpu.runtime.optim import make_map_optimizer
from coslam_tpu.runtime.tracking import make_tracking_step

LOGDIR = "/tmp/jaxprof_tum"


def main():
    here = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    cfg = load_config(os.path.join(here, "configs/Tum/fr1_desk.yaml"))
    H, W = cfg["cam"]["H"], cfg["cam"]["W"]
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    map_tx = make_map_optimizer(cfg)
    opt_state = map_tx.init(params)

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def rand_rays(k, n):
        k1, k2, k3 = jax.random.split(k, 3)
        dirs = jnp.concatenate(
            [jax.random.uniform(k1, (n, 2), minval=-0.8, maxval=0.8),
             -jnp.ones((n, 1))], axis=-1)
        return jnp.concatenate(
            [dirs, jax.random.uniform(k2, (n, 3)),
             jax.random.uniform(k3, (n, 1), minval=0.5, maxval=4.0)], -1)

    num_kf = 2000 // cfg["mapping"]["keyframe_every"] + 1
    rays_per_kf = int(H * W * cfg["mapping"]["n_pixels"])
    rays_per_kf -= rays_per_kf % RAY_CHUNK
    kf_rays = jax.jit(pack_rays)(
        rand_rays(jax.random.PRNGKey(1), num_kf * rays_per_kf
                  ).reshape(num_kf, rays_per_kf, 7))
    kf_poses = jnp.tile(jnp.eye(4), (num_kf, 1, 1)).astype(jnp.float32)
    cur_rays = rand_rays(jax.random.PRNGKey(2), H * W)
    ba = make_ba_step(model, cfg, map_tx, num_kf, rays_per_kf,
                      rays_per_kf, maxcur=128)
    kf_count = jnp.int32(100)

    out = ba(params, opt_state, kf_rays, kf_count, kf_poses, jnp.eye(4),
             cur_rays, key)
    float(jnp.sum(out[4]))
    with jax.profiler.trace(LOGDIR):
        out = ba(params, opt_state, kf_rays, kf_count, kf_poses,
                 jnp.eye(4), cur_rays, key)
        float(jnp.sum(out[4]))
    print("trace captured", flush=True)

    xs = sorted(glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                          recursive=True))
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(xs[-1], "rb").read())
    for p in sp.planes:
        if "TPU" not in p.name:
            continue
        emeta = {k: v.name for k, v in p.event_metadata.items()}
        agg = defaultdict(float)
        cnt = defaultdict(int)
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = emeta.get(ev.metadata_id, "?")
                agg[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        tot = sum(agg.values())
        print(f"== {p.name}: XLA-op total {tot:.1f} ms")
        for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:22]:
            print(f"  {ms:9.2f} ms x{cnt[name]:5d}  {name[:120]}")


if __name__ == "__main__":
    main()
