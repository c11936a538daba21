"""Capture a JAX profiler trace of the D2 program (enc+blob+decoder
grad, scan-amortized) and dump per-op time aggregates via
tensorboard_plugin_profile. Run from repo root on TPU."""

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

N_IT = 10
LOGDIR = "/tmp/jaxprof_d2"


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
    dec = model.decoder

    def tsum(t):
        return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(t))

    def d2(mp, flat):
        emb = model._grid_apply(mp["grid"], flat)
        epos = model._pos_apply(None, flat)
        return jnp.sum(dec(mp["decoder"], emb, epos)) * 1e-6

    @jax.jit
    def run(mp, flat, k):
        def body(c, kk):
            sh = 1e-7 * jax.random.uniform(kk, (1,))
            return c + tsum(jax.grad(d2)(mp, flat + sh)), None
        out, _ = jax.lax.scan(body, 0.0, jax.random.split(k, N_IT))
        return out

    float(run(params, flat, key))  # compile + warm
    float(run(params, flat, key))
    with jax.profiler.trace(LOGDIR):
        for _ in range(3):
            out = run(params, flat, key)
        float(out)
    print("trace captured", flush=True)

    # Aggregate per-op device times from the xplane.
    xs = sorted(glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                          recursive=True))
    print("xplanes:", xs)
    if not xs:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xs[-1]], "framework_op_stats^", {})
        open("/tmp/d2_opstats.csv", "wb").write(
            data if isinstance(data, bytes) else data.encode())
        print("wrote /tmp/d2_opstats.csv")
    except Exception as e:
        print(f"op_stats failed: {e}")
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xs[-1]], "trace_viewer^", {})
            open("/tmp/d2_trace.json", "wb").write(
                data if isinstance(data, bytes) else data.encode())
            print("wrote /tmp/d2_trace.json")
        except Exception as e2:
            print(f"trace_viewer failed: {e2}")


if __name__ == "__main__":
    main()
