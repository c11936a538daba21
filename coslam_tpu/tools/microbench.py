"""TPU microbenchmark: dispatch floor, matmul roofline, SLAM hot kernels.

Run: python -m coslam_tpu.tools.microbench [--quick]

Measurement methodology for tunneled devices (where block_until_ready
may not actually synchronize and output downloads are expensive):
every timed computation returns ONE scalar; timing enqueues n calls and
fetches the final scalar, so the wall-clock covers device execution
without measuring the transfer of large outputs.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import os

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/coslam_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import numpy as np

    from ..config import load_config
    from ..models.scene_rep import JointEncoding
    from ..ops import encodings as E

    results = {}
    key = jax.random.PRNGKey(0)
    n_rep = 5 if args.quick else 20

    def timeit(name, f, *a, n=None):
        n = n or n_rep
        t0 = time.perf_counter()
        out = f(*a)
        _ = float(out)  # forces completion
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _i in range(n):
            out = f(*a)
        _ = float(out)
        dt = (time.perf_counter() - t0) / n
        results[name] = {"ms": round(dt * 1e3, 3),
                         "compile_s": round(compile_s, 1)}
        print(f"{name}: {dt*1e3:.3f} ms (compile {compile_s:.1f}s)",
              flush=True)
        return dt

    # 1. dispatch floor
    f0 = jax.jit(lambda a: jnp.sum(a + 1.0))
    timeit("dispatch_floor", f0, jnp.ones((8, 128)), n=50)

    # 2. matmul roofline (bf16), scalar output
    for sz in ([2048] if args.quick else [2048, 4096, 8192]):
        a = jax.random.normal(key, (sz, sz), jnp.bfloat16)
        f = jax.jit(lambda a: jnp.sum(
            jnp.dot(a, a, preferred_element_type=jnp.float32)))
        dt = timeit(f"matmul_{sz}", f, a, n=10)
        results[f"matmul_{sz}"]["tflops"] = round(2 * sz ** 3 / dt / 1e12, 1)
        print(f"  -> {results[f'matmul_{sz}']['tflops']} TFLOPS", flush=True)

    # 3. HBM bandwidth probe (elementwise on a big array)
    big = jax.random.normal(key, (4096, 4096))
    fbw = jax.jit(lambda a: jnp.sum(a * 1.0001 + 0.1))
    dt = timeit("elemwise_64MB", fbw, big, n=10)
    results["elemwise_64MB"]["gbps"] = round(2 * big.nbytes / dt / 1e9, 1)

    # 4. SLAM kernels at Replica room0 scale
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cfg = load_config(os.path.join(here, "configs", "Replica", "room0.yaml"))
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    params = model.init_params(key)

    N = 1024 * 43
    x = jax.random.uniform(key, (N, 3))
    spec = model.grid_spec
    g = jax.random.normal(key, (N, spec.out_dim))

    timeit("hash_fwd", jax.jit(
        lambda t, x: jnp.sum(E.hashgrid_encode(spec, t, x))),
        params["grid"], x)
    timeit("hash_bwd_scatter", jax.jit(
        lambda t: jnp.sum(jax.grad(
            lambda tt: jnp.sum(E.hashgrid_encode(spec, tt, x) * g))(t))),
        params["grid"])
    enc_mxu = E.make_hashgrid_encode_mxu(spec)
    timeit("hash_bwd_onehot", jax.jit(
        lambda t: jnp.sum(jax.grad(
            lambda tt: jnp.sum(enc_mxu(tt, x) * g))(t))),
        params["grid"])
    timeit("oneblob_fwd", jax.jit(
        lambda x: jnp.sum(E.oneblob_encode(x, 16))), x)
    timeit("point_query_fwd", jax.jit(
        lambda p, x: jnp.sum(model.query_color_sdf(p, x))), params, x)

    ro = jnp.zeros((1024, 3))
    rd = jnp.concatenate([jax.random.uniform(key, (1024, 2), minval=-0.5,
                                             maxval=0.5),
                          -jnp.ones((1024, 1))], -1)
    rgb = jax.random.uniform(key, (1024, 3))
    dpt = jax.random.uniform(key, (1024, 1), minval=0.5, maxval=4)

    def fwd_loss(p):
        r = model.forward(p, key, ro, rd, rgb, dpt)
        return r["rgb_loss"] + r["depth_loss"] + r["sdf_loss"] + r["fs_loss"]

    timeit("render_fwd_1024rays", jax.jit(fwd_loss), params)
    timeit("render_fwdbwd_params_1024rays", jax.jit(
        lambda p: jnp.sum(jax.grad(fwd_loss)(p)["grid"])), params)

    def fwd_loss_pose(t):
        rd2 = rd + t  # pose-like dependency
        r = model.forward(params, key, ro, rd2, rgb, dpt)
        return r["rgb_loss"] + r["depth_loss"] + r["sdf_loss"] + r["fs_loss"]

    timeit("render_fwdbwd_pose_1024rays", jax.jit(
        lambda t: jnp.sum(jax.grad(fwd_loss_pose)(t))), jnp.zeros((1, 3)))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
