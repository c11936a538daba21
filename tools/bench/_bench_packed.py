import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))
import time
import jax
import jax.numpy as jnp
from coslam_tpu.ops import hash_packed as HP
from coslam_tpu.ops import encodings as E

key = jax.random.PRNGKey(0)

def timeit(name, f, *a, n=10):
    out = f(*a)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    s = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt

# Replica room0 scale: res 400 (8m/0.02), hash 16, 16 levels
for N, tag in [(44032, "track(1024x43)"), (99072, "map(2304x43)")]:
    x = jax.random.uniform(key, (N, 3))
    g_shape = (N, 32)
    g = jax.random.normal(key, g_shape)

    pspec = HP.make_packed_spec(400, 16, 16, 2, 16)
    ptab = jax.random.normal(key, (pspec.total_entries, 2)) * 0.1
    enc_p = HP.make_packed_encode(pspec, jnp.bfloat16)
    timeit(f"packed_fwd_{tag}", jax.jit(lambda t, xx: jnp.sum(enc_p(t, xx))),
           ptab, x)
    timeit(f"packed_fwdbwd_table_{tag}", jax.jit(
        lambda t, xx: jnp.sum(jax.grad(
            lambda tt: jnp.sum(enc_p(tt, xx) * g))(t))), ptab, x)
    timeit(f"packed_fwdbwd_x_{tag}", jax.jit(
        lambda t, xx: jnp.sum(jax.grad(
            lambda zz: jnp.sum(enc_p(t, zz) * g))(xx))), ptab, x)
    timeit(f"packed_fwdbwd_both_{tag}", jax.jit(
        lambda t, xx: jnp.sum(jax.grad(
            lambda tt, zz: jnp.sum(enc_p(tt, zz) * g), argnums=(0,))(t, xx)[0])),
        ptab, x)

    ospec = E.make_hashgrid_spec(400, 16, 16, 2, 16)
    otab = jax.random.normal(key, (ospec.total_entries, 2)) * 0.1
    from coslam_tpu.ops.hash_pallas import make_hashgrid_encode_pallas_bwd
    enc_o = make_hashgrid_encode_pallas_bwd(ospec, jnp.bfloat16)
    timeit(f"legacy_fwd_{tag}", jax.jit(
        lambda t, xx: jnp.sum(E.hashgrid_encode(ospec, t, xx, jnp.bfloat16))),
        otab, x)
    timeit(f"legacy_pallas_fwdbwd_table_{tag}", jax.jit(
        lambda t, xx: jnp.sum(jax.grad(
            lambda tt: jnp.sum(enc_o(tt, xx) * g))(t))), otab, x)
