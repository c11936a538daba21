"""Destination-binned two-pass table-gradient scatter — the one
structural design VERDICT r3 flagged as untried.

Idea: instead of 4.6M serial [2, F] read-modify-writes (pair_scatter,
measured 154M upd/s ceiling), (1) order the update stream by destination
row, (2) accumulate it region-by-region with DENSE vector/MXU work:
sorted updates are region-contiguous, so each chunk of C updates touches
one small row window that fits a VMEM tile, and the accumulation becomes
a [C, R] one-hot matmul (MXU) plus one dynamic-slice add per chunk — no
per-update serial RMW anywhere.

The open question is the cost of step (1): TPUs have no cheap radix
partition, so ordering is a lax.sort_key_val over the row ids. This
probe measures each stage separately and the end-to-end pipeline against
the shipped pair_scatter on the SAME update distribution (Replica parity
BA shape: 4.58M updates into a 96k-row level group + coarse-level
duplicate runs).

Run from repo root on TPU. Verdict goes to STATUS.md: adopted or refuted
with numbers.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import os
import time
from functools import partial

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/coslam_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from coslam_tpu.ops.hash_packed import pair_scatter

F = 2           # features per table row (pair kernel: [2, F] per update)
N_ROWS = 96 * 1024
M = 4_584_832 // 2048 * 2048   # updates (VERDICT r3 profile: 4.58M/iter)
CHUNK = 2048    # updates per dense-accumulate chunk
R_WIN = 2048    # row window a chunk accumulates into (VMEM tile rows)


def _sync(out):
    # block_until_ready is unreliable over the tunneled device link;
    # force completion by fetching one scalar.
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed(fn, *args, n=10):
    _sync(fn(*args))  # compile + warm
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def make_updates(key, ray_like=True):
    """Row-id stream with the BA profile's duplicate-run structure:
    43 consecutive samples per ray share coarse cells in runs."""
    k1, k2 = jax.random.split(key)
    if ray_like:
        n_rays = M // 43 + 1
        base = jax.random.randint(k1, (n_rays,), 0, N_ROWS - 2)
        jitter = jax.random.randint(k2, (n_rays, 43), 0, 3)
        idx = (base[:, None] + jitter).reshape(-1)[:M]
    else:
        idx = jax.random.randint(k1, (M,), 0, N_ROWS - 2)
    streams = [jax.random.normal(k2, (M,), jnp.float32)
               for _ in range(2 * F)]
    return idx.astype(jnp.int32), streams


def main():
    key = jax.random.PRNGKey(0)
    idx, streams = make_updates(key)
    idx = jax.device_put(idx)
    streams = [jax.device_put(s) for s in streams]

    # --- A: shipped serial pair-RMW baseline ------------------------------
    base_ms = timed(jax.jit(lambda i, s: pair_scatter(i, s, N_ROWS)),
                    idx, streams)
    print(f"A pair_scatter baseline: {base_ms:.2f} ms "
          f"({M / base_ms / 1e3:.0f}M upd/s)", flush=True)

    # --- B: ordering cost (the binned design's pass 1) --------------------
    @jax.jit
    def sort_perm(i):
        return jax.lax.sort_key_val(i, jnp.arange(M, dtype=jnp.int32))

    sort_ms = timed(sort_perm, idx)
    print(f"B sort_key_val({M / 1e6:.1f}M int32): {sort_ms:.2f} ms",
          flush=True)

    # --- C: stream permute (gather all value streams by the sort order) ---
    @jax.jit
    def permute(i, s):
        key_sorted, perm = jax.lax.sort_key_val(
            i, jnp.arange(M, dtype=jnp.int32))
        packed = jnp.stack(s, axis=1)         # [M, 2F]
        return key_sorted, packed[perm]

    perm_ms = timed(permute, idx, streams)
    print(f"C sort + stream gather: {perm_ms:.2f} ms", flush=True)

    # --- D: dense chunk accumulation over the sorted stream ---------------
    # Each chunk of CHUNK sorted updates lands in a row window
    # [base, base + R_WIN); one-hot [CHUNK, R_WIN] matmuls push the
    # accumulation onto the MXU; windows add into the table with
    # dynamic_update_slice. Updates whose row overflows the window
    # (pathological duplication) fall back into a residual stream for
    # the serial kernel (counted, expected ~0 for hashed levels).
    n_chunks = M // CHUNK

    @jax.jit
    def binned_accum(i, s):
        key_sorted, perm = jax.lax.sort_key_val(
            i, jnp.arange(M, dtype=jnp.int32))
        packed = jnp.stack(s, axis=1)[perm]   # [M, 2F]
        keys_c = key_sorted.reshape(n_chunks, CHUNK)
        vals_c = packed.reshape(n_chunks, CHUNK, 2 * F)
        table = jnp.zeros((N_ROWS + R_WIN + 2, 2 * F), jnp.float32)

        def body(tab, xs):
            kc, vc = xs
            base = kc[0]
            local = kc - base                     # sorted: >= 0
            in_win = local < R_WIN - 1
            local = jnp.where(in_win, local, R_WIN - 1)  # clip (residual)
            onehot0 = (local[:, None] ==
                       jnp.arange(R_WIN)[None, :]).astype(jnp.bfloat16)
            # pair semantics: row j gets v[:, :F], row j+1 gets v[:, F:]
            tile0 = (onehot0.T @ vc[:, :F].astype(jnp.bfloat16)
                     ).astype(jnp.float32)
            onehot1 = (local[:, None] + 1 ==
                       jnp.arange(R_WIN)[None, :]).astype(jnp.bfloat16)
            tile1 = (onehot1.T @ vc[:, F:].astype(jnp.bfloat16)
                     ).astype(jnp.float32)
            tile = jnp.concatenate([tile0, tile1], axis=1)
            win = jax.lax.dynamic_slice(tab, (base, 0), (R_WIN, 2 * F))
            tab = jax.lax.dynamic_update_slice(tab, win + tile, (base, 0))
            return tab, jnp.sum(~in_win)

        table, resid = jax.lax.scan(body, table,
                                    (keys_c, vals_c))
        return table, jnp.sum(resid)

    binned_ms = timed(binned_accum, idx, streams)
    _, resid = binned_accum(idx, streams)
    print(f"D full binned pipeline (sort + gather + {n_chunks} MXU "
          f"chunk-accums): {binned_ms:.2f} ms "
          f"({M / binned_ms / 1e3:.0f}M upd/s), residual "
          f"overflow updates: {int(resid)}", flush=True)

    # f32 exactness note: bf16 one-hot matmul accumulates v in bf16 —
    # check a f32 VPU variant too (no MXU, pure vector adds).
    @jax.jit
    def binned_accum_f32(i, s):
        key_sorted, perm = jax.lax.sort_key_val(
            i, jnp.arange(M, dtype=jnp.int32))
        packed = jnp.stack(s, axis=1)[perm]
        keys_c = key_sorted.reshape(n_chunks, CHUNK)
        vals_c = packed.reshape(n_chunks, CHUNK, 2 * F)
        table = jnp.zeros((N_ROWS + R_WIN + 2, 2 * F), jnp.float32)

        def body(tab, xs):
            kc, vc = xs
            base = kc[0]
            local = jnp.minimum(kc - base, R_WIN - 1)
            onehot0 = (local[:, None] ==
                       jnp.arange(R_WIN)[None, :]).astype(jnp.float32)
            onehot1 = (local[:, None] + 1 ==
                       jnp.arange(R_WIN)[None, :]).astype(jnp.float32)
            tile = jnp.concatenate([onehot0.T @ vc[:, :F],
                                    onehot1.T @ vc[:, F:]], axis=1)
            win = jax.lax.dynamic_slice(tab, (base, 0), (R_WIN, 2 * F))
            return jax.lax.dynamic_update_slice(tab, win + tile,
                                                (base, 0)), None

        table, _ = jax.lax.scan(body, table, (keys_c, vals_c))
        return table

    f32_ms = timed(binned_accum_f32, idx, streams)
    print(f"E f32 one-hot variant: {f32_ms:.2f} ms", flush=True)

    # Random (non-ray-ordered) distribution for reference.
    idx_r, streams_r = make_updates(jax.random.PRNGKey(1), ray_like=False)
    base_r = timed(jax.jit(lambda i, s: pair_scatter(i, s, N_ROWS)),
                   idx_r, streams_r)
    binned_r = timed(binned_accum, idx_r, streams_r)
    print(f"random stream: pair_scatter {base_r:.2f} ms, "
          f"binned {binned_r:.2f} ms", flush=True)

    verdict = "ADOPT" if binned_ms < 0.9 * base_ms else "REFUTE"
    print(f"verdict: {verdict} (binned {binned_ms:.2f} vs serial "
          f"{base_ms:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
