"""Mapping: first-frame map init and global bundle adjustment, each as a
single jitted megastep.

TPU-native redesign of the reference's global_BA (coslam.py:285-397):

- Keyframe poses live in a fixed-shape [max_kf, 4, 4] device array; the
  tangent-space pose parameters are a fixed-shape {'rot','trans'}
  [max_kf + 1, 3] pytree (slot max_kf = current frame). The first
  keyframe and all not-yet-allocated slots are frozen by rebuilding
  their matrix entries from constants inside the loss graph, so their
  gradients vanish identically.
- Each BA iteration samples `sample` rays uniformly from the keyframe
  reservoir and a dynamic quota max(sample // kf_count, min_pixels_cur)
  of current-frame rays (reference coslam.py:336-344) — realized as a
  fixed MAXCUR-ray block with a validity mask so shapes stay static.
- Gradient accumulation schedules map_accum_step / pose_accum_step /
  map_wait_step (reference coslam.py:363-387) are reproduced with
  carried accumulators and masked optimizer applications.
- The map optimizer state (Adam moments) persists across frames, like
  the reference's long-lived map_optimizer; the pose optimizer is fresh
  per BA call (reference get_pose_param_optim per call).

Everything below runs as ONE device dispatch per mapped frame.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops import losses as L
from ..ops import pose as P
from .optim import make_pose_optimizer


def _masked_opt_update(tx, grads, opt_state, params, enable):
    """Apply an optax update only where `enable` (scalar bool); otherwise
    keep params/state unchanged. Computed unconditionally + select —
    cheap for pose-sized params, and branch-free for TPU."""
    updates, new_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    sel = lambda a, b: jnp.where(enable, a, b)
    params = jax.tree_util.tree_map(sel, new_params, params)
    opt_state = jax.tree_util.tree_map(sel, new_state, opt_state)
    return params, opt_state


def make_first_frame_step(model, config: Dict, map_tx, H: int, W: int,
                          mesh=None):
    """Jitted map-only optimization on one frame with a fixed pose.

    step(map_params, map_opt_state, c2w, frame_rays [H*W, 7], key, n_iters)
    runs `mapping.first_iters` iterations (reference coslam.py:162-207)
    in one dispatch. n_iters is static (baked per call site). With a
    device mesh, the per-iteration ray batch is sharded over 'dp'.
    """
    from ..parallel.sharding import maybe_shard

    mcfg = config["mapping"]
    sample = int(mcfg["sample"])
    weights = config["training"]
    n_total = int(mcfg["first_iters"])
    # Largest divisor of first_iters that is <= 50 keeps iteration count
    # exact while bounding single-dispatch duration.
    chunk = next(c for c in range(min(50, n_total), 0, -1)
                 if n_total % c == 0)

    @jax.jit
    def step(map_params, map_opt_state, c2w, frame_rays, key):
        model.remat = True  # trace-time: map grads need rematerialization
        dirs_all = frame_rays[:, :3]
        rgb_all = frame_rays[:, 3:6]
        d_all = frame_rays[:, 6:7]
        Rm = c2w[:3, :3]
        t = c2w[:3, 3]

        def loss_fn(mp, idx, k):
            rays_d = maybe_shard(dirs_all[idx] @ Rm.T, mesh)
            rays_o = jnp.broadcast_to(t, rays_d.shape)
            ret = model.forward(mp, k, rays_o, rays_d,
                                maybe_shard(rgb_all[idx], mesh),
                                maybe_shard(d_all[idx], mesh))
            return L.total_loss(ret, weights), ret["psnr"]

        def body(carry, k):
            mp, opt_state = carry
            k1, k2 = jax.random.split(k)
            idx = jax.random.randint(k1, (sample,), 0, dirs_all.shape[0])
            (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                mp, idx, k2)
            updates, opt_state = map_tx.update(grads, opt_state, mp)
            mp = optax.apply_updates(mp, updates)
            return (mp, opt_state), (loss, psnr)

        keys = jax.random.split(key, chunk)
        (map_params, map_opt_state), (losses, psnrs) = jax.lax.scan(
            body, (map_params, map_opt_state), keys)
        return map_params, map_opt_state, losses[-1], psnrs[-1]

    def run(map_params, map_opt_state, c2w, frame_rays, key):
        """Dispatch first_iters in bounded chunks: a single multi-minute
        XLA program can trip device execution watchdogs."""
        loss = psnr = None
        for _ in range(n_total // chunk):
            key, sub = jax.random.split(key)
            map_params, map_opt_state, loss, psnr = step(
                map_params, map_opt_state, c2w, frame_rays, sub)
        return map_params, map_opt_state, loss, psnr

    return run


def make_current_frame_step(model, config: Dict, map_tx, mesh=None):
    """Optional per-frame map-only refinement at the tracked pose
    (reference coslam.py:209-249; enabled when mapping.cur_frame_iters > 0).

    Same inner loop as first-frame mapping but for `cur_frame_iters`
    iterations and with its own optimizer state (the reference uses a
    separate cur_map_optimizer over the embedding only,
    coslam.py:626-634).
    """
    from ..parallel.sharding import maybe_shard

    mcfg = config["mapping"]
    sample = int(mcfg["sample"])
    n_iters = int(mcfg["cur_frame_iters"])
    weights = config["training"]

    @jax.jit
    def step(grid_params, decoder_params, cur_opt_state, c2w, frame_rays, key):
        model.remat = True  # trace-time: map grads need rematerialization
        dirs_all = frame_rays[:, :3]
        rgb_all = frame_rays[:, 3:6]
        d_all = frame_rays[:, 6:7]
        Rm, t = c2w[:3, :3], c2w[:3, 3]

        def loss_fn(gp, idx, k):
            mp = {"grid": gp, "decoder": decoder_params}
            rays_d = maybe_shard(dirs_all[idx] @ Rm.T, mesh)
            rays_o = jnp.broadcast_to(t, rays_d.shape)
            ret = model.forward(mp, k, rays_o, rays_d,
                                maybe_shard(rgb_all[idx], mesh),
                                maybe_shard(d_all[idx], mesh))
            return L.total_loss(ret, weights)

        def body(carry, k):
            gp, opt_state = carry
            k1, k2 = jax.random.split(k)
            idx = jax.random.randint(k1, (sample,), 0, dirs_all.shape[0])
            loss, grads = jax.value_and_grad(loss_fn)(gp, idx, k2)
            updates, opt_state = map_tx.update(grads, opt_state, gp)
            gp = optax.apply_updates(gp, updates)
            return (gp, opt_state), loss

        keys = jax.random.split(key, max(n_iters, 1))
        (grid_params, cur_opt_state), losses = jax.lax.scan(
            body, (grid_params, cur_opt_state), keys)
        return grid_params, cur_opt_state, losses[-1]

    return step


def make_ba_step(model, config: Dict, map_tx, max_kf: int, rays_per_kf: int,
                 n_pixels: int, mesh=None, maxcur: int = None,
                 n_chunks: int = 1, between=None):
    """Build the jitted global-BA megastep.

    step(map_params, map_opt_state, kf_rays, kf_count,
         kf_poses [max_kf, 4, 4], cur_pose [4, 4], cur_rays [H*W, 7], key)
      -> (map_params, map_opt_state, new_kf_poses, new_cur_pose,
          last_loss)

    n_chunks > 1 splits the iteration scan into that many device
    dispatches (identical math and RNG stream — the optimizer carry
    crosses chunk boundaries as device arrays). The pipelined runtime
    uses this so concurrent tracking steps can interleave in the device
    queue between BA chunks instead of stalling behind one multi-x-ms
    program (the r3 tail attribution: p99 = 3.7x p50, caused by
    `ba+keyframe`).

    kf_rays is either the PACKED reservoir [max_kf, R/16, 128]
    (runtime/keyframe.py layout — the fast path: the per-iteration ray
    draw gathers 128-lane rows of 16 pre-shuffled rays each, which XLA
    vectorizes, instead of narrow [*, 7] rows, which XLA lowers to a
    ~1 us/row serial loop ≈ 2 ms/iteration at Replica batch size) or
    the logical [max_kf, R, 7] block (row-gather fallback; also used
    when `sample` is not a multiple of 16).

    maxcur caps the fixed-shape current-frame ray block. The dynamic
    quota is max(sample // kf_count, min_pixels_cur) (reference
    coslam.py:339-341), so maxcur=sample is always correct but wasteful
    once the database has grown; the runtime compiles a second variant
    with a small maxcur and dispatches on kf_count (see CoSLAM.global_BA).
    """
    from ..parallel.sharding import maybe_shard

    mcfg = config["mapping"]
    sample = int(mcfg["sample"])
    if maxcur is None:
        maxcur = sample  # quota max: sample // 1 with one keyframe
    iters = int(mcfg["iters"])
    min_pixels_cur = int(mcfg["min_pixels_cur"])
    map_accum = int(mcfg["map_accum_step"])
    pose_accum = int(mcfg["pose_accum_step"])
    map_wait = int(mcfg["map_wait_step"])
    # Every shipped config uses map_accum_step=1 / map_wait_step=0, which
    # makes the map-update mask STATICALLY true: specialize to a direct
    # optimizer step and drop the gradient accumulator entirely (the
    # masked path costs 4 extra full-parameter HBM sweeps per iteration:
    # accumulate, two where-selects, re-zero — plus carrying a
    # param-sized accumulator through the scan).
    map_every_iter = (map_accum == 1 and map_wait == 0)
    optim_cur = bool(mcfg["optim_cur"])
    weights = config["training"]
    smooth_weight = float(weights["smooth_weight"])
    # Per-frame exposure alignment (training.frame_align): the BA jointly
    # optimizes a [max_kf + 1, 4] gains+offset table alongside the poses
    # (the reference defined the module but never wired it,
    # optimization/frame_align.py:5-19).
    use_align = bool(weights.get("frame_align", False))
    lr_align = float(mcfg.get("lr_align", 1e-3))

    mat_to_tensor, mat_from_tensor = P.get_pose_representation(
        config["training"]["rot_rep"])
    pose_tx = make_pose_optimizer(mcfg["lr_rot"], mcfg["lr_trans"],
                                  lr_align if use_align else None)

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("n_iters", "presplit", "finalize"))
    def step(map_params, map_opt_state, kf_rays, kf_count, kf_poses,
             cur_pose, cur_rays, key, kf_aligns=None, cur_align=None,
             carry_in=None, i0=0, n_iters=iters, presplit=False,
             finalize=True):
        model.remat = True  # trace-time: map grads need rematerialization
        n_cur_pix = cur_rays.shape[0]
        # Tangent-space parameters for all keyframes + current frame.
        all_poses0 = jnp.concatenate([kf_poses, cur_pose[None]], axis=0)
        pp = {"rot": mat_to_tensor(all_poses0[:, :3, :3]),
              "trans": all_poses0[:, :3, 3]}
        if use_align:
            pp["align"] = jnp.concatenate([kf_aligns, cur_align[None]], axis=0)
        pose_opt_state = pose_tx.init(pp)
        pose_enable = kf_count >= 2  # reference: no pose optim with <2 KFs

        first_kf_pose = kf_poses[0]

        def build_poses(pp):
            mats = mat_from_tensor(pp["rot"], pp["trans"])  # [max_kf+1,4,4]
            mats = mats.at[0].set(first_kf_pose)            # frozen first KF
            if not optim_cur:
                mats = mats.at[max_kf].set(cur_pose)        # frozen current
            return mats

        def build_aligns(pp):
            # First keyframe's exposure is the gauge anchor (frozen), the
            # same way its pose anchors the trajectory: a global
            # gain/offset is unobservable against the map's free colors.
            return pp["align"].at[0].set(kf_aligns[0])

        n_cur_quota = jnp.minimum(
            jnp.maximum(sample // jnp.maximum(kf_count, 1), min_pixels_cur),
            maxcur)

        def loss_fn(pp, mp, ray_data, ray_ids, ray_mask, k):
            poses_all = build_poses(pp)
            # Gather each ray's pose via a one-hot matmul rather than
            # indexing: XLA lowers the transpose of poses_all[ray_ids]
            # to a SERIAL per-ray scatter-add while-loop (~20 ms/iter on
            # TPU); the one-hot form makes both directions tiny MXU
            # matmuls ([N, max_kf+1] @ [max_kf+1, 12], ~20 MFLOP).
            onehot = (ray_ids[:, None] ==
                      jnp.arange(max_kf + 1)[None, :]).astype(poses_all.dtype)
            pose_rows = onehot @ poses_all[:, :3, :].reshape(max_kf + 1, 12)
            pose_rows = pose_rows.reshape(-1, 3, 4)
            Rm = pose_rows[:, :, :3]                      # [N,3,3]
            t = pose_rows[:, :, 3]                        # [N,3]
            dirs = ray_data[:, :3]
            rays_d = jnp.einsum("nij,nj->ni", Rm, dirs)
            # Per-ray exposure parameters ride the same one-hot matmul.
            align_rows = (onehot @ build_aligns(pp)) if use_align else None
            k1, k2 = jax.random.split(k)
            # NOTE: fusing the smoothness-grid query into the forward's
            # encode (forward(..., smooth_pts_norm=...)) was measured
            # SLOWER (577 vs 543 ms/cycle on hybrid): the combined
            # encode's backward computes dx for the grid points too,
            # while the separate call lets XLA dead-code-eliminate that
            # whole chain (grid points don't depend on poses). Keep the
            # two-call form.
            ret = model.forward(mp, k1, t, rays_d, ray_data[:, 3:6],
                                ray_data[:, 6:7], ray_mask=ray_mask,
                                align=align_rows)
            smooth = model.smoothness(mp, k2, weights["smooth_pts"],
                                      weights["smooth_vox"],
                                      weights["smooth_margin"]) \
                if smooth_weight > 0 else None
            loss = L.total_loss(ret, weights, smooth_loss=smooth,
                                smooth_weight=smooth_weight)
            return loss

        zero_pose_grads = jax.tree_util.tree_map(jnp.zeros_like, pp)

        from .keyframe import RAY_CHUNK, unpack_rays
        is_packed = kf_rays.ndim == 3 and kf_rays.shape[-1] == 8 * RAY_CHUNK
        chunked = is_packed and sample % RAY_CHUNK == 0
        if is_packed:
            nc = kf_rays.shape[1]          # chunks per keyframe
            R = nc * RAY_CHUNK
            flat_kf = unpack_rays(kf_rays.reshape(-1, 8 * RAY_CHUNK)) \
                if not chunked else None
            flat_chunks = kf_rays.reshape(-1, 8 * RAY_CHUNK)
        else:
            R = kf_rays.shape[1]
            flat_kf = kf_rays.reshape(-1, 7)

        def sample_kf_rays(k):
            """-> (rays [sample, 7], kf ids [sample])."""
            if chunked:
                cid = jax.random.randint(k, (sample // RAY_CHUNK,), 0,
                                         kf_count * nc)
                return (unpack_rays(flat_chunks[cid]),
                        jnp.repeat(cid // nc, RAY_CHUNK))
            idx = jax.random.randint(k, (sample,), 0, kf_count * R)
            return flat_kf[idx], idx // R

        def body(carry, xs):
            if map_every_iter:
                (pp, pose_opt_state, mp, map_opt_state,
                 pose_accum_grads) = carry
                map_accum_grads = None
            else:
                (pp, pose_opt_state, mp, map_opt_state, pose_accum_grads,
                 map_accum_grads) = carry
            i, k = xs
            k1, k2, k3 = jax.random.split(k, 3)

            kf_ray, kf_ids = sample_kf_rays(k1)

            cur_idx = jax.random.randint(k2, (maxcur,), 0, n_cur_pix)
            cur_ray = cur_rays[cur_idx]
            cur_mask = jnp.arange(maxcur) < n_cur_quota

            ray_data = maybe_shard(
                jnp.concatenate([kf_ray, cur_ray], axis=0), mesh)
            ray_ids = maybe_shard(jnp.concatenate(
                [kf_ids, jnp.full((maxcur,), max_kf, jnp.int32)]), mesh)
            ray_mask = maybe_shard(jnp.concatenate(
                [jnp.ones((sample,)), cur_mask.astype(jnp.float32)]), mesh)

            loss, (pose_grads, map_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(pp, mp, ray_data, ray_ids,
                                         ray_mask, k3)

            pose_accum_grads = jax.tree_util.tree_map(
                jnp.add, pose_accum_grads, pose_grads)

            if map_every_iter:
                # Statically-true schedule: plain optimizer step.
                updates, map_opt_state = map_tx.update(
                    map_grads, map_opt_state, mp)
                mp = optax.apply_updates(mp, updates)
            else:
                map_accum_grads = jax.tree_util.tree_map(
                    jnp.add, map_accum_grads, map_grads)
                # Map update every map_accum_step iters, after map_wait_step.
                do_map = ((i + 1) % map_accum == 0) & ((i + 1) > map_wait)
                mp, map_opt_state = _masked_opt_update(
                    map_tx, map_accum_grads, map_opt_state, mp, do_map)
                map_accum_grads = jax.tree_util.tree_map(
                    lambda g: jnp.where(do_map, jnp.zeros_like(g), g),
                    map_accum_grads)

            # Pose update every pose_accum_step iters (if >= 2 keyframes).
            do_pose = ((i + 1) % pose_accum == 0) & pose_enable
            pp, pose_opt_state = _masked_opt_update(
                pose_tx, pose_accum_grads, pose_opt_state, pp, do_pose)
            pose_accum_grads = jax.tree_util.tree_map(
                lambda g: jnp.where(do_pose, jnp.zeros_like(g), g),
                pose_accum_grads)

            if map_every_iter:
                return (pp, pose_opt_state, mp, map_opt_state,
                        pose_accum_grads), loss
            return (pp, pose_opt_state, mp, map_opt_state, pose_accum_grads,
                    map_accum_grads), loss

        keys = key if presplit else jax.random.split(key, n_iters)
        if carry_in is not None:
            init = carry_in
        else:
            init = (pp, pose_opt_state, map_params, map_opt_state,
                    zero_pose_grads)
            if not map_every_iter:
                init = init + (
                    jax.tree_util.tree_map(jnp.zeros_like, map_params),)
        carry, losses = jax.lax.scan(
            body, init, (jnp.arange(n_iters) + i0, keys))
        if not finalize:
            return carry, losses[-1]
        (pp, _, map_params, map_opt_state, *_) = carry

        final = build_poses(pp)
        # Only report optimized poses when pose optimization actually ran.
        new_kf = jnp.where(pose_enable, final[:max_kf], kf_poses)
        new_cur = jnp.where(pose_enable & optim_cur, final[max_kf], cur_pose)
        if use_align:
            fa = build_aligns(pp)
            new_kf_al = jnp.where(pose_enable, fa[:max_kf], kf_aligns)
            new_cur_al = jnp.where(pose_enable, fa[max_kf], cur_align)
            return (map_params, map_opt_state, new_kf, new_cur, losses[-1],
                    new_kf_al, new_cur_al)
        return map_params, map_opt_state, new_kf, new_cur, losses[-1]

    if n_chunks <= 1:
        return step

    # Chunked dispatch: identical iteration stream (the key is pre-split
    # exactly as the single-dispatch path splits it), carry crossing
    # chunk boundaries as device arrays. Each dispatch covers ~iters /
    # n_chunks iterations so concurrent work can interleave between them.
    bounds = []
    base = 0
    for c in range(n_chunks):
        clen = (iters - base) // (n_chunks - c)
        if clen > 0:
            bounds.append((base, clen))
            base += clen

    def run(map_params, map_opt_state, kf_rays, kf_count, kf_poses,
            cur_pose, cur_rays, key, kf_aligns=None, cur_align=None):
        ks = jax.random.split(key, iters)
        carry = None
        loss = None
        for ci, (i0, clen) in enumerate(bounds):
            last = ci == len(bounds) - 1
            out = step(map_params, map_opt_state, kf_rays, kf_count,
                       kf_poses, cur_pose, cur_rays, ks[i0:i0 + clen],
                       kf_aligns=kf_aligns, cur_align=cur_align,
                       carry_in=carry, i0=i0, n_iters=clen, presplit=True,
                       finalize=last)
            if not last:
                carry, loss = out
                if between is not None:
                    # Chunks dispatch asynchronously and would sit
                    # back-to-back in the device queue; the hook gives a
                    # concurrent tracker a window to enqueue its step
                    # between them (runtime/pipeline.py _ba_chunk_gap).
                    between()
        return out

    return run
