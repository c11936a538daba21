"""Camera tracking as a single jitted megastep.

Replaces the reference's per-iteration Python loop with host syncs
(reference coslam.py:502-594: 10 Adam iterations, each doing a
forward/backward, a .cpu().item() loss readback for best-pose
bookkeeping, and an early-stop counter) with ONE `lax.scan` over
iterations compiled into a single XLA computation:

- the ray set is sampled once per frame and fixed across iterations
  (reference behavior, coslam.py:536-544);
- best-pose selection runs on device in the scan carry (no readbacks);
- the early-stop counter is carried and the final pose selection
  reproduces the reference exactly: with `tracking.best` the
  lowest-loss pose is returned, otherwise the pose *evaluated at* the
  last executed iteration (i.e. after iter-1 optimizer steps). The
  reference's `wait_iters` early break is representable as a masked
  no-op; with every shipped config wait_iters >= iter so it never fires.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..ops import losses as L
from ..ops import pose as P
from .optim import make_pose_optimizer


def make_tracking_step(model, config: Dict, mesh=None):
    """Build the jitted per-frame tracking function.

    Returned signature:
        step(params, c2w_init [4,4], rays [S,7], key)
            -> (c2w [4,4], last_loss, last_psnr)

    With a device mesh, the ray batch is sharded over 'dp' (params
    replicated; XLA reduces the pose gradient over ICI).
    """
    from ..parallel.sharding import maybe_shard

    tcfg = config["tracking"]
    n_iter = int(tcfg["iter"])
    use_best = bool(tcfg["best"])
    wait_iters = int(tcfg["wait_iters"])
    weights = config["training"]
    # Robust photometric kernel (tracking.robust_delta > 0): Huber on
    # the rgb residual. Tracking-only — the map keeps the reference MSE.
    robust = float(tcfg.get("robust_delta", 0.0) or 0.0) or None
    # Constant-velocity motion prior (tracking.prior_trans/prior_rot
    # > 0): quadratic pull of the pose tangent toward the motion-model
    # init. In observability-degenerate views (a textureless corridor
    # walked forward: the render loss is nearly flat along the forward
    # axis) the prior holds the unconstrained direction at the predicted
    # velocity instead of letting it random-walk; where the data terms
    # have gradient they dominate (the prior is ~quadratic in a
    # centimeter-scale deviation). No reference counterpart (its
    # tracker is pure render loss, coslam.py:531-567) — exceeds it.
    prior_t = float(tcfg.get("prior_trans", 0.0) or 0.0)
    prior_r = float(tcfg.get("prior_rot", 0.0) or 0.0)
    # training.frame_align: the tracker jointly optimizes the frame's 4
    # exposure parameters (gains+offset) with the pose, initialized from
    # the latest estimate — under exposure drift the frame's true gain is
    # ahead of any stored estimate, so a frozen value goes stale.
    use_align = bool(config["training"].get("frame_align", False))
    lr_align = float(tcfg.get(
        "lr_align", config["mapping"].get("lr_align", 0.01)))
    mat_to_tensor, mat_from_tensor = P.get_pose_representation(
        config["training"]["rot_rep"])

    tx = make_pose_optimizer(tcfg["lr_rot"], tcfg["lr_trans"],
                             lr_align if use_align else None)

    @jax.jit
    def step(params, c2w_init, rays, key, align=None):
        # Tracking never differentiates the map: pre-pack the grid's
        # gather mirrors ONCE per megastep, outside the iteration scan
        # (XLA does not hoist the loop-invariant pack chain itself).
        params = model.prepack_params(params)
        pp = {"rot": mat_to_tensor(c2w_init[:3, :3])[None],
              "trans": c2w_init[:3, 3][None]}
        if use_align:
            pp["align"] = align
        opt_state = tx.init(pp)

        dirs = maybe_shard(rays[:, :3], mesh)
        target_rgb = maybe_shard(rays[:, 3:6], mesh)
        target_d = maybe_shard(rays[:, 6:7], mesh)

        # Executed at trace time: tracking differentiates only the pose,
        # so skip query rematerialization (memory is small; remat would
        # re-run the encoder gather in the backward pass).
        model.remat = False

        # Motion-model anchor for the const-velocity prior: the tangent
        # of the INIT pose, a trace-time constant of this step.
        pp0_rot = jax.lax.stop_gradient(pp["rot"])
        pp0_trans = jax.lax.stop_gradient(pp["trans"])

        def loss_fn(pp, k):
            c2w = mat_from_tensor(pp["rot"], pp["trans"])[0]
            rays_d = dirs @ c2w[:3, :3].T
            rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
            ret = model.forward(params, k, rays_o, rays_d, target_rgb,
                                target_d, align=pp.get("align"),
                                rgb_kernel=robust)
            loss = L.total_loss(ret, weights)
            if prior_t > 0.0:
                loss = loss + prior_t * jnp.sum(
                    (pp["trans"] - pp0_trans) ** 2)
            if prior_r > 0.0:
                loss = loss + prior_r * jnp.sum((pp["rot"] - pp0_rot) ** 2)
            return loss, ret["psnr"]

        def body(carry, k):
            pp, opt_state, best_loss, best_pp, last_pp, stall, done = carry
            (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(pp, k)

            improved = loss < best_loss
            best_pp = jax.tree_util.tree_map(
                lambda new, old: jnp.where(improved & ~done, new, old), pp, best_pp)
            best_loss = jnp.where(improved & ~done, loss, best_loss)
            stall = jnp.where(done, stall, jnp.where(improved, 0, stall + 1))

            # Pose evaluated this iteration (reference's `c2w_est` at loop end).
            last_pp = jax.tree_util.tree_map(
                lambda new, old: jnp.where(done, old, new), pp, last_pp)

            updates, new_opt_state = tx.update(grads, opt_state, pp)
            new_pp = optax.apply_updates(pp, updates)

            done_next = done | (stall > wait_iters)
            pp = jax.tree_util.tree_map(
                lambda new, old: jnp.where(done, old, new), new_pp, pp)
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(done, old, new), new_opt_state, opt_state)
            return (pp, opt_state, best_loss, best_pp, last_pp, stall,
                    done_next), (loss, psnr)

        keys = jax.random.split(key, n_iter)
        init = (pp, opt_state, jnp.inf, pp, pp, jnp.int32(0), jnp.bool_(False))
        (pp, _, best_loss, best_pp, last_pp, _, _), (losses, psnrs) = \
            jax.lax.scan(body, init, keys)

        chosen = best_pp if use_best else last_pp
        c2w = mat_from_tensor(chosen["rot"], chosen["trans"])[0]
        if use_align:
            return c2w, losses[-1], psnrs[-1], chosen["align"]
        return c2w, losses[-1], psnrs[-1]

    return step


def make_tracking_pc_step(model, config: Dict, mesh=None):
    """Point-cloud-loss tracking (reference coslam.py:415-500,
    'tracking_pc', enabled by tracking.iter_point > 0; not used by the
    shipped configs but part of the capability surface).

    Back-projects sampled valid-depth pixels to 3D with the current pose
    estimate, queries SDF+color at those points, and minimizes
    5*mse(rgb) + 1000*mse(sdf) over the pose tangent.
    """
    from ..parallel.sharding import maybe_shard

    tcfg = config["tracking"]
    n_iter = int(tcfg["iter_point"])
    use_best = bool(tcfg["best"])
    mat_to_tensor, mat_from_tensor = P.get_pose_representation(
        config["training"]["rot_rep"])
    tx = make_pose_optimizer(tcfg["lr_rot"], tcfg["lr_trans"])

    @jax.jit
    def step(params, c2w_init, rays, key):
        # rays: [S, 7]; rows with invalid depth are masked out of the loss.
        params = model.prepack_params(params)
        pp = {"rot": mat_to_tensor(c2w_init[:3, :3])[None],
              "trans": c2w_init[:3, 3][None]}
        opt_state = tx.init(pp)
        dirs = maybe_shard(rays[:, :3], mesh)
        target_rgb = maybe_shard(rays[:, 3:6], mesh)
        target_d = maybe_shard(rays[:, 6:7], mesh)
        valid = ((target_d[:, 0] > 0.0) & (target_d[:, 0] < 5.0)
                 ).astype(jnp.float32)

        def loss_fn(pp):
            c2w = mat_from_tensor(pp["rot"], pp["trans"])[0]
            rays_d = dirs @ c2w[:3, :3].T
            pts = c2w[:3, 3][None] + target_d * rays_d
            pts_norm = model.normalize_coords(pts)
            out = model.query_color_sdf(params, pts_norm)
            sdf = out[:, -1]
            rgb = jax.nn.sigmoid(out[:, :3])
            rgb_l = L.masked_mean((rgb - target_rgb) ** 2, valid[:, None])
            sdf_l = L.masked_mean(sdf ** 2, valid)
            return 5.0 * rgb_l + 1000.0 * sdf_l

        def body(carry, _):
            pp, opt_state, best_loss, best_pp, last_pp = carry
            loss, grads = jax.value_and_grad(loss_fn)(pp)
            improved = loss < best_loss
            best_pp = jax.tree_util.tree_map(
                lambda new, old: jnp.where(improved, new, old), pp, best_pp)
            best_loss = jnp.minimum(loss, best_loss)
            last_pp = pp
            updates, opt_state = tx.update(grads, opt_state, pp)
            pp = optax.apply_updates(pp, updates)
            return (pp, opt_state, best_loss, best_pp, last_pp), loss

        init = (pp, opt_state, jnp.inf, pp, pp)
        (pp, _, best_loss, best_pp, last_pp), losses = jax.lax.scan(
            body, init, None, length=max(n_iter, 1))
        chosen = best_pp if use_best else last_pp
        return mat_from_tensor(chosen["rot"], chosen["trans"])[0], losses[-1]

    return step


def predict_current_pose(est_prev, est_prev_prev=None, constant_speed=True,
                         gap_ratio: float = 1.0):
    """Constant-speed motion model init (reference coslam.py:399-413).

    Host-side numpy helper: with two previous poses, applies the last
    inter-frame delta; otherwise copies the previous pose.

    ``gap_ratio`` extends the model to NON-UNIFORM frame spacing (the
    ActiveCoSLAM loop tracks an info-gain subsequence, so consecutive
    processed frames can be several video frames apart): the last
    observed velocity is rescaled by (gap to the new frame) / (gap the
    velocity was measured over) via the SE(3) delta's screw
    parameterization (axis-angle rotation and translation scaled
    together). gap_ratio=1 is exactly the reference model.
    """
    import numpy as np

    if est_prev_prev is None or not constant_speed:
        return np.array(est_prev, np.float32)
    delta = est_prev @ np.linalg.inv(est_prev_prev.astype(np.float64))
    if gap_ratio != 1.0:
        from scipy.spatial.transform import Rotation

        rotvec = Rotation.from_matrix(delta[:3, :3]).as_rotvec()
        scaled = np.eye(4)
        scaled[:3, :3] = Rotation.from_rotvec(gap_ratio * rotvec).as_matrix()
        scaled[:3, 3] = gap_ratio * delta[:3, 3]
        delta = scaled
    return (delta @ est_prev).astype(np.float32)
