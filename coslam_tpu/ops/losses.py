"""Loss functions for SDF volume rendering.

Functional, mask-aware ports of the reference loss stack
(reference: model/utils.py:89-161, coslam.py:140-160,
model/scene_rep.py:319-338). Every loss takes an optional per-ray
validity mask so fixed-shape padded batches (required for XLA static
shapes) reproduce the reference's dynamic-batch semantics exactly:
padded rays contribute nothing to sums or counts.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse2psnr(x: jnp.ndarray) -> jnp.ndarray:
    """MSE -> PSNR (reference model/utils.py:8-12)."""
    return -10.0 * jnp.log(x + 1e-6) / jnp.log(10.0)


def masked_mean(x: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Mean of x over elements where mask==1 (mask broadcastable to x)."""
    if mask is None:
        return jnp.mean(x)
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def compute_loss(prediction: jnp.ndarray, target: jnp.ndarray,
                 loss_type: str = "l2", mask=None) -> jnp.ndarray:
    """l2 (MSE) or l1 loss with optional element mask
    (reference model/utils.py:120-135)."""
    if loss_type == "l2":
        return masked_mean((prediction - target) ** 2, mask)
    if loss_type == "l1":
        return masked_mean(jnp.abs(prediction - target), mask)
    raise ValueError(f"Unsupported loss type {loss_type}")


def huber_loss(prediction: jnp.ndarray, target: jnp.ndarray, delta: float,
               mask=None) -> jnp.ndarray:
    """Huber kernel scaled to MATCH l2 for small residuals (r^2 below
    delta, delta*(2|r| - delta) above), so loss weights tuned for the l2
    photometric term keep their meaning when the robust kernel is
    enabled (tracking.robust_delta). No reference counterpart — the
    reference tracker is plain MSE (model/scene_rep.py:319-326)."""
    a = jnp.abs(prediction - target)
    q = jnp.minimum(a, delta)
    return masked_mean(q * (2.0 * a - q), mask)


def get_masks(z_vals: jnp.ndarray, target_d: jnp.ndarray, truncation: float,
              ray_mask=None):
    """Truncation-region masks + normalized fs/sdf weights.

    z_vals: [Bs, N_samples]; target_d: [Bs, 1]; ray_mask: optional [Bs]
    Returns (front_mask, sdf_mask, fs_weight, sdf_weight); parity with
    reference model/utils.py:89-117 (weights are 1 - count/total).
    """
    front_mask = (z_vals < (target_d - truncation)).astype(z_vals.dtype)
    back_mask = (z_vals > (target_d + truncation)).astype(z_vals.dtype)
    depth_mask = (target_d > 0.0).astype(z_vals.dtype)
    sdf_mask = (1.0 - front_mask) * (1.0 - back_mask) * depth_mask

    if ray_mask is not None:
        rm = ray_mask.reshape(-1, 1).astype(z_vals.dtype)
        front_mask = front_mask * rm
        sdf_mask = sdf_mask * rm

    num_fs = jnp.sum(front_mask)
    num_sdf = jnp.sum(sdf_mask)
    num = jnp.maximum(num_fs + num_sdf, 1.0)
    fs_weight = 1.0 - num_fs / num
    sdf_weight = 1.0 - num_sdf / num
    return front_mask, sdf_mask, fs_weight, sdf_weight


def get_sdf_loss(z_vals: jnp.ndarray, target_d: jnp.ndarray,
                 predicted_sdf: jnp.ndarray, truncation: float,
                 loss_type: str = "l2", ray_mask=None):
    """Free-space + truncation-region SDF losses
    (reference model/utils.py:138-161).

    Note: like the reference, the masked residuals are averaged over the
    FULL sample grid (mask multiplies the residual, not the count) — this
    matches `compute_loss(pred * mask, ones * mask)` semantics. When
    ray_mask is given, padded rays are excluded from both the residual
    and the denominator (they don't exist in the reference's batch).
    """
    front_mask, sdf_mask, fs_weight, sdf_weight = get_masks(
        z_vals, target_d, truncation, ray_mask=ray_mask
    )
    denom_mask = None
    if ray_mask is not None:
        denom_mask = jnp.broadcast_to(
            ray_mask.reshape(-1, 1).astype(z_vals.dtype), z_vals.shape
        )

    fs_loss = compute_loss(
        predicted_sdf * front_mask, front_mask, loss_type, mask=denom_mask
    ) * fs_weight
    sdf_loss = compute_loss(
        (z_vals + predicted_sdf * truncation) * sdf_mask,
        target_d * sdf_mask, loss_type, mask=denom_mask
    ) * sdf_weight
    return fs_loss, sdf_loss


def smoothness_tv(embedded: jnp.ndarray, sample_points: int) -> jnp.ndarray:
    """Total-variation smoothness of hash features on a dense grid.

    embedded: [g, g, g, C] hash-grid features sampled on a jittered grid
    (reference coslam.py:251-274). Normalized by sample_points**3.
    """
    tv_x = jnp.sum((embedded[1:] - embedded[:-1]) ** 2)
    tv_y = jnp.sum((embedded[:, 1:] - embedded[:, :-1]) ** 2)
    tv_z = jnp.sum((embedded[:, :, 1:] - embedded[:, :, :-1]) ** 2)
    return (tv_x + tv_y + tv_z) / (sample_points ** 3)


def total_loss(ret: dict, weights: dict, rgb=True, sdf=True, depth=True,
               fs=True, smooth_loss=None, smooth_weight: float = 0.0):
    """Weighted sum of the per-term losses (reference coslam.py:140-160)."""
    loss = 0.0
    if rgb:
        loss += weights["rgb_weight"] * ret["rgb_loss"]
    if depth:
        loss += weights["depth_weight"] * ret["depth_loss"]
    if sdf:
        loss += weights["sdf_weight"] * ret["sdf_loss"]
    if fs:
        loss += weights["fs_weight"] * ret["fs_loss"]
    if smooth_loss is not None and smooth_weight > 0:
        loss += smooth_weight * smooth_loss
    return loss
