"""SDF volume-rendering primitives.

Functional ports of the reference renderer (reference:
model/scene_rep.py:77-124 sdf2weights/raw2outputs,
model/scene_rep.py:211-295 depth-guided sampling,
model/utils.py:32-71 sample_pdf). Everything here is shape-static and
jit/vmap/grad-safe; randomness comes in through explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdf2weights(sdf: jnp.ndarray, z_vals: jnp.ndarray, truncation: float,
                sc_factor: float = 1.0) -> jnp.ndarray:
    """Convert SDF samples along a ray into normalized rendering weights.

    sdf, z_vals: [N_rays, N_samples]. A sigmoid-bell kernel is masked to
    the first zero crossing (+ sc_factor * truncation slack) and
    normalized per ray (reference model/scene_rep.py:77-97).
    """
    weights = jax.nn.sigmoid(sdf / truncation) * jax.nn.sigmoid(-sdf / truncation)

    signs = sdf[:, 1:] * sdf[:, :-1]
    crossing = (signs < 0.0).astype(z_vals.dtype)
    # argmax returns the FIRST maximal element => first crossing; if no
    # crossing exists, index 0 is selected (same as the reference).
    inds = jnp.argmax(crossing, axis=1)
    z_min = jnp.take_along_axis(z_vals, inds[:, None], axis=1)
    mask = (z_vals < z_min + sc_factor * truncation).astype(z_vals.dtype)

    weights = weights * mask
    return weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-8)


def raw2outputs(raw: jnp.ndarray, z_vals: jnp.ndarray, truncation: float,
                sc_factor: float = 1.0, white_bkgd: bool = False):
    """Volume render raw network output along rays.

    raw: [N_rays, N_samples, 4] (rgb logits + sdf); z_vals: [N_rays, N_samples].
    Returns (rgb_map [N,3], disp_map [N], acc_map [N], weights [N,S],
    depth_map [N], depth_var [N]) — reference model/scene_rep.py:99-124.
    """
    rgb = jax.nn.sigmoid(raw[..., :3])
    weights = sdf2weights(raw[..., 3], z_vals, truncation, sc_factor)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)

    depth_map = jnp.sum(weights * z_vals, axis=-1)
    depth_var = jnp.sum(weights * (z_vals - depth_map[..., None]) ** 2, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.sum(weights, axis=-1))
    acc_map = jnp.sum(weights, axis=-1)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map, depth_var


def stratified_z_vals(key, n_rays: int, target_d, near: float, far: float,
                      range_d: float, n_range_d: int, n_samples_d: int,
                      perturb: bool, dtype=jnp.float32):
    """Depth-guided + uniform z sampling with optional stratified perturb.

    target_d: [N_rays, 1] (or None for pure uniform sampling with
    n_samples_d samples). Rays with invalid depth (<= 0) fall back to a
    near..far linspace for their depth-guided block. Mirrors reference
    model/scene_rep.py:219-255. Returns z_vals [N_rays, n_total].
    """
    if target_d is not None:
        z_samples = jnp.linspace(-range_d, range_d, n_range_d, dtype=dtype)
        z_samples = z_samples[None, :] + target_d  # [N, n_range_d]
        fallback = jnp.linspace(near, far, n_range_d, dtype=dtype)
        invalid = (target_d[:, 0] <= 0.0)[:, None]
        z_samples = jnp.where(invalid, fallback[None, :], z_samples)

        if n_samples_d > 0:
            z_uniform = jnp.linspace(near, far, n_samples_d, dtype=dtype)
            z_uniform = jnp.broadcast_to(z_uniform[None, :], (n_rays, n_samples_d))
            z_vals = jnp.sort(jnp.concatenate([z_uniform, z_samples], axis=-1), axis=-1)
        else:
            z_vals = z_samples
    else:
        z_vals = jnp.broadcast_to(
            jnp.linspace(near, far, n_samples_d, dtype=dtype)[None, :],
            (n_rays, n_samples_d),
        )

    if perturb:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t = jax.random.uniform(key, z_vals.shape, dtype=dtype)
        z_vals = lower + (upper - lower) * t
    return z_vals


def sample_pdf(key, bins: jnp.ndarray, weights: jnp.ndarray,
               n_importance: int, det: bool = False, eps: float = 1e-5):
    """Hierarchical importance sampling by CDF inversion.

    bins: [Bs, M+1], weights: [Bs, M] -> samples [Bs, n_importance].
    As in the reference call site (model/scene_rep.py:269-270), bins are
    the z midpoints and weights the interior rendering weights, so bins
    has exactly one more entry than weights — the same length as the
    zero-padded CDF (reference model/utils.py:32-71).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [Bs, M+1]

    if det:
        u = jnp.linspace(0.5 / n_importance, 1.0 - 0.5 / n_importance, n_importance)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_importance,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_importance,))

    # searchsorted 'right' per-row
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
