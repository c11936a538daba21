"""Keyframe ray reservoir as a fixed-shape HBM ring buffer.

TPU-native replacement of the reference's CPU-tensor keyframe database
(reference: model/keyframe.py). The buffer [num_kf, rays_per_kf, 7]
(dir(3), rgb(3), depth(1)) is preallocated on device; adding a keyframe
is a jitted gather + dynamic_update_slice with buffer donation (no
reallocation, no host copies), and global-BA ray sampling is a jitted
random gather. Sizes are static: num_kf is computed up front from the
sequence length exactly like the reference (coslam.py:84-96).

Sampling semantics vs the reference:
- per-keyframe subsampling uses noise top-k (= uniform sampling without
  replacement), optionally restricted to valid-depth rays
  ('filter_depth', reference model/keyframe.py:39-56);
- global ray sampling draws WITH replacement from the first
  `count * rays_per_kf` stored rays (the reference draws without
  replacement from the same pool; at 2048 draws from millions of rays
  the collision probability is negligible).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class KeyFrameDatabase:
    def __init__(self, config: Dict, H: int, W: int, num_kf: int,
                 num_rays_to_save: int):
        self.config = config
        self.H, self.W = H, W
        self.num_kf = num_kf
        self.num_rays_to_save = num_rays_to_save
        self.rays = jnp.zeros((num_kf, num_rays_to_save, 7), jnp.float32)
        self.frame_ids = np.full((num_kf,), -1, np.int64)
        self.count = 0

        depth_trunc = float(config["cam"]["depth_trunc"])

        @partial(jax.jit, donate_argnums=(0,), static_argnames=("filter_depth",))
        def _add(buf, frame_rays, slot, key, filter_depth: bool):
            # frame_rays: [H*W, 7]. Sample num_rays_to_save rows without
            # replacement via noise top-k; filter_depth biases invalid
            # depths to -inf score so they are never chosen (as long as
            # enough valid rays exist).
            scores = jax.random.uniform(key, (frame_rays.shape[0],))
            if filter_depth:
                valid = (frame_rays[:, 6] > 0.0) & (frame_rays[:, 6] <= depth_trunc)
                scores = jnp.where(valid, scores, -jnp.inf)
            _, idx = jax.lax.top_k(scores, num_rays_to_save)
            sampled = frame_rays[idx]
            return jax.lax.dynamic_update_slice(buf, sampled[None], (slot, 0, 0))

        self._add = _add

    def __len__(self):
        return self.count

    def add_keyframe(self, frame_rays: jnp.ndarray, frame_id: int, key,
                     filter_depth: bool = False) -> None:
        """frame_rays: [H*W, 7] device array of [dir, rgb, depth]."""
        self.rays = self._add(self.rays, frame_rays,
                              jnp.int32(self.count), key,
                              filter_depth=filter_depth)
        self.frame_ids[self.count] = frame_id
        self.count += 1

    def sample_global_rays(self, key, bs: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Random rays from all stored keyframes (host entry point; the BA
        megastep inlines the same logic on device). Returns
        (rays [bs, 7], kf_index [bs])."""
        idx = jax.random.randint(key, (bs,), 0,
                                 self.count * self.num_rays_to_save)
        flat = self.rays.reshape(-1, 7)
        return flat[idx], idx // self.num_rays_to_save
