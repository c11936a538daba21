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

Storage layout (TPU): rays are PACKED 16-per-row as [num_kf, R/16, 128]
(each 128-lane row holds 16 rays x 8 floats, the 8th a zero pad).
XLA lowers a random gather of narrow [*, 7] rows to a SERIAL per-row
loop (~1 us/row — 2 ms per BA iteration at the Replica batch size);
gathering full 128-lane rows is vectorized and ~free. Global sampling
therefore draws 16-ray CHUNKS. Each keyframe's reservoir rows are a
uniform random subsample in top-k order (i.e. randomly ordered pixels),
so a chunk of 16 consecutive STORED rays is itself a uniform 16-ray
sample of the frame — chunked draws only add a without-replacement
structure within each 16-group, which at BA batch sizes is
statistically indistinguishable from independent draws.
`num_rays_to_save` is floored to a multiple of 16.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

RAY_CHUNK = 16  # rays per packed 128-lane storage row


def pack_rays(rays: jnp.ndarray) -> jnp.ndarray:
    """[..., R, 7] logical rays -> [..., R/16, 128] packed storage rows
    (pad each ray 7 -> 8 floats, 16 rays per row). R must be a multiple
    of RAY_CHUNK."""
    *lead, R, w = rays.shape
    assert w == 7 and R % RAY_CHUNK == 0, (rays.shape,)
    pad = [(0, 0)] * len(lead) + [(0, 0), (0, 1)]
    return jnp.pad(rays, pad).reshape(*lead, R // RAY_CHUNK, 8 * RAY_CHUNK)


def unpack_rays(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., C, 128] packed rows -> [..., C*16, 7] logical rays."""
    *lead, C, w = packed.shape
    assert w == 8 * RAY_CHUNK, (packed.shape,)
    return packed.reshape(*lead, C * RAY_CHUNK, 8)[..., :7]


class KeyFrameDatabase:
    def __init__(self, config: Dict, H: int, W: int, num_kf: int,
                 num_rays_to_save: int):
        self.config = config
        self.H, self.W = H, W
        self.num_kf = num_kf
        # Floor to the packed-chunk granularity (module docstring).
        self.num_rays_to_save = max(RAY_CHUNK,
                                    num_rays_to_save
                                    - num_rays_to_save % RAY_CHUNK)
        num_rays_to_save = self.num_rays_to_save
        self.rays = jnp.zeros((num_kf, num_rays_to_save // RAY_CHUNK,
                               8 * RAY_CHUNK), jnp.float32)
        self.frame_ids = np.full((num_kf,), -1, np.int64)
        self.count = 0
        self._wrap_ptr = 1  # next slot to recycle once the buffer is full

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
            sampled = pack_rays(frame_rays[idx])
            return jax.lax.dynamic_update_slice(buf, sampled[None], (slot, 0, 0))

        self._add = _add

    def __len__(self):
        return self.count

    def add_keyframe(self, frame_rays: jnp.ndarray, frame_id: int, key,
                     filter_depth: bool = False) -> int:
        """frame_rays: [H*W, 7] device array of [dir, rgb, depth].

        Returns the slot written. When the preallocated buffer is full
        (possible with ActiveCoSLAM's choose_k > 1 adding off-cadence
        keyframes), recycles the oldest slot >= 1 round-robin — slot 0
        stays pinned because global BA freezes the first keyframe's pose
        as the gauge anchor. Without this guard, dynamic_update_slice
        would silently clamp every overflow into the LAST slot while
        ``count`` kept climbing past the buffer."""
        if self.count < self.num_kf:
            slot = self.count
            self.count += 1
        else:
            slot = self._wrap_ptr
            self._wrap_ptr = self._wrap_ptr % (self.num_kf - 1) + 1
        self.rays = self._add(self.rays, frame_rays, jnp.int32(slot), key,
                              filter_depth=filter_depth)
        self.frame_ids[slot] = frame_id
        return slot

    def sample_global_rays(self, key, bs: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Random rays from all stored keyframes (host entry point; the BA
        megastep inlines the same logic on device): `bs // 16` random
        16-ray chunks (module docstring). Returns
        (rays [bs, 7], kf_index [bs]); bs must be a multiple of 16."""
        assert bs % RAY_CHUNK == 0, bs
        nc = self.num_rays_to_save // RAY_CHUNK
        cid = jax.random.randint(key, (bs // RAY_CHUNK,), 0, self.count * nc)
        flat = self.rays.reshape(-1, 8 * RAY_CHUNK)
        rays = unpack_rays(flat[cid])
        return rays, jnp.repeat(cid // nc, RAY_CHUNK)

    def sample_global_keyframe(self, key, window_size: int, n_fixed: int = 1):
        """Windowed keyframe sampling: `window_size` random keyframes plus
        the last `n_fixed` (reference model/keyframe.py:108-127).
        Returns (rays [k, R, 7], slot indices list)."""
        if window_size >= self.count:
            slots = list(range(self.count))
            return unpack_rays(self.rays[:self.count]), slots
        perm = np.asarray(jax.random.permutation(key, self.count - n_fixed))
        slots = list(perm[:window_size]) + list(
            range(self.count - n_fixed, self.count))
        return unpack_rays(self.rays[np.asarray(slots)]), slots

    def sample_overlap_keyframe(self, batch: Dict, frame_id: int,
                                est_c2w_list, k_frame: int,
                                n_samples: int = 16, n_pixel: int = 100,
                                config: Dict = None, rng=None):
        """NICE-SLAM-style overlap-based keyframe selection (reference
        model/keyframe.py:129-222, unused by the main loop): sample pixels
        of the current frame, march points along their rays, and rank
        keyframes by the fraction of points projecting into their view.
        Host/numpy: runs rarely and is branch-heavy."""
        cfg = config or self.config
        rng = rng or np.random.default_rng(0)
        c2w_est = np.asarray(est_c2w_list[frame_id], np.float64)

        H, W = self.H, self.W
        idx = rng.integers(0, H * W, n_pixel)
        dirs = np.asarray(batch["direction"]).reshape(-1, 3)[idx]
        depth = np.asarray(batch["depth"]).reshape(-1, 1)[idx]
        rays_d = dirs @ c2w_est[:3, :3].T
        rays_o = c2w_est[:3, 3][None]

        t_vals = np.linspace(0.0, 1.0, n_samples)
        near = depth * 0.8
        far = depth + 0.5
        z_vals = near * (1 - t_vals)[None] + far * t_vals[None]  # [P, S]
        pts = (rays_o[:, None, :] + rays_d[:, None, :]
               * z_vals[..., None]).reshape(-1, 3)

        fx, fy = cfg["cam"]["fx"], cfg["cam"]["fy"]
        cx, cy = cfg["cam"]["cx"], cfg["cam"]["cy"]
        Wc, Hc = cfg["cam"]["W"], cfg["cam"]["H"]
        edge = 20

        scored = []
        for slot in range(self.count):
            fid = int(self.frame_ids[slot])
            c2w = np.asarray(est_c2w_list[fid], np.float64)
            w2c = np.linalg.inv(c2w)
            cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
            cam[:, 0] *= -1  # reference's x-flip (model/keyframe.py:188)
            z = cam[:, 2:3] + 1e-5
            u = fx * cam[:, 0] / z[:, 0] + cx
            v = fy * cam[:, 1] / z[:, 0] + cy
            mask = ((u < Wc - edge) & (u > edge)
                    & (v < Hc - edge) & (v > edge) & (z[:, 0] < 0))
            scored.append((slot, mask.mean()))

        scored.sort(key=lambda s: s[1], reverse=True)
        selected = [s for s, p in scored if p > 0.0]
        selected = list(rng.permutation(np.array(selected, np.int64))[:k_frame])
        last = self.count - 1
        if last not in selected:
            selected.append(last)
        return unpack_rays(self.rays[np.asarray(selected)]), selected
