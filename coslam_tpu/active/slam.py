"""ActiveCoSLAM runtime: information-gain keyframe selection.

Reference: ActiveCoSLAM/ac_coslam.py:1014-1131 — up to `init_image`
frames keyframes are added on the fixed cadence; afterwards, every
keyframe interval the system renders a ~10-frame holdout window at
reduced resolution, computes per-frame expected information gain

    pre  = sum over rays/samples of beta^2(r)
    post = sum of 1 / (1/beta^2 + w^2 / beta^2_render)

and inserts the top-K gain frames into the keyframe database. The
holdout render is one jitted megastep (vmapped over the window's
frames); top-K selection happens on host.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.slam import CoSLAM
from .scene_rep import ActiveJointEncoding


class ActiveCoSLAM(CoSLAM):
    def __init__(self, config: Dict, dataset=None):
        # Ensure the 'active' section exists with reference defaults
        # (ActiveCoSLAM/active_tum.yaml:117-124).
        config.setdefault("active", {})
        a = config["active"]
        a.setdefault("isActive", True)
        a.setdefault("check_info_gain_every", 10)
        a.setdefault("init_image", 20)
        a.setdefault("choose_k", 1)
        a.setdefault("w", 0.01)
        a.setdefault("downsample_rate", 4)
        a.setdefault("beta_min", 0.01)
        super().__init__(config, dataset)
        self._info_gain_fn = None

    def _make_model(self, config):
        """Use the uncertainty-aware scene representation."""
        return ActiveJointEncoding(config, self.bounding_box)

    def _build_info_gain(self):
        model = self.model
        ds_rate = self.config["active"]["downsample_rate"]
        H, W = self.dataset.H, self.dataset.W
        n_samples = (H // ds_rate) * (W // ds_rate)

        @jax.jit
        def info_gain(params, key, rays, c2w):
            """rays: [S, 7] of one holdout frame; returns (pre, post)."""
            dirs = rays[:, :3]
            rays_d = dirs @ c2w[:3, :3].T
            rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
            rend = model.render_rays(params, key, rays_o, rays_d,
                                     target_d=rays[:, 6:7])
            uncert_render = rend["uncert_map"][:, None] + 1e-9
            uncert_pts = rend["raw"][..., -1] + 1e-9         # [S, n_samp]
            w = rend["weights"]
            pre = jnp.sum(uncert_pts)
            post = jnp.sum(1.0 / (1.0 / uncert_pts
                                  + w * w / uncert_render))
            return pre, post

        return info_gain, n_samples

    def select_info_gain_indices(self, holdout_view):
        """Rank a holdout DatasetView by expected information gain and
        return the view-local indices of the top-K frames
        (reference ac_coslam.py:1049-1108)."""
        if self._info_gain_fn is None:
            self._info_gain_fn = self._build_info_gain()
        info_gain, n_samples = self._info_gain_fn
        k = self.config["active"]["choose_k"]

        idx = self._rng.choice(self.dataset.H * self.dataset.W,
                               size=n_samples, replace=False)
        gains = []
        for j in range(len(holdout_view)):
            batch = holdout_view[j]
            fid = int(batch["frame_id"])
            flat = self._frame_rays_flat(batch)[idx]
            pre, post = info_gain(self.params, self._next_key(),
                                  jnp.asarray(flat),
                                  jnp.asarray(self.est_c2w[fid] if
                                              np.any(self.est_c2w[fid]) else
                                              batch["c2w"]))
            gains.append(float(pre) - float(post))
        order = np.argsort(gains)[::-1]
        return [int(j) for j in order[:k]]

    def _grow_train_set(self, train_ds, holdout, as_keyframes: bool,
                        verbose: bool):
        """Append the info-gain top-K of the next holdout window to the
        train set and drop them from the pool; optionally insert them as
        keyframes (reference ac_coslam.py:1106-1131)."""
        wsize = min(10, len(holdout))
        window = holdout.slice(range(wsize))
        top = self.select_info_gain_indices(window)
        chosen = window.slice(top)
        train_ds = train_ds + chosen
        holdout = holdout.remove(top)
        if as_keyframes:
            existing = set(self.kf_db.frame_ids[:self.kf_db.count])
            for j in range(len(chosen)):
                cb = chosen[j]
                if int(cb["frame_id"]) not in existing:
                    self.add_keyframe(cb)
                    if verbose:
                        print(f"info-gain keyframe: {int(cb['frame_id'])} "
                              f"(train set -> {len(train_ds)})")
        return train_ds, holdout

    def run(self, n_frames: Optional[int] = None, verbose: bool = True,
            eval_ate: bool = True):
        """Active per-frame loop with a GROWING training set
        (reference ac_coslam.py:956-1172): the run starts on the first
        ``init_image`` frames; every keyframe interval past that, the
        info-gain top-K of the next holdout window are appended to the
        train set (and the loop bound re-derived from its new length),
        removed from the holdout pool, and inserted as keyframes. The
        training distribution therefore concentrates on high-information
        frames — the point of the ActiveCoSLAM variant."""
        import os

        from ..eval.ate import pose_evaluation
        from ..runtime.tracking import predict_current_pose

        cfg = self.config
        active = cfg["active"]
        out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
        os.makedirs(out, exist_ok=True)
        total = len(self.dataset) if n_frames is None else min(
            n_frames, len(self.dataset))
        init_image = int(active["init_image"])

        if active["isActive"] and init_image < total:
            train_ds = self.dataset.slice(range(0, init_image))
            holdout = self.dataset.slice(range(init_image, total))
        else:
            train_ds = self.dataset.slice(range(0, total))
            holdout = self.dataset.slice([])

        processed = []  # frame ids in processing order (for pose init)
        i = 0
        while i < len(train_ds):  # bound re-read each lap: the set grows
            batch = train_ds[i]
            fid = int(batch["frame_id"])
            if i == 0:
                self.first_frame_mapping(batch)
                processed.append(fid)
                i += 1
                continue

            prev = self.est_c2w[processed[-1]]
            prev_prev = (self.est_c2w[processed[-2]]
                         if len(processed) >= 2 else None)
            c2w_init = predict_current_pose(prev, prev_prev,
                                            cfg["tracking"]["const_speed"])
            self.tracking_render(batch, fid, c2w_init=c2w_init)
            processed.append(fid)
            if verbose:
                loss, psnr, err = self._last_track_info
                print(f"it: {i} (frame {fid}), loss: {loss:.5f}, "
                      f"psnr: {psnr:.3f}, pose L1 vs gt: {err:.5f}")

            if i % cfg["mapping"]["map_every"] == 0:
                self.global_BA(batch, fid)

            if i % cfg["mapping"]["keyframe_every"] == 0:
                if (not active["isActive"]) or i <= init_image \
                        or len(holdout) == 0:
                    self.add_keyframe(batch)
                else:
                    train_ds, holdout = self._grow_train_set(
                        train_ds, holdout, as_keyframes=True,
                        verbose=verbose)
            if (active["isActive"] and len(holdout) > 0
                    and i == len(train_ds) - 1):
                # Train set about to run dry: pull the next info-gain
                # window so the run continues through the sequence (the
                # reference's i_end = len(train_dataset) re-derivation,
                # ac_coslam.py:1172).
                train_ds, holdout = self._grow_train_set(
                    train_ds, holdout, as_keyframes=False, verbose=verbose)

            if cfg["mesh"]["vis"] and i % cfg["mesh"]["vis"] == 0:
                try:
                    self.save_mesh(i, voxel_size=cfg["mesh"]["voxel_eval"])
                except Exception as e:
                    print(f"mesh save failed: {e}")
            i += 1

        self.train_set_size = len(train_ds)  # final i_end (ac_coslam:1172)
        i = len(train_ds) - 1
        self.save_checkpoint(os.path.join(out, f"checkpoint{i}.npz"))
        results = None
        if eval_ate:
            results = pose_evaluation(self.pose_gt, self._pose_dict(), 1,
                                      out, i)
        return results

    def test(self, batch: Dict, frame_id: int) -> Dict:
        """One-shot render evaluation at the predicted pose
        (reference ac_coslam.py:703-741)."""
        from ..runtime.tracking import predict_current_pose

        prev = self.est_c2w[frame_id - 1]
        prev_prev = self.est_c2w[frame_id - 2] if frame_id >= 2 else None
        c2w = predict_current_pose(prev, prev_prev,
                                   self.config["tracking"]["const_speed"])
        rays = self._sample_tracking_rays(batch)
        dirs = jnp.asarray(rays[:, :3])
        rays_d = dirs @ jnp.asarray(c2w[:3, :3]).T
        rays_o = jnp.broadcast_to(jnp.asarray(c2w[:3, 3]), rays_d.shape)
        ret = self.model.forward(self.params, self._next_key(), rays_o,
                                 rays_d, jnp.asarray(rays[:, 3:6]),
                                 jnp.asarray(rays[:, 6:7]))
        return {k: np.asarray(v) for k, v in ret.items()}
