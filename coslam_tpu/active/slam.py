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
        # Default ON: train beta on a detached residual (the reference's
        # plain NLL measurably biases pose/map optimization — 91 cm vs
        # 5 cm ATE on the 300f synthetic control; see
        # ActiveJointEncoding.forward). detach_nll: false restores the
        # reference formulation (ac_scene_rep.py:365-380).
        a.setdefault("detach_nll", True)
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

    def _grow_train_set(self, train_ds, holdout, verbose: bool):
        """Append the info-gain top-K of the next holdout window
        (``check_info_gain_every`` frames; the reference's is 10) to the
        train set, insert them as keyframes, and march the window
        forward (reference ac_coslam.py:1106-1131).

        Two ordering properties matter for tracking and are taken from
        the reference: chosen indices are appended in TEMPORAL order
        (the np.sort at ac_coslam.py:1103 — the constant-speed motion
        model needs a forward-moving frame stream), and the candidate
        window is LOCAL and marches with the video (the reference
        anchors it to the current frame, dataset.slice(range(i-4,
        i-4+10)) at ac_coslam.py:1060, advancing keyframe_every frames
        per event) — holdout frames the window passes over without
        being chosen are skipped for good. That subsetting is the
        variant's point: it trains on an information-dense subsequence."""
        wsize = min(int(self.config["active"]["check_info_gain_every"]),
                    len(holdout))
        window = holdout.slice(range(wsize))
        by_gain = self.select_info_gain_indices(window)
        chosen = window.slice(sorted(by_gain))
        train_ds = train_ds + chosen
        # Consume the WHOLE window: unchosen frames are skipped for good,
        # so the processed stream is strictly forward in time (leftovers
        # chosen later would be tracked AFTER newer frames — backward
        # jumps the constant-speed model extrapolates badly from).
        holdout = holdout.slice(range(wsize, len(holdout)))
        # Only the TOP-1 gain frame becomes a keyframe — the reference's
        # selection hardcodes topK=1 (ac_coslam.py:1102), which keeps
        # keyframe insertion at the cadence rate the [num_kf] ring is
        # sized for; making every chosen frame a keyframe overflows the
        # ring and recycles away early-scene coverage (measured: ATE
        # 89 cm vs 5 cm at cadence rate). choose_k controls TRAIN-SET
        # growth only. Insertion is deferred until the frame is TRACKED:
        # the BA pose table mirrors est_c2w at insertion
        # (runtime/slam.py add_keyframe), so inserting a not-yet-tracked
        # frame would hand BA an all-zero pose and poison the map.
        if by_gain:
            self._pending_kf.add(int(window[by_gain[0]]["frame_id"]))
        if verbose and by_gain:
            print(f"info-gain chose {[int(window[j]['frame_id']) for j in by_gain]} "
                  f"(kf: {int(window[by_gain[0]]['frame_id'])}, "
                  f"train set -> {len(train_ds)})")
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
        self._pending_kf = set()  # chosen, awaiting their tracked pose
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
            # The subsequence has non-uniform frame gaps; rescale the
            # constant-speed velocity by the id-gap ratio so skipping
            # k video frames extrapolates k frames of motion.
            if len(processed) >= 2:
                g1 = processed[-1] - processed[-2]
                gap_ratio = (fid - processed[-1]) / g1 if g1 else 1.0
            else:
                gap_ratio = 1.0
            c2w_init = predict_current_pose(prev, prev_prev,
                                            cfg["tracking"]["const_speed"],
                                            gap_ratio=gap_ratio)
            self.tracking_render(batch, fid, c2w_init=c2w_init)
            if fid - processed[-1] > 1:
                # Gap frame (the selection skipped video frames): one
                # refinement pass re-runs the same compiled tracking
                # megastep from the first pass's pose — the doubled
                # budget the reference's dagger protocol applies
                # globally, spent only where the jump needs it.
                self.tracking_render(batch, fid,
                                     c2w_init=self.est_c2w[fid])
            processed.append(fid)
            if fid in self._pending_kf:
                # Deferred info-gain keyframe: the frame now has a
                # tracked pose for the BA pose table.
                self._pending_kf.discard(fid)
                if fid not in set(
                        int(f) for f in
                        self.kf_db.frame_ids[:self.kf_db.count]):
                    self.add_keyframe(batch)
                    if verbose:
                        print(f"info-gain keyframe: {fid}")
            if verbose:
                loss, psnr, err = self._last_track_info
                print(f"it: {i} (frame {fid}), loss: {loss:.5f}, "
                      f"psnr: {psnr:.3f}, pose L1 vs gt: {err:.5f}")

            if i % cfg["mapping"]["map_every"] == 0:
                self.global_BA(batch, fid)

            if i % cfg["mapping"]["keyframe_every"] == 0:
                if (not active["isActive"]) or i <= init_image \
                        or len(holdout) == 0:
                    # Cadence keyframe; a frame already chosen by
                    # info-gain must not occupy a second DB slot.
                    if fid not in set(
                            int(f) for f in
                            self.kf_db.frame_ids[:self.kf_db.count]):
                        self.add_keyframe(batch)
                else:
                    train_ds, holdout = self._grow_train_set(
                        train_ds, holdout, verbose=verbose)
            if (active["isActive"] and len(holdout) > 0
                    and i == len(train_ds) - 1):
                # Train set about to run dry: pull the next info-gain
                # window so the run continues through the sequence (the
                # reference's i_end = len(train_dataset) re-derivation,
                # ac_coslam.py:1172).
                train_ds, holdout = self._grow_train_set(
                    train_ds, holdout, verbose=verbose)

            if cfg["mesh"]["vis"] and i % cfg["mesh"]["vis"] == 0:
                # Off-thread like the base runtime (no periodic ATE in
                # the reference fork's loop).
                self._periodic_mesh_eval(i, out, eval_ate=False)
            i += 1

        self.train_set_size = len(train_ds)  # final i_end (ac_coslam:1172)
        i = len(train_ds) - 1
        self._mesh_worker.wait()  # periodic meshes land before the final
        try:
            # Final mesh under the CoSLAM.run naming contract (indexed by
            # the SEQUENCE's last frame) so eval/benchmark.py finds it.
            self.save_mesh(total - 1, voxel_size=cfg["mesh"]["voxel_final"])
        except Exception as e:
            print(f"final mesh save failed: {e}")
        # cursor=total: resuming a finished run re-finalizes only.
        self.save_checkpoint(os.path.join(out, f"checkpoint{i}{self._ckpt_ext}"),
                             frame_cursor=total)
        results = None
        if eval_ate:
            # The active loop trains on a SUBSEQUENCE; evaluate ATE over
            # the processed frames only, remapped to contiguous keys
            # (pose_evaluation walks a dense index range).
            est = self._pose_dict()
            ids = sorted(est.keys())
            gt = {j: self.pose_gt[fid] for j, fid in enumerate(ids)}
            est = {j: est[fid] for j, fid in enumerate(ids)}
            results = pose_evaluation(gt, est, 1, out, i)
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
