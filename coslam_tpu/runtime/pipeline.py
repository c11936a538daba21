"""Concurrent tracker/mapper pipeline (the coslam_mp.py equivalent).

The reference runs tracking and mapping as two torch.multiprocessing
processes sharing CUDA memory, synchronized by polled scalar flags
(reference: coslam_mp.py, mp_slam/tracker.py, mp_slam/mapper.py). The
TPU-native equivalent is a single process with two host threads driving
asynchronously-dispatched jitted megasteps:

- the MAPPER thread owns the scene parameters and optimizer state and
  runs first-frame mapping + global BA;
- the TRACKER thread tracks every frame against the latest published
  parameter snapshot (an atomic reference swap replaces the reference's
  deepcopy-from-shared-model, mp_slam/tracker.py:24-28);
- the reference's polling throttle is preserved: the tracker waits while
  `mapping_idx < tracking_idx - map_every - map_every // 2`
  (mp_slam/tracker.py:150-152), and the mapper maps frame
  `mapping_idx + map_every` as soon as tracking passes it
  (mp_slam/mapper.py:209-220).

On one chip the two streams interleave in the device queue; with two or
more devices the mapper can be pinned to a second device and snapshots
cross the ICI via jax.device_put (device_map argument).
"""

from __future__ import annotations

import threading
import time
from typing import Dict, Optional

import jax
import numpy as np

from .slam import CoSLAM


class PipelinedCoSLAM(CoSLAM):
    def __init__(self, config: Dict, dataset=None, devices=None):
        super().__init__(config, dataset)
        self.devices = devices or jax.devices()
        self.tracker_device = self.devices[0]
        self.mapper_device = self.devices[1] if len(self.devices) > 1 \
            else self.devices[0]

        # Shared state (single-writer flags, like the reference's
        # mapping_idx / tracking_idx / mapping_first_frame).
        self.tracking_idx = 0
        self.mapping_idx = 0
        self.mapping_first_frame = False
        self._shared_params = None     # latest published snapshot
        self._stop = False
        self._error: Optional[BaseException] = None
        self._frames: Dict[int, Dict] = {}
        self._frames_lock = threading.Lock()

    # -- parameter snapshot handoff -----------------------------------------

    def _publish_params(self):
        params = self.params
        if self.tracker_device is not self.mapper_device:
            params = jax.device_put(params, self.tracker_device)
        self._shared_params = params  # atomic reference swap

    # -- threads --------------------------------------------------------------

    def _tracker_loop(self, total: int):
        try:
            cfg = self.config
            map_every = cfg["mapping"]["map_every"]
            while not self.mapping_first_frame and not self._stop:
                time.sleep(0.005)
            for i in range(1, total):
                if self._stop:
                    return
                # Throttle: don't run too far ahead of the mapper
                # (reference mp_slam/tracker.py:150-152).
                while (self.mapping_idx < i - map_every - map_every // 2
                       and not self._stop):
                    time.sleep(0.002)
                batch = self.dataset[i]
                # Track against the latest published snapshot WITHOUT
                # touching self.params — the mapper thread owns it and
                # writes it concurrently from global_BA; a swap/restore
                # here could silently discard a finished BA update.
                self.tracking_render(batch, i, params=self._shared_params)
                if i % map_every == 0 or i % cfg["mapping"]["keyframe_every"] == 0:
                    with self._frames_lock:
                        self._frames[i] = batch
                self.tracking_idx = i
        except BaseException as e:  # surface errors to the main thread
            self._error = e
            self._stop = True

    def _mapper_loop(self, total: int):
        try:
            cfg = self.config
            map_every = cfg["mapping"]["map_every"]
            kf_every = cfg["mapping"]["keyframe_every"]

            batch0 = self.dataset[0]
            self.first_frame_mapping(batch0)
            self._publish_params()
            self.mapping_first_frame = True

            next_map = map_every
            while next_map < total and not self._stop:
                if self.tracking_idx < next_map:
                    time.sleep(0.002)
                    continue
                with self._frames_lock:
                    batch = self._frames.pop(next_map, None)
                if batch is None:
                    batch = self.dataset[next_map]
                self.global_BA(batch, next_map)
                if next_map % kf_every == 0:
                    self.add_keyframe(batch)
                self._publish_params()
                self.mapping_idx = next_map
                # Periodic mesh + ATE from the mapper, like the reference
                # (mp_slam/mapper.py:222-231) — handed to the single-flight
                # mesh worker so BA keeps its cadence. The pose-table
                # snapshot may catch the tracker mid-frame (full-row
                # writes); the reference's mp mode tolerates the same
                # benign race on its shared pose tensor.
                vis = cfg["mesh"]["vis"]
                if vis and next_map % vis == 0:
                    self._periodic_mesh_eval(next_map, *self._vis_ctx)
                next_map += map_every
            self.mapping_idx = total  # release any throttled tracker
        except BaseException as e:
            self._error = e
            self._stop = True
            self.mapping_first_frame = True

    # -- entry ------------------------------------------------------------------

    def run(self, n_frames: Optional[int] = None, verbose: bool = True,
            eval_ate: bool = True):
        import os

        from ..eval.ate import pose_evaluation

        cfg = self.config
        out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
        os.makedirs(out, exist_ok=True)
        total = len(self.dataset) if n_frames is None else min(
            n_frames, len(self.dataset))

        self.est_c2w[0] = np.asarray(self.dataset[0]["c2w"], np.float32)
        self._publish_params()
        self._vis_ctx = (out, eval_ate)

        mapper = threading.Thread(target=self._mapper_loop, args=(total,),
                                  name="mapper")
        tracker = threading.Thread(target=self._tracker_loop, args=(total,),
                                   name="tracker")
        mapper.start()
        tracker.start()
        tracker.join()
        self._stop_mapper_when_done(total)
        mapper.join()
        self._mesh_worker.wait()  # periodic mesh/eval jobs land first
        if self._error is not None:
            raise self._error

        i = total - 1
        # cursor=total: resuming a finished run re-finalizes only.
        self.save_checkpoint(os.path.join(out, f"checkpoint{i}.npz"),
                             frame_cursor=total)
        try:
            self.save_mesh(i, voxel_size=cfg["mesh"]["voxel_final"])
        except Exception as e:
            print(f"final mesh failed: {e}")
        results = None
        if eval_ate:
            results = pose_evaluation(self.pose_gt, self._pose_dict(), 1,
                                      out, i)
        if verbose:
            self.print_timings()
        return results

    def _stop_mapper_when_done(self, total: int):
        # Tracker finished: let the mapper drain remaining frames, then stop.
        deadline = time.time() + 600
        map_every = self.config["mapping"]["map_every"]
        last_mapped_target = ((total - 1) // map_every) * map_every
        while (self.mapping_idx < last_mapped_target
               and time.time() < deadline and not self._stop):
            time.sleep(0.01)
        self._stop = True
