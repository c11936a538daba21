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

The tracker rides the sequential loop's deferred-readback machinery
(slam.py): tracked poses stay on the device pose chain, packed results
return via async d2h copies into a lock-guarded FIFO resolved in
submission order, and the mapper raises a monotonic chain-retention
threshold so device poses it still needs are never pruned. On one chip
the two streams interleave in the device queue (wall frame time = the
tracking step; BA hides behind it). With two or more devices
(`devices=` argument / CLI `--devices`), the mapper-owned state is
pinned to the second device so BA, keyframe insertion, and mesh queries
execute there, and parameter snapshots cross the ICI via
jax.device_put.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .slam import CoSLAM


class PipelinedCoSLAM(CoSLAM):
    def __init__(self, config: Dict, dataset=None, devices=None):
        # _next_key runs inside super().__init__ (init_params) — the
        # lock and device attributes it reads must exist first.
        self._key_lock = threading.Lock()
        self.devices = devices or jax.devices()
        self.tracker_device = self.devices[0]
        self.mapper_device = self.devices[1] if len(self.devices) > 1 \
            else self.devices[0]
        # mapping.ba_chunks splits BA into several device dispatches so
        # tracking steps could interleave between them. Measured on the
        # single-chip pipeline (r4, same session, 110-frame flagship):
        # 1 chunk p50 19.6 / p99 51.8 ms; 4 chunks p50 18.0 / p99 49.8
        # (parity); 2 chunks + 4 ms between-chunk tracker-dispatch gaps
        # p50 18.3 / p99 182.9 (the gaps push the mapper past its
        # 5-frame cadence budget and the tracker hits the reference
        # throttle). The tail is device OCCUPANCY — per 5 frames the
        # chip runs 5 tracking steps + one ~60 ms BA with no slack to
        # pace — so splitting cannot hide it on one chip; default stays
        # 1 (env COSLAM_BA_CHUNKS / mapping.ba_chunks remain for
        # dedicated-mapper-device setups where BA competes with nothing).
        import os as _os
        env_chunks = _os.environ.get("COSLAM_BA_CHUNKS")
        if env_chunks is not None:
            config["mapping"]["ba_chunks"] = int(env_chunks)
        # Tracker-dispatch signal consumed by _ba_chunk_gap: between BA
        # chunks the mapper yields until the tracker has enqueued its
        # next step (or a short timeout), so that step executes between
        # chunks instead of after the whole BA.
        self._track_dispatch_ev = threading.Event()
        super().__init__(config, dataset)
        if self.mapper_device is not self.tracker_device:
            # Pin the mapper-owned state to its device(s) so BA,
            # keyframe insertion, and mesh queries actually execute
            # there, concurrent with tracking on device 0; parameter
            # snapshots cross back over ICI in _publish_params. With a
            # mapper mesh (parallel.dp > 2) the state is REPLICATED over
            # the mesh and BA's ray batches shard over it. (The keyframe
            # ring keeps its donation chain — donation is per-placement
            # and every add_keyframe now runs on the mapper devices.)
            self.params = self._mapper_put(self.params)
            self.map_opt_state = self._mapper_put(self.map_opt_state)
            self.kf_db.rays = self._mapper_put(self.kf_db.rays)
            self.kf_poses = self._mapper_put(self.kf_poses)
            if self._use_align:
                self.kf_aligns = self._mapper_put(self.kf_aligns)
                self._cur_align = self._mapper_put(self._cur_align)

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

    def _setup_meshes(self, config: Dict):
        """Heterogeneous pipelined placement: `parallel.dp` / `--devices
        N` selects the TOTAL device count. The tracker keeps devices[0]
        to itself (its step latency sets the wall frame rate) and the
        mapper owns devices[1:N]: with N > 2 those form a ray-DP mesh —
        BA/first-frame ray batches shard over it, parameters replicate,
        and XLA reduces the map gradients over ICI — so bundle
        adjustment scales out across chips while tracking latency stays
        single-chip. N=2 degenerates to plain second-chip pinning, N<=1
        runs both streams on one chip (the sequential mode's dp mesh
        semantics stay with the sequential runtime)."""
        dp = int((config.get("parallel") or {}).get("dp", 1) or 1)
        self.mesh = None
        self.track_mesh = None
        if dp > len(self.devices):
            raise ValueError(f"parallel.dp={dp} but only "
                             f"{len(self.devices)} devices available")
        if dp > 1:
            self.tracker_device = self.devices[0]
            self.mapper_devices = list(self.devices[1:dp])
            self.mapper_device = self.mapper_devices[0]
        else:
            self.mapper_devices = [self.mapper_device]
        if len(self.mapper_devices) > 1:
            from jax.sharding import Mesh, NamedSharding
            from jax.sharding import PartitionSpec as P

            n = len(self.mapper_devices)
            if config["mapping"]["sample"] % n:
                raise ValueError(
                    f"mapping.sample={config['mapping']['sample']} not "
                    f"divisible by the mapper mesh size {n} "
                    f"(= parallel.dp - 1)")
            self.map_mesh = Mesh(np.array(self.mapper_devices), ("dp",))
            self._mapper_target = NamedSharding(self.map_mesh, P())
        else:
            self.map_mesh = None
            self._mapper_target = self.mapper_device

    def _mapper_put(self, x):
        """Place a value on the mapper's device (or replicate it over
        the mapper mesh when BA is sharded)."""
        return jax.device_put(x, self._mapper_target)

    def _to_mapper(self, x):
        if self.tracker_device is not self.mapper_device:
            return self._mapper_put(x)
        return x

    def _ba_chunk_gap(self):
        # Give the tracker a window to enqueue between BA chunks. The
        # event is set right after each tracking dispatch; waiting on it
        # (bounded) puts at most one tracker step between chunks without
        # stalling BA when the tracker is idle/throttled.
        self._track_dispatch_ev.wait(timeout=0.004)
        self._track_dispatch_ev.clear()

    def _next_key(self):
        # Both threads consume the shared jax RNG stream; without the
        # guard a read-split-write interleave could hand the SAME subkey
        # to a tracking step and a BA step.
        with self._key_lock:
            k = super()._next_key()
        # jit outputs are committed to their execution device (device 0
        # here); mapper-side steps need mapper-committed inputs.
        if (self.tracker_device is not self.mapper_device
                and threading.current_thread().name == "mapper"):
            return self._mapper_put(k)
        return k

    def _frame_block(self, batch):
        """Frame blocks are assembled (and prefetch-staged) on the
        tracker device; their pipelined consumers (global_BA, keyframe
        insertion, first-frame mapping) all run on the mapper device —
        move once and cache on the batch."""
        blk = super()._frame_block(batch)
        if self.tracker_device is self.mapper_device:
            return blk
        blk_m = batch.get("_dev_block_mapper")
        if blk_m is None:
            blk_m = self._mapper_put(blk)
            batch["_dev_block_mapper"] = blk_m
        return blk_m

    def _to_tracker(self, x):
        if self.tracker_device is not self.mapper_device:
            return jax.device_put(x, self.tracker_device)
        return x

    def _pose_dev(self, frame_id: int):
        # Chain poses are tracker-committed; the callers of _pose_dev
        # (global_BA / add_keyframe / current_frame_mapping) all run on
        # the mapper device.
        p = super()._pose_dev(frame_id)
        if self.tracker_device is not self.mapper_device:
            return self._mapper_put(p)
        return p

    def load_checkpoint(self, path: str) -> int:
        """Resume restores arrays onto the default device; re-pin the
        mapper-owned state to its placement (second chip / mapper mesh)
        so the resumed run keeps the pipelined execution geometry."""
        cursor = super().load_checkpoint(path)
        if self.mapper_device is not self.tracker_device:
            self.params = self._mapper_put(self.params)
            self.map_opt_state = self._mapper_put(self.map_opt_state)
            self.kf_db.rays = self._mapper_put(self.kf_db.rays)
            self.kf_poses = self._mapper_put(self.kf_poses)
            if self._use_align:
                self.kf_aligns = self._mapper_put(self.kf_aligns)
                self._cur_align = self._mapper_put(self._cur_align)
        return cursor

    # -- parameter snapshot handoff -----------------------------------------

    def _publish_params(self):
        params = self.params
        if self.tracker_device is not self.mapper_device:
            params = jax.device_put(params, self.tracker_device)
        self._shared_params = params  # atomic reference swap

    # -- threads --------------------------------------------------------------

    def _tracker_loop(self, total: int, start: int = 1):
        try:
            from ..data.prefetch import PrefetchIterator

            cfg = self.config
            map_every = cfg["mapping"]["map_every"]

            def stage(i, batch):
                """Prefetch-worker staging, as in the sequential run():
                pre-upload the tracking rays and (for frames the mapper
                will consume) the full frame block so h2d transfers hide
                behind device compute. The mapper only ever consumes
                map_every-cadence frames (keyframes are inserted from the
                mapped frame, like the reference's mp mapper,
                mp_slam/mapper.py:222), so only those get a block."""
                batch["_dev_track_rays"] = jnp.asarray(
                    self._sample_tracking_rays(batch))
                if i % map_every == 0:
                    self._frame_block(batch)
                return batch

            frames = PrefetchIterator(self.dataset, total, start=start,
                                      transform=stage,
                                      workers=cfg["data"].get("num_workers"))
            # Load the tracking megastep's compiled program NOW (the
            # tracker is otherwise idle until the mapper finishes the
            # first frame); _shared_params was published before the
            # threads started, so the warm call compiles/loads for the
            # tracker device's placement. Best-effort, outputs dropped.
            try:
                if jax.default_backend() != "cpu":
                    al = ({"align": jnp.zeros((4,), jnp.float32)}
                          if self._use_align else {})
                    self._track_step(
                        self._shared_params, jnp.eye(4, dtype=jnp.float32),
                        jnp.zeros((cfg["tracking"]["sample"], 7),
                                  jnp.float32), jax.random.PRNGKey(0), **al)
            except Exception:
                pass
            while not self.mapping_first_frame and not self._stop:
                time.sleep(0.005)
            for i, batch in frames:
                if self._stop:
                    return
                # Throttle: don't run too far ahead of the mapper
                # (reference mp_slam/tracker.py:150-152).
                if self.mapping_idx < i - map_every - map_every // 2:
                    with self._event("throttle"):
                        while (self.mapping_idx
                               < i - map_every - map_every // 2
                               and not self._stop):
                            time.sleep(0.002)
                self.frame_walls.append(time.perf_counter())
                # Track against the latest published snapshot WITHOUT
                # touching self.params — the mapper thread owns it and
                # writes it concurrently from global_BA; a swap/restore
                # here could silently discard a finished BA update.
                # Readbacks are DEFERRED (slam.py module docstring): the
                # tracked pose stays on the device chain, the packed
                # result rides an async d2h into the lock-guarded FIFO.
                self.tracking_render(batch, i, params=self._shared_params)
                self._track_dispatch_ev.set()
                if i % map_every == 0:
                    # Only stash frames the mapper pops (map_every
                    # cadence); kf-only frames would accumulate in the
                    # dict forever when kf_every doesn't align.
                    with self._frames_lock:
                        self._frames[i] = batch
                self.tracking_idx = i
            self.frame_walls.append(time.perf_counter())
        except BaseException as e:  # surface errors to the main thread
            self._error = e
            self._stop = True

    def _mapper_loop(self, total: int, start: int = 1, ckpt_every: int = 0,
                     out: str = ""):
        try:
            import os

            cfg = self.config
            map_every = cfg["mapping"]["map_every"]
            kf_every = cfg["mapping"]["keyframe_every"]

            if start <= 1:
                batch0 = self.dataset[0]
                self.first_frame_mapping(batch0)
                next_map = map_every
            else:
                # Resume: the map/keyframes up to the cursor were
                # restored by load_checkpoint; continue BA at the next
                # mapping cadence point.
                next_map = ((start - 1) // map_every + 1) * map_every
                self.mapping_idx = next_map - map_every
            self._publish_params()
            self.mapping_first_frame = True
            while next_map < total and not self._stop:
                # The tracker must not prune device-chain poses the
                # mapper still needs (global_BA's cur_pose and the
                # keyframe insert read _pose_dev(next_map)); raising the
                # threshold is monotonic, so no entry >= next_map is
                # ever dropped before this BA consumes it.
                self._chain_keep = next_map
                if self.tracking_idx < next_map:
                    time.sleep(0.002)
                    continue
                with self._frames_lock:
                    batch = self._frames.pop(next_map, None)
                if batch is None:
                    batch = self.dataset[next_map]
                with self._event("ba"):
                    self.global_BA(batch, next_map)
                if next_map % kf_every == 0:
                    with self._event("keyframe"):
                        self.add_keyframe(batch)
                self._publish_params()
                self.mapping_idx = next_map
                if ckpt_every and next_map % ckpt_every == 0 \
                        and next_map > start:
                    # Consistent resume point: frames [0, next_map] are
                    # tracked + mapped + keyframed (tracker-ahead frames
                    # simply re-track on resume). The FIFO drain inside
                    # save_checkpoint serializes under the pending lock.
                    with self._event("checkpoint"):
                        self.save_checkpoint(
                            os.path.join(
                                out,
                                f"checkpoint{next_map}{self._ckpt_ext}"),
                            frame_cursor=next_map + 1, async_write=True)
                # Periodic mesh + ATE from the mapper, like the reference
                # (mp_slam/mapper.py:222-231) — handed to the single-flight
                # mesh worker so BA keeps its cadence. The pose-table
                # snapshot may catch the tracker mid-frame (full-row
                # writes); the reference's mp mode tolerates the same
                # benign race on its shared pose tensor.
                vis = cfg["mesh"]["vis"]
                if vis and next_map % vis == 0:
                    with self._event("mesh_eval"):
                        self._periodic_mesh_eval(next_map, *self._vis_ctx)
                next_map += map_every
            self._chain_keep = total  # tracker may prune freely now
            self.mapping_idx = total  # release any throttled tracker
        except BaseException as e:
            self._error = e
            self._stop = True
            self.mapping_first_frame = True

    # -- entry ------------------------------------------------------------------

    def run(self, n_frames: Optional[int] = None, verbose: bool = True,
            eval_ate: bool = True, ckpt_every: int = 0,
            start_frame: int = 0):
        """ckpt_every: mapper-side periodic resumable checkpoints (the
        sequential run()'s crash-recovery story for this mode).
        start_frame: resume cursor from load_checkpoint — frames before
        it are restored state; tracking restarts there against the
        restored map."""
        import os

        from ..eval.ate import pose_evaluation

        cfg = self.config
        out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
        os.makedirs(out, exist_ok=True)
        total = len(self.dataset) if n_frames is None else min(
            n_frames, len(self.dataset))
        start = max(1, int(start_frame))

        if start_frame <= 0:
            self.est_c2w[0] = np.asarray(self.dataset[0]["c2w"], np.float32)
        else:
            # Re-seed the device pose chain from the restored table so
            # the resumed frames take the deferred device-predict path.
            for fid in (start - 2, start - 1):
                if fid >= 0 and np.any(self.est_c2w[fid]):
                    self._chain[fid] = jnp.asarray(self.est_c2w[fid])
        self._publish_params()
        self._vis_ctx = (out, eval_ate)
        # Deferred readbacks in the tracker (slam.py): per-frame results
        # ride async d2h copies instead of blocking ~26 ms tunnel RTTs,
        # so the pipelined mode's wall frame rate is set by the tracking
        # device step, with BA hidden on the mapper thread.
        self.defer_readback = True
        self._chain_keep = 0
        self.frame_walls = []
        self.frame_events = []

        mapper = threading.Thread(target=self._mapper_loop,
                                  args=(total, start, ckpt_every, out),
                                  name="mapper")
        tracker = threading.Thread(target=self._tracker_loop,
                                   args=(total, start), name="tracker")
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
        self.save_checkpoint(os.path.join(out, f"checkpoint{i}{self._ckpt_ext}"),
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
