"""Co-SLAM orchestrator: per-frame tracking -> mapping -> keyframing loop.

TPU-native equivalent of the reference CoSLAM class (reference:
coslam.py:31-722). Differences by design:

- All hot loops are single jitted device dispatches (tracking megastep,
  BA megastep, keyframe insertion); Python only sequences frames.
- Poses are a preallocated [N, 4, 4] numpy table on the host (the
  reference's est_c2w_data dict of tensors), mirrored to device only as
  inputs to the jitted steps.
- Host<->device traffic is TRANSFER-THIN (each h2d/d2h round-trip costs
  ~20 ms over a tunneled device link, dwarfing the 14/56 ms device
  cycles): the constant ray-direction field uploads ONCE; per-frame
  uploads are the rgb+depth columns only, QUANTIZED to uint8/uint16 on
  the wire (3.3x fewer bytes; see _frame_block), assembled into the
  [H*W, 7] block on device and shared by BA / keyframe insertion /
  current-frame mapping (one upload, not three); the prefetch worker
  thread stages uploads a frame EARLY so they overlap device compute;
  each phase reads back ONE packed array, asynchronously (see
  defer_readback below).
- Per-phase wall-clock instrumentation (track/map/mesh ms) is built in
  (the reference has none; SURVEY §5.1).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_dataset
from ..models.scene_rep import JointEncoding
from .checkpoint import (AsyncCheckpointWriter, SingleFlightWorker,
                         load_ckpt, save_ckpt)
from .keyframe import KeyFrameDatabase
from .mapping import (make_ba_step, make_current_frame_step,
                      make_first_frame_step)
from .optim import _adam_l2, make_map_optimizer
from .tracking import (make_tracking_pc_step, make_tracking_step,
                       predict_current_pose)


class CoSLAM:
    def __init__(self, config: Dict, dataset=None):
        self.config = config
        self.dataset = dataset if dataset is not None else get_dataset(config)
        self.device = jax.devices()[0]

        # Multi-chip ray-data-parallelism: parallel.dp devices in a 1-D
        # mesh; ray batches shard over 'dp', parameters replicate, XLA
        # inserts the gradient psum over ICI (SURVEY §2.7; the reference
        # is single-GPU). Enabled via config `parallel: {dp: N}` or the
        # CLI `--devices N`. _setup_meshes sets self.track_mesh /
        # self.map_mesh (both = the dp mesh here; the pipelined runtime
        # overrides it with a heterogeneous placement — single-chip
        # tracker, mapper sharded over the remaining chips).
        self._setup_meshes(config)

        self.bounding_box = np.array(config["mapping"]["bound"], np.float32)
        self.marching_cube_bound = np.array(
            config["mapping"]["marching_cubes_bound"], np.float32)

        # Latency bookkeeping (runtime/latency.py): per-frame wall
        # timestamps + (t0, t1, tag) spans around tail-inducing events.
        self.frame_walls = []
        self.frame_events = []

        n = self.dataset.num_frames
        self.est_c2w = np.zeros((n, 4, 4), np.float32)
        self.est_c2w_rel: Dict[int, np.ndarray] = {}
        self.pose_gt = {i: np.asarray(p, np.float32)
                        for i, p in enumerate(self.dataset.poses)}

        self.model = self._make_model(config)
        # Top-level config `seed` varies every RNG stream (param init,
        # ray draws, optimization) — the seed-replication quality
        # protocol runs each scene at several seeds.
        seed = int(config.get("seed", 0))
        self.key = jax.random.PRNGKey(seed)
        self.params = self.model.init_params(self._next_key())

        self.map_tx = make_map_optimizer(config)
        self.map_opt_state = self.map_tx.init(self.params)

        num_kf = int(n // config["mapping"]["keyframe_every"] + 1)
        self.kf_db = KeyFrameDatabase(config, self.dataset.H, self.dataset.W,
                                      num_kf, self.dataset.num_rays_to_save)
        self.kf_poses = jnp.tile(jnp.eye(4), (num_kf, 1, 1)).astype(jnp.float32)
        # Per-frame exposure alignment (training.frame_align): BA jointly
        # optimizes per-keyframe gains+offset; tracking renders through
        # the latest estimate (ops/frame_align.py; the reference defined
        # the module but never wired it, optimization/frame_align.py).
        self._use_align = bool(config["training"].get("frame_align", False))
        if self._use_align:
            from ..ops.frame_align import init_frame_align
            self.kf_aligns = init_frame_align(num_kf)
            self._cur_align = jnp.array([1.0, 1.0, 1.0, 0.0], jnp.float32)

        H, W = self.dataset.H, self.dataset.W
        self._track_step = make_tracking_step(self.model, config,
                                              mesh=self.track_mesh)
        self._first_step = make_first_frame_step(self.model, config,
                                                 self.map_tx, H, W,
                                                 mesh=self.map_mesh)
        # mapping.ba_chunks > 1 splits each BA call into that many device
        # dispatches (identical math/RNG); the pipelined runtime defaults
        # it on so tracking steps interleave between BA chunks.
        ba_chunks = int(config["mapping"].get("ba_chunks", 1))
        self._ba_step = make_ba_step(self.model, config, self.map_tx,
                                     num_kf, self.kf_db.num_rays_to_save,
                                     self.kf_db.num_rays_to_save,
                                     mesh=self.map_mesh,
                                     n_chunks=ba_chunks,
                                     between=self._ba_chunk_gap)
        # Small-current-block variant: once kf_count >= sample/maxcur_small
        # the dynamic quota fits in a much smaller fixed block (halves the
        # BA ray count vs always padding to `sample`).
        sample = config["mapping"]["sample"]
        # Round the block up to the 128-lane register width; the dispatch
        # threshold below guarantees the dynamic quota fits, so a tighter
        # block is exact (it only trims masked padding rows).
        self._ba_maxcur_small = max(
            128, -(-int(config["mapping"]["min_pixels_cur"]) // 128) * 128)
        self._ba_small_min_kf = -(-sample // self._ba_maxcur_small)  # ceil
        if self.map_mesh is not None:  # total BA batch must split over 'dp'
            n_dev = self.map_mesh.devices.size
            self._ba_maxcur_small = -(-self._ba_maxcur_small
                                      // n_dev) * n_dev
        self._ba_step_small = make_ba_step(
            self.model, config, self.map_tx, num_kf,
            self.kf_db.num_rays_to_save, self.kf_db.num_rays_to_save,
            maxcur=self._ba_maxcur_small, mesh=self.map_mesh,
            n_chunks=ba_chunks, between=self._ba_chunk_gap)
        # Optional modes (reference coslam.py:209-249 / :415-500).
        if config["mapping"]["cur_frame_iters"] > 0:
            self._cur_map_tx = _adam_l2(config["mapping"]["lr_embed"],
                                        0.9, 0.99, 1e-15)
            self._cur_map_opt_state = self._cur_map_tx.init(self.params["grid"])
            self._cur_map_step = make_current_frame_step(
                self.model, config, self._cur_map_tx, mesh=self.map_mesh)
        if config["tracking"]["iter_point"] > 0:
            self._track_pc_step = make_tracking_pc_step(self.model, config,
                                                        mesh=self.track_mesh)
        self._seed = seed
        self._rng = np.random.default_rng(seed)

        # Transfer-thin frame path (module docstring): cached device
        # direction field, per-frame device block cache, and the tiny
        # jitted pack/assemble helpers that turn three readbacks into one.
        self._dirs_src = None          # host array the upload came from
        self._dirs_dev = None
        self._block_cache = (-1, None)
        # Frame-block upload is QUANTIZED (uint8 rgb + uint16 depth,
        # dequantized on device): 3.3x fewer bytes on the wire. rgb
        # round-trips its source uint8 exactly; depth quantizes at
        # (max depth)/65535 per frame (<=0.2 mm at room scale — far
        # below sensor noise). Disable via `data: {quantize_upload:
        # false}` for bit-exact f32 streaming.
        self._quant_upload = bool(
            (config.get("data") or {}).get("quantize_upload", True))
        self._assemble_block = jax.jit(
            lambda dirs, rgb8, d16, ds: jnp.concatenate(
                [dirs,
                 rgb8.reshape(-1, 3).astype(jnp.float32) * (1.0 / 255.0),
                 d16.reshape(-1, 1).astype(jnp.float32) * ds], axis=1))
        self._assemble_block_f32 = jax.jit(
            lambda dirs, rgb, depth: jnp.concatenate(
                [dirs, rgb.reshape(-1, 3), depth.reshape(-1, 1)], axis=1))
        self._pack_ba = jax.jit(
            lambda kf, cur, loss: jnp.concatenate(
                [kf.reshape(-1), cur.reshape(-1), loss.reshape(1)]))

        # Device-resident pose chain + deferred readbacks (sequential
        # run() only): the last two tracked poses stay on device, the
        # const-speed init is predicted on device, the non-finite
        # fallback is a device select, and BOTH the tracking and the BA
        # packed results are copied to the host ASYNCHRONOUSLY
        # (copy_to_host_async: measured 0.18 ms vs the ~26 ms tunnel
        # RTT of a blocking fetch). Pending readbacks form a FIFO that
        # replays the host pose-table writes in EXACT sequential order
        # (track i -> BA i -> track i+1 ...), drained with a few frames
        # of lag so transfers overlap device compute; any host read of
        # the table drains it fully first. The frame loop's serialized
        # host cost drops to the jitted dispatches — the device
        # pipeline, not the tunnel, sets the frame rate.
        self.defer_readback = False   # set by run()/pipelined run()
        self._chain: Dict[int, jnp.ndarray] = {}   # frame id -> device [4,4]
        self._pending = []   # FIFO of ("track"|"ba", ...) readback entries
        # FIFO guard: in the pipelined runtime the tracker thread appends
        # track entries while the mapper appends BA entries and either
        # side (or the main thread) may drain; resolution is serialized
        # under the lock so host pose-table writes land in exact
        # submission order — the same order the synchronous path would
        # produce. Sequential run() has no contention (uncontended lock
        # acquisition is ~100 ns, noise next to a 14 ms frame).
        import threading as _threading
        self._pending_lock = _threading.Lock()
        # Oldest frame whose device pose the mapper still needs; the
        # tracker never prunes chain entries at or above it. None =
        # sequential semantics (keep the last two frames only).
        self._chain_keep: Optional[int] = None
        self._ckpt_writer = AsyncCheckpointWriter()
        # Checkpoint backend: "npz" (default, host-local atomic file) or
        # "orbax" (multi-host-coordinated directory; checkpoint.py).
        backend = (config.get("training") or {}).get("ckpt_backend", "npz")
        if backend not in ("npz", "orbax"):
            raise ValueError(f"training.ckpt_backend must be 'npz' or "
                             f"'orbax', got {backend!r}")
        self._ckpt_ext = ".orbax" if backend == "orbax" else ".npz"
        self._mesh_worker = SingleFlightWorker("mesh-eval")
        self._last_track_info = (float("nan"),) * 3

        def _rigid_inv(m):
            Rt = m[:3, :3].T
            top = jnp.concatenate([Rt, (-Rt @ m[:3, 3])[:, None]], axis=1)
            return jnp.concatenate([top, m[3:4]], axis=0)

        # Constant-speed motion model on device (predict_current_pose
        # semantics, reference coslam.py:399-413): prev @ inv(prev_prev)
        # applied to prev. Rigid closed-form inverse (R^T, -R^T t).
        self._predict_dev = jax.jit(
            lambda prev, prev_prev: (prev @ _rigid_inv(prev_prev)) @ prev)

        def _pack_guard(c2w, loss, psnr, c2w_init):
            finite = jnp.all(jnp.isfinite(c2w))
            out = jnp.where(finite, c2w, c2w_init)  # non-finite fallback
            packed = jnp.concatenate(
                [out.reshape(-1),
                 jnp.stack([loss, psnr, finite.astype(jnp.float32)])])
            return packed, out

        self._pack_track_guard = jax.jit(_pack_guard)

        # Per-phase instrumentation (ms per invocation).
        self.timings = {"tracking": [], "mapping": [], "mesh": [],
                        "first_frame": []}

    # -- helpers --------------------------------------------------------------

    def _make_model(self, config: Dict):
        """Hook for variants (ActiveCoSLAM overrides with the beta-head model)."""
        return JointEncoding(config, self.bounding_box)

    def _setup_meshes(self, config: Dict):
        """Resolve `parallel.dp` into the device meshes the jitted steps
        are built with: `track_mesh` for the tracking megasteps,
        `map_mesh` for first-frame/BA/current-frame mapping. Here both
        are the same 1-D ray-DP mesh over the first dp devices;
        `self.mesh` keeps the legacy single-mesh view."""
        dp = int((config.get("parallel") or {}).get("dp", 1) or 1)
        if dp > 1:
            from ..parallel.sharding import make_mesh

            avail = len(jax.devices())
            if dp > avail:
                raise ValueError(
                    f"parallel.dp={dp} but only {avail} devices visible")
            for name, size in (("tracking.sample",
                                config["tracking"]["sample"]),
                               ("mapping.sample",
                                config["mapping"]["sample"])):
                if size % dp:
                    raise ValueError(
                        f"{name}={size} not divisible by parallel.dp={dp}")
            self.mesh = make_mesh(dp)
        else:
            self.mesh = None
        self.track_mesh = self.map_mesh = self.mesh

    @contextlib.contextmanager
    def _event(self, tag: str):
        """Record a (t0, t1, tag) span for frame-tail attribution
        (runtime/latency.attribute_tails). Host-side cost only; device
        work dispatched inside the span overlaps later frames, so the
        span marks the DISPATCH, which is what delays the next frame."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.frame_events.append((t0, time.perf_counter(), tag))

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def seed_everything(self, seed: int):
        self.key = jax.random.PRNGKey(seed)
        self._seed = seed
        self._rng = np.random.default_rng(seed)

    def _frame_rays_flat(self, batch: Dict) -> np.ndarray:
        """[H*W, 7] = [direction, rgb, depth] host block."""
        H, W = batch["depth"].shape
        return np.concatenate(
            [batch["direction"].reshape(-1, 3),
             batch["rgb"].reshape(-1, 3),
             batch["depth"].reshape(-1, 1)], axis=1).astype(np.float32)

    def _device_dirs(self, direction: np.ndarray) -> jnp.ndarray:
        """Device copy of the ray-direction field, uploaded ONCE.

        Every loader returns the same cached array object each frame
        (data/datasets.py BaseDataset._directions), so identity is the
        cache key; holding the reference keeps the id stable. A loader
        that handed out fresh arrays would merely re-upload (correct,
        just not transfer-thin)."""
        if self._dirs_src is not direction:
            self._dirs_src = direction
            self._dirs_dev = jnp.asarray(
                np.ascontiguousarray(direction, np.float32).reshape(-1, 3))
        return self._dirs_dev

    def _frame_block(self, batch: Dict) -> jnp.ndarray:
        """[H*W, 7] frame block ON DEVICE: per-frame upload is the
        rgb+depth columns only (4/7 of the bytes), concatenated with the
        cached direction field by a tiny jitted op. Cached per frame id
        so global_BA / add_keyframe / current_frame_mapping share ONE
        upload; the prefetch worker pre-stages it under
        ``batch['_dev_block']`` a frame early (run())."""
        staged = batch.get("_dev_block")
        if staged is not None:
            return staged
        fid = int(batch["frame_id"])
        cached = self._block_cache  # one read: the prefetch worker /
        if cached[0] == fid:        # pipelined stage thread rebinds it
            return cached[1]
        dirs = self._device_dirs(batch["direction"])
        if self._quant_upload:
            rgb_u8 = batch.get("rgb_u8")
            depth_raw = batch.get("depth_raw")
            if rgb_u8 is not None and depth_raw is not None:
                # Decode-through: the loader's raw uint8/uint16 arrays
                # upload as-is (LazyFrame fast path) — no host f32
                # round-trip, and depth keeps the dataset's NATIVE
                # quantization instead of a second lossy re-quantize.
                rgb8 = np.ascontiguousarray(rgb_u8)
                d16 = np.ascontiguousarray(depth_raw)
                dscale = (batch["depth_sc_factor"]
                          / batch["depth_png_scale"])
            else:
                rgb8 = np.clip(np.rint(np.asarray(batch["rgb"], np.float32)
                                       * 255.0), 0, 255).astype(np.uint8)
                d = np.maximum(np.asarray(batch["depth"], np.float32), 0.0)
                dscale = max(float(d.max()), 1e-6) / 65535.0
                d16 = np.rint(d * (1.0 / dscale)).astype(np.uint16)
            blk = self._assemble_block(dirs, jnp.asarray(rgb8),
                                       jnp.asarray(d16),
                                       jnp.float32(dscale))
        else:
            blk = self._assemble_block_f32(
                dirs,
                jnp.asarray(np.ascontiguousarray(batch["rgb"], np.float32)),
                jnp.asarray(np.ascontiguousarray(batch["depth"],
                                                 np.float32)))
        self._block_cache = (fid, blk)
        batch["_dev_block"] = blk
        return blk

    def _sample_tracking_rays(self, batch: Dict) -> np.ndarray:
        """Host-side pixel sampling on the edge-cropped image
        (reference coslam.py:536-544); one fixed set per frame.

        The draw is seeded by (run seed, frame id) — deterministic and
        ORDER-INDEPENDENT, so the prefetch worker thread can stage it a
        frame early without perturbing any other random stream.

        With ``tracking.sample_info_frac`` > 0 the draw is
        information-weighted: sampling probability mixes that fraction
        of an image-gradient weight (gray + depth Sobel-style
        magnitudes, each mean-normalized) with the uniform base. In
        texture-poor views (corridor scene) uniform draws waste most
        rays on blank walls whose residuals constrain neither forward
        translation nor rotation; gradient pixels (pillar silhouettes,
        wall/floor junctions, the beam) are where the pose Jacobian of
        the photometric+depth residual is nonzero. frac=0 (default) is
        bit-identical to the reference's uniform `random.sample`
        (coslam.py:131-138); this knob EXCEEDS the reference."""
        iH = self.config["tracking"]["ignore_edge_H"]
        iW = self.config["tracking"]["ignore_edge_W"]
        S = self.config["tracking"]["sample"]
        direction = batch["direction"]
        H, W = direction.shape[:2]
        ch, cw = H - 2 * iH, W - 2 * iW
        rng = np.random.default_rng((self._seed, int(batch["frame_id"])))
        frac = float(self.config["tracking"].get("sample_info_frac",
                                                 0.0) or 0.0)
        if frac > 0.0:
            p = self._info_weights(batch, iH, iW, frac)
            idx = rng.choice(ch * cw, size=S, replace=False, p=p)
        else:
            idx = rng.choice(ch * cw, size=S, replace=False)
        # Gather S pixels by (row, col) fancy indexing instead of
        # materializing edge-cropped copies of all three fields (the
        # copies cost ~3 full-image passes per frame; same elements,
        # same rng draw, bit-identical output — and it works on crop
        # VIEWS without flattening them).
        r, c = idx // cw + iH, idx % cw + iW
        dirs = direction[r, c]
        rgb_u8 = batch.get("rgb_u8")
        if rgb_u8 is not None and "rgb" not in batch:
            rgb = (rgb_u8[r, c] / 255.0).astype(np.float32)
        else:
            rgb = np.asarray(batch["rgb"])[r, c]
        depth_raw = batch.get("depth_raw")
        if depth_raw is not None and "depth" not in batch:
            depth = (depth_raw[r, c, None].astype(np.float32)
                     / batch["depth_png_scale"] * batch["depth_sc_factor"])
        else:
            depth = np.asarray(batch["depth"])[r, c, None]
        return np.concatenate([dirs, rgb, depth],
                              axis=1).astype(np.float32)

    def _info_weights(self, batch: Dict, iH: int, iW: int,
                      frac: float) -> np.ndarray:
        """Flattened sampling probabilities over the edge-cropped image:
        ``frac`` parts gradient-weight + ``1-frac`` parts uniform.

        The gradient weight is |∇gray| + |∇depth|, each normalized by
        its own mean so the photometric and geometric edges contribute
        on equal footing regardless of scene scale; invalid-depth
        pixels keep only their gray term (their depth gradient is a
        sensor artifact, not geometry)."""
        rgb_u8 = batch.get("rgb_u8")
        if rgb_u8 is not None and "rgb" not in batch:
            gray = np.asarray(rgb_u8, np.float32).mean(-1) / 255.0
        else:
            gray = np.asarray(batch["rgb"], np.float32).mean(-1)
        depth_raw = batch.get("depth_raw")
        if depth_raw is not None and "depth" not in batch:
            depth = (np.asarray(depth_raw, np.float32)
                     / batch["depth_png_scale"] * batch["depth_sc_factor"])
        else:
            depth = np.asarray(batch["depth"], np.float32)
        H, W = depth.shape
        gray = gray[iH:H - iH, iW:W - iW]
        depth = depth[iH:H - iH, iW:W - iW]
        gy, gx = np.gradient(gray)
        gg = np.hypot(gx, gy)
        dy, dx = np.gradient(depth)
        gd = np.hypot(dx, dy)
        valid = depth > 0.0
        gd = np.where(valid, gd, 0.0)
        w = (gg / max(float(gg.mean()), 1e-12)
             + gd / max(float(gd.mean()), 1e-12)).ravel().astype(np.float64)
        p = frac * w / max(float(w.sum()), 1e-12)
        p += (1.0 - frac) / p.size
        return p / p.sum()

    def first_frame_mapping(self, batch: Dict) -> float:
        """Reference coslam.py:162-207."""
        t0 = time.perf_counter()
        c2w = np.asarray(batch["c2w"], np.float32)
        self.est_c2w[0] = c2w
        self.est_c2w_rel[0] = c2w

        frame_rays = self._frame_block(batch)
        c2w_dev = jnp.asarray(c2w)
        self._chain[0] = c2w_dev  # seed the device pose chain
        self.params, self.map_opt_state, loss, psnr = self._first_step(
            self.params, self.map_opt_state, c2w_dev, frame_rays,
            self._next_key())
        self.add_keyframe(batch, frame_rays=frame_rays)
        jax.block_until_ready(loss)
        self.timings["first_frame"].append((time.perf_counter() - t0) * 1e3)
        return float(loss)

    def tracking_render(self, batch: Dict, frame_id: int,
                        params: Optional[Dict] = None,
                        c2w_init: Optional[np.ndarray] = None) -> float:
        """Reference coslam.py:502-594.

        params: optional explicit parameter snapshot to track against
        (used by the pipelined runtime so the tracker thread never
        touches ``self.params``, which the mapper thread owns — the
        reference's tracker likewise reads a copy and never writes the
        shared model, mp_slam/tracker.py:24-28).
        c2w_init: optional explicit initialization (ActiveCoSLAM tracks
        out-of-order info-gain frames, where frame_id-1 may be untracked)."""
        t0 = time.perf_counter()
        track_params = self.params if params is None else params
        # Deferred-readback fast path: init pose comes from the device
        # chain, the packed result goes back asynchronously. Only the
        # standard prediction path qualifies (explicit c2w_init =
        # ActiveCoSLAM out-of-order frames; iter_point = pc tracking
        # already wrote est_c2w). A pipelined params snapshot is fine:
        # the pose chain and the readback FIFO are independent of which
        # parameter snapshot the step ran against.
        deferred = (self.defer_readback and c2w_init is None
                    and self.config["tracking"]["iter_point"] <= 0
                    and (frame_id - 1) in self._chain)
        if deferred:
            prev_dev = self._chain[frame_id - 1]
            pp_dev = self._chain.get(frame_id - 2)
            if self.config["tracking"]["const_speed"] and pp_dev is not None:
                c2w_init_dev = self._predict_dev(prev_dev, pp_dev)
            else:
                c2w_init_dev = prev_dev
        else:
            if c2w_init is not None:
                pass
            elif self.config["tracking"]["iter_point"] > 0:
                # tracking_pc already initialized this frame's pose
                # (reference coslam.py:516-519).
                c2w_init = self.est_c2w[frame_id]
            else:
                const_speed = self.config["tracking"]["const_speed"]
                prev = self.est_c2w[frame_id - 1]
                prev_prev = (self.est_c2w[frame_id - 2]
                             if frame_id >= 2 else None)
                c2w_init = predict_current_pose(prev, prev_prev, const_speed)
            c2w_init_dev = jnp.asarray(np.asarray(c2w_init, np.float32))

        rays = batch.get("_dev_track_rays")  # staged by the prefetch worker
        if rays is None:
            rays = jnp.asarray(self._sample_tracking_rays(batch))
        # The new frame's exposure parameters are jointly optimized with
        # the pose, initialized from the latest estimate (exposure
        # drifts as a walk; the previous estimate is the best prior).
        if self._use_align:
            c2w_dev, loss, psnr, new_align = self._track_step(
                track_params, c2w_init_dev, rays, self._next_key(),
                align=self._to_tracker(self._cur_align))
            self._cur_align = new_align
        else:
            c2w_dev, loss, psnr = self._track_step(
                track_params, c2w_init_dev, rays, self._next_key())
        # ONE packed d2h array for pose+loss+psnr+finite-flag (separate
        # fetches pay the ~20 ms tunnel RTT each); the non-finite
        # fallback to the motion-model init is a device select.
        packed_dev, c2w_guard = self._pack_track_guard(c2w_dev, loss, psnr,
                                                       c2w_init_dev)
        if self.defer_readback:
            self._chain[frame_id] = c2w_guard
            keep_from = frame_id - 1
            if self._chain_keep is not None:  # pipelined: mapper lags
                keep_from = min(keep_from, self._chain_keep)
            for old in [f for f in self._chain if f < keep_from]:
                del self._chain[old]
        self.timings["tracking"].append((time.perf_counter() - t0) * 1e3)
        entry = ("track", frame_id, packed_dev,
                 len(self.timings["tracking"]) - 1)
        if deferred:
            try:  # start the d2h copy in the background
                packed_dev.copy_to_host_async()
            except Exception:
                pass  # backend without async copy: resolve blocks later
            # Drain OLD entries (their transfers long overlapped device
            # compute); the few newest stay pending — this bounds how
            # far the host can run ahead of the device (backpressure).
            with self._pending_lock:
                self._pending.append(entry)
                while len(self._pending) > 3:
                    self._resolve_entry(self._pending.pop(0))
            return None
        # Sync path (ActiveCoSLAM / pc-init / defer_readback off). All
        # pose-table writes stay serialized under the pending lock so a
        # concurrent checkpoint snapshot never observes a half-applied
        # entry stream.
        with self._pending_lock:
            while self._pending:
                self._resolve_entry(self._pending.pop(0))
            self._resolve_entry(entry)
        return self._last_track_info[0]

    def _resolve_entry(self, entry):
        """Resolve one pending readback into the host pose table. The
        block time is charged back to the phase's timing entry."""
        if entry[0] == "ba":
            return self._resolve_ba_entry(entry)
        _, frame_id, packed_dev, tidx = entry
        t0 = time.perf_counter()
        packed = np.asarray(packed_dev)
        self.timings["tracking"][tidx] += (time.perf_counter() - t0) * 1e3
        c2w = packed[:16].reshape(4, 4).astype(np.float32)
        loss, psnr = float(packed[16]), float(packed[17])
        if packed[18] == 0.0:
            # A non-finite pose would poison every later frame through
            # the const-speed prediction and the BA pose table; the
            # device select already kept the motion-model prediction
            # (the reference only prints, optimization/pose_array.py:43-52).
            print(f"tracking produced a non-finite pose at frame "
                  f"{frame_id}; keeping the motion-model prediction")
        self.est_c2w[frame_id] = c2w

        kf_every = self.config["mapping"]["keyframe_every"]
        if frame_id % kf_every != 0:
            kf_frame_id = (frame_id // kf_every) * kf_every
            c2w_key = self.est_c2w[kf_frame_id].astype(np.float64)
            # ActiveCoSLAM tracks frames out of order: the anchor keyframe
            # may not be tracked yet (all-zero row) — skip the relative
            # delta then; convert_relative_pose falls back to identity.
            if np.any(c2w_key):
                self.est_c2w_rel[frame_id] = (
                    c2w.astype(np.float64)
                    @ np.linalg.inv(c2w_key)).astype(np.float32)

        gt = self.pose_gt.get(frame_id)
        if gt is not None and np.all(np.isfinite(gt)):
            err = np.abs(c2w[:3] - gt[:3]).mean()
        else:
            err = float("nan")
        self._last_track_info = (loss, psnr, float(err))

    def _resolve_ba_entry(self, entry):
        """Apply a deferred BA readback to the host pose table — same
        writes, same order as the synchronous path (coslam.py:389-397).
        kf count/ids/optim_cur were snapshotted at issue time."""
        (_, cur_frame_id, packed_dev, count, frame_ids, optim_cur,
         tidx) = entry
        t0 = time.perf_counter()
        packed = np.asarray(packed_dev)
        self.timings["mapping"][tidx] += (time.perf_counter() - t0) * 1e3
        self._last_ba_loss = float(packed[-1])
        nk = self.kf_db.num_kf
        if count >= 2:
            kf_np = packed[:nk * 16].reshape(nk, 4, 4)
            for slot in range(1, count):
                self.est_c2w[int(frame_ids[slot])] = kf_np[slot]
            if optim_cur:
                self.est_c2w[cur_frame_id] = \
                    packed[nk * 16:nk * 16 + 16].reshape(4, 4)

    def _to_tracker(self, x):
        """Placement hook for device-chain poses produced by the mapper
        (BA-refreshed keyframe poses). Identity here; the 2-device
        pipelined runtime overrides it with a device_put to the tracker
        device so the tracker's jits never see mapper-committed arrays."""
        return x

    def _to_mapper(self, x):
        """Placement hook for tracker-committed values consumed by
        mapper-side steps (the tracked exposure estimate feeding BA).
        Identity here; the pipelined runtime overrides it."""
        return x

    def _ba_chunk_gap(self):
        """Called between chunked-BA dispatches (mapping.ba_chunks > 1).
        No-op sequentially; the pipelined runtime waits here for the
        tracker's next dispatch so it lands between BA chunks in the
        device queue."""

    def _warm_programs(self):
        """Best-effort cold-start overlap: dispatch each heavy megastep
        once on dummy inputs from a background thread so the
        compiled-program loads (XLA persistent-cache deserialize +
        program upload — measured 5-20 s EACH over the tunneled device
        link) overlap first-frame mapping instead of stalling the first
        tracked/mapped frames. Semantically inert: parameters are
        immutable device arrays read concurrently, the keyframe ring is
        replaced by a zeros dummy (the real one is donated to
        add_keyframe), outputs are discarded, and the run's RNG streams
        are untouched (fixed local key). Skipped on the CPU backend,
        where executing a dummy BA costs more than the load it hides."""
        try:
            if jax.default_backend() == "cpu":
                return
            cfg = self.config
            key = jax.random.PRNGKey(0)
            params = self.params          # snapshot the references once
            opt = self.map_opt_state
            eye = jnp.eye(4, dtype=jnp.float32)
            rays_t = jnp.zeros((cfg["tracking"]["sample"], 7), jnp.float32)
            if self._use_align:
                self._track_step(params, eye, rays_t, key,
                                 align=jnp.zeros((4,), jnp.float32))
            else:
                self._track_step(params, eye, rays_t, key)
            ring = jnp.zeros_like(self.kf_db.rays)
            poses = jnp.zeros_like(self.kf_poses)
            cur = jnp.zeros((self.dataset.H * self.dataset.W, 7),
                            jnp.float32)
            al_kw = ({"kf_aligns": jnp.zeros_like(self.kf_aligns),
                      "cur_align": jnp.zeros((4,), jnp.float32)}
                     if self._use_align else {})
            for ba in (self._ba_step_small, self._ba_step):
                ba(params, opt, ring, jnp.int32(2), poses, eye, cur, key,
                   **al_kw)
        except Exception:
            pass  # the real calls load lazily; warmup must never fail a run

    def _resolve_track_pending(self):
        with self._pending_lock:
            while self._pending:
                self._resolve_entry(self._pending.pop(0))

    def _pose_dev(self, frame_id: int) -> jnp.ndarray:
        """Device pose for a frame: the chain copy when resident (no
        upload), else the host table. With deferred readbacks a chain
        miss drains the FIFO first — the host row may still be a
        pending write (pipelined mapper reading a frame the tracker has
        already pruned)."""
        p = self._chain.get(frame_id)
        if p is not None:
            return p
        if self.defer_readback:
            self._resolve_track_pending()
        return jnp.asarray(self.est_c2w[frame_id])

    def add_keyframe(self, batch: Dict, frame_rays: Optional[jnp.ndarray] = None):
        """Reference model/keyframe.py:67-94 + coslam.py:685-687."""
        if frame_rays is None:
            frame_rays = self._frame_block(batch)
        slot = self.kf_db.add_keyframe(
            frame_rays, int(batch["frame_id"]), self._next_key(),
            filter_depth=self.config["mapping"]["filter_depth"])
        # Mirror the keyframe pose into the device pose table.
        self.kf_poses = self.kf_poses.at[slot].set(
            self._pose_dev(int(batch["frame_id"])))
        if self._use_align:
            # The new keyframe inherits the latest exposure estimate.
            self.kf_aligns = self.kf_aligns.at[slot].set(self._cur_align)

    def current_frame_mapping(self, batch: Dict, cur_frame_id: int):
        """Per-frame map-only refinement (reference coslam.py:209-249;
        no-op unless mapping.cur_frame_iters > 0)."""
        if self.config["mapping"]["cur_frame_iters"] <= 0:
            return None
        c2w = self._pose_dev(cur_frame_id)
        frame_rays = self._frame_block(batch)
        grid, self._cur_map_opt_state, loss = self._cur_map_step(
            self.params["grid"], self.params["decoder"],
            self._cur_map_opt_state, c2w, frame_rays, self._next_key())
        self.params = {**self.params, "grid": grid}
        return float(loss)

    def tracking_pc(self, batch: Dict, frame_id: int,
                    params: Optional[Dict] = None) -> float:
        """Point-cloud-loss tracking (reference coslam.py:415-500)."""
        self._resolve_track_pending()
        track_params = self.params if params is None else params
        const_speed = self.config["tracking"]["const_speed"]
        prev = self.est_c2w[frame_id - 1]
        prev_prev = self.est_c2w[frame_id - 2] if frame_id >= 2 else None
        c2w_init = predict_current_pose(prev, prev_prev, const_speed)
        iH = self.config["tracking"]["ignore_edge_H"]
        iW = self.config["tracking"]["ignore_edge_W"]
        S = self.config["tracking"]["pc_samples"]
        dirs = batch["direction"][iH:-iH, iW:-iW].reshape(-1, 3)
        rgb = batch["rgb"][iH:-iH, iW:-iW].reshape(-1, 3)
        depth = batch["depth"][iH:-iH, iW:-iW].reshape(-1, 1)
        idx = self._rng.choice(dirs.shape[0], size=min(S, dirs.shape[0]),
                               replace=False)
        rays = np.concatenate([dirs[idx], rgb[idx], depth[idx]],
                              axis=1).astype(np.float32)
        c2w, loss = self._track_pc_step(track_params, jnp.asarray(c2w_init),
                                        jnp.asarray(rays), self._next_key())
        self.est_c2w[frame_id] = np.asarray(c2w)
        return float(loss)

    def global_BA(self, batch: Dict, cur_frame_id: int) -> float:
        """Reference coslam.py:285-397."""
        if not self.defer_readback:
            self._resolve_track_pending()
        t0 = time.perf_counter()
        cur_pose = self._pose_dev(cur_frame_id)
        cur_rays = self._frame_block(batch)

        ba = (self._ba_step_small if self.kf_db.count >= self._ba_small_min_kf
              else self._ba_step)
        if self._use_align:
            (self.params, self.map_opt_state, self.kf_poses, new_cur, loss,
             self.kf_aligns, self._cur_align) = ba(
                self.params, self.map_opt_state, self.kf_db.rays,
                jnp.int32(self.kf_db.count), self.kf_poses, cur_pose,
                cur_rays, self._next_key(), kf_aligns=self.kf_aligns,
                cur_align=self._to_mapper(self._cur_align))
        else:
            (self.params, self.map_opt_state, self.kf_poses, new_cur,
             loss) = ba(
                self.params, self.map_opt_state, self.kf_db.rays,
                jnp.int32(self.kf_db.count), self.kf_poses, cur_pose,
                cur_rays, self._next_key())

        # ONE packed d2h array for (keyframe poses, current pose, loss).
        packed_dev = self._pack_ba(self.kf_poses, new_cur, loss)
        if self.kf_db.count >= 2:
            # Keep the device pose chain current (the next frame's
            # prediction must see the BA-optimized poses, like the host
            # table does in the synchronous path).
            for slot in range(1, self.kf_db.count):
                fid = int(self.kf_db.frame_ids[slot])
                if fid in self._chain:
                    self._chain[fid] = self._to_tracker(self.kf_poses[slot])
            if (self.config["mapping"]["optim_cur"]
                    and cur_frame_id in self._chain):
                self._chain[cur_frame_id] = self._to_tracker(new_cur)
        self.timings["mapping"].append((time.perf_counter() - t0) * 1e3)
        entry = ("ba", cur_frame_id, packed_dev, self.kf_db.count,
                 np.array(self.kf_db.frame_ids, copy=True),
                 bool(self.config["mapping"]["optim_cur"]),
                 len(self.timings["mapping"]) - 1)
        if self.defer_readback:
            try:
                packed_dev.copy_to_host_async()
            except Exception:
                pass
            with self._pending_lock:
                self._pending.append(entry)
            return None
        with self._pending_lock:
            self._resolve_entry(entry)
        return self._last_ba_loss

    def convert_relative_pose(self) -> Dict[int, np.ndarray]:
        """Recompose non-keyframe poses from stored keyframe-relative deltas
        (reference coslam.py:596-608)."""
        self._resolve_track_pending()
        kf_every = self.config["mapping"]["keyframe_every"]
        poses = {}
        for i in range(len(self.est_c2w)):
            if not np.any(self.est_c2w[i]):
                # Untracked frame (the table is preallocated; a mid-run
                # periodic evaluation stops at the current frame — the
                # reference's est_c2w_data dict simply has no such keys).
                continue
            if i % kf_every == 0:
                poses[i] = self.est_c2w[i]
            else:
                kf_frame_id = (i // kf_every) * kf_every
                delta = self.est_c2w_rel.get(i, np.eye(4, dtype=np.float32))
                poses[i] = (delta.astype(np.float64)
                            @ self.est_c2w[kf_frame_id].astype(np.float64)
                            ).astype(np.float32)
        return poses

    def save_mesh(self, i: int, voxel_size: float = 0.05, params=None):
        """params: optional explicit parameter snapshot (the async
        periodic path extracts from the submit-time parameters while
        the frame loop keeps updating self.params — device arrays are
        immutable, so the snapshot is free)."""
        from ..mesh.extract import extract_mesh

        t0 = time.perf_counter()
        out = os.path.join(self.config["data"]["output"],
                           self.config["data"]["exp_name"])
        mesh_path = os.path.join(out, f"mesh_track{i}.ply")
        color_fn = (self.model.render_surface_color
                    if self.config["mesh"]["render_color"]
                    else self.model.query_color)
        extract_mesh(self.model,
                     self.params if params is None else params,
                     self.config, self.bounding_box,
                     marching_cube_bound=self.marching_cube_bound,
                     color_func=color_fn, voxel_size=voxel_size,
                     mesh_savepath=mesh_path)
        self.timings["mesh"].append((time.perf_counter() - t0) * 1e3)
        return mesh_path

    def _periodic_mesh_eval(self, i: int, out: str, eval_ate: bool):
        """Periodic mesh + ATE on the mesh.vis cadence, OFF the frame
        loop's critical path (the reference blocks its loop for seconds
        here, coslam.py:689-696): parameters are an immutable device
        snapshot, pose tables are host-copied at submit time, and the
        single-flight worker pays the chunked SDF readbacks, marching
        cubes, PLY write, and trajectory plots while the next frames
        keep tracking (device queries interleave with the frame steps;
        the host/tunnel cost — which dominates — fully overlaps).
        `mesh.async_vis: false` restores the reference's synchronous
        sequencing."""
        from ..eval.ate import pose_evaluation

        params = self.params
        est = rel = None
        if eval_ate:
            est = {k: np.array(v) for k, v in self._pose_dict().items()}
            rel = {k: np.array(v)
                   for k, v in self.convert_relative_pose().items()}
        voxel = self.config["mesh"]["voxel_eval"]

        def job():
            try:
                self.save_mesh(i, voxel_size=voxel, params=params)
            except Exception as e:
                print(f"mesh save failed: {e}")
            if eval_ate:
                pose_evaluation(self.pose_gt, est, 1, out, i)
                pose_evaluation(self.pose_gt, rel, 1, out, i, img="pose_r",
                                name="output_relative.txt")

        if self.config["mesh"].get("async_vis", True):
            self._mesh_worker.submit(job)
        else:
            job()

    def save_checkpoint(self, path: str, frame_cursor: Optional[int] = None,
                        async_write: bool = False):
        """Full crash-resume state: params + pose tables + keyframe DB
        (ray buffer, ids, count, wrap pointer, device pose array) +
        optimizer state + RNG streams. ``frame_cursor`` is the index of
        the next unprocessed frame; periodic ckpt_every saves pass it so
        `--ckpt` resumes mid-sequence (the reference only ever saves
        model+poses at sequence end, coslam.py:709-712).

        async_write: hand the write to a background thread (used by the
        periodic ckpt_every path so the d2h transfer of the keyframe
        reservoir + the file write overlap the next frames' device
        work). Device arrays are immutable, so they snapshot for free
        — EXCEPT the keyframe ring, whose buffer is donated to the next
        add_keyframe step (keyframe.py _add, donate_argnums=(0,)) and
        would be deleted under the in-flight writer; it gets a cheap
        HBM-to-HBM copy at submit time. Mutable host state (pose
        tables, RNG) is copied here too — the checkpoint's content is
        identical either way."""
        import pickle

        self._resolve_track_pending()
        self._ckpt_writer.wait()  # previous async write must land first

        # Snapshot the host pose tables under the pending lock: in
        # pipelined mode the TRACKER thread keeps inserting into
        # est_c2w_rel (via _resolve_entry) while this (mapper-thread)
        # checkpoint iterates it — an unguarded dict comprehension can
        # die with "dictionary changed size during iteration". All
        # est_c2w/est_c2w_rel writes happen under this lock.
        with self._pending_lock:
            est_snap = self.est_c2w.copy()
            rel_snap = {k: v.copy() for k, v in self.est_c2w_rel.items()}

        extra = {
            # jnp.copy: detach from the donation chain (see docstring).
            "kf_rays": (jnp.copy(self.kf_db.rays) if async_write
                        else self.kf_db.rays),
            "kf_frame_ids": self.kf_db.frame_ids.copy(),
            "kf_count": np.int64(self.kf_db.count),
            "kf_wrap_ptr": np.int64(self.kf_db._wrap_ptr),
            "kf_poses": self.kf_poses,
            "jax_key": self.key,
            "np_rng_state": np.frombuffer(
                pickle.dumps(self._rng.bit_generator.state), np.uint8),
            "opt_state": self.map_opt_state,
        }
        if self._use_align:
            extra["kf_aligns"] = self.kf_aligns
            extra["cur_align"] = self._cur_align
        if frame_cursor is not None:
            extra["frame_cursor"] = np.int64(frame_cursor)
        if async_write:
            self._ckpt_writer.submit(path, self.params, est_snap, rel_snap,
                                     extra)
        else:
            save_ckpt(path, self.params, est_snap, rel_snap, extra)

    def load_checkpoint(self, path: str) -> int:
        """Restores everything save_checkpoint wrote (legacy slim
        checkpoints restore params+poses only). Returns the frame index
        to resume from (0 when the checkpoint carries no cursor)."""
        import pickle

        params, est, rel, extra = load_ckpt(path)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self.est_c2w = est
        self.est_c2w_rel = rel
        if "kf_rays" in extra:
            kf_rays = jnp.asarray(extra["kf_rays"])
            if kf_rays.shape[-1] == 7:  # legacy unpacked checkpoint
                from .keyframe import RAY_CHUNK, pack_rays
                R16 = kf_rays.shape[1] - kf_rays.shape[1] % RAY_CHUNK
                kf_rays = pack_rays(kf_rays[:, :R16])
            self.kf_db.rays = kf_rays
            self.kf_db.frame_ids = np.asarray(extra["kf_frame_ids"])
            self.kf_db.count = int(extra["kf_count"])
            self.kf_db._wrap_ptr = int(extra["kf_wrap_ptr"])
            self.kf_poses = jnp.asarray(extra["kf_poses"])
        if self._use_align and "kf_aligns" in extra:
            self.kf_aligns = jnp.asarray(extra["kf_aligns"])
            self._cur_align = jnp.asarray(extra["cur_align"])
        if "opt_state" in extra:
            self.map_opt_state = jax.tree_util.tree_map(
                jnp.asarray, extra["opt_state"])
        if "jax_key" in extra:
            self.key = jnp.asarray(extra["jax_key"])
        if "np_rng_state" in extra:
            self._rng.bit_generator.state = pickle.loads(
                extra["np_rng_state"].tobytes())
        return int(extra.get("frame_cursor", 0))

    # -- main loop --------------------------------------------------------------

    def run(self, n_frames: Optional[int] = None, verbose: bool = True,
            eval_ate: bool = True, profile_dir: Optional[str] = None,
            ckpt_every: int = 0, start_frame: int = 0):
        """Main per-frame loop (reference coslam.py:651-722).

        profile_dir: capture a JAX profiler trace of the steady-state
        frames 10-20 (first-class tracing; the reference has none).
        ckpt_every: periodic checkpoint interval in frames (0 = final
        only, like the reference); enables crash recovery via --ckpt.
        start_frame: resume the loop mid-sequence (pass the cursor
        load_checkpoint returned; frames before it are assumed done).
        """
        from ..eval.ate import pose_evaluation

        cfg = self.config
        out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
        os.makedirs(out, exist_ok=True)

        from ..data.prefetch import PrefetchIterator

        map_every = cfg["mapping"]["map_every"]
        kf_every = cfg["mapping"]["keyframe_every"]

        # Overlap the heavy megasteps' compiled-program loads with
        # first-frame mapping (no-op semantically; see _warm_programs).
        import threading
        threading.Thread(target=self._warm_programs, daemon=True,
                         name="warmup").start()

        # Sequential loop: defer tracking/BA readbacks (device pose
        # chain). On resume, re-seed the chain from the checkpointed
        # table so the resumed frames take the same (device-predict)
        # path as the original run — bitwise-identical resumption.
        self.defer_readback = True
        for fid in (start_frame - 2, start_frame - 1):
            if fid >= 0 and np.any(self.est_c2w[fid]):
                self._chain[fid] = jnp.asarray(self.est_c2w[fid])

        def stage(i, batch):
            """Runs in the prefetch WORKER thread: issue the (async)
            host->device uploads a frame early so the transfer hides
            behind the previous frame's device compute. Only touches the
            batch dict and the upload caches; sampling is keyed by
            (seed, frame id) so thread timing cannot perturb it."""
            if i > 0:
                batch["_dev_track_rays"] = jnp.asarray(
                    self._sample_tracking_rays(batch))
            if i == 0 or i % map_every == 0 or i % kf_every == 0:
                self._frame_block(batch)
            return batch

        frames = PrefetchIterator(self.dataset, n_frames,
                                  start=start_frame, transform=stage,
                                  workers=cfg["data"].get("num_workers"))
        total = len(frames)

        visualise = bool(cfg["mesh"].get("visualisation"))
        # Per-iteration wall timestamps (frame_walls[k+1]-frame_walls[k]
        # = full wall cost of frame k incl. prefetch stalls / keyframe
        # insertion / deferred-readback drains — the end-to-end frame
        # rate, which per-phase timings alone no longer bound).
        self.frame_walls = []
        self.frame_events = []
        for i, batch in frames:
            self.frame_walls.append(time.perf_counter())
            if visualise:
                self.visualise_frame(batch, i, out)
            if profile_dir and i == 10:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and i == 20:
                jax.profiler.stop_trace()
            if ckpt_every and i > start_frame and i % ckpt_every == 0:
                # State covers frames [0, i): resume continues AT i.
                with self._event("checkpoint"):
                    self.save_checkpoint(
                        os.path.join(out, f"checkpoint{i}{self._ckpt_ext}"),
                        frame_cursor=i, async_write=True)
            if i == 0:
                loss = self.first_frame_mapping(batch)
                if cfg["mapping"]["first_mesh"]:
                    try:
                        self.save_mesh(0, voxel_size=cfg["mesh"]["voxel_eval"])
                    except Exception as e:  # mesh ext optional at start
                        print(f"first mesh skipped: {e}")
                if verbose:
                    print(f"frame 0: first-frame mapping loss {loss:.5f}")
                continue

            if cfg["tracking"]["iter_point"] > 0:
                self.tracking_pc(batch, i)
            self.tracking_render(batch, i)
            if verbose:
                self._resolve_track_pending()
                loss, psnr, err = self._last_track_info
                print(f"it: {i}, loss: {loss:.5f}, psnr: {psnr:.3f}, "
                      f"pose L1 vs gt: {err:.5f}")

            if i % cfg["mapping"]["map_every"] == 0:
                with self._event("ba"):
                    self.current_frame_mapping(batch, i)
                    self.global_BA(batch, i)

            if i % cfg["mapping"]["keyframe_every"] == 0:
                with self._event("keyframe"):
                    self.add_keyframe(batch)

            if cfg["mesh"]["vis"] and i % cfg["mesh"]["vis"] == 0:
                with self._event("mesh_eval"):
                    self._periodic_mesh_eval(i, out, eval_ate)

        self._resolve_track_pending()  # count in-flight device work
        self.frame_walls.append(time.perf_counter())
        # Periodic mesh/eval jobs land before the final artifacts (the
        # output.txt appends stay in frame order).
        self._mesh_worker.wait()
        i = total - 1
        # cursor=total: --ckpt auto on a finished run re-finalizes
        # (empty loop + mesh/eval) instead of re-running from frame 0.
        self.save_checkpoint(os.path.join(out, f"checkpoint{i}{self._ckpt_ext}"),
                             frame_cursor=total)
        try:
            self.save_mesh(i, voxel_size=cfg["mesh"]["voxel_final"])
        except Exception as e:
            print(f"final mesh failed: {e}")
        results = None
        if eval_ate:
            results = pose_evaluation(self.pose_gt, self._pose_dict(), 1, out, i)
            pose_evaluation(self.pose_gt, self.convert_relative_pose(), 1,
                            out, i, img="pose_r", name="output_relative.txt")
        if verbose:
            self.print_timings()
        return results

    def visualise_frame(self, batch: Dict, i: int, out_dir: str) -> str:
        """Headless equivalent of the reference's live RGB-D window
        (reference coslam.py:657-668 + colormap utils.py:208-263): writes
        an [rgb | turbo-depth] composite to <out>/vis/rgbd_<i>.png. The
        trajectory view (coslam.py:698-707) is covered by the pose_r_*.png
        plots that pose_evaluation already writes on the mesh cadence."""
        import cv2

        from ..tools.viz import colormap_image

        depth = np.asarray(batch["depth"])
        mask = depth < self.config["cam"]["depth_trunc"]
        dvis = colormap_image(depth, mask, invalid_color=(1.0, 1.0, 1.0))
        comp = np.hstack([np.asarray(batch["rgb"]), dvis])
        vis_dir = os.path.join(out_dir, "vis")
        os.makedirs(vis_dir, exist_ok=True)
        path = os.path.join(vis_dir, f"rgbd_{i:05d}.png")
        bgr = cv2.cvtColor((comp * 255).astype(np.uint8),
                           cv2.COLOR_RGB2BGR)
        cv2.imwrite(path, bgr)
        # Live window when a display exists (the reference's cv2.imshow
        # loop, coslam.py:657-668); headless runs keep the PNG trail.
        if os.environ.get("DISPLAY"):
            try:
                cv2.imshow("RGB-D", bgr)
                cv2.waitKey(1)
            except cv2.error:
                pass
        return path

    def _pose_dict(self) -> Dict[int, np.ndarray]:
        self._resolve_track_pending()
        return {i: self.est_c2w[i] for i in range(len(self.est_c2w))
                if np.any(self.est_c2w[i] != 0)}

    def print_timings(self):
        self._resolve_track_pending()  # charge outstanding block time
        for phase, vals in self.timings.items():
            if vals:
                # Skip the first invocation (jit compile) in the mean.
                steady = vals[1:] if len(vals) > 1 else vals
                print(f"[timing] {phase}: mean {np.mean(steady):.2f} ms "
                      f"({len(vals)} calls, first {vals[0]:.0f} ms)")
