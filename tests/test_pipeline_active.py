"""Concurrent tracker/mapper pipeline + ActiveCoSLAM variant + dataset algebra."""

import numpy as np
import pytest

from coslam_tpu.data.synth import (AnalyticScene, make_synthetic_config,
                                   make_trajectory, write_replica_format)


@pytest.fixture(scope="module")
def small_seq(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    datadir = str(d / "scene")
    cfg = make_synthetic_config(datadir, str(d / "out"), H=40, W=52,
                                n_frames=12)
    cfg["mapping"]["first_iters"] = 60
    cfg["mesh"]["vis"] = 0
    scene = AnalyticScene()
    poses = make_trajectory(12, orbit_fraction=0.02)
    cam = cfg["cam"]
    write_replica_format(datadir, scene, poses, cam["H"], cam["W"],
                         cam["fx"], cam["fy"], cam["cx"], cam["cy"])
    return cfg


def test_pipelined_slam(small_seq):
    from coslam_tpu.runtime.pipeline import PipelinedCoSLAM

    cfg = dict(small_seq)
    slam = PipelinedCoSLAM(cfg)
    res = slam.run(verbose=False, eval_ate=True)
    ate = res["absolute_translational_error.rmse"]
    assert np.isfinite(ate) and ate < 0.08
    assert slam.kf_db.count >= 2
    assert slam.mapping_idx >= 10
    assert slam.tracking_idx == 11


def test_pipelined_sharded_mapper(small_seq):
    """Heterogeneous multi-chip placement (`--devices N` with
    --pipelined): tracker single-chip on device 0, mapper state
    REPLICATED over a mesh of devices 1..N-1 with BA ray batches
    sharded over it. Asserts the run completes with sane quality and
    that the mapper params actually live on the mapper mesh devices
    (not the tracker's chip)."""
    import jax

    from coslam_tpu.runtime.pipeline import PipelinedCoSLAM

    cfg = dict(small_seq)
    cfg["parallel"] = {"dp": 3}  # tracker dev0 + 2-device mapper mesh
    slam = PipelinedCoSLAM(cfg)
    assert slam.map_mesh is not None and slam.map_mesh.devices.size == 2
    assert slam.tracker_device is jax.devices()[0]
    leaf = jax.tree_util.tree_leaves(slam.params)[0]
    assert set(leaf.sharding.device_set) == set(jax.devices()[1:3])

    res = slam.run(verbose=False, eval_ate=True)
    ate = res["absolute_translational_error.rmse"]
    assert np.isfinite(ate) and ate < 0.08
    assert slam.tracking_idx == 11
    # BA outputs stayed on the mapper placement all run.
    leaf = jax.tree_util.tree_leaves(slam.params)[0]
    assert set(leaf.sharding.device_set) == set(jax.devices()[1:3])
    # The tracker's published snapshot sits on the tracker chip.
    snap = jax.tree_util.tree_leaves(slam._shared_params)[0]
    assert set(snap.sharding.device_set) == {jax.devices()[0]}


def test_pipeline_params_ownership(small_seq):
    """The mapper thread OWNS self.params: no tracker-side write may
    ever clobber a finished BA update (the round-1 swap/restore race).
    Instruments the params attribute and asserts every write came from
    the mapper (or main) thread, and that the final params object is the
    one the last mapper update produced."""
    import threading

    from coslam_tpu.runtime.pipeline import PipelinedCoSLAM

    writes = []

    class InstrumentedSLAM(PipelinedCoSLAM):
        @property
        def params(self):
            return self._params_box

        @params.setter
        def params(self, value):
            writes.append((threading.current_thread().name, id(value)))
            self._params_box = value

    cfg = dict(small_seq)
    slam = InstrumentedSLAM(cfg)
    slam.run(verbose=False, eval_ate=False)

    threads = {name for name, _ in writes}
    assert not any(t == "tracker" for t in threads), \
        f"tracker thread wrote self.params: {threads}"
    # Final params is exactly the last write (no restore clobbered it).
    assert id(slam.params) == writes[-1][1]
    assert slam.mapping_idx >= 10


def test_active_coslam(small_seq):
    from coslam_tpu.active.slam import ActiveCoSLAM

    cfg = dict(small_seq)
    cfg["active"] = {"isActive": True, "check_info_gain_every": 5,
                     "init_image": 5, "choose_k": 1, "w": 0.01,
                     "downsample_rate": 4, "beta_min": 0.01}
    slam = ActiveCoSLAM(cfg)
    res = slam.run(verbose=False, eval_ate=True)
    assert np.isfinite(res["absolute_translational_error.rmse"])
    assert slam.kf_db.count >= 3  # 0, 5 (cadence) + info-gain picks

    # Final mesh under the CoSLAM.run naming contract (sequence's last
    # frame index) so eval/benchmark.py --active finds it.
    import os
    out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    assert os.path.exists(os.path.join(out, "mesh_track11.ply"))

    # Uncertainty channel behaves: beta positive, test() returns uncert_map.
    batch = slam.dataset[5]
    ret = slam.test(batch, 5)
    assert (ret["uncert_map"] > 0).all()
    assert np.isfinite(ret["rgb_loss"])


def test_active_train_set_growth_and_kf_overflow(small_seq):
    """choose_k=2 grows the train set past the preallocated keyframe
    buffer: the DB must cap at num_kf (recycling old slots, never
    clobbering via index clamp) and the train set must visibly grow
    (reference ac_coslam.py:1106-1172)."""
    from coslam_tpu.active.slam import ActiveCoSLAM

    cfg = dict(small_seq)
    cfg["active"] = {"isActive": True, "check_info_gain_every": 5,
                     "init_image": 3, "choose_k": 2, "w": 0.01,
                     "downsample_rate": 4, "beta_min": 0.01}
    slam = ActiveCoSLAM(cfg)
    num_kf = slam.kf_db.num_kf
    slam.run(verbose=False, eval_ate=False)

    assert slam.train_set_size > 3  # grew past init_image
    # Buffer capped, never over-counted; frame ids all valid and unique.
    assert slam.kf_db.count <= num_kf
    ids = slam.kf_db.frame_ids[:slam.kf_db.count]
    assert all(0 <= f < len(slam.dataset) for f in ids)
    assert len(set(ids)) == len(ids)
    # First keyframe (BA gauge anchor) is never recycled.
    assert slam.kf_db.frame_ids[0] == 0


def test_dataset_algebra(small_seq):
    from coslam_tpu.data import get_dataset

    ds = get_dataset(small_seq)
    v = ds.slice(range(2, 6))
    assert len(v) == 4
    assert v[0]["frame_id"] == 2
    v2 = v.remove([0])
    assert len(v2) == 3 and v2[0]["frame_id"] == 3
    both = v + v2
    assert len(both) == 7
    assert both[4]["frame_id"] == 3  # first of second part
    exc = ds.slice_except([0, 1])
    assert len(exc) == len(ds) - 2
    # attribute passthrough
    assert v.H == ds.H and both.W == ds.W


def test_detach_nll_gradient_isolation(small_seq):
    """detach_nll (default): the uncertainty NLL must contribute ZERO
    gradient to grid and non-beta decoder params (geometry/color follow
    the plain MSE) while the beta head still receives gradient; the
    reference formulation (detach_nll: false) leaks NLL gradients into
    the grid (the measured pose-bias mechanism, STATUS.md session 6)."""
    import jax
    import jax.numpy as jnp

    from coslam_tpu.active.scene_rep import ActiveJointEncoding

    def build(detach):
        cfg = dict(small_seq)
        cfg["active"] = {"isActive": True, "check_info_gain_every": 5,
                         "init_image": 5, "choose_k": 1, "w": 0.01,
                         "downsample_rate": 4, "beta_min": 0.01,
                         "detach_nll": detach}
        bb = np.array(cfg["mapping"]["bound"], np.float32)
        return cfg, ActiveJointEncoding(cfg, bb)

    cfg, model = build(True)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    n = 64
    k1, k2 = jax.random.split(key)
    rays_d = jax.random.normal(k1, (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.zeros((n, 3))
    rgb = jax.random.uniform(k2, (n, 3))
    td = jax.random.uniform(k2, (n, 1), minval=0.5, maxval=1.5)

    def rgb_loss_fn(p, m):
        return m.forward(p, jax.random.PRNGKey(2), rays_o, rays_d,
                         rgb, td)["rgb_loss"]

    g_detach = jax.grad(rgb_loss_fn)(params, model)

    # Plain-MSE reference gradients: the base JointEncoding math on the
    # same params is not directly comparable (different decoder), so
    # compare against the NLL terms' analytic property instead: zeroing
    # the NLL terms must not change the non-beta gradients.
    cfg2, model2 = build(False)
    g_ref = jax.grad(rgb_loss_fn)(params, model2)

    # Beta head trains in both formulations.
    gb = g_detach["decoder"]["uncertainty_linear"]
    assert any(float(jnp.abs(x).max()) > 0 for x in
               jax.tree_util.tree_leaves(gb))
    # The two formulations must differ on the grid (the reference NLL
    # couples the grid through 1/beta weighting and the render weights).
    diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(g_detach["grid"]),
        jax.tree_util.tree_leaves(g_ref["grid"])))
    assert diff > 0

    # Detached grid gradients == gradients of the PURE MSE component
    # (drop the NLL terms entirely): the NLL contributes nothing.
    def mse_only(p, m):
        ret = m.forward(p, jax.random.PRNGKey(2), rays_o, rays_d, rgb, td)
        # psnr = mse2psnr(masked mse) -> invert to recover the raw MSE
        # without re-implementing forward: use rgb output directly.
        sq = (ret["rgb"] - rgb) ** 2
        return jnp.mean(sq)

    # Same RNG -> same render; compare directions via cosine similarity
    # of flattened grid grads (exact equality needs identical masking
    # internals, so assert near-parallel instead).
    g_mse = jax.grad(mse_only)(params, model)
    va = jnp.concatenate([x.ravel() for x in
                          jax.tree_util.tree_leaves(g_detach["grid"])])
    vb = jnp.concatenate([x.ravel() for x in
                          jax.tree_util.tree_leaves(g_mse["grid"])])
    cos = float(jnp.vdot(va, vb) /
                (jnp.linalg.norm(va) * jnp.linalg.norm(vb) + 1e-12))
    assert cos > 0.99


def test_pipelined_deferred_stress(small_seq):
    """Deferred-readback pipelined mode under a longer interleaving
    window: the tracker's async readback FIFO and device pose chain must
    never lose a pose write (every frame's est_c2w row lands), the
    mapper must consume device poses before the tracker prunes them
    (no zero cur_pose poisoning BA -> trajectory stays sane), and the
    FIFO must be fully drained at return."""
    import copy

    from coslam_tpu.runtime.pipeline import PipelinedCoSLAM

    cfg = copy.deepcopy(small_seq)
    cfg["data"]["exp_name"] = "pipe_stress"
    # Tighter BA/keyframe cadence than the base run: more BA cycles and
    # keyframe inserts interleaving with tracked frames per sequence.
    cfg["mapping"]["map_every"] = 2
    cfg["mapping"]["keyframe_every"] = 2
    slam = PipelinedCoSLAM(cfg)
    res = slam.run(verbose=False, eval_ate=True)

    assert slam.tracking_idx == 11
    assert slam.mapping_idx >= 10
    # Every frame's pose write landed (no lost FIFO entries).
    for i in range(12):
        assert np.any(slam.est_c2w[i]), f"frame {i} pose never resolved"
    assert not slam._pending, "readback FIFO not drained at return"
    # No zero-pose poisoning: trajectory is finite and reference-class
    # for this tiny scene.
    ate = res["absolute_translational_error.rmse"]
    assert np.isfinite(ate) and ate < 0.08
    # Wall timestamps cover the tracked frames (tracker loop recorded
    # one per frame 1..11 + a final stamp).
    assert len(slam.frame_walls) == 12


def test_checkpoint_concurrent_rel_pose_writes(small_seq):
    """save_checkpoint must snapshot est_c2w_rel under the pending lock:
    in pipelined mode the tracker thread inserts relative-pose entries
    (_resolve_entry) while the mapper's periodic checkpoint iterates the
    dict — unguarded, that dies with 'dictionary changed size during
    iteration' on long runs. Mimics the real interleaving: a writer
    thread inserting under slam._pending_lock (as _resolve_entry's
    callers do) racing repeated checkpoint saves."""
    import copy
    import os
    import threading

    from coslam_tpu.runtime.slam import CoSLAM

    cfg = copy.deepcopy(small_seq)
    cfg["data"]["exp_name"] = "ckpt_race"
    slam = CoSLAM(cfg)
    # Seed a large dict so an unguarded iteration spans many inserts.
    for i in range(5000):
        slam.est_c2w_rel[i] = np.eye(4, dtype=np.float32)

    stop = threading.Event()

    def writer():
        i = 5000
        while not stop.is_set():
            with slam._pending_lock:
                slam.est_c2w_rel[i] = np.eye(4, dtype=np.float32)
            i += 1

    t = threading.Thread(target=writer, name="tracker")
    t.start()
    try:
        out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
        os.makedirs(out, exist_ok=True)
        for k in range(10):
            slam.save_checkpoint(os.path.join(out, "race.npz"),
                                 frame_cursor=k,
                                 async_write=(k % 2 == 0))
        slam._ckpt_writer.wait()
    finally:
        stop.set()
        t.join()
    frame = slam.load_checkpoint(os.path.join(out, "race.npz"))
    assert frame == 9 and len(slam.est_c2w_rel) >= 5000


def test_pipelined_single_device(small_seq):
    """Single-device pipelined path (what the one-chip TPU runs): both
    threads share the device, placement hooks are identity. On the
    8-virtual-device CPU mesh the other pipelined tests all take the
    2-device path, so this pins the devices=[d0] variant."""
    import copy

    import jax

    from coslam_tpu.runtime.pipeline import PipelinedCoSLAM

    cfg = copy.deepcopy(small_seq)
    cfg["data"]["exp_name"] = "pipe_1dev"
    slam = PipelinedCoSLAM(cfg, devices=jax.devices()[:1])
    assert slam.tracker_device is slam.mapper_device
    res = slam.run(verbose=False, eval_ate=True)
    ate = res["absolute_translational_error.rmse"]
    assert np.isfinite(ate) and ate < 0.08
    assert not slam._pending


def test_pipelined_periodic_mesh(small_seq):
    """The mapper runs periodic mesh+ATE at the mesh.vis cadence like
    the reference's mp mapper (mp_slam/mapper.py:222-231), handed to the
    single-flight mesh worker; all artifacts are on disk at return."""
    import copy
    import os

    from coslam_tpu.runtime.pipeline import PipelinedCoSLAM

    cfg = copy.deepcopy(small_seq)
    cfg["mesh"]["vis"] = 5
    cfg["mesh"]["voxel_eval"] = 0.12
    cfg["data"]["exp_name"] = "pipe_vis"
    slam = PipelinedCoSLAM(cfg)
    res = slam.run(verbose=False, eval_ate=True)
    assert np.isfinite(res["absolute_translational_error.rmse"])
    out = os.path.join(cfg["data"]["output"], cfg["data"]["exp_name"])
    for f in ("mesh_track5.ply", "mesh_track10.ply", "output.txt",
              "pose_5.png"):
        assert os.path.exists(os.path.join(out, f)), f
