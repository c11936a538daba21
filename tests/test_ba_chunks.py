"""Chunked BA dispatch (mapping.ba_chunks): splitting the iteration
scan into several device dispatches must reproduce the single-dispatch
program exactly — same RNG stream (pre-split keys), same optimizer
trajectory (carry crosses chunks), same final poses/params."""

import numpy as np

import jax
import jax.numpy as jnp

from coslam_tpu.data.synth import make_synthetic_config
from coslam_tpu.models.scene_rep import JointEncoding
from coslam_tpu.runtime.keyframe import KeyFrameDatabase
from coslam_tpu.runtime.mapping import make_ba_step
from coslam_tpu.runtime.optim import make_map_optimizer


def test_chunked_ba_matches_single_dispatch():
    cfg = make_synthetic_config("/tmp/unused", "/tmp/unused", H=24, W=32)
    cfg["mapping"]["iters"] = 7          # prime: uneven chunk split
    cfg["mapping"]["sample"] = 64
    cfg["training"]["smooth_pts"] = 4
    bb = np.asarray(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    map_tx = make_map_optimizer(cfg)
    opt = map_tx.init(params)

    H, W, num_kf = 24, 32, 3
    kfdb = KeyFrameDatabase(cfg, H, W, num_kf,
                            int(H * W * cfg["mapping"]["n_pixels"]))
    k1, k2 = jax.random.split(key)
    dirs = jax.random.normal(k1, (H * W, 3)) * jnp.array([0.3, 0.3, 0.0]) \
        + jnp.array([0.0, 0.0, -1.0])
    frame = jnp.concatenate(
        [dirs, jax.random.uniform(k2, (H * W, 3)),
         jax.random.uniform(k2, (H * W, 1), minval=0.5, maxval=2.0)], 1)
    kfdb.add_keyframe(frame, 0, jax.random.PRNGKey(10))
    kfdb.add_keyframe(frame, 1, jax.random.PRNGKey(11))
    kf_poses = jnp.tile(jnp.eye(4), (num_kf, 1, 1)).astype(jnp.float32)

    outs = []
    for n_chunks in (1, 3):
        ba = make_ba_step(model, cfg, map_tx, num_kf,
                          kfdb.num_rays_to_save, kfdb.num_rays_to_save,
                          maxcur=32, n_chunks=n_chunks)
        outs.append(ba(params, opt, kfdb.rays, jnp.int32(2), kf_poses,
                       jnp.eye(4), frame, jax.random.PRNGKey(7)))

    (p1, _, kf1, cur1, loss1), (p3, _, kf3, cur3, loss3) = outs
    np.testing.assert_allclose(np.asarray(loss1), np.asarray(loss3),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(kf1), np.asarray(kf3),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cur1), np.asarray(cur3),
                               atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
