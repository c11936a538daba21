"""Multi-device sharding: sharded megasteps run on an 8-device CPU mesh
and match the unsharded computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.data.synth import make_synthetic_config
from coslam_tpu.models.scene_rep import JointEncoding
from coslam_tpu.parallel.sharding import make_mesh, maybe_shard
from coslam_tpu.runtime.mapping import make_ba_step
from coslam_tpu.runtime.optim import make_map_optimizer
from coslam_tpu.runtime.tracking import make_tracking_step


@pytest.fixture(scope="module")
def setup():
    cfg = make_synthetic_config("/tmp/x", "/tmp/y", H=32, W=40)
    cfg["mapping"]["sample"] = 64   # divisible by 8
    cfg["mapping"]["iters"] = 2
    cfg["tracking"]["iter"] = 2
    cfg["tracking"]["sample"] = 64
    cfg["training"]["smooth_pts"] = 8
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, model, params


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.shape == (8,)


def test_maybe_shard_noop_and_constraint(setup):
    x = jnp.ones((16, 3))
    assert maybe_shard(x, None) is x
    mesh = make_mesh()
    y = jax.jit(lambda x: maybe_shard(x * 2, mesh))(x)
    np.testing.assert_allclose(np.asarray(y), 2.0)


def test_sharded_tracking_matches_unsharded(setup):
    cfg, model, params = setup
    mesh = make_mesh()
    key = jax.random.PRNGKey(1)
    rays = jax.random.uniform(key, (cfg["tracking"]["sample"], 7))
    rays = rays.at[:, 2].set(-1.0)
    c2w = jnp.eye(4)

    t_plain = make_tracking_step(model, cfg)
    t_shard = make_tracking_step(model, cfg, mesh=mesh)
    out_p = t_plain(params, c2w, rays, key)
    out_s = t_shard(params, c2w, rays, key)
    np.testing.assert_allclose(np.asarray(out_p[0]), np.asarray(out_s[0]),
                               atol=1e-5)
    np.testing.assert_allclose(float(out_p[1]), float(out_s[1]), rtol=1e-5)


def test_sharded_ba_matches_unsharded(setup):
    cfg, model, params = setup
    mesh = make_mesh()
    map_tx = make_map_optimizer(cfg)
    opt_state = map_tx.init(params)
    max_kf, R = 4, 32
    key = jax.random.PRNGKey(2)
    kf_rays = jax.random.uniform(key, (max_kf, R, 7)).at[..., 2].set(-1.0)
    kf_poses = jnp.tile(jnp.eye(4), (max_kf, 1, 1))
    cur_rays = jax.random.uniform(key, (32 * 40, 7)).at[:, 2].set(-1.0)

    ba_p = make_ba_step(model, cfg, map_tx, max_kf, R, R)
    ba_s = make_ba_step(model, cfg, map_tx, max_kf, R, R, mesh=mesh)
    args = (params, opt_state, kf_rays, jnp.int32(3), kf_poses,
            jnp.eye(4), cur_rays, key)
    out_p = ba_p(*args)
    out_s = ba_s(*args)
    np.testing.assert_allclose(float(out_p[4]), float(out_s[4]), rtol=1e-4)
    gp = np.asarray(out_p[0]["grid"])
    gs = np.asarray(out_s[0]["grid"])
    np.testing.assert_allclose(gp, gs, atol=2e-5)
