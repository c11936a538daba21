"""Importance-sampling render path (n_importance > 0, the TUM config)."""

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.data.synth import make_synthetic_config
from coslam_tpu.models.scene_rep import JointEncoding


def test_render_with_importance_sampling():
    cfg = make_synthetic_config("/tmp/a", "/tmp/b", H=32, W=40)
    cfg["training"]["n_importance"] = 16
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))

    n = 64
    key = jax.random.PRNGKey(1)
    rays_o = jnp.zeros((n, 3))
    rays_d = jnp.concatenate(
        [jax.random.uniform(key, (n, 2), minval=-0.4, maxval=0.4),
         -jnp.ones((n, 1))], -1)
    target_d = jax.random.uniform(key, (n, 1), minval=0.8, maxval=2.0)

    ret = model.render_rays(params, key, rays_o, rays_d, target_d)
    n_base = cfg["training"]["n_samples_d"] + cfg["training"]["n_range_d"]
    assert ret["z_vals"].shape == (n, n_base + 16)
    for k in ("rgb0", "depth0", "disp0", "acc0", "depth_var0", "z_std"):
        assert k in ret
    assert ret["rgb"].shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(ret["rgb"])))
    assert np.all(np.diff(np.asarray(ret["z_vals"]), axis=-1) >= 0)

    # forward() adds the coarse losses and is differentiable end-to-end.
    rgb = jax.random.uniform(key, (n, 3))
    out = model.forward(params, key, rays_o, rays_d, rgb, target_d)
    assert np.isfinite(float(out["rgb_loss"]))

    g = jax.grad(lambda p: model.forward(p, key, rays_o, rays_d, rgb,
                                         target_d)["rgb_loss"])(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
