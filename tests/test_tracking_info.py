"""Corridor-observability levers: information-weighted tracking-ray
sampling (tracking.sample_info_frac) and the constant-velocity motion
prior (tracking.prior_trans/prior_rot).

Neither has a reference counterpart (reference tracking is a uniform
pixel draw + pure render loss, coslam.py:131-138, 531-567); they exist
for degenerate views (results/CORRIDOR_AB)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.data.synth import make_synthetic_config
from coslam_tpu.models.scene_rep import JointEncoding
from coslam_tpu.runtime.tracking import make_tracking_step


def _mini_cfg():
    cfg = make_synthetic_config("/tmp/x", "/tmp/y", H=24, W=32)
    cfg["tracking"]["iter"] = 4
    cfg["tracking"]["sample"] = 64
    return cfg


class _FakeSlam:
    """Just enough of CoSLAM to drive _sample_tracking_rays."""

    def __init__(self, cfg, seed=0):
        from coslam_tpu.runtime.slam import CoSLAM

        self.config = cfg
        self._seed = seed
        self._info_weights = CoSLAM._info_weights.__get__(self)
        self._sample = CoSLAM._sample_tracking_rays.__get__(self)


def _edge_batch(H=24, W=32):
    """Blank scene with one vertical high-contrast edge at column W//2."""
    rgb = np.full((H, W, 3), 0.5, np.float32)
    rgb[:, W // 2:, :] = 0.9
    depth = np.full((H, W), 2.0, np.float32)
    depth[:, W // 2:] = 1.0
    direction = np.dstack([np.zeros((H, W, 2), np.float32),
                           -np.ones((H, W, 1), np.float32)])
    return {"frame_id": 3, "rgb": rgb, "depth": depth,
            "direction": direction}


def test_info_weights_valid_distribution_and_edge_bias():
    cfg = _mini_cfg()
    cfg["tracking"]["ignore_edge_H"] = 2
    cfg["tracking"]["ignore_edge_W"] = 2
    slam = _FakeSlam(cfg)
    batch = _edge_batch()
    p = slam._info_weights(batch, 2, 2, frac=0.8)
    H, W = batch["depth"].shape
    ch, cw = H - 4, W - 4
    assert p.shape == (ch * cw,)
    assert abs(p.sum() - 1.0) < 1e-9 and (p >= 0).all()
    pm = p.reshape(ch, cw)
    # The edge column region carries far more probability mass per
    # pixel than the blank regions.
    edge_col = W // 2 - 2  # in cropped coords
    assert pm[:, edge_col - 1:edge_col + 2].mean() > 5 * pm[:, :4].mean()
    # Mixture floor: even blank pixels keep >= (1-frac)/N.
    assert p.min() >= (1 - 0.8) / p.size * 0.999


def test_info_sampling_biases_draws_and_default_is_uniform_path():
    cfg = _mini_cfg()
    cfg["tracking"]["ignore_edge_H"] = 2
    cfg["tracking"]["ignore_edge_W"] = 2
    cfg["tracking"]["sample"] = 128
    batch = _edge_batch()

    # Default (no knob): bit-identical to the plain uniform draw.
    slam_u = _FakeSlam(cfg)
    rays_u = slam_u._sample(dict(batch))
    rng = np.random.default_rng((0, 3))
    idx = rng.choice(20 * 28, size=128, replace=False)
    r, c = idx // 28 + 2, idx % 28 + 2
    np.testing.assert_array_equal(rays_u[:, 3:6], batch["rgb"][r, c])

    # Weighted: deterministic, and draws concentrate near the edge.
    cfg2 = {**cfg, "tracking": {**cfg["tracking"], "sample_info_frac": 0.8}}
    slam_w = _FakeSlam(cfg2)
    rays_w = slam_w._sample(dict(batch))
    rays_w2 = slam_w._sample(dict(batch))
    np.testing.assert_array_equal(rays_w, rays_w2)
    # Fraction of sampled pixels on the bright side of the edge via rgb:
    # a uniform draw gives ~0.5; gradient weighting pulls draws toward
    # the edge column itself, so count pixels whose depth sits at the
    # edge transition rows (depth gradient nonzero -> near column W/2).
    near_edge_w = np.abs(rays_w[:, 6] - 1.5) < 0.51  # any pixel is near
    assert near_edge_w.all()  # sanity: depths in {1,2} band
    # Stronger check: the drawn rgb mix has more mid-edge pixels than
    # uniform (edge pixels have rgb in {0.5, 0.9}; count draws whose
    # column is the edge +-1 by matching both rgb values' gradient zone).
    # Use the probability map directly for the expectation instead.
    p = slam_w._info_weights(batch, 2, 2, 0.8).reshape(20, 28)
    edge_mass = p[:, 13:16].sum()
    assert edge_mass > 0.3  # uniform would be 3/28 ~ 0.107


def test_const_velocity_prior_holds_flat_direction():
    cfg = _mini_cfg()
    # best=True would return the iter-0 (= init) pose on an untrained
    # model (nothing improves); compare the LAST iterate instead.
    cfg["tracking"]["best"] = False
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rays = jax.random.uniform(key, (cfg["tracking"]["sample"], 7))
    rays = rays.at[:, 2].set(-1.0)
    c2w = jnp.eye(4)

    free = make_tracking_step(model, cfg)
    cfg_p = {**cfg, "tracking": {**cfg["tracking"],
                                 "prior_trans": 1e6, "prior_rot": 1e6}}
    pinned = make_tracking_step(model, cfg_p)

    c2w_free = np.asarray(free(params, c2w, rays, key)[0])
    c2w_pin = np.asarray(pinned(params, c2w, rays, key)[0])
    # Untrained model + random rays: the free pose wanders, the
    # heavily-prior-pinned pose stays at the motion-model init.
    assert np.abs(c2w_pin - np.eye(4)).max() < 1e-3
    assert np.abs(c2w_free - np.eye(4)).max() > np.abs(
        c2w_pin - np.eye(4)).max()


def test_prior_zero_is_bitwise_reference_path():
    """prior 0 / knob absent compiles the identical loss graph."""
    cfg = _mini_cfg()
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rays = jax.random.uniform(key, (cfg["tracking"]["sample"], 7))
    rays = rays.at[:, 2].set(-1.0)
    c2w = jnp.eye(4)
    base = make_tracking_step(model, cfg)
    cfg0 = {**cfg, "tracking": {**cfg["tracking"], "prior_trans": 0.0,
                                "prior_rot": 0.0,
                                "sample_info_frac": 0.0}}
    zero = make_tracking_step(model, cfg0)
    o1 = base(params, c2w, rays, key)
    o2 = zero(params, c2w, rays, key)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
