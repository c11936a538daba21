"""Loss masks/weights vs numpy reference formulas; mask-padding invariance."""

import jax.numpy as jnp
import numpy as np

from coslam_tpu.ops import losses as L


def test_get_masks_weights(rng):
    n, s = 8, 16
    z = np.sort(rng.uniform(0, 5, (n, s))).astype(np.float32)
    d = rng.uniform(1, 4, (n, 1)).astype(np.float32)
    trunc = 0.3
    fm, sm, fw, sw = L.get_masks(jnp.asarray(z), jnp.asarray(d), trunc)
    fm, sm = np.asarray(fm), np.asarray(sm)
    np.testing.assert_array_equal(fm, (z < d - trunc).astype(np.float32))
    expect_sm = ((z >= d - trunc) & (z <= d + trunc) & (d > 0)).astype(np.float32)
    np.testing.assert_array_equal(sm, expect_sm)
    total = fm.sum() + sm.sum()
    np.testing.assert_allclose(float(fw), 1 - fm.sum() / total, rtol=1e-6)
    np.testing.assert_allclose(float(sw), 1 - sm.sum() / total, rtol=1e-6)


def test_compute_loss_l1_l2():
    p = jnp.array([1.0, 2.0, 3.0])
    t = jnp.array([0.0, 0.0, 0.0])
    np.testing.assert_allclose(float(L.compute_loss(p, t, "l2")), 14 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(L.compute_loss(p, t, "l1")), 2.0, rtol=1e-6)


def test_masked_mean_ignores_padding():
    x = jnp.array([1.0, 2.0, 100.0])
    m = jnp.array([1.0, 1.0, 0.0])
    np.testing.assert_allclose(float(L.masked_mean(x, m)), 1.5)


def test_sdf_loss_padding_invariance(rng):
    """Padded rays with ray_mask=0 must not change fs/sdf losses."""
    n, s = 8, 16
    z = np.sort(rng.uniform(0, 5, (n, s))).astype(np.float32)
    d = rng.uniform(1, 4, (n, 1)).astype(np.float32)
    sdf = rng.standard_normal((n, s)).astype(np.float32)

    fs0, sd0 = L.get_sdf_loss(jnp.asarray(z), jnp.asarray(d), jnp.asarray(sdf), 0.3)

    # Pad with garbage rays masked out.
    zp = np.concatenate([z, rng.uniform(0, 5, (4, s)).astype(np.float32)])
    dp = np.concatenate([d, rng.uniform(1, 4, (4, 1)).astype(np.float32)])
    sp = np.concatenate([sdf, 10 * rng.standard_normal((4, s)).astype(np.float32)])
    mask = np.concatenate([np.ones(n), np.zeros(4)]).astype(np.float32)
    fs1, sd1 = L.get_sdf_loss(jnp.asarray(zp), jnp.asarray(dp), jnp.asarray(sp),
                              0.3, ray_mask=jnp.asarray(mask))
    np.testing.assert_allclose(float(fs0), float(fs1), rtol=1e-5)
    np.testing.assert_allclose(float(sd0), float(sd1), rtol=1e-5)


def test_mse2psnr():
    np.testing.assert_allclose(float(L.mse2psnr(jnp.asarray(0.01))),
                               -10 * np.log10(0.01 + 1e-6), rtol=1e-5)


def test_total_loss_weighting():
    ret = {"rgb_loss": jnp.asarray(1.0), "depth_loss": jnp.asarray(2.0),
           "sdf_loss": jnp.asarray(3.0), "fs_loss": jnp.asarray(4.0)}
    w = {"rgb_weight": 5.0, "depth_weight": 0.1, "sdf_weight": 1000.0,
         "fs_weight": 10.0}
    got = float(L.total_loss(ret, w))
    np.testing.assert_allclose(got, 5.0 + 0.2 + 3000.0 + 40.0)
    got2 = float(L.total_loss(ret, w, smooth_loss=jnp.asarray(2.0),
                              smooth_weight=1e-3))
    np.testing.assert_allclose(got2, got + 2e-3, rtol=1e-6)
