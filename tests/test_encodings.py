"""Encoding correctness: hash grid gather/interp, OneBlob, frequency, SH."""

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.ops import encodings as enc


def test_hashgrid_spec_dense_then_hashed():
    spec = enc.make_hashgrid_spec(desired_resolution=400, log2_hashmap_size=16)
    assert spec.n_levels == 16
    assert spec.resolutions[0] == 16
    # Growth reaches the desired resolution at the last level (within floor).
    assert abs(spec.resolutions[-1] - 400) <= 1
    # Coarse levels dense, fine levels hashed.
    assert spec.hashed[0] is False or spec.hashed[0] == False  # noqa: E712
    assert spec.hashed[-1]
    # Offsets strictly increasing, total consistent.
    assert list(spec.offsets) == sorted(set(spec.offsets))
    dense_sizes = [(r + 1) ** 3 for r in spec.resolutions]
    expect_total = sum(min(s, 2 ** 16) for s in dense_sizes)
    assert spec.total_entries == expect_total


def test_hashgrid_encode_shapes_and_grad():
    spec = enc.make_hashgrid_spec(desired_resolution=64, log2_hashmap_size=10,
                                  n_levels=4)
    key = jax.random.PRNGKey(0)
    table = enc.init_hashgrid(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
    out = enc.hashgrid_encode(spec, table, x)
    assert out.shape == (128, spec.out_dim)
    assert np.all(np.isfinite(np.asarray(out)))

    # Gradient flows into the table (scatter-add through the gather).
    def loss(t):
        return jnp.sum(enc.hashgrid_encode(spec, t, x) ** 2)

    g = jax.grad(loss)(table)
    assert np.asarray(jnp.abs(g).sum()) > 0


def test_hashgrid_trilinear_interpolation_exact():
    """With a table holding f(corner) = linear function of dense coords,
    trilinear interp must reproduce the linear function exactly."""
    spec = enc.make_hashgrid_spec(desired_resolution=8, log2_hashmap_size=14,
                                  n_levels=1, base_resolution=8)
    assert not spec.hashed[0]
    res = spec.resolutions[0]
    # table[row] = [x + 2y + 3z, 1] for dense row of corner (x, y, z)
    grid = np.stack(np.meshgrid(*[np.arange(res + 1)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3).astype(np.float32)
    table = np.stack([grid @ np.array([1.0, 2.0, 3.0], np.float32),
                      np.ones(len(grid), np.float32)], axis=-1)
    x = np.random.default_rng(0).uniform(0.05, 0.95, (64, 3)).astype(np.float32)
    out = np.asarray(enc.hashgrid_encode(spec, jnp.asarray(table), jnp.asarray(x)))
    expect = (x * res) @ np.array([1.0, 2.0, 3.0], np.float32)
    np.testing.assert_allclose(out[:, 0], expect, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(out[:, 1], 1.0, atol=1e-5)


def test_hashgrid_out_of_range_clamped():
    spec = enc.make_hashgrid_spec(desired_resolution=16, log2_hashmap_size=10,
                                  n_levels=2)
    table = enc.init_hashgrid(jax.random.PRNGKey(0), spec)
    x = jnp.array([[-0.5, 1.5, 0.5], [0.0, 1.0, 0.5]])
    out = enc.hashgrid_encode(spec, table, x)
    assert np.all(np.isfinite(np.asarray(out)))


def test_hashgrid_mxu_backward_matches_scatter():
    """The MXU one-hot table gradient must match XLA's scatter-add
    (up to bf16 rounding of the update values)."""
    spec = enc.make_hashgrid_spec(64, 12, n_levels=4)
    table = enc.init_hashgrid(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (256, spec.out_dim))
    enc_mxu = enc.make_hashgrid_encode_mxu(spec)

    f_ref = enc.hashgrid_encode(spec, table, x)
    f_mxu = enc_mxu(table, x)
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_mxu))

    gr = jax.grad(lambda t, xx: jnp.sum(enc.hashgrid_encode(spec, t, xx) * g),
                  argnums=(0, 1))(table, x)
    gm = jax.grad(lambda t, xx: jnp.sum(enc_mxu(t, xx) * g),
                  argnums=(0, 1))(table, x)
    scale = float(jnp.abs(gr[0]).max())
    assert float(jnp.abs(gr[0] - gm[0]).max()) < 0.01 * scale  # bf16 vals
    np.testing.assert_allclose(np.asarray(gr[1]), np.asarray(gm[1]),
                               atol=1e-5)


def test_oneblob_partition_of_unity():
    """Far from the boundary, bin masses sum to ~1 and peak at x's bin."""
    x = jnp.array([[0.5, 0.3, 0.71]])
    out = np.asarray(enc.oneblob_encode(x, n_bins=16)).reshape(3, 16)
    np.testing.assert_allclose(out.sum(axis=-1), 1.0, atol=1e-4)
    assert out[0].argmax() == 8  # x=0.5 -> bin 8
    assert out[2].argmax() == 11  # x=0.71 -> bin 11
    assert np.all(out >= -1e-6)


def test_oneblob_localization():
    out = np.asarray(enc.oneblob_encode(jnp.array([[0.5]]), n_bins=16))[0]
    # Mass concentrated within +-1 bin of the center.
    assert out[7] + out[8] > 0.9


def test_freq_encode():
    x = jnp.array([[0.25, 0.5, 1.0]])
    out = np.asarray(enc.freq_encode(x, n_frequencies=4))
    assert out.shape == (1, 3 * 4 * 2)
    # sin(pi * 0.25) for dim0 freq0
    np.testing.assert_allclose(out[0, 0], np.sin(np.pi * 0.25), atol=1e-5)


def test_sh_encode_orthonormal_dc():
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out = np.asarray(enc.sh_encode(d, degree=4))
    assert out.shape == (2, 16)
    np.testing.assert_allclose(out[:, 0], 0.28209479, atol=1e-6)


def test_make_encoder_factory():
    for name, dim in [("OneBlob", 48), ("Frequency", 72), ("Identity", 3),
                      ("SphericalHarmonics", 16)]:
        init, apply, out_dim, _ = enc.make_encoder(name, n_bins=16,
                                                   n_frequencies=12)
        assert out_dim == dim
        x = jnp.ones((4, 3)) * 0.5
        assert apply(init(jax.random.PRNGKey(0)), x).shape == (4, dim)

    init, apply, out_dim, spec = enc.make_encoder(
        "HashGrid", log2_hashmap_size=12, desired_resolution=64)
    assert out_dim == 32
    table = init(jax.random.PRNGKey(0))
    assert table.shape == (spec.total_entries, 2)
