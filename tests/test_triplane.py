"""TriPlane encoding: numerics vs the pure-XLA oracle, gradient parity,
continuity, and JointEncoding integration (grid.enc: TriPlane)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.ops import triplane as TP


@pytest.fixture(scope="module")
def spec():
    return TP.make_triplane_spec(96, n_levels=3, n_features=2,
                                 base_resolution=16)


@pytest.fixture(scope="module")
def table(spec):
    key = jax.random.PRNGKey(0)
    return jax.random.normal(key, (spec.total_entries, spec.n_features),
                             jnp.float32) * 0.1


def _pts(n=257, seed=1):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3),
                              minval=-0.05, maxval=1.05)


def test_forward_matches_oracle(spec, table):
    x = _pts()
    enc = TP.make_triplane_encode(spec, compute_dtype=jnp.float32,
                                  interpret=True)
    out = enc(table, x)
    ref = TP.triplane_encode_fwd_only(spec, table, x)
    assert out.shape == (x.shape[0], spec.out_dim)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_dtable_matches_autodiff(spec, table):
    x = _pts(129)
    g = jax.random.normal(jax.random.PRNGKey(2), (129, spec.out_dim))
    enc = TP.make_triplane_encode(spec, compute_dtype=jnp.float32,
                                  interpret=True)
    d_fast = jax.grad(lambda t: jnp.sum(enc(t, x) * g))(table)
    d_ref = jax.grad(lambda t: jnp.sum(
        TP.triplane_encode_fwd_only(spec, t, x) * g))(table)
    np.testing.assert_allclose(d_fast, d_ref, rtol=1e-4, atol=1e-5)


def test_dx_matches_autodiff(spec, table):
    # Interior points only: the oracle's clip has zero grad outside.
    x = jax.random.uniform(jax.random.PRNGKey(3), (65, 3),
                           minval=0.05, maxval=0.95)
    g = jax.random.normal(jax.random.PRNGKey(4), (65, spec.out_dim))
    enc = TP.make_triplane_encode(spec, compute_dtype=jnp.float32,
                                  interpret=True)
    d_fast = jax.grad(lambda z: jnp.sum(enc(table, z) * g))(x)
    d_ref = jax.grad(lambda z: jnp.sum(
        TP.triplane_encode_fwd_only(spec, z if False else table, z) * g))(x)
    np.testing.assert_allclose(d_fast, d_ref, rtol=1e-4, atol=1e-4)


def test_continuity_across_cells(spec, table):
    """Bilinear interp must be continuous at cell boundaries."""
    r = spec.resolutions[-1]
    eps = 1e-6
    edge = 5.0 / r  # a v-cell boundary of the finest level
    a = jnp.array([[0.33, 0.44, edge - eps]])
    b = jnp.array([[0.33, 0.44, edge + eps]])
    fa = TP.triplane_encode_fwd_only(spec, table, a)
    fb = TP.triplane_encode_fwd_only(spec, table, b)
    np.testing.assert_allclose(fa, fb, atol=1e-3)


def test_spec_sections_fit_scatter_budget():
    from coslam_tpu.ops import hash_packed as HP
    spec = TP.make_triplane_spec(512, n_levels=4, n_features=2)
    assert max(spec.sizes) <= HP._MAX_GROUP_ROWS
    assert spec.out_dim == 8
    assert spec.n_levels == 12


def test_joint_encoding_integration(tmp_path):
    from coslam_tpu.data.synth import make_synthetic_config
    from coslam_tpu.models.scene_rep import JointEncoding

    cfg = make_synthetic_config(str(tmp_path / "scene"),
                                str(tmp_path / "out"), H=40, W=52,
                                n_frames=4)
    cfg["grid"]["enc"] = "TriPlane"
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    raw = model.query_color_sdf(params, x)
    assert raw.shape == (64, 4)
    sdf = model.query_sdf(params, x)
    assert np.all(np.isfinite(np.asarray(sdf)))


def test_hybrid_encoding_integration(tmp_path):
    """TriPlaneHybrid: dense-3D coarse pyramid + plane fine levels."""
    from coslam_tpu.data.synth import make_synthetic_config
    from coslam_tpu.models.scene_rep import JointEncoding

    cfg = make_synthetic_config(str(tmp_path / "scene"),
                                str(tmp_path / "out"), H=40, W=52,
                                n_frames=4)
    cfg["grid"]["enc"] = "TriPlaneHybrid"
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    assert set(params["grid"].keys()) == {"dense", "planes"}
    # 3 dense levels + 4 plane levels, 2 features each.
    assert model.input_ch == 14
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    raw = model.query_color_sdf(params, x)
    assert raw.shape == (64, 4)
    g = jax.grad(lambda p: float(0) + jnp.sum(
        model.query_color_sdf(p, x) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g["grid"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
