"""Quad plane path (ops/plane_quad.py): one gather row + one 2x2-block
RMW per (point, section) must reproduce the pair-path / oracle numerics
exactly (forward, dtable, dx), including cell-boundary and out-of-range
points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.ops import plane_quad as PQ
from coslam_tpu.ops import tensovm as VM
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


def _pts(n=257, seed=1, lo=-0.05, hi=1.05):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3),
                              minval=lo, maxval=hi)


def test_pack_roundtrip_corners(spec, table):
    """Every (cell, corner) must be reachable in the packed storage at
    the row/lane the gather computes."""
    x = _pts(129, seed=7)
    storage = PQ.pack_uv_storage(spec, table, jnp.float32)
    cu, cv, _, _ = PQ._cell_project(spec, x)
    p00, p01, p10, p11 = PQ.gather_quads(spec, storage, cu, cv, x.dtype)
    # Oracle corners from the logical table via _project entries.
    e, _, _ = TP._project(spec, x)                   # [S, 2, N] v0-entries
    t = table
    np.testing.assert_allclose(p00, jnp.moveaxis(t[e[:, 0]], -1, 0),
                               atol=1e-6)
    np.testing.assert_allclose(p01, jnp.moveaxis(t[e[:, 0] + 1], -1, 0),
                               atol=1e-6)
    np.testing.assert_allclose(p10, jnp.moveaxis(t[e[:, 1]], -1, 0),
                               atol=1e-6)
    np.testing.assert_allclose(p11, jnp.moveaxis(t[e[:, 1] + 1], -1, 0),
                               atol=1e-6)


def test_forward_matches_pair_path(spec, table):
    x = _pts()
    quad = PQ.make_plane_sections_quad(spec, jnp.float32, interpret=True)
    out = quad(table, x)
    ref = VM.plane_sections_fwd_only(spec, table, x)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_grads_match_oracle(spec, table):
    x = _pts(129, seed=2)
    g = jax.random.normal(jax.random.PRNGKey(3),
                          (spec.n_features, spec.n_levels, 129))
    quad = PQ.make_plane_sections_quad(spec, jnp.float32, interpret=True)
    d_fast = jax.grad(lambda t: jnp.sum(quad(t, x) * g))(table)
    d_ref = jax.grad(lambda t: jnp.sum(
        VM.plane_sections_fwd_only(spec, t, x) * g))(table)
    np.testing.assert_allclose(d_fast, d_ref, rtol=1e-4, atol=1e-5)


def test_dx_matches_oracle(spec, table):
    x = _pts(65, seed=4, lo=0.05, hi=0.95)
    g = jax.random.normal(jax.random.PRNGKey(5),
                          (spec.n_features, spec.n_levels, 65))
    quad = PQ.make_plane_sections_quad(spec, jnp.float32, interpret=True)
    d_fast = jax.grad(lambda z: jnp.sum(quad(table, z) * g))(x)
    d_ref = jax.grad(lambda z: jnp.sum(
        VM.plane_sections_fwd_only(spec, table, z) * g))(x)
    np.testing.assert_allclose(d_fast, d_ref, rtol=1e-4, atol=1e-4)


def test_tensovm_quad_equals_pair(spec):
    """The full TensoVM encode must be identical under both plane
    implementations (fwd + both grads)."""
    key = jax.random.PRNGKey(9)
    p = VM.init_tensovm(key, spec)
    p = {"planes": jax.random.normal(key, p["planes"].shape) * 0.1,
         "lines": 1.0 + jax.random.normal(key, p["lines"].shape) * 0.1}
    x = _pts(97, seed=6)
    g = jax.random.normal(key, (97, spec.out_dim))
    enc_q = VM.make_tensovm_encode(spec, jnp.float32, interpret=True,
                                   plane_impl="quad")
    enc_p = VM.make_tensovm_encode(spec, jnp.float32, interpret=True,
                                   plane_impl="pair")
    np.testing.assert_allclose(enc_q(p, x), enc_p(p, x), rtol=1e-5,
                               atol=1e-6)
    gq = jax.grad(lambda pp: jnp.sum(enc_q(pp, x) * g))(p)
    gp = jax.grad(lambda pp: jnp.sum(enc_p(pp, x) * g))(p)
    for a, b in zip(jax.tree_util.tree_leaves(gq),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mm_rcut", [0, 48, 1024])
def test_quad_table_grad_rcut_invariant(spec, table, mm_rcut):
    """The MM-vs-serial routing threshold must not change the numbers:
    rcut=0 routes every section through the cell-RMW serial kernel,
    rcut=1024 routes every section through the two-hot matmul, and
    rcut=48 exercises the mixed split the flagship pyramid
    (32/96/287 at the default rcut 128) actually runs."""
    n = 129
    x = _pts(n, seed=8)
    g = jax.random.normal(jax.random.PRNGKey(10),
                          (spec.n_features, spec.n_levels, n))
    cu, cv, wu, wv = PQ._cell_project(spec, x)
    d_ref = jax.grad(lambda t: jnp.sum(
        VM.plane_sections_fwd_only(spec, t, x) * g))(table)
    d = PQ.quad_table_grad(spec, cu, cv, wu, wv, g, interpret=True,
                           mm_rcut=mm_rcut)
    np.testing.assert_allclose(d, d_ref, rtol=1e-4, atol=1e-5)
