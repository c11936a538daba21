"""Dense-prefix cell path of the packed hash encoding: one gather row /
one cell-row RMW per (point, dense level) must match the pure-XLA
oracle and the all-pair path exactly (forward, dtable, dx)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.ops import hash_packed as HP


def _mixed_spec():
    # res 16 dense (17^3 = 4913 <= 2^13), 25/40/64 hashed.
    return HP.make_packed_spec(64, log2_hashmap_size=13, n_levels=4,
                               base_resolution=16)


def _dense_spec():
    return HP.make_packed_spec(24, log2_hashmap_size=16, n_levels=3,
                               base_resolution=12, dense_only=True)


@pytest.mark.parametrize("mk", [_mixed_spec, _dense_spec])
def test_forward_matches_oracle(mk):
    spec = mk()
    assert (HP._n_dense(spec) > 0), "spec must exercise the cell path"
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (spec.total_entries, spec.n_features))
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3),
                           minval=-0.05, maxval=1.05)
    enc = HP.make_packed_encode(spec, compute_dtype=jnp.float32,
                                interpret=True, cell_dense=True)
    out = enc(table, x)
    ref = HP.packed_encode_fwd_only(spec, table, x)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mk", [_mixed_spec, _dense_spec])
def test_dtable_matches_pair_path(mk):
    spec = mk()
    key = jax.random.PRNGKey(2)
    table = jax.random.normal(key, (spec.total_entries, spec.n_features))
    x = jax.random.uniform(jax.random.PRNGKey(3), (129, 3))
    g = jax.random.normal(jax.random.PRNGKey(4), (129, spec.out_dim))
    cell = HP.make_packed_encode(spec, compute_dtype=jnp.float32,
                                 interpret=True, cell_dense=True)
    pair = HP.make_packed_encode(spec, compute_dtype=jnp.float32,
                                 interpret=True, cell_dense=False)
    d_cell = jax.grad(lambda t: jnp.sum(cell(t, x) * g))(table)
    d_pair = jax.grad(lambda t: jnp.sum(pair(t, x) * g))(table)
    np.testing.assert_allclose(d_cell, d_pair, rtol=1e-4, atol=1e-5)
    d_ref = jax.grad(lambda t: jnp.sum(
        HP.packed_encode_fwd_only(spec, t, x) * g))(table)
    np.testing.assert_allclose(d_cell, d_ref, rtol=1e-4, atol=1e-5)


def test_dx_matches_oracle():
    spec = _mixed_spec()
    key = jax.random.PRNGKey(5)
    table = jax.random.normal(key, (spec.total_entries, spec.n_features))
    # Interior points: the oracle's clip has zero grad outside.
    x = jax.random.uniform(jax.random.PRNGKey(6), (65, 3),
                           minval=0.05, maxval=0.95)
    g = jax.random.normal(jax.random.PRNGKey(7), (65, spec.out_dim))
    enc = HP.make_packed_encode(spec, compute_dtype=jnp.float32,
                                interpret=True, cell_dense=True)
    d_fast = jax.grad(lambda z: jnp.sum(enc(table, z) * g))(x)
    d_ref = jax.grad(lambda z: jnp.sum(
        HP.packed_encode_fwd_only(spec, table, z) * g))(x)
    np.testing.assert_allclose(d_fast, d_ref, rtol=1e-4, atol=1e-4)


def test_multipass_big_hash_level():
    """A hashed level bigger than one VMEM accumulator pass (hash_size
    18 -> 262k rows) must still produce exact dtable via the disjoint
    multi-pass + shifted-add unpack."""
    spec = HP.make_packed_spec(128, log2_hashmap_size=18, n_levels=2,
                               base_resolution=48)
    assert any(s > HP._MAX_GROUP_ROWS for s in spec.sizes)
    key = jax.random.PRNGKey(8)
    table = jax.random.normal(key, (spec.total_entries, spec.n_features))
    x = jax.random.uniform(jax.random.PRNGKey(9), (97, 3))
    g = jax.random.normal(jax.random.PRNGKey(10), (97, spec.out_dim))
    enc = HP.make_packed_encode(spec, compute_dtype=jnp.float32,
                                interpret=True)
    d_fast = jax.grad(lambda t: jnp.sum(enc(t, x) * g))(table)
    d_ref = jax.grad(lambda t: jnp.sum(
        HP.packed_encode_fwd_only(spec, t, x) * g))(table)
    np.testing.assert_allclose(d_fast, d_ref, rtol=1e-4, atol=1e-5)


def test_multipass_big_dense_level():
    """A dense level bigger than one accumulator pass (r=56 -> 176k
    cell rows) must go through the dense multi-pass."""
    spec = HP.make_packed_spec(56, log2_hashmap_size=18, n_levels=1,
                               base_resolution=56)
    from coslam_tpu.ops.serial_scatter import MAX_ROWS
    assert spec.hashed == (False,)
    assert spec.resolutions[0] ** 3 > MAX_ROWS
    key = jax.random.PRNGKey(11)
    table = jax.random.normal(key, (spec.total_entries, spec.n_features))
    x = jax.random.uniform(jax.random.PRNGKey(12), (65, 3))
    g = jax.random.normal(jax.random.PRNGKey(13), (65, spec.out_dim))
    enc = HP.make_packed_encode(spec, compute_dtype=jnp.float32,
                                interpret=True)
    d_fast = jax.grad(lambda t: jnp.sum(enc(t, x) * g))(table)
    d_ref = jax.grad(lambda t: jnp.sum(
        HP.packed_encode_fwd_only(spec, t, x) * g))(table)
    np.testing.assert_allclose(d_fast, d_ref, rtol=1e-4, atol=1e-5)


def test_cell_storage_roundtrip():
    """Every (cell, corner) is reachable at the right lane."""
    spec = _dense_spec()
    nd = HP._n_dense(spec)
    F = spec.n_features
    table = jnp.arange(spec.total_entries * F,
                       dtype=jnp.float32).reshape(-1, F)
    st = np.asarray(HP.pack_cell_storage(spec, table, nd, jnp.float32))
    coffs, _ = HP._cell_layout(spec, nd)
    rng = np.random.default_rng(0)
    for l in range(nd):
        r = spec.resolutions[l]
        for _ in range(20):
            cx, cy, cz = rng.integers(0, r, 3)
            row = coffs[l] + (cx * r + cy) * r + cz
            for k, (a, b, c) in enumerate([(a, b, c) for a in (0, 1)
                                           for b in (0, 1)
                                           for c in (0, 1)]):
                logical = (spec.offsets[l]
                           + ((cx + a) * (r + 1) + cy + b) * (r + 1)
                           + cz + c)
                for f in range(F):
                    assert st[k * F + f, row] == float(table[logical, f])


def test_need_dx_false_matches_and_zeroes_dx():
    """need_dx=False: identical forward + dtable, zero dx, no dx chain."""
    spec = _mixed_spec()
    key = jax.random.PRNGKey(5)
    table = jax.random.normal(key, (spec.total_entries, spec.n_features))
    x = jax.random.uniform(jax.random.PRNGKey(6), (129, 3))
    g = jax.random.normal(jax.random.PRNGKey(7), (129, spec.out_dim))
    full = HP.make_packed_encode(spec, compute_dtype=jnp.float32,
                                 interpret=True)
    nodx = HP.make_packed_encode(spec, compute_dtype=jnp.float32,
                                 interpret=True, need_dx=False)
    np.testing.assert_allclose(nodx(table, x), full(table, x),
                               rtol=1e-6, atol=1e-6)
    loss = lambda enc, t, xx: jnp.sum(enc(t, xx) * g)
    d_t_full, d_x_full = jax.grad(loss, argnums=(1, 2))(full, table, x)
    d_t_nodx, d_x_nodx = jax.grad(loss, argnums=(1, 2))(nodx, table, x)
    np.testing.assert_allclose(d_t_nodx, d_t_full, rtol=1e-5, atol=1e-5)
    assert np.abs(d_x_full).max() > 0  # the full path has real dx
    np.testing.assert_array_equal(np.asarray(d_x_nodx), 0.0)


@pytest.mark.parametrize("mk", [_mixed_spec, _dense_spec])
def test_frozen_encode_matches_stock(mk):
    """make_packed_encode_frozen (tracking's hoisted-prepack path) is
    bit-equal to the stock encode in forward and dx; its table
    cotangent is structurally zero."""
    spec = mk()
    key = jax.random.PRNGKey(8)
    table = jax.random.normal(key, (spec.total_entries, spec.n_features))
    x = jax.random.uniform(jax.random.PRNGKey(9), (193, 3),
                           minval=0.05, maxval=0.95)
    g = jax.random.normal(jax.random.PRNGKey(10), (193, spec.out_dim))
    stock = HP.make_packed_encode(spec, compute_dtype=jnp.float32,
                                  interpret=True, cell_dense=True)
    prepack, frozen = HP.make_packed_encode_frozen(
        spec, compute_dtype=jnp.float32)
    packed = prepack(table)
    np.testing.assert_array_equal(np.asarray(frozen(packed, x)),
                                  np.asarray(stock(table, x)))
    d_frozen = jax.grad(lambda z: jnp.sum(frozen(packed, z) * g))(x)
    d_stock = jax.grad(lambda z: jnp.sum(stock(table, z) * g))(x)
    np.testing.assert_array_equal(np.asarray(d_frozen),
                                  np.asarray(d_stock))
    d_packed = jax.grad(lambda p: jnp.sum(frozen(p, x) * g))(packed)
    assert all(float(jnp.abs(v).max()) == 0.0
               for v in jax.tree_util.tree_leaves(d_packed))


def test_prepack_params_tracking_equivalence():
    """JointEncoding.prepack_params + forward is bit-equal to the stock
    forward on CPU (no-op there) and structurally safe: the tracking
    step calls it inside jit before the scan."""
    from coslam_tpu.data.synth import make_synthetic_config
    from coslam_tpu.models.scene_rep import JointEncoding

    cfg = make_synthetic_config("/tmp/x", "/tmp/y", H=24, W=32)
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    pp = model.prepack_params(params)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    a = model.query_color_sdf(params, x)
    b = model.query_color_sdf(pp, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
