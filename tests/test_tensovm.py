"""TensoVM encoding: fast-path vs pure-XLA oracle (forward, dtable,
dlines, dx), init semantics, disambiguation property, and JointEncoding
integration (grid.enc: TensoVM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coslam_tpu.ops import tensovm as VM


@pytest.fixture(scope="module")
def spec():
    return VM.make_tensovm_spec(96, n_levels=3, n_features=2,
                                base_resolution=16)


@pytest.fixture(scope="module")
def params(spec):
    key = jax.random.PRNGKey(0)
    p = VM.init_tensovm(key, spec)
    # Randomize so gradient tests exercise real values on both factors.
    k1, k2 = jax.random.split(key)
    return {
        "planes": jax.random.normal(k1, p["planes"].shape) * 0.1,
        "lines": 1.0 + jax.random.normal(k2, p["lines"].shape) * 0.1,
    }


def _pts(n=257, seed=1, lo=-0.05, hi=1.05):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3),
                              minval=lo, maxval=hi)


def test_forward_matches_oracle(spec, params):
    x = _pts()
    enc = VM.make_tensovm_encode(spec, compute_dtype=jnp.float32,
                                 interpret=True)
    out = enc(params, x)
    ref = VM.tensovm_encode_fwd_only(spec, params, x)
    assert out.shape == (x.shape[0], spec.out_dim)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_grads_match_autodiff(spec, params):
    x = _pts(129)
    g = jax.random.normal(jax.random.PRNGKey(2), (129, spec.out_dim))
    enc = VM.make_tensovm_encode(spec, compute_dtype=jnp.float32,
                                 interpret=True)
    d_fast = jax.grad(lambda p: jnp.sum(enc(p, x) * g))(params)
    d_ref = jax.grad(lambda p: jnp.sum(
        VM.tensovm_encode_fwd_only(spec, p, x) * g))(params)
    np.testing.assert_allclose(d_fast["planes"], d_ref["planes"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(d_fast["lines"], d_ref["lines"],
                               rtol=1e-4, atol=1e-5)


def test_dx_matches_autodiff(spec, params):
    # Interior points only: the oracle's clip has zero grad outside.
    x = _pts(65, seed=3, lo=0.05, hi=0.95)
    g = jax.random.normal(jax.random.PRNGKey(4), (65, spec.out_dim))
    enc = VM.make_tensovm_encode(spec, compute_dtype=jnp.float32,
                                 interpret=True)
    d_fast = jax.grad(lambda z: jnp.sum(enc(params, z) * g))(x)
    d_ref = jax.grad(lambda z: jnp.sum(
        VM.tensovm_encode_fwd_only(spec, params, z) * g))(x)
    np.testing.assert_allclose(d_fast, d_ref, rtol=1e-4, atol=1e-4)


def test_init_equals_additive_triplane(spec):
    """lines = 1 at init, so TensoVM(init) == TriPlane on the same
    plane table: the multiplicative factor starts as a no-op."""
    from coslam_tpu.ops import triplane as TP

    key = jax.random.PRNGKey(7)
    p = VM.init_tensovm(key, spec)
    p = {"planes": jax.random.normal(key, p["planes"].shape) * 0.1,
         "lines": p["lines"]}
    x = _pts(97, seed=5)
    vm = VM.tensovm_encode_fwd_only(spec, p, x)
    tp = TP.triplane_encode_fwd_only(spec, p["planes"], x)
    np.testing.assert_allclose(vm, tp, rtol=1e-5, atol=1e-6)


def test_lines_disambiguate_columns(spec):
    """The VM property the hybrid's dense base existed for: zeroing the
    line factor at a depth removes the plane column's feature THERE
    while keeping it elsewhere — impossible for additive tri-planes."""
    key = jax.random.PRNGKey(8)
    p = VM.init_tensovm(key, spec)
    planes = jax.random.normal(key, p["planes"].shape) * 0.1
    lines = np.asarray(p["lines"]).copy()
    # Zero the xy-plane's z-line around z=0.25 for level 0 (section 0).
    r = spec.resolutions[0]
    j = int(round(0.25 * r))
    lines[j - 1:j + 2] = 0.0
    p = {"planes": planes, "lines": jnp.asarray(lines)}

    a = jnp.array([[0.4, 0.6, 0.25]])   # inside the zeroed band
    b = jnp.array([[0.4, 0.6, 0.75]])   # same column, other depth
    fa = VM.tensovm_encode_fwd_only(spec, p, a)
    fb = VM.tensovm_encode_fwd_only(spec, p, b)
    # Level-0 features at `a` lost the xy-plane contribution; at `b`
    # the column still contributes — outputs must differ beyond what
    # plane interpolation alone would give.
    assert not np.allclose(fa[0, :2], fb[0, :2], atol=1e-6)


@pytest.mark.parametrize("enc_name", ["TensoVM", "TriPlane",
                                      "TriPlaneHybrid"])
def test_lattice_smoothness_matches_pointwise(tmp_path, enc_name):
    """The separable-lattice smoothness fast path must equal the
    pointwise path (same jittered grid, same TV value and gradients)."""
    from coslam_tpu.data.synth import make_synthetic_config
    from coslam_tpu.models.scene_rep import JointEncoding
    from coslam_tpu.ops import losses as L

    cfg = make_synthetic_config(str(tmp_path / "s"), str(tmp_path / "o"),
                                H=40, W=52, n_frames=4)
    cfg["grid"]["enc"] = enc_name
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    assert model._grid_lattice is not None
    key = jax.random.PRNGKey(11)
    params = model.init_params(key)
    # Randomize so the TV is non-trivial.
    params["grid"] = jax.tree_util.tree_map(
        lambda a: a + jax.random.normal(key, a.shape) * 0.05, params["grid"])

    sp, vox, marg = 9, 0.12, 0.05

    def pointwise(p):
        pts = model.smoothness_points(key, sp, vox, marg)
        emb = model.query_sdf(p, pts.reshape(sp - 1, sp - 1, sp - 1, 3),
                              embed=True)
        return L.smoothness_tv(emb, sp)

    def lattice(p):
        return model.smoothness(p, key, sp, vox, marg)

    v_pt, g_pt = jax.value_and_grad(pointwise)(params)
    v_lat, g_lat = jax.value_and_grad(lattice)(params)
    np.testing.assert_allclose(v_lat, v_pt, rtol=1e-5, atol=1e-8)
    for a, b in zip(jax.tree_util.tree_leaves(g_lat["grid"]),
                    jax.tree_util.tree_leaves(g_pt["grid"])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_fast_lattice_matches_pure_xla(spec, params):
    """make_tensovm_lattice(fast=True) — the cell-RMW plane-grid
    backward — must equal the pure-XLA lattice encode in value and in
    the params gradient (axes are non-differentiable constants on the
    fast path, so only params grads are compared)."""
    g = 9
    axes = jax.random.uniform(jax.random.PRNGKey(21), (3, g),
                              minval=0.02, maxval=0.98)
    ct = jax.random.normal(jax.random.PRNGKey(22),
                           (g, g, g, spec.out_dim))
    fast = VM.make_tensovm_lattice(spec, fast=True, interpret=True)
    slow = VM.make_tensovm_lattice(spec, fast=False)

    v_fast = fast(params, axes)
    v_slow = slow(params, axes)
    np.testing.assert_allclose(v_fast, v_slow, rtol=1e-5, atol=1e-6)

    d_fast = jax.grad(lambda p: jnp.sum(fast(p, axes) * ct))(params)
    d_slow = jax.grad(lambda p: jnp.sum(slow(p, axes) * ct))(params)
    np.testing.assert_allclose(d_fast["planes"], d_slow["planes"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(d_fast["lines"], d_slow["lines"],
                               rtol=1e-4, atol=1e-6)


def test_joint_encoding_integration(tmp_path):
    from coslam_tpu.data.synth import make_synthetic_config
    from coslam_tpu.models.scene_rep import JointEncoding

    cfg = make_synthetic_config(str(tmp_path / "scene"),
                                str(tmp_path / "out"), H=40, W=52,
                                n_frames=4)
    cfg["grid"]["enc"] = "TensoVM"
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    params = model.init_params(jax.random.PRNGKey(0))
    assert set(params["grid"].keys()) == {"planes", "lines"}
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    raw = model.query_color_sdf(params, x)
    assert raw.shape == (64, 4)
    g = jax.grad(lambda p: jnp.sum(model.query_color_sdf(p, x) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g["grid"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
