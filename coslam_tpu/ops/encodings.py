"""Input encodings: multiresolution hash grid, dense grid, OneBlob,
frequency, spherical harmonics, identity.

TPU-native replacement for the CUDA tiny-cuda-nn encoders the reference
uses (reference: model/encodings.py:6-97). The hash grid follows the
Instant-NGP scheme: L levels of growing resolution; coarse levels whose
full grids fit in the table budget are stored densely (exact, collision
free), fine levels are spatially hashed into 2**log2_hashmap_size
entries. All levels live in ONE flat parameter table with static
per-level offsets, so the forward pass is a single fused gather and the
backward pass is a single scatter-add — both patterns XLA maps well to
TPU. A Pallas fast path is provided in ops/hash_pallas.py.

Encoders are exposed as (init_fn, apply_fn, out_dim) triples through
`make_encoder`, mirroring the reference's get_encoder factory surface.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Instant-NGP spatial hash primes.
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridSpec:
    """Static description of a multiresolution (hash) grid encoding."""

    n_levels: int = 16
    n_features: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int = 512
    # Derived (filled by make_hashgrid_spec):
    resolutions: Tuple[int, ...] = field(default=())
    offsets: Tuple[int, ...] = field(default=())       # per-level start row
    hashed: Tuple[bool, ...] = field(default=())       # per-level dense/hash
    total_entries: int = 0

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def make_hashgrid_spec(desired_resolution: int,
                       log2_hashmap_size: int = 19,
                       n_levels: int = 16,
                       n_features: int = 2,
                       base_resolution: int = 16,
                       dense_only: bool = False) -> HashGridSpec:
    """Compute static level resolutions/offsets for a hash (or dense) grid.

    per_level_scale = exp2(log2(desired/base)/(L-1)) — identical formula
    to the reference (model/encodings.py:15,33). With dense_only=True,
    every level is stored densely (the reference's 'Dense' encoder with
    4 levels).
    """
    if n_levels > 1:
        growth = math.exp2(math.log2(desired_resolution / base_resolution) / (n_levels - 1))
    else:
        growth = 1.0
    max_hash = 2 ** log2_hashmap_size

    resolutions, offsets, hashed = [], [], []
    offset = 0
    for lvl in range(n_levels):
        res = int(math.floor(base_resolution * (growth ** lvl)))
        res = max(res, 1)
        n_dense = (res + 1) ** 3
        use_hash = (not dense_only) and (n_dense > max_hash)
        n_entries = max_hash if use_hash else n_dense
        resolutions.append(res)
        offsets.append(offset)
        hashed.append(use_hash)
        offset += n_entries

    return HashGridSpec(
        n_levels=n_levels,
        n_features=n_features,
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        desired_resolution=desired_resolution,
        resolutions=tuple(resolutions),
        offsets=tuple(offsets),
        hashed=tuple(hashed),
        total_entries=offset,
    )


def init_hashgrid(key, spec: HashGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) table init (tiny-cuda-nn's default)."""
    return jax.random.uniform(
        key, (spec.total_entries, spec.n_features), dtype=dtype,
        minval=-1e-4, maxval=1e-4,
    )


def _corner_indices(spec: HashGridSpec, grid_i: jnp.ndarray) -> jnp.ndarray:
    """Flat table rows for the 8 cell corners of every point at every level.

    grid_i: int32 [N, L, 3] integer cell coords (floor of scaled pos).
    Returns int32 [N, L, 8] flat indices into the parameter table.
    """
    n = grid_i.shape[0]
    L = spec.n_levels
    # 8 corner offsets [8, 3]: (z fastest to match dense row-major below)
    corners = jnp.array(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], dtype=jnp.int32
    )
    coords = grid_i[:, :, None, :] + corners[None, None, :, :]  # [N, L, 8, 3]

    res = jnp.array(spec.resolutions, dtype=jnp.int32)  # [L]
    coords = jnp.clip(coords, 0, res[None, :, None, None] + 0)  # corners in [0, res]

    out = jnp.zeros((n, L, 8), dtype=jnp.int32)
    res_p1 = res + 1
    # Dense index: (x * (res+1) + y) * (res+1) + z
    dense_idx = (coords[..., 0] * res_p1[None, :, None] + coords[..., 1]) \
        * res_p1[None, :, None] + coords[..., 2]
    # Hash index: (x*p0 ^ y*p1 ^ z*p2) & (2^T - 1)
    cu = coords.astype(jnp.uint32)
    h = (cu[..., 0] * jnp.uint32(_PRIMES[0])) \
        ^ (cu[..., 1] * jnp.uint32(_PRIMES[1])) \
        ^ (cu[..., 2] * jnp.uint32(_PRIMES[2]))
    hash_idx = (h & jnp.uint32(2 ** spec.log2_hashmap_size - 1)).astype(jnp.int32)

    hashed = jnp.array(spec.hashed, dtype=bool)  # [L]
    offs = jnp.array(spec.offsets, dtype=jnp.int32)  # [L]
    idx = jnp.where(hashed[None, :, None], hash_idx, dense_idx)
    return idx + offs[None, :, None]


def hashgrid_encode(spec: HashGridSpec, table: jnp.ndarray,
                    x: jnp.ndarray,
                    compute_dtype=None) -> jnp.ndarray:
    """Multiresolution trilinear hash-grid encoding.

    x: [N, 3] normalized to [0, 1] (tcnn convention; out-of-range points
    are clamped). table: [total_entries, F]. Returns [N, L*F] features
    (float32). One gather of [N, L, 8] rows => XLA emits a single fused
    gather; autodiff yields a single scatter-add for the table gradient.

    The gather reads the table in `compute_dtype` (bf16 halves the
    bandwidth of the dominant random-access traffic — the tcnn analogue
    stores fp16 parameters); master parameters and gradients stay f32.
    """
    n = x.shape[0]
    table_t = table.T                                  # [F, T]
    if compute_dtype is not None and table_t.dtype != compute_dtype:
        table_t = table_t.astype(compute_dtype)

    # All intermediates are laid out [..., N] so the minor (lane) dim is
    # the large point axis — [.., 8]- or [.., F]-minor layouts tile-pad
    # 16-64x in HBM and dominated the runtime in the naive formulation.
    xt = jnp.clip(x, 0.0, 1.0).T                       # [3, N]
    res = jnp.array(spec.resolutions, dtype=x.dtype)   # [L]
    pos = res[:, None, None] * xt[None, :, :]          # [L, 3, N]
    gi = jnp.floor(pos)
    w = pos - gi                                       # [L, 3, N]
    gi = gi.astype(jnp.int32)

    cc = jnp.array([[(c >> 2) & 1, (c >> 1) & 1, c & 1]
                    for c in range(8)], dtype=jnp.int32)  # [8, 3]
    coords = gi[:, None, :, :] + cc[None, :, :, None]  # [L, 8, 3, N]
    resi = jnp.array(spec.resolutions, jnp.int32)
    coords = jnp.minimum(coords, resi[:, None, None, None])

    cu = coords.astype(jnp.uint32)
    h = (cu[:, :, 0] * jnp.uint32(_PRIMES[0])) \
        ^ (cu[:, :, 1] * jnp.uint32(_PRIMES[1])) \
        ^ (cu[:, :, 2] * jnp.uint32(_PRIMES[2]))
    hash_idx = (h & jnp.uint32(2 ** spec.log2_hashmap_size - 1)
                ).astype(jnp.int32)
    r1 = resi + 1
    dense_idx = (coords[:, :, 0] * r1[:, None, None] + coords[:, :, 1]) \
        * r1[:, None, None] + coords[:, :, 2]
    hashed = jnp.array(spec.hashed, dtype=bool)
    offs = jnp.array(spec.offsets, dtype=jnp.int32)
    idx = jnp.where(hashed[:, None, None], hash_idx, dense_idx) \
        + offs[:, None, None]                          # [L, 8, N]

    feats = table_t[:, idx].astype(x.dtype)            # [F, L, 8, N]
    cw = jnp.where(cc[None, :, :, None] == 1,
                   w[:, None, :, :], 1.0 - w[:, None, :, :])  # [L, 8, 3, N]
    weight = cw[:, :, 0] * cw[:, :, 1] * cw[:, :, 2]   # [L, 8, N]

    out = jnp.sum(feats * weight[None], axis=2)        # [F, L, N]
    return out.transpose(2, 1, 0).reshape(n, spec.out_dim)


def _hash_corners_and_weights(spec: HashGridSpec, x: jnp.ndarray):
    """Shared helper: (flat corner rows [N, L, 8], trilinear weights [N, L, 8])."""
    x = jnp.clip(x, 0.0, 1.0)
    res = jnp.array(spec.resolutions, dtype=x.dtype)
    pos = x[:, None, :] * res[None, :, None]
    grid_i = jnp.floor(pos).astype(jnp.int32)
    w = pos - grid_i.astype(x.dtype)
    idx = _corner_indices(spec, grid_i)
    corners = jnp.array(
        [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], dtype=x.dtype)
    cw = corners[None, None, :, :] * w[:, :, None, :] + \
        (1.0 - corners[None, None, :, :]) * (1.0 - w[:, :, None, :])
    weight = cw[..., 0] * cw[..., 1] * cw[..., 2]
    return idx, weight


def make_hashgrid_encode_mxu(spec: HashGridSpec, compute_dtype=None):
    """Hash-grid encoding with an MXU-friendly custom backward.

    XLA lowers the table-gradient scatter-add to a serialized per-update
    loop on TPU (no atomics), which is orders of magnitude too slow for
    the BA inner loop. This variant computes dL/dtable per level as a
    fused one-hot matmul

        dT_l = one_hot(idx_l, T_l)^T @ (w_l * g_l)        (bf16 on MXU)

    — the standard TPU formulation of embedding-gradient accumulation.
    The point-gradient path (dL/dx) contains no scatter and uses plain
    autodiff. Forward numerics are identical to hashgrid_encode.
    """

    @jax.custom_vjp
    def encode(table, x):
        return hashgrid_encode(spec, table, x, compute_dtype)

    def fwd(table, x):
        return hashgrid_encode(spec, table, x, compute_dtype), (table, x)

    def bwd(res, g):
        table, x = res
        # dL/dx via autodiff of the gather-only path (no scatter inside).
        _, vjp_x = jax.vjp(
            lambda xx: hashgrid_encode(spec, jax.lax.stop_gradient(table), xx,
                                       compute_dtype),
            x)
        (dx,) = vjp_x(g)

        idx, weight = _hash_corners_and_weights(spec, x)   # [N, L, 8]
        g_lv = g.reshape(-1, spec.n_levels, spec.n_features)  # [N, L, F]
        # Per-corner update values: w * g  -> [N, L, 8, F]
        vals = weight[..., None] * g_lv[:, :, None, :]

        parts = []
        for lvl in range(spec.n_levels):
            t_l = (spec.offsets[lvl + 1] if lvl + 1 < spec.n_levels
                   else spec.total_entries) - spec.offsets[lvl]
            idx_l = (idx[:, lvl, :] - spec.offsets[lvl]).reshape(-1)  # [N*8]
            vals_l = vals[:, lvl].reshape(-1, spec.n_features)        # [N*8, F]
            onehot = jax.nn.one_hot(idx_l, t_l, dtype=jnp.bfloat16)
            dT_l = jax.lax.dot_general(
                onehot, vals_l.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            parts.append(dT_l)
        dtable = jnp.concatenate(parts, axis=0).astype(table.dtype)
        return dtable, dx

    encode.defvjp(fwd, bwd)
    return encode


# ---------------------------------------------------------------------------
# Coordinate encodings (pure XLA)
# ---------------------------------------------------------------------------

def _quartic_cdf(u: jnp.ndarray) -> jnp.ndarray:
    """CDF of the quartic kernel k(u) = 15/16 (1-u^2)^2 on [-1, 1].

    Used by tiny-cuda-nn's OneBlob as a cheap Gaussian-CDF surrogate.
    """
    uc = jnp.clip(u, -1.0, 1.0)
    cdf = 0.5 + (15.0 / 16.0) * (uc - (2.0 / 3.0) * uc ** 3 + (1.0 / 5.0) * uc ** 5)
    return jnp.where(u < -1.0, 0.0, jnp.where(u > 1.0, 1.0, cdf))


def oneblob_encode(x: jnp.ndarray, n_bins: int = 16) -> jnp.ndarray:
    """OneBlob encoding (Neural Importance Sampling / tcnn 'OneBlob').

    x: [N, D] in [0, 1]. Each scalar is encoded as the mass a quartic
    kernel (sigma = 1/n_bins) centered at x deposits in each of n_bins
    uniform bins. Returns [N, D*n_bins].

    Computed transpose-major ([bins, D, N] with the big point axis minor)
    so no intermediate lane-pads; one transpose at the end.
    """
    xt = x.T                                                      # [D, N]
    edges = jnp.arange(n_bins + 1, dtype=x.dtype) / n_bins        # [B+1]
    u = (edges[:, None, None] - xt[None]) * n_bins                # [B+1, D, N]
    cdf = _quartic_cdf(u)
    feats = cdf[1:] - cdf[:-1]                                    # [B, D, N]
    return feats.transpose(2, 1, 0).reshape(x.shape[0], -1)


def freq_encode(x: jnp.ndarray, n_frequencies: int = 12) -> jnp.ndarray:
    """NeRF-style frequency encoding: [sin, cos](2^k * pi * x).

    x: [N, D] -> [N, D * n_frequencies * 2].
    """
    freqs = (2.0 ** jnp.arange(n_frequencies, dtype=x.dtype)) * jnp.pi
    ang = x[..., None] * freqs[None, None, :]                     # [N, D, F]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [N, D, 2F]
    return enc.reshape(x.shape[0], -1)


def sh_encode(d: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical-harmonics basis of unit directions up to `degree`.

    d: [N, 3] (normalized internally). Returns [N, degree**2].
    Hard-coded bands 0..3 (degree<=4), matching tcnn's use for view dirs.
    """
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [jnp.full_like(x, 0.28209479177387814)]
    if degree > 1:
        out += [-0.48860251190291987 * y,
                0.48860251190291987 * z,
                -0.48860251190291987 * x]
    if degree > 2:
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        out += [1.0925484305920792 * xy,
                -1.0925484305920792 * yz,
                0.94617469575755997 * z2 - 0.31539156525251999,
                -1.0925484305920792 * xz,
                0.54627421529603959 * (x2 - y2)]
    if degree > 3:
        out += [0.59004358992664352 * y * (-3.0 * x2 + y2),
                2.8906114426405538 * xy * z,
                0.45704579946446572 * y * (1.0 - 5.0 * z2),
                0.3731763325901154 * z * (5.0 * z2 - 3.0),
                0.45704579946446572 * x * (1.0 - 5.0 * z2),
                1.4453057213202769 * z * (x2 - y2),
                0.59004358992664352 * x * (-x2 + 3.0 * y2)]
    if degree > 4:
        raise NotImplementedError("SH degree > 4")
    return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Factory (parity with reference get_encoder, model/encodings.py:6-97)
# ---------------------------------------------------------------------------

def _grid_apply_fn(spec: HashGridSpec, grad_impl: str = "auto"):
    """Pick the table-gradient implementation:
      'packed'  — packed z-linear layout: wide-row gathers + pair-RMW
                  Pallas scatter (ops/hash_packed.py; default — ~4x the
                  'pallas' path on TPU). On CPU the same math runs as
                  pure XLA (identical numerics, autodiff scatter).
      'scatter' — XOR hash, XLA autodiff scatter-add
      'onehot'  — XOR hash, MXU one-hot matmul custom VJP (O(M*T) FLOPs,
                  competitive only on full-rate MXUs)
      'pallas'  — XOR hash, Pallas single-row serial scatter
    On TPU the gather also reads the table as bf16 (tcnn stores fp16
    params); master params/gradients stay f32."""
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    compute_dtype = jnp.bfloat16 if on_tpu else None
    if grad_impl == "auto":
        grad_impl = "packed"
    if grad_impl == "packed":
        # spec here is a PackedGridSpec (built by make_encoder).
        from . import hash_packed as HP

        if on_tpu:
            enc = HP.make_packed_encode(spec, jnp.bfloat16)
            prepack, enc_frozen = HP.make_packed_encode_frozen(
                spec, jnp.bfloat16)

            def apply(p, x):
                # Frozen-table fast path: a caller that never
                # differentiates the table (tracking) pre-packs the
                # bf16 mirrors once per megastep — see
                # JointEncoding.prepack_params.
                if isinstance(p, dict) and "__packed__" in p:
                    return enc_frozen(p["__packed__"], x)
                return enc(p, x)

            apply.prepack = lambda table: {"__packed__": prepack(table)}
            return apply
        return lambda p, x: HP.packed_encode_fwd_only(spec, p, x)
    if grad_impl == "pallas":
        from .hash_pallas import make_hashgrid_encode_pallas_bwd

        enc = make_hashgrid_encode_pallas_bwd(spec, compute_dtype,
                                              interpret=not on_tpu)
        return lambda p, x: enc(p, x)
    if grad_impl == "onehot":
        enc = make_hashgrid_encode_mxu(spec, compute_dtype)
        return lambda p, x: enc(p, x)
    return lambda p, x: hashgrid_encode(spec, p, x, compute_dtype)


def make_encoder(encoding: str, input_dim: int = 3, degree: int = 4,
                 n_bins: int = 16, n_frequencies: int = 12,
                 n_levels: int = 16, level_dim: int = 2,
                 base_resolution: int = 16, log2_hashmap_size: int = 19,
                 desired_resolution: int = 512, grad_impl: str = "auto"):
    """Return (init_fn(key) -> params|None, apply_fn(params, x), out_dim).

    Recognized names (case-insensitive substring match, like the
    reference): dense, hash/tiled, spherical, blob, freq, identity.
    """
    name = encoding.lower()
    packed = grad_impl in ("auto", "packed")

    if "dense" in name:
        if packed:
            from . import hash_packed as HP
            spec = HP.make_packed_spec(
                desired_resolution, log2_hashmap_size, n_levels=4,
                n_features=level_dim, base_resolution=base_resolution,
                dense_only=True)
            return (lambda key: HP.init_packed(key, spec),
                    _grid_apply_fn(spec, grad_impl), spec.out_dim, spec)
        spec = make_hashgrid_spec(desired_resolution, log2_hashmap_size,
                                  n_levels=4, n_features=level_dim,
                                  base_resolution=base_resolution, dense_only=True)
        return (lambda key: init_hashgrid(key, spec),
                _grid_apply_fn(spec, grad_impl),
                spec.out_dim, spec)

    if "hash" in name or "tiled" in name:
        if packed:
            from . import hash_packed as HP
            spec = HP.make_packed_spec(
                desired_resolution, log2_hashmap_size, n_levels=n_levels,
                n_features=level_dim, base_resolution=base_resolution)
            return (lambda key: HP.init_packed(key, spec),
                    _grid_apply_fn(spec, grad_impl), spec.out_dim, spec)
        spec = make_hashgrid_spec(desired_resolution, log2_hashmap_size,
                                  n_levels=n_levels, n_features=level_dim,
                                  base_resolution=base_resolution)
        return (lambda key: init_hashgrid(key, spec),
                _grid_apply_fn(spec, grad_impl),
                spec.out_dim, spec)

    if "vm" in name:  # TensoVM: planes x line factors (TensoRF-style)
        # Multiplicative 1-D line factors give the dense base's
        # disambiguation with ZERO extra serial gather/scatter issues:
        # line eval + grads are fused two-hot MXU matmuls (tables are
        # <= r+1 rows). See ops/tensovm.py.
        from . import tensovm as VM

        spec = VM.make_tensovm_spec(desired_resolution,
                                    n_levels=min(n_levels, 8),
                                    n_features=level_dim)
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if on_tpu:
            venc = VM.make_tensovm_encode(spec, jnp.bfloat16)
            apply_fn = lambda p, x: venc(p, x)
        else:
            apply_fn = lambda p, x: VM.tensovm_encode_fwd_only(spec, p, x)
        return (lambda key: VM.init_tensovm(key, spec),
                apply_fn, spec.out_dim, spec)

    if "hybrid" in name:  # TriPlaneHybrid: dense-3D coarse + plane fine
        # Additive tri-planes alone suffer projection ambiguity (a
        # feature at (x,y) affects every z along that column), which
        # shows up as phantom geometry/bumps in rendered depth. A small
        # TRUE-3D dense pyramid at coarse scale disambiguates while the
        # planes carry fine detail — still ~2x fewer serial gather/
        # scatter issues per point than the hash grid.
        from . import hash_packed as HP
        from . import triplane as TP

        # Top dense level capped at 44: 45^3 = 91k rows fits ONE scatter
        # accumulator pass (48^3 = 117k would trigger the 2x-cost
        # multi-pass path in hash_packed._scatter_table_grad).
        dspec = HP.make_packed_spec(
            min(desired_resolution, 44), log2_hashmap_size,
            n_levels=3, n_features=level_dim, base_resolution=16,
            dense_only=True)
        pspec = TP.make_triplane_spec(desired_resolution,
                                      n_levels=min(n_levels, 8),
                                      n_features=level_dim)
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if on_tpu:
            denc = HP.make_packed_encode(dspec, jnp.bfloat16)
            penc = TP.make_triplane_encode(pspec, jnp.bfloat16)
        else:
            denc = lambda p, x: HP.packed_encode_fwd_only(dspec, p, x)
            penc = lambda p, x: TP.triplane_encode_fwd_only(pspec, p, x)

        def hybrid_apply(p, x):
            return jnp.concatenate([denc(p["dense"], x),
                                    penc(p["planes"], x)], axis=-1)

        def hybrid_init(key):
            k1, k2 = jax.random.split(key)
            return {"dense": HP.init_packed(k1, dspec),
                    "planes": TP.init_triplane(k2, pspec)}

        return (hybrid_init, hybrid_apply,
                dspec.out_dim + pspec.out_dim, (dspec, pspec))

    if "plane" in name:  # TriPlane — TPU-first factorized-plane encoding
        from . import triplane as TP

        spec = TP.make_triplane_spec(desired_resolution,
                                     n_levels=min(n_levels, 8),
                                     n_features=level_dim)
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        if on_tpu:
            tenc = TP.make_triplane_encode(spec, jnp.bfloat16)
            apply_fn = lambda p, x: tenc(p, x)
        else:
            apply_fn = lambda p, x: TP.triplane_encode_fwd_only(spec, p, x)
        return (lambda key: TP.init_triplane(key, spec),
                apply_fn, spec.out_dim, spec)

    if "spherical" in name:
        return (lambda key: None,
                lambda p, x: sh_encode(x, degree),
                degree ** 2, None)

    if "blob" in name:
        return (lambda key: None,
                lambda p, x: oneblob_encode(x, n_bins),
                input_dim * n_bins, None)

    if "freq" in name:
        return (lambda key: None,
                lambda p, x: freq_encode(x, n_frequencies),
                input_dim * n_frequencies * 2, None)

    if "identity" in name:
        return (lambda key: None, lambda p, x: x, input_dim, None)

    raise ValueError(f"Unknown encoding: {encoding}")
