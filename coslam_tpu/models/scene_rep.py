"""Joint scene representation: hash-grid + coordinate encoding -> SDF/color.

Functional JAX port of the reference's JointEncoding nn.Module
(reference: model/scene_rep.py:10-351). The class holds only *static*
configuration (resolutions, encoder specs, loss weights); all learnable
state is an explicit parameter pytree, and every method is a pure
function of (params, inputs[, key]) — directly jit/grad/vmap-able and
shardable with jax.sharding.

Coordinates are normalized to the unit cube of the scene bounding box
before encoding (tcnn convention, reference model/scene_rep.py:185-186).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import encodings as enc
from ..ops import losses as L
from ..ops import render as R
from .decoder import ColorSDFDecoder


class JointEncoding:
    def __init__(self, config: Dict, bound_box: np.ndarray):
        """config: full Co-SLAM config dict; bound_box: [3, 2] metric bounds."""
        self.config = config
        self.bounding_box = np.asarray(bound_box, dtype=np.float32)
        self._get_resolution()
        self._build_encoders(config)
        self._build_decoder(config)

    # -- static setup -------------------------------------------------------

    def _get_resolution(self):
        """Voxel size -> grid resolution (reference model/scene_rep.py:23-38)."""
        dim_max = float((self.bounding_box[:, 1] - self.bounding_box[:, 0]).max())
        vs = self.config["grid"]["voxel_sdf"]
        self.resolution_sdf = int(vs) if vs > 10 else int(dim_max / vs)
        vc = self.config["grid"]["voxel_color"]
        self.resolution_color = int(vc) if vc > 10 else int(dim_max / vc)

    def _build_encoders(self, config: Dict):
        # Coordinate encoding (OneBlob by default).
        (self._pos_init, self._pos_apply, self.input_ch_pos, _
         ) = enc.make_encoder(config["pos"]["enc"], n_bins=config["pos"]["n_bins"])
        # Remat only pays off for legacy grid impls with big residuals.
        self.needs_remat = config["grid"].get("grad_impl", "auto") not in (
            "auto", "packed")

        # Sparse parametric encoding (SDF grid). grad_impl selects the
        # table-gradient path ('onehot' = MXU matmul, default on TPU).
        grad_impl = config["grid"].get("grad_impl", "auto")
        grid_kw = {}
        enc_name = str(config["grid"]["enc"]).lower()
        if "plane" in enc_name or "vm" in enc_name:
            # TriPlane/TensoVM capacity knobs (no reference counterpart):
            # pyramid depth and features/level.
            grid_kw["n_levels"] = int(
                config["grid"].get("triplane_levels", 4))
            grid_kw["level_dim"] = int(
                config["grid"].get("triplane_features", 2))
        (self._grid_init, self._grid_apply, self.input_ch, self.grid_spec
         ) = enc.make_encoder(config["grid"]["enc"],
                              log2_hashmap_size=config["grid"]["hash_size"],
                              desired_resolution=self.resolution_sdf,
                              grad_impl=grad_impl, **grid_kw)

        self._grid_lattice = self._make_lattice_fn(config)

        self.one_grid = bool(config["grid"]["oneGrid"])
        if not self.one_grid:
            (self._cgrid_init, self._cgrid_apply, self.input_ch_color,
             self.color_grid_spec) = enc.make_encoder(
                config["grid"]["enc"],
                log2_hashmap_size=config["grid"]["hash_size"],
                desired_resolution=self.resolution_color,
                grad_impl=grad_impl)
        else:
            self.input_ch_color = 0

    def _make_lattice_fn(self, config: Dict):
        """Separable-lattice encode for the BA smoothness term.

        The smoothness grid (reference coslam.py:251-263) is a regular
        jittered lattice: for factorized encodings each plane section
        only needs its g^2 unique projections and each line its g unique
        coordinates (~g-fold fewer table accesses than pointwise
        encoding). Returns fn(grid_params, axes [3, g]) -> [g, g, g, C]
        or None when the encoding has no separable structure (hash)."""
        name = str(config["grid"]["enc"]).lower()
        if "vm" in name:
            from ..ops import tensovm as VM
            spec = self.grid_spec
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
            # Smoothness goes through the analytic separable TV (O(g^2),
            # no g^3 feature volume); the lattice encode stays available
            # for callers that need the actual feature grid.
            self._grid_lattice_tv = VM.make_tensovm_lattice_tv(
                spec, fast=on_tpu)
            return VM.make_tensovm_lattice(spec, fast=on_tpu)
        if "hybrid" in name:
            from ..ops import hash_packed as HP
            from ..ops import triplane as TP
            dspec, pspec = self.grid_spec
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
            denc = (HP.make_packed_encode(dspec, jnp.bfloat16) if on_tpu
                    else (lambda p, x: HP.packed_encode_fwd_only(dspec, p, x)))

            def hybrid_lattice(p, axes):
                g = axes.shape[1]
                pts = jnp.stack(jnp.meshgrid(axes[0], axes[1], axes[2],
                                             indexing="ij"), -1).reshape(-1, 3)
                dense = denc(p["dense"], pts).reshape(g, g, g, -1)
                planes = TP.triplane_lattice_encode(pspec, p["planes"], axes)
                return jnp.concatenate([dense, planes], axis=-1)

            return hybrid_lattice
        if "plane" in name:
            from ..ops import tensovm as VM
            from ..ops import triplane as TP
            spec = self.grid_spec
            # Additive tri-planes are TensoVM with unit lines (tested
            # equivalence): reuse the analytic O(g^2) TV.
            tv = VM.make_tensovm_lattice_tv(spec)
            n_lrows = VM.line_total_rows(spec)

            def plane_tv(table, axes, sample_points):
                ones = jnp.ones((n_lrows, spec.n_features), table.dtype)
                return tv({"planes": table, "lines": ones}, axes,
                          sample_points)

            self._grid_lattice_tv = plane_tv
            return lambda p, axes: TP.triplane_lattice_encode(spec, p, axes)
        # Hash (packed): no separable structure, but the TV lattice
        # points are CONSTANTS — use a no-dx encode so the backward
        # skips the whole input-gradient reduction chain (the custom
        # VJP computes it unconditionally otherwise; XLA cannot DCE
        # through the custom_vjp boundary).
        if config["grid"].get("grad_impl", "auto") in ("auto", "packed") \
                and jax.default_backend() not in ("cpu", "gpu"):
            from ..ops import hash_packed as HP
            if isinstance(self.grid_spec, HP.PackedGridSpec):
                self._smooth_encode = HP.make_packed_encode(
                    self.grid_spec, jnp.bfloat16, need_dx=False)
        return None

    def _build_decoder(self, config: Dict):
        self.decoder = ColorSDFDecoder(
            config, input_ch=self.input_ch, input_ch_pos=self.input_ch_pos,
            input_ch_color=self.input_ch_color, one_grid=self.one_grid)

    def init_params(self, key) -> Dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = {"grid": self._grid_init(k1),
                  "decoder": self.decoder.init(k2)}
        if not self.one_grid:
            params["grid_color"] = self._cgrid_init(k3)
        return params

    # -- coordinate helpers --------------------------------------------------

    def prepack_params(self, params: Dict) -> Dict:
        """Pre-pack the grid's bf16 gather mirrors for a FROZEN-table
        computation (tracking: 10 scan iterations against constant
        params — reference coslam.py:502-594 likewise freezes the map).
        Encoders without a frozen path (TensoVM/TriPlane/legacy
        grad_impls, CPU) return params unchanged. Bit-identical
        outputs; saves the per-iteration mirror rebuild XLA cannot
        hoist out of the scan (~0.27 ms/iter at parity tracking scale,
        r4 trace)."""
        out = params
        pre = getattr(self._grid_apply, "prepack", None)
        if pre is not None:
            out = {**out, "grid": pre(params["grid"])}
        if not self.one_grid:
            cpre = getattr(self._cgrid_apply, "prepack", None)
            if cpre is not None:
                out = {**out, "grid_color": cpre(params["grid_color"])}
        return out

    def normalize_coords(self, x: jnp.ndarray) -> jnp.ndarray:
        """Metric coords -> [0,1] unit cube of the scene bounds."""
        lo = jnp.asarray(self.bounding_box[:, 0])
        hi = jnp.asarray(self.bounding_box[:, 1])
        return (x - lo) / (hi - lo)

    # -- queries (x already normalized to [0,1], like the tcnn path) ---------

    def query_color_sdf(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        """[N, 3] normalized -> raw [N, 4] = [rgb logits, sdf]
        (reference model/scene_rep.py:155-171)."""
        embed = self._grid_apply(params["grid"], x)
        embed_pos = self._pos_apply(None, x)
        if not self.one_grid:
            embed_color = self._cgrid_apply(params["grid_color"], x)
            return self.decoder(params["decoder"], embed, embed_pos, embed_color)
        return self.decoder(params["decoder"], embed, embed_pos)

    def query_sdf(self, params: Dict, x: jnp.ndarray, return_geo: bool = False,
                  embed: bool = False):
        """SDF (and optionally geo features / raw hash embedding) at x
        (reference model/scene_rep.py:126-150). x: [..., 3] normalized."""
        flat = x.reshape(-1, 3)
        embedded = self._grid_apply(params["grid"], flat)
        if embed:
            return embedded.reshape(x.shape[:-1] + (embedded.shape[-1],))
        embedded_pos = self._pos_apply(None, flat)
        out = self.decoder.sdf_net(
            params["decoder"], jnp.concatenate([embedded, embedded_pos], axis=-1))
        sdf = out[..., 0].reshape(x.shape[:-1])
        if not return_geo:
            return sdf
        geo = out[..., 1:].reshape(x.shape[:-1] + (out.shape[-1] - 1,))
        return sdf, geo

    def query_color(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        """RGB in [0,1] at normalized points x [..., 3]."""
        flat = x.reshape(-1, 3)
        rgb = jax.nn.sigmoid(self.query_color_sdf(params, flat)[..., :3])
        return rgb.reshape(x.shape[:-1] + (3,))

    def run_network(self, params: Dict, pts: jnp.ndarray,
                    extra_norm: Optional[jnp.ndarray] = None):
        """Metric points [N_rays, N_samples, 3] -> raw [N_rays, N_samples, 4].

        Normalizes to the unit cube first (reference
        model/scene_rep.py:173-191). No host-side chunking: XLA tiles it.

        extra_norm: optional [G, 3] already-normalized points appended to
        the SDF-grid encode batch (one gather pass + ONE backward scatter
        kernel set instead of two); their embeddings are returned as a
        second output and they never touch the decoders. Used to fuse the
        BA smoothness-grid query into the main forward.

        When self.remat is set (mapping megasteps under a LEGACY
        grad_impl), the query is rematerialized (jax.checkpoint): the
        legacy encoders' autodiff residuals (~1 KB/point) are too big to
        save across an optimization scan. The default 'packed' encoder
        has a custom VJP with compact residuals (bf16 pair features), so
        remat would only force a second gather pass — it is skipped
        regardless of the flag (see ops/hash_packed.py).
        """
        flat = pts.reshape(-1, 3)
        flat = self.normalize_coords(flat)
        if extra_norm is not None:
            n_ray = flat.shape[0]
            embed_all = self._grid_apply(params["grid"],
                                         jnp.concatenate([flat, extra_norm]))
            embed, extra_emb = embed_all[:n_ray], embed_all[n_ray:]
            embed_pos = self._pos_apply(None, flat)
            if not self.one_grid:
                embed_color = self._cgrid_apply(params["grid_color"], flat)
                raw = self.decoder(params["decoder"], embed, embed_pos,
                                   embed_color)
            else:
                raw = self.decoder(params["decoder"], embed, embed_pos)
            return (raw.reshape(pts.shape[:-1] + (raw.shape[-1],)),
                    extra_emb)
        if getattr(self, "remat", True) and self.needs_remat:
            raw = jax.checkpoint(self.query_color_sdf)(params, flat)
        else:
            raw = self.query_color_sdf(params, flat)
        return raw.reshape(pts.shape[:-1] + (raw.shape[-1],))

    # -- rendering ------------------------------------------------------------

    def render_surface_color(self, params: Dict, rays_o: jnp.ndarray,
                             normal: jnp.ndarray) -> jnp.ndarray:
        """Render color along vertex normals (reference
        model/scene_rep.py:193-209). rays_o: [N, 3], normal: [N, 3]."""
        tr = self.config["training"]
        n_rays = rays_o.shape[0]
        z_vals = jnp.linspace(-tr["trunc"], tr["trunc"], tr["n_range_d"])
        z_vals = jnp.broadcast_to(z_vals[None, :], (n_rays, tr["n_range_d"]))
        pts = rays_o[..., None, :] + normal[..., None, :] * z_vals[..., :, None]
        raw = self.run_network(params, pts)
        rgb, *_ = R.raw2outputs(raw, z_vals, tr["trunc"],
                                self.config["data"]["sc_factor"],
                                tr["white_bkgd"])
        return rgb

    def render_rays(self, params: Dict, key, rays_o: jnp.ndarray,
                    rays_d: jnp.ndarray, target_d: Optional[jnp.ndarray] = None,
                    extra_norm: Optional[jnp.ndarray] = None) -> Dict:
        """Volume render a batch of rays (reference model/scene_rep.py:211-295).

        rays_o/rays_d: [N, 3]; target_d: [N, 1] or None. Returns the same
        ret dict keys as the reference ('rgb', 'depth', 'disp_map',
        'acc_map', 'depth_var', 'z_vals', 'raw', + coarse '...0' keys and
        'z_std' when importance sampling is on).
        """
        tr = self.config["training"]
        cam = self.config["cam"]
        n_rays = rays_o.shape[0]
        k_pert, k_imp = jax.random.split(key)

        z_vals = R.stratified_z_vals(
            k_pert, n_rays, target_d, cam["near"], cam["far"],
            tr["range_d"], tr["n_range_d"],
            tr["n_samples_d"] if target_d is not None else tr.get("n_samples", tr["n_samples_d"]),
            perturb=tr["perturb"] > 0)

        pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
        extra_emb = None
        if extra_norm is not None:
            raw, extra_emb = self.run_network(params, pts,
                                              extra_norm=extra_norm)
        else:
            raw = self.run_network(params, pts)
        rgb_map, disp_map, acc_map, weights, depth_map, depth_var = R.raw2outputs(
            raw, z_vals, tr["trunc"], self.config["data"]["sc_factor"],
            tr["white_bkgd"])

        ret = {}
        if extra_emb is not None:
            ret["extra_emb"] = extra_emb
        if tr["n_importance"] > 0:
            ret.update(rgb0=rgb_map, disp0=disp_map, acc0=acc_map,
                       depth0=depth_map, depth_var0=depth_var)
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = R.sample_pdf(k_imp, z_mid, weights[..., 1:-1],
                                     tr["n_importance"], det=(tr["perturb"] == 0.0))
            z_samples = jax.lax.stop_gradient(z_samples)
            ret["z_std"] = jnp.std(z_samples, axis=-1)

            # The fine pass needs the network at [z_vals ∪ z_samples];
            # the z_vals points were just evaluated — REUSE their raw
            # outputs and query only the n_importance new points, then
            # merge-sort raw alongside z. Exactly the reference's fine
            # pass (model/scene_rep.py:265-277 re-evaluates the same
            # points; same function at the same points, same gradients)
            # at 2/7ths fewer encode gathers + table-gradient scatters
            # under the TUM recipe (85 reused + 128 new vs 213 encoded).
            pts_new = rays_o[..., None, :] \
                + rays_d[..., None, :] * z_samples[..., :, None]
            raw_new = self.run_network(params, pts_new)
            z_cat = jnp.concatenate([z_vals, z_samples], axis=-1)
            raw_cat = jnp.concatenate([raw, raw_new], axis=-2)
            order = jnp.argsort(z_cat, axis=-1)
            z_vals = jnp.take_along_axis(z_cat, order, axis=-1)
            raw = jnp.take_along_axis(raw_cat, order[..., None], axis=-2)
            rgb_map, disp_map, acc_map, weights, depth_map, depth_var = R.raw2outputs(
                raw, z_vals, tr["trunc"], self.config["data"]["sc_factor"],
                tr["white_bkgd"])

        ret.update(rgb=rgb_map, depth=depth_map, disp_map=disp_map,
                   acc_map=acc_map, depth_var=depth_var, z_vals=z_vals, raw=raw)
        return ret

    def forward(self, params: Dict, key, rays_o: jnp.ndarray,
                rays_d: jnp.ndarray, target_rgb: jnp.ndarray,
                target_d: jnp.ndarray, ray_mask: Optional[jnp.ndarray] = None,
                smooth_pts_norm: Optional[jnp.ndarray] = None,
                align: Optional[jnp.ndarray] = None,
                rgb_kernel: Optional[float] = None) -> Dict:
        """Render + per-term losses (reference model/scene_rep.py:297-351).

        ray_mask: optional [N] validity mask for padded fixed-shape
        batches; masked rays contribute to no loss term.
        smooth_pts_norm: optional [G, 3] normalized smoothness-grid
        points fused into the SDF-grid encode (see run_network); their
        embeddings come back as ret['smooth_emb'].
        align: optional per-ray exposure parameters [N, 4] or [4]
        (3 gains + offset, ops/frame_align.py): the rendered canonical
        RGB is mapped to the frame's exposure before the photometric
        loss (the reference defined this module but never wired it —
        optimization/frame_align.py:5-19).
        rgb_kernel: optional Huber delta for the photometric residual
        (robust tracking; None = reference MSE).
        """
        tr = self.config["training"]
        rend = self.render_rays(params, key, rays_o, rays_d, target_d=target_d,
                                extra_norm=smooth_pts_norm)

        td = target_d[..., 0]
        valid_depth = (td > 0.0) & (td < self.config["cam"]["depth_trunc"])
        valid_depth = valid_depth.astype(jnp.float32)
        if ray_mask is not None:
            rm = ray_mask.astype(jnp.float32)
        else:
            rm = jnp.ones_like(valid_depth)

        def expose(rgb):
            if align is None:
                return rgb
            return rgb * align[..., :3] + align[..., 3:4]

        def rgb_term(pred, target, mask):
            if rgb_kernel is None:
                return L.compute_loss(pred, target, mask=mask)
            return L.huber_loss(pred, target, float(rgb_kernel), mask=mask)

        # rgb_weight multiplies pred and target inside the MSE
        # (reference model/scene_rep.py:319-326): invalid-depth pixels get
        # down-weighted by 'rgb_missing'.
        rgb_w = jnp.where(valid_depth > 0, 1.0, tr["rgb_missing"])[:, None]
        rgb_loss = rgb_term(expose(rend["rgb"]) * rgb_w, target_rgb * rgb_w,
                            rm[:, None])
        psnr = L.mse2psnr(rgb_loss)
        depth_loss = L.compute_loss(rend["depth"], td, mask=valid_depth * rm)

        if "rgb0" in rend:
            rgb_loss = rgb_loss + rgb_term(expose(rend["rgb0"]) * rgb_w,
                                           target_rgb * rgb_w, rm[:, None])
            depth_loss = depth_loss + L.compute_loss(rend["depth0"], td,
                                                     mask=valid_depth * rm)

        truncation = tr["trunc"] * self.config["data"]["sc_factor"]
        fs_loss, sdf_loss = L.get_sdf_loss(
            rend["z_vals"], target_d, rend["raw"][..., -1], truncation,
            "l2", ray_mask=rm)

        out = {"rgb": rend["rgb"], "depth": rend["depth"],
               "rgb_loss": rgb_loss, "depth_loss": depth_loss,
               "sdf_loss": sdf_loss, "fs_loss": fs_loss, "psnr": psnr}
        if "extra_emb" in rend:
            out["smooth_emb"] = rend["extra_emb"]
        return out

    # -- smoothness regularizer ----------------------------------------------

    def smoothness_points(self, key, sample_points: int = 256,
                          voxel_size: float = 0.1,
                          margin: float = 0.05) -> jnp.ndarray:
        """Jittered dense-grid sample points for the TV regularizer
        (reference coslam.py:251-263), normalized, flat [(g)^3, 3]."""
        lo = jnp.asarray(self.bounding_box[:, 0])
        hi = jnp.asarray(self.bounding_box[:, 1])
        grid_size = (sample_points - 1) * voxel_size
        offset_max = hi - lo - grid_size - 2 * margin

        k1, k2 = jax.random.split(key)
        offset = jax.random.uniform(k1, (3,)) * offset_max + margin
        g = sample_points - 1
        ax = jnp.arange(g, dtype=jnp.float32)
        coords = jnp.stack(jnp.meshgrid(ax, ax, ax, indexing="ij"), axis=-1)
        jitter = jax.random.uniform(k2, (1, 1, 1, 3))
        pts = (coords + jitter) * voxel_size + lo + offset
        return ((pts - lo) / (hi - lo)).reshape(-1, 3)

    def smoothness_axes(self, key, sample_points: int = 256,
                        voxel_size: float = 0.1,
                        margin: float = 0.05) -> jnp.ndarray:
        """Per-axis coordinates [3, g] of the same jittered lattice
        smoothness_points builds (identical random draws, so the two
        paths sample the same grid)."""
        lo = jnp.asarray(self.bounding_box[:, 0])
        hi = jnp.asarray(self.bounding_box[:, 1])
        grid_size = (sample_points - 1) * voxel_size
        offset_max = hi - lo - grid_size - 2 * margin

        k1, k2 = jax.random.split(key)
        offset = jax.random.uniform(k1, (3,)) * offset_max + margin
        g = sample_points - 1
        ax = jnp.arange(g, dtype=jnp.float32)
        jitter = jax.random.uniform(k2, (3,))
        pts = (ax[None, :] + jitter[:, None]) * voxel_size + offset[:, None]
        return pts / (hi - lo)[:, None]

    def smoothness_from_emb(self, emb: jnp.ndarray,
                            sample_points: int) -> jnp.ndarray:
        """TV loss from flat [(g)^3, C] embeddings of smoothness_points."""
        g = sample_points - 1
        return L.smoothness_tv(emb.reshape(g, g, g, -1), sample_points)

    def smoothness(self, params: Dict, key, sample_points: int = 256,
                   voxel_size: float = 0.1, margin: float = 0.05) -> jnp.ndarray:
        """TV regularizer on hash features over a jittered dense grid
        (reference coslam.py:251-274). Standalone form; the BA megastep
        fuses the same computation into the main forward's encode
        (forward(..., smooth_pts_norm=...)).

        Factorized encodings (TriPlane/TensoVM/hybrid planes) take the
        separable-lattice fast path: g^2 unique plane projections and g
        line coordinates instead of g^3 pointwise encodes. TensoVM goes
        further: the TV sum itself factorizes into O(g^2) contractions
        (ops/tensovm.make_tensovm_lattice_tv), so no feature volume is
        ever built."""
        if getattr(self, "_grid_lattice_tv", None) is not None:
            axes = self.smoothness_axes(key, sample_points, voxel_size,
                                        margin)
            return self._grid_lattice_tv(params["grid"], axes,
                                         sample_points)
        if self._grid_lattice is not None:
            axes = self.smoothness_axes(key, sample_points, voxel_size,
                                        margin)
            emb = self._grid_lattice(params["grid"], axes)
            return L.smoothness_tv(emb, sample_points)
        pts_norm = self.smoothness_points(key, sample_points, voxel_size,
                                          margin)
        if getattr(self, "_smooth_encode", None) is not None:
            g = sample_points - 1
            emb = self._smooth_encode(params["grid"], pts_norm)
            return L.smoothness_tv(emb.reshape(g, g, g, -1), sample_points)
        emb = self.query_sdf(params, pts_norm.reshape(
            sample_points - 1, sample_points - 1, sample_points - 1, 3),
            embed=True)
        return L.smoothness_tv(emb, sample_points)
