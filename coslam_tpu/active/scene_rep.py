"""Scene representation with an uncertainty (beta) output channel.

Reference: ActiveCoSLAM/ac_scene_rep.py — raw2outputs additionally
returns uncert_map = sum_i w_i^2 * beta_i and the raw weights; the RGB
loss becomes the heteroscedastic NLL
  mean((x - y)^2 / (2 beta)) + 0.5 mean(log beta) + 4.0
when beta is strictly positive (ac_scene_rep.py:23-27, 365-380).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.scene_rep import JointEncoding
from ..ops import losses as L
from ..ops import render as R
from .decoder import ColorSDFNetV3


class ActiveJointEncoding(JointEncoding):
    def _build_decoder(self, config: Dict):
        self.decoder = ColorSDFNetV3(config, input_ch=self.input_ch,
                                     input_ch_pos=self.input_ch_pos)
        self.w_reg = float(config.get("active", {}).get("w", 0.01))

    # query_sdf must go through sdf_linear (the backbone output is a
    # feature vector, not [sdf, geo] like the base decoder).
    def query_sdf(self, params, x, return_geo: bool = False, embed: bool = False):
        from .decoder import _linear

        flat = x.reshape(-1, 3)
        embedded = self._grid_apply(params["grid"], flat)
        if embed:
            return embedded.reshape(x.shape[:-1] + (embedded.shape[-1],))
        embedded_pos = self._pos_apply(None, flat)
        h = self.decoder.sdf_net(
            params["decoder"],
            jnp.concatenate([embedded, embedded_pos], axis=-1))
        sdf = _linear(params["decoder"]["sdf_linear"], h)[..., 0]
        sdf = sdf.reshape(x.shape[:-1])
        if not return_geo:
            return sdf
        geo = _linear(params["decoder"]["feature_linear"], h)
        return sdf, geo.reshape(x.shape[:-1] + (geo.shape[-1],))

    def _raw2outputs_active(self, raw, z_vals):
        tr = self.config["training"]
        rgb_map, disp, acc, weights, depth, depth_var = R.raw2outputs(
            raw[..., :4], z_vals, tr["trunc"],
            self.config["data"]["sc_factor"], tr["white_bkgd"])
        uncert = raw[..., 4]
        uncert_map = jnp.sum(weights * weights * uncert, axis=-1)
        return rgb_map, disp, acc, weights, depth, depth_var, uncert_map

    def render_rays(self, params, key, rays_o, rays_d,
                    target_d: Optional[jnp.ndarray] = None) -> Dict:
        tr = self.config["training"]
        cam = self.config["cam"]
        n_rays = rays_o.shape[0]
        k_pert, k_imp = jax.random.split(key)

        z_vals = R.stratified_z_vals(
            k_pert, n_rays, target_d, cam["near"], cam["far"],
            tr["range_d"], tr["n_range_d"], tr["n_samples_d"],
            perturb=tr["perturb"] > 0)
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
        raw = self.run_network(params, pts)
        (rgb_map, disp, acc, weights, depth, depth_var,
         uncert_map) = self._raw2outputs_active(raw, z_vals)

        ret = {}
        if tr["n_importance"] > 0:
            ret.update(rgb0=rgb_map, disp0=disp, acc0=acc, depth0=depth,
                       depth_var0=depth_var, uncert_map0=uncert_map,
                       weights0=weights)
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = R.sample_pdf(k_imp, z_mid, weights[..., 1:-1],
                                     tr["n_importance"],
                                     det=(tr["perturb"] == 0.0))
            z_samples = jax.lax.stop_gradient(z_samples)
            ret["z_std"] = jnp.std(z_samples, axis=-1)
            z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), -1)
            pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
            raw = self.run_network(params, pts)
            (rgb_map, disp, acc, weights, depth, depth_var,
             uncert_map) = self._raw2outputs_active(raw, z_vals)

        ret.update(rgb=rgb_map, depth=depth, disp_map=disp, acc_map=acc,
                   depth_var=depth_var, uncert_map=uncert_map,
                   weights=weights, sdf=raw[..., 3], z_vals=z_vals, raw=raw)
        return ret

    def forward(self, params, key, rays_o, rays_d, target_rgb, target_d,
                ray_mask: Optional[jnp.ndarray] = None,
                align: Optional[jnp.ndarray] = None,
                rgb_kernel: Optional[float] = None) -> Dict:
        # align: optional per-ray exposure params (ops/frame_align.py),
        # applied to the rendered RGB before the NLL like the base
        # model's photometric loss. rgb_kernel (Huber) is accepted for
        # call-site compatibility but ignored: the heteroscedastic NLL
        # is already outlier-weighted through beta.
        tr = self.config["training"]
        rend = self.render_rays(params, key, rays_o, rays_d, target_d)
        if align is not None:
            rend = {**rend,
                    "rgb": rend["rgb"] * align[..., :3] + align[..., 3:4]}

        td = target_d[..., 0]
        valid_depth = ((td > 0.0)
                       & (td < self.config["cam"]["depth_trunc"])).astype(jnp.float32)
        rm = (ray_mask.astype(jnp.float32) if ray_mask is not None
              else jnp.ones_like(valid_depth))
        rgb_w = jnp.where(valid_depth > 0, 1.0, tr["rgb_missing"])[:, None]

        # Heteroscedastic RGB NLL (beta strictly positive by construction).
        uncert = rend["uncert_map"] + 1e-9
        sq = (rend["rgb"] * rgb_w - target_rgb * rgb_w) ** 2
        if self.config.get("active", {}).get("detach_nll", False):
            # Detached-residual variant: the plain MSE drives
            # color/geometry/pose (identical gradients to the base
            # model), and the NLL trains ONLY the beta head on a
            # stop-gradient residual — the standard heteroscedastic
            # stop-grad trick. Motivation: with the reference NLL
            # (ac_scene_rep.py:365-380) the 1/beta weighting measurably
            # biases pose/map optimization on low-texture scenes (see
            # STATUS.md); beta stays calibrated to the residual scale,
            # so the info-gain selection semantics are unchanged.
            sq_d = jax.lax.stop_gradient(sq)
            # Rebuild the ray uncertainty with detached render weights:
            # the NLL then trains ONLY the beta head (gradients through
            # w would otherwise reach the SDF field).
            w_sg = jax.lax.stop_gradient(rend["weights"])
            unc_sg = jnp.sum(w_sg * w_sg * rend["raw"][..., -1], -1) + 1e-9
            rgb_loss = (L.masked_mean(sq, rm[:, None])
                        + L.masked_mean(sq_d / (2.0 * unc_sg[:, None]),
                                        rm[:, None])
                        + 0.5 * L.masked_mean(jnp.log(unc_sg), rm) + 4.0)
        else:
            rgb_loss = (L.masked_mean(sq / (2.0 * uncert[:, None]),
                                      rm[:, None])
                        + 0.5 * L.masked_mean(jnp.log(uncert), rm) + 4.0)
        psnr = L.mse2psnr(L.masked_mean(sq, rm[:, None]))
        depth_loss = L.compute_loss(rend["depth"], td, mask=valid_depth * rm)

        if "rgb0" in rend:
            rgb_loss = rgb_loss + L.compute_loss(
                rend["rgb0"] * rgb_w, target_rgb * rgb_w, mask=rm[:, None])
            depth_loss = depth_loss + L.compute_loss(
                rend["depth0"], td, mask=valid_depth * rm)

        truncation = tr["trunc"] * self.config["data"]["sc_factor"]
        fs_loss, sdf_loss = L.get_sdf_loss(
            rend["z_vals"], target_d, rend["sdf"], truncation, "l2",
            ray_mask=rm)

        return {"rgb": rend["rgb"], "depth": rend["depth"],
                "uncert_map": rend["uncert_map"], "weights": rend["weights"],
                "raw": rend["raw"],
                "rgb_loss": rgb_loss, "depth_loss": depth_loss,
                "sdf_loss": sdf_loss, "fs_loss": fs_loss, "psnr": psnr}
