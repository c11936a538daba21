"""ColorSDFNetV3: SDF backbone with separate SDF / uncertainty / feature
heads (reference: ActiveCoSLAM/ac_decoder.py:153-198).

Output per point: [rgb logits (3), sdf (1), beta (1)], with
beta = softplus(uncertainty_head(h)) + beta_min.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..models.decoder import _decoder_dims, _layer_dims, init_mlp, mlp_apply


def _init_linear(key, d_in: int, d_out: int):
    """torch nn.Linear default init (with bias)."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / (d_in ** 0.5)
    return {"w": jax.random.uniform(k1, (d_in, d_out), minval=-bound, maxval=bound),
            "b": jax.random.uniform(k2, (d_out,), minval=-bound, maxval=bound)}


def _linear(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


class ColorSDFNetV3:
    def __init__(self, config: Dict, input_ch: int, input_ch_pos: int,
                 beta_min: float = 1e-4):
        d = _decoder_dims(config)
        a = config.get("active", {})
        self.beta_min = float(a.get("beta_min", beta_min))
        # With detach_nll (the default — see ActiveJointEncoding.forward)
        # the uncertainty head reads a STOP-GRADIENT copy of the trunk
        # features: beta's training signal reaches only
        # uncertainty_linear, never the shared trunk/grid (the leak that
        # remains after detaching the NLL residual, since beta itself is
        # a function of the trunk).
        self.detach_trunk = bool(a.get("detach_nll", True))
        self.geo_feat_dim = d["geo_feat_dim"]
        self.backbone_out = 1 + d["geo_feat_dim"]
        self.sdf_dims = _layer_dims(input_ch + input_ch_pos, d["hidden_dim"],
                                    self.backbone_out, d["num_layers"])
        self.color_dims = _layer_dims(input_ch_pos + self.backbone_out,
                                      d["hidden_dim_color"], 3,
                                      d["num_layers_color"])

    def init(self, key) -> Dict:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        W = self.backbone_out
        return {
            "sdf_net": init_mlp(k1, self.sdf_dims),
            "color_net": init_mlp(k2, self.color_dims),
            "feature_linear": _init_linear(k3, W, W),
            "sdf_linear": _init_linear(k4, W, 1),
            "uncertainty_linear": _init_linear(k5, W, 1),
        }

    def sdf_net(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        """Backbone output h [., W]; callers needing plain SDF should use
        sdf_linear on top (query_sdf does)."""
        return mlp_apply(params["sdf_net"], x)

    def color_net(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        return mlp_apply(params["color_net"], x)

    def __call__(self, params: Dict, embed: jnp.ndarray,
                 embed_pos: jnp.ndarray, embed_color=None) -> jnp.ndarray:
        h = self.sdf_net(params, jnp.concatenate([embed, embed_pos], axis=-1))
        sdf = _linear(params["sdf_linear"], h)
        h_u = jax.lax.stop_gradient(h) if self.detach_trunk else h
        beta = jax.nn.softplus(_linear(params["uncertainty_linear"], h_u)) \
            + self.beta_min
        geo_feat = _linear(params["feature_linear"], h)
        rgb = self.color_net(params,
                             jnp.concatenate([embed_pos, geo_feat], axis=-1))
        return jnp.concatenate([rgb, sdf, beta], axis=-1)
