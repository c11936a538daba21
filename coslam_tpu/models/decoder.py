"""Tiny MLP decoders for SDF + color.

Functional JAX replacement of the reference decoders (reference:
model/decoder.py — SDFNet :57-108, ColorNet :7-55, ColorSDFNet :110-143,
ColorSDFNet_v2 :145-180). The MLPs are bias-free, ReLU-activated, 2
layers by default (80->32->16 and 63->32->3 with the paper config) —
small enough that XLA keeps them entirely in registers/VMEM and fuses
them with the surrounding elementwise work; no hand-written "fully fused
MLP" is needed for these sizes (that was a CUDA-launch-overhead fix).

Parameters are plain pytrees: a list of weight matrices per net.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp


def init_mlp(key, dims: Sequence[int], dtype=jnp.float32) -> List[jnp.ndarray]:
    """Bias-free MLP weights with torch.nn.Linear's default init
    (kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)))."""
    keys = jax.random.split(key, len(dims) - 1)
    ws = []
    for k, d_in, d_out in zip(keys, dims[:-1], dims[1:]):
        bound = 1.0 / (d_in ** 0.5)
        ws.append(jax.random.uniform(k, (d_in, d_out), dtype=dtype,
                                     minval=-bound, maxval=bound))
    return ws


def mlp_apply(ws: Sequence[jnp.ndarray], x: jnp.ndarray,
              compute_dtype=jnp.float32) -> jnp.ndarray:
    """ReLU MLP, no activation on the output layer.

    compute_dtype=bfloat16 streams activations/weights at half width
    (master weights stay f32; every dot accumulates in f32 via
    preferred_element_type, so only the activation stream is rounded).
    Output is always f32."""
    x = x.astype(compute_dtype)
    for w in ws[:-1]:
        x = jax.nn.relu(jnp.dot(x, w.astype(compute_dtype),
                                preferred_element_type=jnp.float32)
                        ).astype(compute_dtype)
    return jnp.dot(x, ws[-1].astype(compute_dtype),
                   preferred_element_type=jnp.float32)


def _decoder_dims(config: Dict) -> Dict:
    dec = config["decoder"]
    return dict(
        geo_feat_dim=dec["geo_feat_dim"],
        hidden_dim=dec["hidden_dim"],
        num_layers=dec["num_layers"],
        hidden_dim_color=dec["hidden_dim_color"],
        num_layers_color=dec["num_layers_color"],
    )


def _layer_dims(in_dim: int, hidden: int, out_dim: int, n_layers: int):
    return [in_dim] + [hidden] * (n_layers - 1) + [out_dim]


class ColorSDFDecoder:
    """One-grid ('v2', reference default) or two-grid color+SDF decoder.

    v2 (one_grid=True): sdf_net([embed, embed_pos]) -> [sdf, geo_feat];
                        color_net([embed_pos, geo_feat]) -> rgb logits.
    two-grid:           color_net([embed_pos, embed_color, geo_feat]).
    Output is [rgb_logits(3), sdf(1)] like the reference forward.
    """

    def __init__(self, config: Dict, input_ch: int, input_ch_pos: int,
                 input_ch_color: int = 0, one_grid: bool = True):
        d = _decoder_dims(config)
        self.one_grid = one_grid
        # decoder.dtype: 'float32' (default) | 'bfloat16' — activation/
        # weight stream width inside the MLPs (f32 accumulation either
        # way; params and outputs stay f32).
        self.compute_dtype = jnp.dtype(
            config["decoder"].get("dtype", "float32"))
        self.geo_feat_dim = d["geo_feat_dim"]
        self.sdf_dims = _layer_dims(input_ch + input_ch_pos, d["hidden_dim"],
                                    1 + d["geo_feat_dim"], d["num_layers"])
        color_in = input_ch_pos + d["geo_feat_dim"]
        if not one_grid:
            color_in += input_ch_color
        self.color_dims = _layer_dims(color_in, d["hidden_dim_color"], 3,
                                      d["num_layers_color"])

    def init(self, key) -> Dict:
        k1, k2 = jax.random.split(key)
        return {
            "sdf_net": init_mlp(k1, self.sdf_dims),
            "color_net": init_mlp(k2, self.color_dims),
        }

    def sdf_net(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        return mlp_apply(params["sdf_net"], x, self.compute_dtype)

    def color_net(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        return mlp_apply(params["color_net"], x, self.compute_dtype)

    def __call__(self, params: Dict, embed: jnp.ndarray,
                 embed_pos: jnp.ndarray, embed_color=None) -> jnp.ndarray:
        h = self.sdf_net(params, jnp.concatenate([embed, embed_pos], axis=-1))
        sdf, geo_feat = h[..., :1], h[..., 1:]
        if self.one_grid:
            cin = jnp.concatenate([embed_pos, geo_feat], axis=-1)
        else:
            cin = jnp.concatenate([embed_pos, embed_color, geo_feat], axis=-1)
        rgb = self.color_net(params, cin)
        return jnp.concatenate([rgb, sdf], axis=-1)
