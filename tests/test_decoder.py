"""Decoder MLP tests: shapes, torch-Linear init bounds, and the
bfloat16 compute-stream option (decoder.dtype)."""

import jax
import jax.numpy as jnp
import numpy as np

from coslam_tpu.models.decoder import ColorSDFDecoder, init_mlp, mlp_apply

CFG = {"decoder": {"geo_feat_dim": 15, "hidden_dim": 32, "num_layers": 2,
                   "hidden_dim_color": 32, "num_layers_color": 2}}


def _build(one_grid=True, dtype=None):
    cfg = {"decoder": dict(CFG["decoder"])}
    if dtype:
        cfg["decoder"]["dtype"] = dtype
    dec = ColorSDFDecoder(cfg, input_ch=32, input_ch_pos=48,
                          input_ch_color=16, one_grid=one_grid)
    return dec, dec.init(jax.random.PRNGKey(0))


def test_decoder_shapes_and_dtype():
    dec, params = _build()
    embed = jnp.ones((64, 32)) * 0.1
    pos = jnp.ones((64, 48)) * 0.2
    out = dec(params, embed, pos)
    assert out.shape == (64, 4)
    assert out.dtype == jnp.float32
    # Two-grid variant consumes the color embedding.
    dec2, params2 = _build(one_grid=False)
    out2 = dec2(params2, embed, pos, embed_color=jnp.ones((64, 16)))
    assert out2.shape == (64, 4)


def test_init_matches_torch_linear_bounds():
    ws = init_mlp(jax.random.PRNGKey(1), [48, 32, 16])
    for w, fan_in in zip(ws, [48, 32]):
        bound = 1.0 / np.sqrt(fan_in)
        assert float(jnp.abs(w).max()) <= bound
        assert float(jnp.abs(w).max()) > 0.5 * bound  # actually spread


def test_bf16_stream_close_to_f32():
    """decoder.dtype: bfloat16 rounds only the activation stream; the
    f32-accumulated result stays within bf16 rounding of the f32 path
    and the output dtype stays f32 (master params untouched)."""
    key = jax.random.PRNGKey(2)
    ws = init_mlp(key, [80, 32, 16])
    x = jax.random.normal(jax.random.PRNGKey(3), (256, 80))
    ref = mlp_apply(ws, x)
    bf = mlp_apply(ws, x, jnp.bfloat16)
    assert bf.dtype == jnp.float32
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(bf - ref).max()) < 0.05 * scale

    dec, params = _build(dtype="bfloat16")
    dec32, _ = _build()
    embed = jax.random.normal(jax.random.PRNGKey(4), (128, 32))
    pos = jax.random.normal(jax.random.PRNGKey(5), (128, 48))
    out_bf = dec(params, embed, pos)
    out_32 = dec32(params, embed, pos)
    assert out_bf.dtype == jnp.float32
    err = float(jnp.abs(out_bf - out_32).max())
    assert err < 0.05 * float(jnp.abs(out_32).max() + 1.0)
    # Gradients flow to the f32 master weights.
    g = jax.grad(lambda p: jnp.sum(dec(p, embed, pos) ** 2))(params)
    assert all(w.dtype == jnp.float32 for w in g["sdf_net"])
