"""Model export: serialize the scene network for external runtimes.

TPU-native counterpart of the reference decoder's ONNX export smoke test
(reference model/decoder.py:182-226, which torch.onnx.export's the
ColorSDFNet on dummy inputs): exports the full query path (parametric
encoding + coordinate encoding + decoders) as a serialized StableHLO
artifact via jax.export. The artifact is runtime-portable (XLA on
CPU/GPU/TPU, IREE, ...) and versioned by StableHLO's compatibility
guarantees — the role ONNX plays for the torch stack.

CLI:
    python -m coslam_tpu.tools.export --config configs/Tum/tum.yaml \
        [--ckpt out/checkpoint.npz] [--out model.stablehlo]

Without --ckpt, freshly initialized parameters are exported (the
reference smoke test also runs on random weights).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def export_query_fn(model, params, batch: int = 4096):
    """Serialize query_color_sdf(params, x[batch, 3]) -> bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fn = jax.jit(lambda p, x: model.query_color_sdf(p, x))
    x_spec = jax.ShapeDtypeStruct((batch, 3), jnp.float32)
    p_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), params)
    exported = jexport.export(fn)(p_spec, x_spec)
    return exported.serialize()


def roundtrip_check(blob: bytes, params, batch: int = 4096):
    """Deserialize and execute the artifact; returns the output array."""
    import jax.numpy as jnp
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    x = jnp.linspace(0.1, 0.9, batch * 3).reshape(batch, 3)
    return exported.call(params, x)


def main(argv=None):
    p = argparse.ArgumentParser(description="export scene network")
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default="model.stablehlo")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--platform", default=None,
                   help="lowering platform (cpu/tpu); default = current "
                        "backend. Use cpu for a portable artifact.")
    args = p.parse_args(argv)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    from ..config import load_config
    from ..models.scene_rep import JointEncoding

    cfg = load_config(args.config)
    bb = np.array(cfg["mapping"]["bound"], np.float32)
    model = JointEncoding(cfg, bb)
    if args.ckpt:
        from ..runtime.checkpoint import load_ckpt

        params, _, _, _ = load_ckpt(args.ckpt)
    else:
        params = model.init_params(jax.random.PRNGKey(0))

    blob = export_query_fn(model, params, batch=args.batch)
    with open(args.out, "wb") as f:
        f.write(blob)
    out = roundtrip_check(blob, params, batch=args.batch)
    print(f"exported {len(blob)/1e6:.2f} MB to {args.out}; "
          f"roundtrip output {tuple(out.shape)} "
          f"finite={bool(np.all(np.isfinite(np.asarray(out))))}")


if __name__ == "__main__":
    main()
