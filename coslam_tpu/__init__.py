"""coslam-tpu: a TPU-native (JAX/XLA/Pallas) dense neural RGB-D SLAM framework.

Re-implements the full capability surface of Co-SLAM (CVPR 2023,
reference: /root/reference) with a TPU-first architecture:

- Joint scene encoding (multiresolution hash grid + OneBlob) and tiny
  SDF/color MLP decoders as pure-functional JAX models (parameters are
  pytrees, all hot paths are `jit`-compiled megasteps).
- Camera tracking and global bundle adjustment as single-dispatch
  `lax.scan` loops over optimization iterations (no per-iteration host
  sync; best-pose selection is carried on device).
- A fixed-shape keyframe ray reservoir living in HBM.
- Mesh extraction via a native C++ marching-cubes library with
  truncation-aware validity semantics (ctypes binding, no CUDA).
- Trajectory (ATE) and reconstruction (Acc/Comp/Ratio/Depth-L1)
  evaluation in pure numpy/scipy.
- Multi-chip scaling over a `jax.sharding.Mesh` (data-parallel ray
  batches; optional 2-device tracker/mapper split).
"""

__version__ = "0.1.0"
