"""Checkpoint save/load: model params + absolute & relative pose tables.

Replaces the reference's torch.save dict checkpoint (reference
coslam.py:112-129) with a numpy .npz of the flattened parameter pytree
plus pose arrays; consumed by mesh culling and ATE tooling the same way.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Tuple

import jax
import numpy as np


def save_ckpt(path: str, params, est_c2w: np.ndarray,
              est_c2w_rel: Dict[int, np.ndarray], extra: Dict = None) -> None:
    """``extra`` values may be numpy arrays or pytrees (pytrees are
    flattened like params). Written uncompressed: resume checkpoints
    carry the keyframe ray buffer (tens of MB), and zlib on the
    single-core host would stall the frame loop at every ckpt_every."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    payload = {
        "treedef": pickle.dumps(treedef),
        "n_leaves": len(leaves),
        "pose": np.asarray(est_c2w),
        "pose_rel_keys": np.array(sorted(est_c2w_rel.keys()), np.int64),
        "pose_rel_vals": np.stack(
            [est_c2w_rel[k] for k in sorted(est_c2w_rel.keys())])
        if est_c2w_rel else np.zeros((0, 4, 4), np.float32),
    }
    for i, leaf in enumerate(leaves):
        payload[f"leaf_{i}"] = np.asarray(leaf)
    if extra:
        for k, v in extra.items():
            kleaves, ktreedef = jax.tree_util.tree_flatten(v)
            if len(kleaves) == 1 and kleaves[0] is v:
                payload[f"extra_{k}"] = np.asarray(v)
            else:  # pytree (e.g. optimizer state)
                payload[f"extree_{k}"] = pickle.dumps(ktreedef)
                payload[f"exn_{k}"] = len(kleaves)
                for i, leaf in enumerate(kleaves):
                    payload[f"exleaf_{k}_{i}"] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **payload)


def load_ckpt(path: str) -> Tuple[object, np.ndarray, Dict[int, np.ndarray],
                                  Dict]:
    """Returns (params, est_c2w, est_c2w_rel, extra) — ``extra`` holds
    whatever resume state the checkpoint carries (possibly empty for
    slim/legacy checkpoints)."""
    data = np.load(path, allow_pickle=True)
    treedef = pickle.loads(data["treedef"].tobytes())
    leaves = [data[f"leaf_{i}"] for i in range(int(data["n_leaves"]))]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    est_c2w = data["pose"]
    rel = {int(k): v for k, v in zip(data["pose_rel_keys"],
                                     data["pose_rel_vals"])}
    extra: Dict = {}
    for name in data.files:
        if name.startswith("extra_"):
            extra[name[len("extra_"):]] = data[name]
        elif name.startswith("extree_"):
            k = name[len("extree_"):]
            ktreedef = pickle.loads(data[name].tobytes())
            kleaves = [data[f"exleaf_{k}_{i}"]
                       for i in range(int(data[f"exn_{k}"]))]
            extra[k] = jax.tree_util.tree_unflatten(ktreedef, kleaves)
    return params, est_c2w, rel, extra
