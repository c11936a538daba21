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
            payload[f"extra_{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **payload)


def load_ckpt(path: str) -> Tuple[object, np.ndarray, Dict[int, np.ndarray]]:
    data = np.load(path, allow_pickle=True)
    treedef = pickle.loads(data["treedef"].tobytes())
    leaves = [data[f"leaf_{i}"] for i in range(int(data["n_leaves"]))]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    est_c2w = data["pose"]
    rel = {int(k): v for k, v in zip(data["pose_rel_keys"],
                                     data["pose_rel_vals"])}
    return params, est_c2w, rel
