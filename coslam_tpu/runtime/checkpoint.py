"""Checkpoint save/load: model params + absolute & relative pose tables.

Replaces the reference's torch.save dict checkpoint (reference
coslam.py:112-129) with a numpy .npz of the flattened parameter pytree
plus pose arrays; consumed by mesh culling and ATE tooling the same way.

Writes are ATOMIC (tmp file + rename): a crash mid-write leaves the
previous checkpoint intact instead of a truncated .npz, so `--ckpt auto`
always finds a loadable file. AsyncCheckpointWriter moves the
device->host transfers and the file write off the frame loop's critical
path (the resume checkpoint carries the keyframe ray reservoir — tens
of MB that would otherwise stall every ckpt_every-th frame).

A second backend targets multi-host runs: a path ending in ``.orbax``
writes the SAME payload through orbax.checkpoint (SURVEY §7's
translation-map row for torch.save). orbax coordinates the atomic
directory commit across all JAX processes — on a multi-host pod every
process calls save on the same path and exactly one consistent
checkpoint lands — which a host-local .npz rename cannot do. Select it
with ``training: {ckpt_backend: orbax}`` (the npz stays the default;
single-host artifacts are equivalent).
"""

from __future__ import annotations

import os
import pickle
import threading
from typing import Dict, Tuple

import jax
import numpy as np


def _build_payload(params, est_c2w: np.ndarray,
                   est_c2w_rel: Dict[int, np.ndarray],
                   extra: Dict = None) -> Dict[str, np.ndarray]:
    """Flatten everything into a flat {name: ndarray} dict — the common
    on-disk schema for both the npz and the orbax backend. Pickled
    treedefs ship as uint8 arrays so every value is a plain ndarray."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    payload = {
        "treedef": np.frombuffer(pickle.dumps(treedef), np.uint8),
        "n_leaves": np.int64(len(leaves)),
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
                payload[f"extree_{k}"] = np.frombuffer(
                    pickle.dumps(ktreedef), np.uint8)
                payload[f"exn_{k}"] = np.int64(len(kleaves))
                for i, leaf in enumerate(kleaves):
                    payload[f"exleaf_{k}_{i}"] = np.asarray(leaf)
    return payload


def _parse_payload(data) -> Tuple[object, np.ndarray,
                                  Dict[int, np.ndarray], Dict]:
    """Inverse of _build_payload. ``data`` is any str->ndarray mapping
    with .keys() (an NpzFile or an orbax-restored dict)."""
    treedef = pickle.loads(np.asarray(data["treedef"]).tobytes())
    leaves = [data[f"leaf_{i}"] for i in range(int(data["n_leaves"]))]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    est_c2w = np.asarray(data["pose"])
    rel = {int(k): np.asarray(v) for k, v in zip(data["pose_rel_keys"],
                                                 data["pose_rel_vals"])}
    extra: Dict = {}
    for name in data.keys():
        if name.startswith("extra_"):
            extra[name[len("extra_"):]] = np.asarray(data[name])
        elif name.startswith("extree_"):
            k = name[len("extree_"):]
            ktreedef = pickle.loads(np.asarray(data[name]).tobytes())
            kleaves = [data[f"exleaf_{k}_{i}"]
                       for i in range(int(data[f"exn_{k}"]))]
            extra[k] = jax.tree_util.tree_unflatten(ktreedef, kleaves)
    return params, est_c2w, rel, extra


def save_ckpt(path: str, params, est_c2w: np.ndarray,
              est_c2w_rel: Dict[int, np.ndarray], extra: Dict = None) -> None:
    """``extra`` values may be numpy arrays or pytrees (pytrees are
    flattened like params). Written uncompressed: resume checkpoints
    carry the keyframe ray buffer (tens of MB), and zlib on the
    single-core host would stall the frame loop at every ckpt_every.
    A ``.orbax`` path routes through the orbax backend (module
    docstring)."""
    payload = _build_payload(params, est_c2w, est_c2w_rel, extra)
    path = os.path.abspath(path)
    if path.endswith(".orbax"):
        import orbax.checkpoint as ocp

        ocp.PyTreeCheckpointer().save(path, payload, force=True)
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # explicit handle: savez must not append .npz
        np.savez(f, **payload)
    os.replace(tmp, path)


class SingleFlightWorker:
    """Run thunks on a background thread, at most ONE in flight.

    ``submit`` first joins any previous in-flight job (jobs land in
    submission order and at most one job's buffers are alive); ``wait``
    joins and re-raises any worker exception. The caller owns snapshot
    semantics: JAX device arrays are immutable and can be handed over
    as-is, mutable host state must be copied BEFORE submit.
    """

    def __init__(self, name: str = "bg-worker"):
        self._name = name
        self._thread: threading.Thread = None
        self._exc: BaseException = None

    def submit(self, fn, *args, **kwargs) -> None:
        self.wait()

        def _run():
            try:
                fn(*args, **kwargs)
            except BaseException as e:  # surfaced at the next wait()
                self._exc = e

        self._thread = threading.Thread(target=_run, daemon=True,
                                        name=self._name)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


class AsyncCheckpointWriter(SingleFlightWorker):
    """Background checkpoint writer: the worker thread pays the
    device->host transfers and the file write while the frame loop keeps
    dispatching device work. Combined with save_ckpt's atomic rename, a
    crash at any point leaves the newest COMPLETED checkpoint loadable.
    """

    def __init__(self):
        super().__init__(name="ckpt-writer")

    def submit(self, path: str, params, est_c2w, est_c2w_rel,
               extra: Dict = None) -> None:
        super().submit(save_ckpt, path, params, est_c2w, est_c2w_rel, extra)


def load_ckpt(path: str) -> Tuple[object, np.ndarray, Dict[int, np.ndarray],
                                  Dict]:
    """Returns (params, est_c2w, est_c2w_rel, extra) — ``extra`` holds
    whatever resume state the checkpoint carries (possibly empty for
    slim/legacy checkpoints). Accepts both backends: a directory is an
    orbax checkpoint, a file is the .npz format."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        data = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        return _parse_payload(data)
    return _parse_payload(np.load(path, allow_pickle=True))
