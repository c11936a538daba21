"""Optimizers matching the reference's torch.optim.Adam param groups.

Reference create_optimizer (coslam.py:610-634): Adam(betas=(0.9, 0.99))
with per-group settings — decoder: lr=lr_decoder, weight_decay=1e-6
(torch-style L2, i.e. wd*param added to the gradient BEFORE the Adam
moments, not decoupled); hash embedding: lr=lr_embed, eps=1e-15.
Pose optimizers (get_pose_param_optim, coslam.py:276-283) are default
Adam (betas (0.9, 0.999), eps 1e-8) with lr_rot / lr_trans groups.
"""

from __future__ import annotations

from typing import Dict

import jax
import optax


def _adam_l2(lr: float, b1: float, b2: float, eps: float,
             weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam with torch-style (coupled) L2 weight decay."""
    chain = []
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain += [optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
              optax.scale(-lr)]
    return optax.chain(*chain)


def make_map_optimizer(config: Dict) -> optax.GradientTransformation:
    """Optimizer for the scene representation (grid + decoder [+ color grid])."""
    m = config["mapping"]
    labels_map = {
        "grid": _adam_l2(m["lr_embed"], 0.9, 0.99, 1e-15),
        "decoder": _adam_l2(m["lr_decoder"], 0.9, 0.99, 1e-8, weight_decay=1e-6),
    }
    if not config["grid"]["oneGrid"]:
        labels_map["grid_color"] = _adam_l2(m.get("lr_embed_color", m["lr_embed"]),
                                            0.9, 0.99, 1e-15)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: path[0].key, params,
            is_leaf=lambda x: False)

    # Label every leaf by its top-level key ('grid' / 'decoder' / 'grid_color').
    def label_tree(params):
        return {k: jax.tree_util.tree_map(lambda _: k, v)
                for k, v in params.items()}

    return optax.multi_transform(labels_map, label_tree)


def make_pose_optimizer(lr_rot: float, lr_trans: float,
                        lr_align: float = None
                        ) -> optax.GradientTransformation:
    """Adam over {'rot': ..., 'trans': ...} with per-group lrs; an
    'align' group (per-frame exposure parameters, ops/frame_align.py)
    joins the BA pose optimization when lr_align is given."""
    groups = {"rot": _adam_l2(lr_rot, 0.9, 0.999, 1e-8),
              "trans": _adam_l2(lr_trans, 0.9, 0.999, 1e-8)}
    labels = {"rot": "rot", "trans": "trans"}
    if lr_align is not None:
        groups["align"] = _adam_l2(lr_align, 0.9, 0.999, 1e-8)
        labels["align"] = "align"
    return optax.multi_transform(groups, labels)
