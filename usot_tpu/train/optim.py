"""Staged optimizer: SGD + momentum + weight decay with per-group LR
multipliers and backbone freeze/unfreeze (ref: scripts/train_usot.py:72-135).

Groups (by param path):
  frozen   — zeroed updates (backbone before UNFIX_EPOCH; stem always)
  backbone — trainable backbone stages, LR x LAYERS_LR
  base     — neck + head, LR x 1

The base LR itself is passed into the train step each epoch (lr_spaces),
so the optimizer tree never needs rebuilding for LR changes — only at the
UNFIX_EPOCH stage boundary, mirroring the reference.
"""
from __future__ import annotations

import jax
import optax


def label_params(params, unfix: bool, trainable_layers=("layer1", "layer2",
                                                        "layer3")):
    """Assign 'frozen' / 'backbone' / 'base' to every param leaf."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = {}

    def put(path_keys, label):
        node = labels
        for p in path_keys[:-1]:
            node = node.setdefault(p, {})
        node[path_keys[-1]] = label

    for path, _ in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        if keys[0] == "features":
            scope = keys[1]  # 'stem' or 'layerN_i'
            layer = scope.split("_")[0]
            if unfix and layer in trainable_layers:
                put(keys, "backbone")
            else:
                put(keys, "frozen")
        else:
            put(keys, "base")
    return labels


def build_optimizer(params, momentum: float, weight_decay: float,
                    layers_lr_mult: float, unfix: bool,
                    trainable_layers=("layer1", "layer2", "layer3")):
    """Returns (tx, labels). Updates come out *unscaled by lr*; the train
    step multiplies by -lr (torch applies per-group lr after momentum)."""
    labels = label_params(params, unfix, trainable_layers)

    def group(mult):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale(mult),
        )

    tx = optax.multi_transform(
        {
            "frozen": optax.set_to_zero(),
            "backbone": group(layers_lr_mult),
            "base": group(1.0),
        },
        labels,
    )
    return tx, labels
