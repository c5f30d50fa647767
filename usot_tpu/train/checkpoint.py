"""Checkpoint save/restore (ref: lib/utils/train_utils.py:74-180).

Format: flax msgpack of {params, batch_stats, opt_state, epoch, arch}.
Files follow the reference naming: checkpoint_e{N}.ckpt under
CHECKPOINT_DIR, saved from epoch >= 5 like the reference's save_model.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(directory: str, state, epoch: int,
                    arch: str = "USOT") -> str:
    os.makedirs(directory, exist_ok=True)
    payload = {
        "epoch": epoch,
        "arch": arch,
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
    }
    path = os.path.join(directory, f"checkpoint_e{epoch}.ckpt")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    return path


def save_model_epoch(directory: str, state, epoch: int,
                     arch: str = "USOT") -> str | None:
    """Reference semantics: only persist from epoch 5 on
    (ref: train_utils.py:82-84)."""
    if epoch < 5:
        return None
    return save_checkpoint(directory, state, epoch, arch)


def peek_epoch(path: str) -> int:
    """Read only the epoch tag of a checkpoint. Used by the resume path
    to rebuild the optimizer with the right freeze stage BEFORE
    deserializing the full state (the opt_state pytree structure differs
    across the UNFIX_EPOCH boundary: frozen params carry MaskedNode,
    unfrozen ones carry momentum buffers)."""
    with open(path, "rb") as f:
        data = f.read()
    return int(serialization.msgpack_restore(data)["epoch"])


def restore_checkpoint(path: str, target_state) -> tuple[Any, int]:
    """Restore into the structure of target_state; returns (state, epoch)."""
    with open(path, "rb") as f:
        data = f.read()
    target = {
        "epoch": 0,
        "arch": "USOT",
        "params": target_state.params,
        "batch_stats": target_state.batch_stats,
        "opt_state": target_state.opt_state,
    }
    restored = serialization.from_bytes(target, data)
    new_state = type(target_state)(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return new_state, int(restored["epoch"])


def load_variables(path: str):
    """Load only {params, batch_stats} for inference, from either our
    .ckpt format or a torch .pth via the converter."""
    if path.endswith((".pth", ".model", ".tar")):
        from usot_tpu.models.convert import load_torch_state_dict, \
            convert_usot_checkpoint
        return convert_usot_checkpoint(load_torch_state_dict(path))
    with open(path, "rb") as f:
        data = f.read()
    restored = serialization.msgpack_restore(data)
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"]}
