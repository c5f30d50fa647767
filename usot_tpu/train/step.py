"""The jitted training step: loss + grads + SGD update + BN stats, with the
reference's loss weighting schedules and NaN/explosion gate
(ref: scripts/train_usot.py:138-273, lib/utils/train_utils.py:8-9).

One XLA program per phase (naive / cycle-memory). Under a data mesh the
batch arrives sharded on 'data'; XLA inserts the gradient all-reduce.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from usot_tpu.models.usot import USOTNet


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def epoch_weights(cfg_train, epoch: int):
    """Resolve (lambda1, lambda_total, cls_ratio) for an epoch
    (ref: train_usot.py:180-229)."""
    shift = cfg_train.CLS_RATIO_SHIFT_EPOCHS
    ratios = cfg_train.CLS_RATIOS
    cls_ratio = None
    for i in range(len(shift) - 1):
        if shift[i] <= epoch <= shift[i + 1]:
            cls_ratio = ratios[i]
            break
    if cls_ratio is None:
        cls_ratio = ratios[-1]

    lshift = cfg_train.LAMBDA_SHIFT_EPOCHS
    l1_list = cfg_train.LAMBDA_1_LIST
    lambda1 = None
    for i in range(len(lshift) - 1):
        if lshift[i] <= epoch <= lshift[i + 1]:
            lambda1 = l1_list[i]
            break
    if lambda1 is None:
        lambda1 = l1_list[-1]
    return lambda1, cfg_train.LAMBDA_TOTAL, cls_ratio


def _images_f32(x):
    """Accept (.., H, W, 3) float images OR the shard-cache transport
    layout — channel-flat (.., H, W*3) uint8 (4x smaller uploads, exact
    TPU tiling; see data/shards.py) — and return (.., H, W, 3) f32."""
    if x.dtype == jnp.uint8:
        x = x.reshape(x.shape[:-1] + (x.shape[-1] // 3, 3))
    return x.astype(jnp.float32)


def make_train_step(model: USOTNet, tx, cycle_memory: bool,
                    stage_bn_train: bool, lambda_1: float,
                    lambda_total: float = 0.9,
                    lambda_1_naive: float = 0.2,
                    remat: bool = False,
                    accum_steps: int = 1):
    """Build the jitted step for one training phase.

    batch dict keys: template, search, label, reg_target, reg_weight,
    template_bbox [, search_memory, search_bbox]. lr and cls_ratio are
    traced scalars so LR changes don't retrace.

    Scale levers (both identical math to the plain step):
    - remat: wrap the loss in jax.checkpoint — backward recomputes the
      forward instead of keeping its activations live, cutting peak HBM
      roughly in half for one extra forward pass. Use when per-chip
      batch is HBM-bound (the cycle-memory phase holds 5 images/sample).
    - accum_steps k>1: split the batch into k microbatches with a
      lax.scan, average the grads, apply ONE optimizer update — k-fold
      larger effective batch at 1/k the activation memory. BN batch
      stats thread through the scan (each microbatch sees the previous
      one's running stats, same as k sequential plain steps). With BN in
      eval mode (stage_bn_train=False) the grads equal the full-batch
      grads exactly; in train mode BN normalizes per microbatch (the
      standard grad-accum semantics). Under a data mesh the microbatch
      split happens on the already-sharded leading axis, so each chip
      scans over its local shard — no extra collectives beyond the
      gradient all-reduce.
    """

    def loss_fn(params, batch_stats, batch, cls_ratio):
        variables = {"params": params, "batch_stats": batch_stats}
        if cycle_memory:
            (l_ori, l_mem, l_reg), mutated = model.apply(
                variables, _images_f32(batch["template"]),
                _images_f32(batch["search"]), batch["label"],
                batch["reg_target"], batch["reg_weight"],
                batch["template_bbox"],
                search_memory=_images_f32(batch["search_memory"]),
                search_bbox=batch["search_bbox"], cls_ratio=cls_ratio,
                stage_bn_train=stage_bn_train,
                method=USOTNet.forward_train, mutable=["batch_stats"])
            loss = (lambda_1 * l_ori + (lambda_total - lambda_1) * l_mem
                    + 1.0 * l_reg)
            metrics = {"cls_loss_ori": l_ori, "cls_loss_memory": l_mem,
                       "reg_loss": l_reg, "loss": loss}
        else:
            (l_ori, _, l_reg), mutated = model.apply(
                variables, _images_f32(batch["template"]),
                _images_f32(batch["search"]), batch["label"],
                batch["reg_target"], batch["reg_weight"],
                batch["template_bbox"], stage_bn_train=stage_bn_train,
                method=USOTNet.forward_train, mutable=["batch_stats"])
            loss = lambda_1_naive * l_ori + 1.0 * l_reg
            metrics = {"cls_loss_ori": l_ori,
                       "cls_loss_memory": jnp.zeros(()),
                       "reg_loss": l_reg, "loss": loss}
        return loss, (mutated["batch_stats"], metrics)

    if remat:
        # Coarse-grain rematerialization: save only the loss inputs,
        # recompute the whole forward during backprop.
        loss_fn = jax.checkpoint(loss_fn)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _grads(params, batch_stats, batch, cls_ratio):
        if accum_steps == 1:
            return grad_fn(params, batch_stats, batch, cls_ratio)

        def split(x):
            b = x.shape[0]
            assert b % accum_steps == 0, (
                f"batch {b} not divisible by accum_steps {accum_steps}")
            return x.reshape((accum_steps, b // accum_steps) + x.shape[1:])

        micro = jax.tree.map(split, batch)
        gzero = jax.tree.map(jnp.zeros_like, params)

        def body(carry, mb):
            stats, gsum, lsum, msum = carry
            (loss, (stats, metrics)), grads = grad_fn(params, stats, mb,
                                                      cls_ratio)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            msum = jax.tree.map(jnp.add, msum, metrics)
            return (stats, gsum, lsum + loss, msum), None

        mzero = {"cls_loss_ori": jnp.zeros(()),
                 "cls_loss_memory": jnp.zeros(()),
                 "reg_loss": jnp.zeros(()), "loss": jnp.zeros(())}
        (new_stats, gsum, lsum, msum), _ = jax.lax.scan(
            body, (batch_stats, gzero, jnp.zeros(()), mzero), micro)
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * inv, gsum)
        metrics = jax.tree.map(lambda m: m * inv, msum)
        return (lsum * inv, (new_stats, metrics)), grads

    @jax.jit
    def step(state: TrainState, batch, lr, cls_ratio):
        (loss, (new_stats, metrics)), grads = _grads(
            state.params, state.batch_stats, batch, cls_ratio)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        # is_valid_number gate: skip the update on NaN/Inf/explosion
        valid = jnp.isfinite(loss) & (loss < 1e4)
        scale = jnp.where(valid, -lr, 0.0)
        new_params = jax.tree.map(lambda p, u: p + scale * u,
                                  state.params, updates)
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(valid, new, old),
            new_opt_state, state.opt_state)
        return TrainState(new_params, new_stats, new_opt_state), metrics

    return step
