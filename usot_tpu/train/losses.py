"""Training losses (ref: lib/models/models.py:42-100), as masked pure
functions — the reference's index_select/nonzero gather pattern is replaced
with static-shape masked means (XLA-friendly; no dynamic shapes)."""
from __future__ import annotations

import jax.numpy as jnp


def _bce_with_logits(logits, labels):
    """Numerically-stable elementwise BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def _masked_mean(values, mask):
    count = jnp.sum(mask)
    return jnp.sum(values * mask) / jnp.maximum(count, 1.0)


def weighted_bce(pred_logits, label):
    """0.5 * mean(BCE | label==1) + 0.5 * mean(BCE | label==0).

    pred_logits and label broadcast to the same shape; label in {0, 1}
    (0.5 "ignore" cells, possible with rNeg>0, fall in neither mask —
    matching the reference's eq(1)/eq(0) selection).
    """
    pred = pred_logits.reshape(-1).astype(jnp.float32)
    lab = label.reshape(-1).astype(jnp.float32)
    elt = _bce_with_logits(pred, lab)
    pos = (lab == 1.0).astype(jnp.float32)
    neg = (lab == 0.0).astype(jnp.float32)
    return 0.5 * _masked_mean(elt, pos) + 0.5 * _masked_mean(elt, neg)


def iou_loss(bbox_pred, reg_target, reg_weight):
    """Mean -log(IoU) over positive cells.

    bbox_pred: (B, H, W, 4) ltrb offsets (positive distances).
    reg_target: (B, H, W, 4); reg_weight: (B, H, W) in {0,1}.
    """
    pred = bbox_pred.reshape(-1, 4).astype(jnp.float32)
    target = reg_target.reshape(-1, 4).astype(jnp.float32)
    w = reg_weight.reshape(-1).astype(jnp.float32)

    pl, pt, pr, pb = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 3]
    tl, tt, tr, tb = target[:, 0], target[:, 1], target[:, 2], target[:, 3]

    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)
    w_inter = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    h_inter = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    inter = w_inter * h_inter
    union = target_area + pred_area - inter
    # Masked-out cells carry negative ltrb targets; the reference gathers
    # positives before the log and never evaluates them. Select a safe
    # ratio there (NaN * 0 would otherwise poison the masked mean).
    ratio = (inter + 1.0) / (union + 1.0)
    safe_ratio = jnp.where(w > 0, ratio, 1.0)
    losses = -jnp.log(jnp.maximum(safe_ratio, 1e-10))
    return _masked_mean(losses, w)
