"""Response-map postprocessing: scale/ratio penalties, Hanning window,
argmax decode, size EMA (ref: lib/tracker/usot_tracker.py:133-200).

One implementation, two array backends: pass xp=numpy for the bit-faithful
host parity path (float64, like the reference) or xp=jax.numpy for the
fully on-device fast path (everything folds into the per-frame XLA program).
"""
from __future__ import annotations

import numpy as np


def hanning_window(score_size: int) -> np.ndarray:
    h = np.hanning(score_size)
    return np.outer(h, h)


def _change(r, xp):
    return xp.maximum(r, 1.0 / r)


def _sz(w, h, xp):
    pad = (w + h) * 0.5
    return xp.sqrt((w + pad) * (h + pad))


def postprocess_response(cls_score, cls_memory, bbox_pred, grid_x, grid_y,
                         window, target_pos, target_sz_scaled, scale_z,
                         instance_size, p_ratio, p_penalty_k,
                         p_window_influence, p_lr, xp=np):
    """Decode one frame.

    cls_score: (S, S) sigmoid offline score; cls_memory: (S, S) sigmoid
    online score or None; bbox_pred: (4, S, S) ltrb offsets;
    grid_x/grid_y: (S, S); window: (S, S);
    target_pos: (2,) image coords; target_sz_scaled: (2,) *search-crop*
    scale (target_sz * scale_z); scale_z: scalar.

    Returns (new_pos (2,), new_sz (2,), best_score scalar,
             pred_bbox_crop (4,) [x1,y1,x2,y2] in crop coords).
    """
    if cls_memory is not None:
        cls_score = p_ratio * cls_score + (1 - p_ratio) * cls_memory

    pred_x1 = grid_x - bbox_pred[0]
    pred_y1 = grid_y - bbox_pred[1]
    pred_x2 = grid_x + bbox_pred[2]
    pred_y2 = grid_y + bbox_pred[3]

    w, h = target_sz_scaled[0], target_sz_scaled[1]
    s_c = _change(_sz(pred_x2 - pred_x1, pred_y2 - pred_y1, xp)
                  / _sz(w, h, xp), xp)
    r_c = _change((w / h) / ((pred_x2 - pred_x1) / (pred_y2 - pred_y1)), xp)
    penalty = xp.exp(-(r_c * s_c - 1) * p_penalty_k)
    pscore = penalty * cls_score
    pscore = pscore * (1 - p_window_influence) + window * p_window_influence
    # Robustness: degenerate predictions (inf/inf box ratios) yield NaN
    # cells; exclude them from the argmax (no-op for healthy checkpoints).
    pscore = xp.where(xp.isnan(pscore), -xp.inf, pscore)

    if xp is np:
        r_max, c_max = np.unravel_index(pscore.argmax(), pscore.shape)
    else:
        flat_idx = xp.argmax(pscore)
        r_max = flat_idx // pscore.shape[1]
        c_max = flat_idx % pscore.shape[1]

    bx1 = pred_x1[r_max, c_max]
    by1 = pred_y1[r_max, c_max]
    bx2 = pred_x2[r_max, c_max]
    by2 = pred_y2[r_max, c_max]

    pred_xs = (bx1 + bx2) / 2
    pred_ys = (by1 + by2) / 2
    pred_w = bx2 - bx1
    pred_h = by2 - by1

    diff_xs = (pred_xs - instance_size // 2) / scale_z
    diff_ys = (pred_ys - instance_size // 2) / scale_z
    pred_w = pred_w / scale_z
    pred_h = pred_h / scale_z

    target_sz_img = target_sz_scaled / scale_z

    lr = penalty[r_max, c_max] * cls_score[r_max, c_max] * p_lr

    res_xs = target_pos[0] + diff_xs
    res_ys = target_pos[1] + diff_ys
    res_w = pred_w * lr + (1 - lr) * target_sz_img[0]
    res_h = pred_h * lr + (1 - lr) * target_sz_img[1]

    new_pos = xp.stack([res_xs, res_ys]) if xp is not np else np.array(
        [res_xs, res_ys])
    new_w = target_sz_img[0] * (1 - lr) + lr * res_w
    new_h = target_sz_img[1] * (1 - lr) + lr * res_h
    new_sz = xp.stack([new_w, new_h]) if xp is not np else np.array(
        [new_w, new_h])

    best_score = cls_score[r_max, c_max]
    pred_bbox_crop = xp.stack([bx1, by1, bx2, by2]) if xp is not np else \
        np.array([bx1, by1, bx2, by2])
    return new_pos, new_sz, best_score, pred_bbox_crop
