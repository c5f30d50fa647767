"""SiamFC-style subwindow cropping.

Two implementations with identical geometry:

* `get_subwindow` — host-side NumPy/cv2, matching the reference tracker
  crop bit-for-bit (ref: lib/utils/track_utils.py:30-119). Used in the
  parity tracking mode and for checkpoint-level A/B validation.

* `subwindow_jax` — fully in-graph JAX gather-resize: a bilinear sampler
  whose source window has a *dynamic* center and size but a static output
  size, so one compiled program serves every frame of a video. Out-of-image
  samples read the per-channel mean. This is the fast-path crop used by the
  scan-over-video tracker (the whole per-frame step lives on device).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def get_subwindow(im, pos, model_sz, original_sz, avg_chans, target_sz=None,
                  need_bbox=False):
    """Crop a square `original_sz` window centered at `pos`, pad with
    avg_chans where the window leaves the image, resize to `model_sz`.

    Returns (patch_hwc_uint8_or_float, crop_info dict).
    """
    import cv2

    crop_info = {}
    if isinstance(pos, float):
        pos = [pos, pos]

    sz = original_sz
    im_sz = im.shape
    c = (original_sz + 1) / 2
    context_xmin = round(pos[0] - c)
    context_xmax = context_xmin + sz - 1
    context_ymin = round(pos[1] - c)
    context_ymax = context_ymin + sz - 1
    left_pad = int(max(0.0, -context_xmin))
    top_pad = int(max(0.0, -context_ymin))
    right_pad = int(max(0.0, context_xmax - im_sz[1] + 1))
    bottom_pad = int(max(0.0, context_ymax - im_sz[0] + 1))

    context_xmin += left_pad
    context_xmax += left_pad
    context_ymin += top_pad
    context_ymax += top_pad

    r, cc, k = im.shape
    if any([top_pad, bottom_pad, left_pad, right_pad]):
        te_im = np.zeros((r + top_pad + bottom_pad, cc + left_pad + right_pad, k),
                         np.uint8)
        te_im[top_pad:top_pad + r, left_pad:left_pad + cc, :] = im
        if top_pad:
            te_im[0:top_pad, left_pad:left_pad + cc, :] = avg_chans
        if bottom_pad:
            te_im[r + top_pad:, left_pad:left_pad + cc, :] = avg_chans
        if left_pad:
            te_im[:, 0:left_pad, :] = avg_chans
        if right_pad:
            te_im[:, cc + left_pad:, :] = avg_chans
        im_patch_original = te_im[int(context_ymin):int(context_ymax + 1),
                                  int(context_xmin):int(context_xmax + 1), :]
    else:
        im_patch_original = im[int(context_ymin):int(context_ymax + 1),
                               int(context_xmin):int(context_xmax + 1), :]

    if not np.array_equal(model_sz, original_sz):
        im_patch = cv2.resize(im_patch_original, (model_sz, model_sz))
    else:
        im_patch = im_patch_original

    if target_sz is not None:
        target_xmin = round(pos[0] - target_sz[0] / 2)
        target_xmax = round(pos[0] + target_sz[0] / 2)
        target_ymin = round(pos[1] - target_sz[1] / 2)
        target_ymax = round(pos[1] + target_sz[1] / 2)
        crop_info["original_image_bbox"] = [target_xmin, target_ymin,
                                            target_xmax, target_ymax]
        if need_bbox:
            patch_sz = im_patch_original.shape[0]
            x_slope = patch_sz / (context_xmax - context_xmin)
            y_slope = patch_sz / (context_ymax - context_ymin)
            target_xmin_after = left_pad - 1 + x_slope * (target_xmin - context_xmin)
            target_xmax_after = left_pad - 1 + x_slope * (target_xmax - context_xmin)
            target_ymin_after = top_pad - 1 + y_slope * (target_ymin - context_ymin)
            target_ymax_after = top_pad - 1 + y_slope * (target_ymax - context_ymin)
            scale_resize = im_patch.shape[0] / patch_sz
            crop_info["template_bbox"] = [
                scale_resize * target_xmin_after,
                scale_resize * target_ymin_after,
                scale_resize * target_xmax_after,
                scale_resize * target_ymax_after,
            ]

    crop_info["crop_cords"] = [context_xmin, context_xmax, context_ymin, context_ymax]
    crop_info["pad_info"] = [top_pad, left_pad, r, cc]
    return im_patch, crop_info


# ---------------------------------------------------------------------------
# In-graph crop: dynamic window, static output, bilinear, mean-padding.
# ---------------------------------------------------------------------------

def subwindow_jax(im, pos_x, pos_y, original_sz, avg_chans, model_sz: int,
                  valid_h=None, valid_w=None, channels: int | None = None):
    """Bilinear gather-resize crop of `im`. Returns (model_sz, model_sz, C)
    float32.

    im is (H, W, C) — or, on the fast path, channel-flattened (H, W*C)
    with `channels=C`. The flat form matters on TPU: a (H, W, 3) array's
    minor dim pads 3 -> 128 lanes in the tiled HBM layout (a 42x memory
    and transfer blowup), while (H, W*3) tiles exactly. uint8 input is
    fine — gathered rows are cast to f32 after the (cheap) row gather.

    pos_{x,y} and original_sz are traced scalars (float32); model_sz is a
    static int. Geometry matches `get_subwindow`: the source window is the
    square [context_min, context_min + original_sz - 1] with
    context_min = round(pos - (original_sz + 1)/2), resized with the
    cv2 INTER_LINEAR pixel-center convention
    (src = (dst + 0.5) * scale - 0.5). Out-of-image taps read avg_chans.

    valid_h/valid_w (traced, optional) restrict the valid image region to a
    sub-rectangle of the canvas (batched multi-resolution tracking pads
    frames to a common canvas).
    """
    if im.ndim == 2:
        if channels is None:
            raise ValueError("flat (H, W*C) input requires channels=")
        C = channels
        H, W = im.shape[0], im.shape[1] // C
    else:
        H, W, C = im.shape
    vh = H if valid_h is None else valid_h
    vw = W if valid_w is None else valid_w
    sz = jnp.round(original_sz)
    cxt_xmin = jnp.round(pos_x - (original_sz + 1.0) / 2.0)
    cxt_ymin = jnp.round(pos_y - (original_sz + 1.0) / 2.0)

    scale = sz / float(model_sz)
    d = (jnp.arange(model_sz, dtype=jnp.float32) + 0.5) * scale - 0.5
    src_x = cxt_xmin + d  # (model_sz,)
    src_y = cxt_ymin + d

    def sample_axis(coord, size, valid_size):
        c0 = jnp.floor(coord)
        frac = coord - c0
        i0 = c0.astype(jnp.int32)
        i1 = i0 + 1
        valid0 = (i0 >= 0) & (i0 < valid_size)
        valid1 = (i1 >= 0) & (i1 < valid_size)
        return (jnp.clip(i0, 0, size - 1), jnp.clip(i1, 0, size - 1),
                frac, valid0, valid1)

    x0, x1, fx, vx0, vx1 = sample_axis(src_x, W, vw)
    y0, y1, fy, vy0, vy1 = sample_axis(src_y, H, vh)

    avg = jnp.asarray(avg_chans, jnp.float32).reshape(1, 1, -1)

    def gather_rows(yi, vy):
        # (model_sz, W, C) rows with invalid rows replaced by avg
        if im.ndim == 2:
            rows = im[yi, :].reshape(model_sz, W, C)
        else:
            rows = im[yi, :, :]
        return jnp.where(vy[:, None, None], rows.astype(jnp.float32), avg)

    r0 = gather_rows(y0, vy0)
    r1 = gather_rows(y1, vy1)

    def gather_cols(rows, xi, vx):
        cols = rows[:, xi, :]
        return jnp.where(vx[None, :, None], cols, avg)

    p00 = gather_cols(r0, x0, vx0)
    p01 = gather_cols(r0, x1, vx1)
    p10 = gather_cols(r1, x0, vx0)
    p11 = gather_cols(r1, x1, vx1)

    fx_ = fx[None, :, None]
    fy_ = fy[:, None, None]
    top = p00 * (1 - fx_) + p01 * fx_
    bot = p10 * (1 - fx_) + p11 * fx_
    return top * (1 - fy_) + bot * fy_


def subwindow_matmul(im, pos_x, pos_y, original_sz, avg_chans,
                     model_sz: int, valid_h=None, valid_w=None,
                     channels: int = 3):
    """`subwindow_jax` re-expressed as two dynamic sparse matmuls (MXU).

    Identical geometry/semantics to subwindow_jax (same source-coordinate
    formula, avg padding outside the valid region), but the bilinear
    gather becomes:

        out = Ry @ im @ Rx^T + avg * (1 - sy (x) sx)

    where Ry (S, H) / Rx (S, W) hold the two bilinear taps per output
    row/col (zeroed outside the valid region) and sy/sx are their row
    sums. The avg-fallback separates exactly because a tap is invalid
    iff its y OR x index is outside: the valid-tap weight mass factors
    as sy*sx. Gathers are slow on the VPU; dense dynamic weight
    matrices ride the MXU instead (measured 3.6 -> ~1 ms at B=32).

    im: (H, W*C) channel-flat uint8/float. Returns (S, S, C) f32.
    """
    C = channels
    H, W = im.shape[0], im.shape[1] // C
    vh = jnp.asarray(H if valid_h is None else valid_h, jnp.float32)
    vw = jnp.asarray(W if valid_w is None else valid_w, jnp.float32)
    sz = jnp.round(original_sz)
    cxt_xmin = jnp.round(pos_x - (original_sz + 1.0) / 2.0)
    cxt_ymin = jnp.round(pos_y - (original_sz + 1.0) / 2.0)

    scale = sz / float(model_sz)
    d = (jnp.arange(model_sz, dtype=jnp.float32) + 0.5) * scale - 0.5

    def weights(cxt_min, size, valid_size):
        src = cxt_min + d                      # (S,)
        i0 = jnp.floor(src)
        frac = src - i0
        grid = jnp.arange(size, dtype=jnp.float32)[None, :]  # (1, N)
        t0 = jnp.where((i0 >= 0) & (i0 < valid_size),
                       1.0 - frac, 0.0)[:, None]
        t1 = jnp.where((i0 + 1 >= 0) & (i0 + 1 < valid_size),
                       frac, 0.0)[:, None]
        R = t0 * (grid == i0[:, None]) + t1 * (grid == i0[:, None] + 1.0)
        return R.astype(jnp.float32)           # (S, N)

    Ry = weights(cxt_ymin, H, vh)
    Rx = weights(cxt_xmin, W, vw)
    sy = jnp.sum(Ry, axis=1)                   # (S,)
    sx = jnp.sum(Rx, axis=1)

    # Raised precision: the platform's default matmul precision is bf16,
    # which costs ~0.5/255 pixel error — visible drift in the tracker.
    # HIGHEST matches the gather to 3e-5; HIGH (3-pass) to ~2e-3 px-value.
    prec = jax.lax.Precision.HIGHEST
    rows = jnp.matmul(Ry, im.astype(jnp.float32),
                      precision=prec)                        # (S, W*C)
    rows = rows.reshape(model_sz, W, C)
    # contract the W axis on the MXU: (S, W, C) x (S, W) -> (S, S, C)
    cols = jax.lax.dot_general(
        rows, Rx, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32)    # (S, C, S2)
    out = jnp.transpose(cols, (0, 2, 1))       # (S, S2, C)

    avg = jnp.asarray(avg_chans, jnp.float32).reshape(1, 1, C)
    miss = 1.0 - sy[:, None, None] * sx[None, :, None]
    return out + avg * miss


def template_bbox_in_crop(pos_x, pos_y, target_w, target_h, original_sz,
                          model_sz: int, xp=np):
    """Image-axis target bbox mapped into crop coordinates.

    Mirrors the `template_bbox` computed by get_subwindow(need_bbox=True)
    for the in-image (pad-free) case; with padding the reference expresses
    coordinates on the padded image, which this affine form also matches
    because left/top pads cancel. xp=np or jnp.
    """
    c = (original_sz + 1.0) / 2.0
    cxt_xmin = xp.round(pos_x - c)
    cxt_ymin = xp.round(pos_y - c)
    # patch size before resize is exactly original_sz; slope uses sz-1 span
    slope = original_sz / (original_sz - 1.0)
    scale_resize = model_sz / original_sz

    tx1 = xp.round(pos_x - target_w / 2.0)
    tx2 = xp.round(pos_x + target_w / 2.0)
    ty1 = xp.round(pos_y - target_h / 2.0)
    ty2 = xp.round(pos_y + target_h / 2.0)

    bx1 = scale_resize * (-1.0 + slope * (tx1 - cxt_xmin))
    bx2 = scale_resize * (-1.0 + slope * (tx2 - cxt_xmin))
    by1 = scale_resize * (-1.0 + slope * (ty1 - cxt_ymin))
    by2 = scale_resize * (-1.0 + slope * (ty2 - cxt_ymin))
    return bx1, by1, bx2, by2
