"""Precise RoI Pooling (PrRoIPool) as a separable tent-integral einsum.

TPU-native reformulation of the reference CUDA op
(ref: lib/models/prroi_pool/src/prroi_pooling_gpu_impl.cu:149-212). PrRoIPool
averages the *continuous* bilinear interpolant of a feature map over each
pooling bin. Because the bilinear interpolant is a sum of separable tent
basis functions centered on the integer grid,

    interp(y, x) = sum_{h,w} F[h, w] * tent(y - h) * tent(x - w),

the 2-D integral over an axis-aligned bin factorizes:

    out[ph, pw] = (1 / bin_area) * sum_{h,w} F[h, w] * Iy[ph, h] * Ix[pw, w]
    Ix[pw, w]   = Int_{x0(pw)}^{x1(pw)} tent(x - w) dx   (closed form)

so the whole op becomes two small matmuls (MXU-friendly) instead of a
scatter/atomicAdd kernel, and JAX autodiff yields BOTH the feature gradient
and the RoI-coordinate gradient (the reference ships three hand-written CUDA
kernels for these; ref: lib/models/prroi_pool/src/prroi_pooling_gpu.c:109-113).

Out-of-image tent mass multiplies implicit zeros, matching the CUDA
`PrRoIPoolingGetData` zero-padding semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _tent_antiderivative(s):
    """G(s) = integral of tent(t)=max(0,1-|t|) from -inf to s, shifted so
    G(-1) = -0.5, G(1) = 0.5 (only differences are used)."""
    t = jnp.clip(s, -1.0, 1.0)
    return t - 0.5 * t * jnp.abs(t)


def _axis_integrals(start, end, n_bins: int, size: int):
    """Per-bin integral of each grid tent over [start, end] split in n_bins.

    start, end: (...,) traced scalars (already in feature-grid units).
    Returns (..., n_bins, size) weights: W[..., p, g] = Int over bin p of
    tent(x - g) dx.
    """
    bin_sz = (end - start) / n_bins  # (...,)
    p = jnp.arange(n_bins, dtype=start.dtype)
    lo = start[..., None] + bin_sz[..., None] * p          # (..., P)
    hi = lo + bin_sz[..., None]                            # (..., P)
    g = jnp.arange(size, dtype=start.dtype)                # (G,)
    # (..., P, G)
    return (_tent_antiderivative(hi[..., None] - g)
            - _tent_antiderivative(lo[..., None] - g))


def prroi_pool(features, rois, pooled_height: int = 7, pooled_width: int = 7,
               spatial_scale: float = 1.0):
    """Precise RoI pooling.

    features: (N, H, W, C) NHWC float array.
    rois: (R, 5) float array, each row (batch_index, x1, y1, x2, y2) in
      input coordinates (multiplied by spatial_scale like the reference).
    Returns (R, pooled_height, pooled_width, C).
    """
    N, H, W, C = features.shape
    dtype = features.dtype
    rois = rois.astype(dtype)

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale

    roi_w = jnp.maximum(x2 - x1, 0.0)
    roi_h = jnp.maximum(y2 - y1, 0.0)
    # Integrate over [x1, x1 + roi_w] so degenerate rois keep zero width
    ix = _axis_integrals(x1, x1 + roi_w, pooled_width, W)    # (R, PW, W)
    iy = _axis_integrals(y1, y1 + roi_h, pooled_height, H)   # (R, PH, H)

    f = features[batch_idx]                                  # (R, H, W, C)
    tmp = jnp.einsum("rhwc,rph->rpwc", f, iy)                # (R, PH, W, C)
    out = jnp.einsum("rpwc,rqw->rpqc", tmp, ix)              # (R, PH, PW, C)

    bin_area = (roi_w / pooled_width) * (roi_h / pooled_height)
    safe = jnp.where(bin_area > 0, bin_area, 1.0)
    out = out / safe[:, None, None, None]
    return jnp.where((bin_area > 0)[:, None, None, None], out, 0.0)


def prroi_pool_same_batch(features, boxes, pooled: int = 7,
                          spatial_scale: float = 1.0):
    """Convenience wrapper: one RoI per feature map (the only pattern USOT
    uses; ref: lib/models/models.py:164-171 builds batch_index=arange).

    features: (N, H, W, C); boxes: (N, 4) [x1,y1,x2,y2].
    """
    n = features.shape[0]
    idx = jnp.arange(n, dtype=features.dtype)[:, None]
    rois = jnp.concatenate([idx, boxes.astype(features.dtype)], axis=1)
    return prroi_pool(features, rois, pooled, pooled, spatial_scale)
