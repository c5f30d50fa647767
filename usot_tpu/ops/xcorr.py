"""Depthwise cross-correlation between per-sample kernels and search features.

TPU-native equivalent of the reference's grouped-conv trick
(ref: lib/models/connect.py:147-157). Each batch element correlates its own
C-channel kernel with its own search feature map, per channel:

    out[b, i, j, c] = sum_{u,v} x[b, i+u, j+v, c] * k[b, u, v, c]

Two formulations:

* grouped-conv (batch folded into feature groups) — a single conv op;
  fastest at small batch on the current backend (which taxes op count),
  but its compile time explodes once feature_group_count = B*C reaches
  ~8192.

* shift-and-multiply — a static unrolled sum of hk*wk shifted elementwise
  products (<=25 fused VPU ops for the 5x5/3x5/5x3 encoded kernels);
  compile-stable at any batch.

`xcorr_depthwise` picks per-shape: grouped conv while B*C stays under the
measured compile cliff, shift-multiply beyond (see PERF_NOTES.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


_GROUPED_CONV_MAX_GROUPS = 4096  # measured compile cliff ~8192


def xcorr_depthwise(x, kernel):
    """x: (B, Hx, Wx, C); kernel: (B, Hk, Wk, C) -> (B, Ho, Wo, C), VALID."""
    b, c = x.shape[0], x.shape[3]
    if b * c <= _GROUPED_CONV_MAX_GROUPS:
        return xcorr_depthwise_conv(x, kernel)
    return xcorr_depthwise_shift(x, kernel)


def xcorr_depthwise_shift(x, kernel):
    """Unrolled shift-and-multiply formulation."""
    b, hx, wx, c = x.shape
    _, hk, wk, _ = kernel.shape
    ho, wo = hx - hk + 1, wx - wk + 1
    acc = jnp.zeros((b, ho, wo, c), jnp.float32)
    for u in range(hk):
        for v in range(wk):
            acc = acc + x[:, u:u + ho, v:v + wo, :].astype(jnp.float32) \
                * kernel[:, u, v, :].astype(jnp.float32)[:, None, None, :]
    return acc.astype(x.dtype)


def xcorr_depthwise_conv(x, kernel):
    """Grouped-conv formulation (feature_group_count = B*C)."""
    b, hx, wx, c = x.shape
    _, hk, wk, _ = kernel.shape
    x_f = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, hx, wx, b * c)
    k_f = jnp.transpose(kernel, (1, 2, 0, 3)).reshape(hk, wk, 1, b * c)
    out = lax.conv_general_dilated(
        x_f, k_f,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
        preferred_element_type=jnp.float32,
    )
    ho, wo = out.shape[1], out.shape[2]
    out = out.reshape(ho, wo, b, c)
    return jnp.transpose(out, (2, 0, 1, 3)).astype(x.dtype)


# Naive reference for tests (independent formulation)
def xcorr_depthwise_ref(x, kernel):
    import numpy as np

    x = np.asarray(x, np.float64)
    kernel = np.asarray(kernel, np.float64)
    b, hx, wx, c = x.shape
    _, hk, wk, _ = kernel.shape
    ho, wo = hx - hk + 1, wx - wk + 1
    out = np.zeros((b, ho, wo, c))
    for bi in range(b):
        for i in range(ho):
            for j in range(wo):
                patch = x[bi, i:i + hk, j:j + wk, :]
                out[bi, i, j, :] = np.sum(patch * kernel[bi], axis=(0, 1))
    return out
