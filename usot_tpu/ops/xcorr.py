"""Depthwise cross-correlation between per-sample kernels and search features.

TPU-native equivalent of the reference's grouped-conv trick
(ref: lib/models/connect.py:147-157). Each batch element correlates its own
C-channel kernel with its own search feature map, per channel:

    out[b, i, j, c] = sum_{u,v} x[b, i+u, j+v, c] * k[b, u, v, c]

Implemented as `lax.conv_general_dilated` with batch folded into the feature
dimension and `feature_group_count = B*C` — XLA lowers per-channel
correlations onto the VPU/MXU with no host round trips. NHWC layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def xcorr_depthwise(x, kernel):
    """x: (B, Hx, Wx, C); kernel: (B, Hk, Wk, C) -> (B, Ho, Wo, C), VALID."""
    b, hx, wx, c = x.shape
    _, hk, wk, _ = kernel.shape
    # Fold batch into channels: (1, Hx, Wx, B*C)
    x_f = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, hx, wx, b * c)
    # Kernel HWIO with I=1, O=B*C
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


def xcorr_depthwise_ref(x, kernel):
    """Naive einsum-over-patches reference (for tests / tiny shapes)."""
    b, hx, wx, c = x.shape
    _, hk, wk, _ = kernel.shape
    ho, wo = hx - hk + 1, wx - wk + 1
    out = jnp.zeros((b, ho, wo, c), dtype=jnp.float32)
    for u in range(hk):
        for v in range(wk):
            out = out + x[:, u:u + ho, v:v + wo, :].astype(jnp.float32) \
                * kernel[:, u, v, :].astype(jnp.float32)[:, None, None, :]
    return out.astype(x.dtype)
