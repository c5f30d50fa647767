"""Cost-volume correlation for the flow network.

TPU formulation of the FlowNet-style correlation CUDA op
(ref: preprocessing/flow_module/models/correlation_package/
correlation_cuda_kernel.cu; pure-tensor equivalence proven by the
reference's own correlation_native.py). Shift-and-reduce over a
(2d+1)^2 displacement window — pure XLA, differentiable, NHWC.
"""
from __future__ import annotations

import jax.numpy as jnp


def correlation(x1, x2, max_displacement: int = 4):
    """x1, x2: (B, H, W, C) -> (B, H, W, (2d+1)^2) cost volume.

    out[b, y, x, k] = mean_c x1[b,y,x,c] * x2[b, y+dy, x+dx, c]
    with (dy, dx) the k-th displacement in row-major order and
    zero padding outside. Channel-mean matches the CUDA kernel's
    division by C (corr_multiply=1, kernel_size=1, stride 1).
    """
    b, h, w, c = x1.shape
    d = max_displacement
    x2_pad = jnp.pad(x2, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(2 * d + 1):
        for dx in range(2 * d + 1):
            shifted = x2_pad[:, dy:dy + h, dx:dx + w, :]
            outs.append(jnp.mean(x1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)
