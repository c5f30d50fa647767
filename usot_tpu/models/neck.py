"""AdjustLayer neck: 1x1 channel reduction + BN, with template cropping
either by fixed center-crop or by PrRoIPooling the pseudo-bbox
(ref: lib/models/connect.py:284-314)."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from usot_tpu.ops.prroi import prroi_pool_same_batch


class AdjustLayer(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bn_train: bool = False, crop: bool = False,
                 pr_pool: bool = True, bbox=None):
        x_ori = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x_ori = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x_ori)
        if not crop:
            return x_ori
        if pr_pool:
            assert bbox is not None
            xf = prroi_pool_same_batch(x_ori, bbox, pooled=7, spatial_scale=1.0)
        else:
            xf = x_ori[:, 4:-4, 4:-4, :]
        return x_ori, xf
