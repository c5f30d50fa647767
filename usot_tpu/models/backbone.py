"""Modified ResNet-50 backbone ("ResNet_plus2") in flax/linen, NHWC.

Architectural contract (ref: lib/models/modules.py:61-151):
  * 7x7 stride-2 stem conv with NO padding (VALID), then 3x3/2 maxpool pad 1
  * layer1: 3 bottlenecks, stride 1 (1x1 downsample)
  * layer2: 4 bottlenecks, first stride 2 with 3x3 pad-0 conv2 AND a 3x3
    pad-0 stride-2 downsample (not the canonical 1x1)
  * layer3: 6 bottlenecks, stride 1, dilation 2; the FIRST block runs its
    3x3 at dilation 1 / pad 1 (the reference halves dilation when a
    downsample is present) with a 3x3 pad-1 downsample; remaining blocks
    use dilation 2 / pad 2
  * layer4 unused; output is layer3 (stride 8, 1024 channels)

Spatial sizes: 255 -> 31x31, 127 -> 15x15, 271 -> 33x33.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class _StemKernel(nn.Module):
    """Bare (7,7,3,width) kernel param at the same tree path nn.Conv would
    use (`<parent>/conv/kernel`), so checkpoints/converters are agnostic
    to how the stem is *applied* (direct 7x7/s2 vs space-to-depth)."""
    dtype: Any = jnp.float32
    width: int = 64

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, self.width), jnp.float32)


class StemConvBN(nn.Module):
    """7x7 stride-2 VALID stem conv + BN, with an optional exact
    space-to-depth rewrite for TPU:

        conv7x7/s2(x) == conv4x4/s1(s2d2(pad_to_even(x)), rearrange(w))

    where s2d2 folds 2x2 pixel blocks into 12 channels and rearrange pads
    the kernel 7->8 with zeros (the zero taps are exactly the ones that
    would read the padded row/col, so any pad value is correct). A 3-channel
    NHWC activation tiles its minor dim 3->128 lanes on TPU; the rewrite
    quadruples the useful lane occupancy and removes the strided-window
    overlap, at identical math (same parameter!).
    """
    dtype: Any = jnp.float32
    s2d: bool = False
    width: int = 64

    @nn.compact
    def __call__(self, x, bn_train: bool):
        w = _StemKernel(dtype=self.dtype, width=self.width, name="conv")()
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        dn = ("NHWC", "HWIO", "NHWC")
        if not self.s2d:
            out = jax.lax.conv_general_dilated(
                x, w, window_strides=(2, 2), padding="VALID",
                dimension_numbers=dn)
        else:
            n, h, wd, c = x.shape
            ph, pw = h % 2, wd % 2
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            hh, ww = x.shape[1] // 2, x.shape[2] // 2
            xs = x.reshape(n, hh, 2, ww, 2, c)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh, ww, 4 * c)
            wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
            ws = wp.reshape(4, 2, 4, 2, c, self.width)
            ws = ws.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c,
                                                        self.width)
            out = jax.lax.conv_general_dilated(
                xs, ws, window_strides=(1, 1), padding="VALID",
                dimension_numbers=dn)
        out = nn.BatchNorm(
            use_running_average=not bn_train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn")(out)
        return out


class _ConvKernel(nn.Module):
    """Bare HWIO kernel param at nn.Conv's tree path (`conv/kernel`), so
    checkpoints are agnostic to how the conv is applied (see StemConvBN)."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


def _dilated2_conv_s2b(x, w):
    """3x3 / dilation-2 / pad-2 / stride-1 conv as space-to-batch: split
    H,W into 2x2 phases, run a REGULAR 3x3 pad-1 conv on (4B, H/2, W/2, C)
    phase maps, interleave back. Exact rewrite: each phase's pad-1 zero
    border corresponds precisely to the taps the dilated conv would read
    outside the (zero-padded) input. Measured 1.37x faster than XLA's
    native dilated conv at the layer3 shape (tools/ab_dilated.py)."""
    b, h, wd, c = x.shape
    hp, wp = (h + 1) // 2 * 2, (wd + 1) // 2 * 2
    if (hp, wp) != (h, wd):
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - wd), (0, 0)))
    ph = x.reshape(b, hp // 2, 2, wp // 2, 2, c)
    ph = ph.transpose(2, 4, 0, 1, 3, 5).reshape(4 * b, hp // 2, wp // 2, c)
    y = jax.lax.conv_general_dilated(
        ph, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    co = y.shape[-1]
    y = y.reshape(2, 2, b, hp // 2, wp // 2, co)
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(b, hp, wp, co)
    return y[:, :h, :wd]


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    dtype: Any = jnp.float32
    s2b: bool = False  # exact space-to-batch rewrite of dilation-2 convs

    @nn.compact
    def __call__(self, x, bn_train: bool):
        if (self.s2b and self.dilation == 2 and self.kernel == 3
                and self.stride == 1 and self.padding == 2):
            w = _ConvKernel((3, 3, x.shape[-1], self.features),
                            name="conv")()
            x = _dilated2_conv_s2b(x.astype(self.dtype),
                                   w.astype(self.dtype))
        else:
            if self.s2b:
                # s2b requested but the conv doesn't match the
                # dilation-2/k3/s1/pad-2 pattern the rewrite covers —
                # surface it so a future stage-config change (e.g. a
                # dilation-4 layer4) doesn't silently lose the rewrite.
                import logging
                logging.getLogger(__name__).warning(
                    "ConvBN s2b=True ignored: k=%d s=%d d=%d p=%d is not "
                    "the dilation-2 pattern; using nn.Conv", self.kernel,
                    self.stride, self.dilation, self.padding)
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not bn_train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        return x


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    conv2_padding: int = 1
    conv2_dilation: int = 1
    downsample: bool = False
    downsample_kernel: int = 1
    downsample_padding: int = 0
    dtype: Any = jnp.float32
    s2b: bool = False

    @nn.compact
    def __call__(self, x, bn_train: bool):
        residual = x
        out = ConvBN(self.planes, 1, dtype=self.dtype, name="cb1")(x, bn_train)
        out = nn.relu(out)
        out = ConvBN(
            self.planes, 3, stride=self.stride, padding=self.conv2_padding,
            dilation=self.conv2_dilation, dtype=self.dtype, name="cb2",
            s2b=self.s2b,
        )(out, bn_train)
        out = nn.relu(out)
        out = ConvBN(self.planes * 4, 1, dtype=self.dtype, name="cb3")(out, bn_train)
        if self.downsample:
            residual = ConvBN(
                self.planes * 4, self.downsample_kernel, stride=self.stride,
                padding=self.downsample_padding, dtype=self.dtype,
                name="downsample",
            )(x, bn_train)
        return nn.relu(out + residual)


def _max_pool_3x3_s2_p1(x):
    # torch MaxPool2d(kernel_size=3, stride=2, padding=1): pads with -inf
    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else x.min()
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class ResNetPlus2(nn.Module):
    """Returns layer3 feature (N, H/8, W/8, 1024)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    s2d_stem: bool = False  # exact TPU rewrite of the stem (see StemConvBN)
    s2b_dilated: bool = False  # exact rewrite of layer3's dilated convs
    # Stage width multiplier base (reference ResNet-50: 64). Reduced
    # widths give dev/test-scale models whose checkpoints are small
    # enough to commit as parity fixtures (tests/fixtures/).
    width: int = 64

    def _stage(self, x, planes, blocks, stride, dilation, name, bn_train):
        if dilation > 1:
            # First block halves the dilation (ref modules.py:19-21) and the
            # downsample is 3x3 with padding = dilation//2 (ref :114-126)
            first = Bottleneck(
                planes, stride=stride, conv2_padding=dilation // 2,
                conv2_dilation=dilation // 2, downsample=True,
                downsample_kernel=3, downsample_padding=dilation // 2,
                dtype=self.dtype, name=f"{name}_0",
            )
            rest_pad, rest_dil = dilation, dilation
        elif stride != 1:
            first = Bottleneck(
                planes, stride=stride, conv2_padding=2 - stride,
                downsample=True, downsample_kernel=3, downsample_padding=0,
                dtype=self.dtype, name=f"{name}_0",
            )
            rest_pad, rest_dil = 1, 1
        else:
            first = Bottleneck(
                planes, conv2_padding=1, downsample=True,
                downsample_kernel=1, downsample_padding=0,
                dtype=self.dtype, name=f"{name}_0",
            )
            rest_pad, rest_dil = 1, 1

        x = first(x, bn_train)
        # s2b only rewrites dilation-2 convs; don't request it for the
        # dilation-1 stages (ConvBN warns on inapplicable requests).
        s2b = self.s2b_dilated and rest_dil == 2
        for i in range(1, blocks):
            x = Bottleneck(
                planes, conv2_padding=rest_pad, conv2_dilation=rest_dil,
                dtype=self.dtype, name=f"{name}_{i}", s2b=s2b,
            )(x, bn_train)
        return x

    @nn.compact
    def __call__(self, x, stem_bn_train: bool = False, stage_bn_train: bool = False):
        """x: (N, H, W, 3). BN modes: stem (conv1/bn1) and stages separately,
        mirroring the staged freeze/unfreeze schedule
        (ref: scripts/train_usot.py:72-102)."""
        x = StemConvBN(dtype=self.dtype, s2d=self.s2d_stem,
                       width=self.width, name="stem")(x, stem_bn_train)
        x = nn.relu(x)
        x = _max_pool_3x3_s2_p1(x)
        w = self.width
        x = self._stage(x, w, self.layers[0], 1, 1, "layer1", stage_bn_train)
        x = self._stage(x, w * 2, self.layers[1], 2, 1, "layer2",
                        stage_bn_train)
        x = self._stage(x, w * 4, self.layers[2], 1, 2, "layer3",
                        stage_bn_train)
        return x
