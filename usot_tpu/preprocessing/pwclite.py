"""PWCLite optical-flow network (ARFlow) in flax/linen, NHWC.

TPU-native rebuild of the reference flow net
(ref: preprocessing/flow_module/models/pwclite.py): 6-level feature
pyramid, cost-volume correlation (pure-XLA shift-reduce, see
correlation.py), dense/reduce flow estimator, dilated context network,
coarse-to-fine warp loop; 2-frame and 3-frame (fw+bw) modes.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from usot_tpu.preprocessing.correlation import correlation


def leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class ConvL(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((self.kernel - 1) * self.dilation) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad)] * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=True, dtype=self.dtype, name="conv")(x)
        return leaky(x) if self.relu else x


class FeatureExtractor(nn.Module):
    num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 192)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        pyramid = []
        for i, ch in enumerate(self.num_chs[1:]):
            x = ConvL(ch, stride=2, dtype=self.dtype, name=f"level{i}_a")(x)
            x = ConvL(ch, dtype=self.dtype, name=f"level{i}_b")(x)
            pyramid.append(x)
        return pyramid[::-1]


class FlowEstimatorDense(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = jnp.concatenate([ConvL(128, dtype=self.dtype, name="conv1")(x), x], -1)
        x2 = jnp.concatenate([ConvL(128, dtype=self.dtype, name="conv2")(x1), x1], -1)
        x3 = jnp.concatenate([ConvL(96, dtype=self.dtype, name="conv3")(x2), x2], -1)
        x4 = jnp.concatenate([ConvL(64, dtype=self.dtype, name="conv4")(x3), x3], -1)
        x5 = jnp.concatenate([ConvL(32, dtype=self.dtype, name="conv5")(x4), x4], -1)
        flow = ConvL(2, relu=False, dtype=self.dtype, name="conv_last")(x5)
        return x5, flow


class FlowEstimatorReduce(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = ConvL(128, dtype=self.dtype, name="conv1")(x)
        x2 = ConvL(128, dtype=self.dtype, name="conv2")(x1)
        x3 = ConvL(96, dtype=self.dtype, name="conv3")(
            jnp.concatenate([x1, x2], -1))
        x4 = ConvL(64, dtype=self.dtype, name="conv4")(
            jnp.concatenate([x2, x3], -1))
        x5 = ConvL(32, dtype=self.dtype, name="conv5")(
            jnp.concatenate([x3, x4], -1))
        flow = ConvL(2, relu=False, dtype=self.dtype, name="predict_flow")(
            jnp.concatenate([x4, x5], -1))
        return x5, flow


class ContextNetwork(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, (ch, dil) in enumerate([(128, 1), (128, 2), (128, 4), (96, 8),
                                       (64, 16), (32, 1)]):
            x = ConvL(ch, dilation=dil, dtype=self.dtype, name=f"c{i}")(x)
        return ConvL(2, relu=False, dtype=self.dtype, name="c6")(x)


# ---------------------------------------------------------------------------
# Bilinear helpers with align_corners=True semantics (torch grid_sample /
# F.interpolate parity).
# ---------------------------------------------------------------------------

def resize_bilinear_align_corners(x, new_h: int, new_w: int):
    """(B, H, W, C) -> (B, new_h, new_w, C), align_corners=True."""
    b, h, w, c = x.shape

    def axis_coords(n_out, n_in):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    ys = axis_coords(new_h, h)
    xs = axis_coords(new_w, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    fy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    fx = (xs - x0.astype(jnp.float32))[None, None, :, None]

    r0 = x[:, y0, :, :]
    r1 = x[:, y1, :, :]
    p00 = r0[:, :, x0, :]
    p01 = r0[:, :, x1, :]
    p10 = r1[:, :, x0, :]
    p11 = r1[:, :, x1, :]
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def flow_warp(x, flow):
    """Warp x (B,H,W,C) by flow (B,H,W,2) [dx, dy]; bilinear, border pad,
    align_corners=True (ref: flow_utils.py:498-527)."""
    b, h, w, c = x.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = gx[None] + flow[..., 0]
    sy = gy[None] + flow[..., 1]
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)

    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    def gather(yi, xi):
        bidx = jnp.arange(b)[:, None, None]
        return x[bidx, yi, xi, :]

    p00 = gather(y0, x0)
    p01 = gather(y0, x1)
    p10 = gather(y1, x0)
    p11 = gather(y1, x1)
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def resize_flow(flow, new_h: int, new_w: int):
    """Resize a flow field and rescale its vectors (ref: flow_utils.py:487).
    Supports stacked (dx, dy) pairs in the channel dim (4ch 3-frame mode)."""
    b, h, w, c = flow.shape
    out = resize_bilinear_align_corners(flow, new_h, new_w)
    scale = jnp.asarray([new_w / w, new_h / h] * (c // 2), out.dtype)
    return out * scale


class PWCLite(nn.Module):
    """n_frames=2 or 3; upsample outputs 4x to input/4 resolution."""
    n_frames: int = 3
    reduce_dense: bool = True
    upsample: bool = True
    search_range: int = 4
    output_level: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.feature_pyramid_extractor = FeatureExtractor(dtype=self.dtype)
        if self.reduce_dense:
            self.flow_estimators = FlowEstimatorReduce(dtype=self.dtype)
        else:
            self.flow_estimators = FlowEstimatorDense(dtype=self.dtype)
        self.context_networks = ContextNetwork(dtype=self.dtype)
        self.conv_1x1 = [ConvL(32, kernel=1, dtype=self.dtype,
                               name=f"conv1x1_{i}") for i in range(5)]

    def _corr(self, a, b):
        return leaky(correlation(a, b, self.search_range))

    def forward_2_frames(self, x1_pyr, x2_pyr):
        flows = []
        b, h, w, _ = x1_pyr[0].shape
        flow = jnp.zeros((b, h, w, 2), jnp.float32)
        for level, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if level == 0:
                x2_warp = x2
            else:
                flow = resize_flow(flow * 1.0, x1.shape[1], x1.shape[2])
                x2_warp = flow_warp(x2, flow)
            out_corr = self._corr(x1, x2_warp)
            x1_1by1 = self.conv_1x1[level](x1)
            x_intm, flow_res = self.flow_estimators(
                jnp.concatenate([out_corr, x1_1by1, flow], -1))
            flow = flow + flow_res
            flow_fine = self.context_networks(
                jnp.concatenate([x_intm, flow], -1))
            flow = flow + flow_fine
            flows.append(flow)
            if level == self.output_level:
                break
        if self.upsample:
            flows = [resize_flow(f, f.shape[1] * 4, f.shape[2] * 4)
                     for f in flows]
        return flows[::-1]

    def forward_3_frames(self, x0_pyr, x1_pyr, x2_pyr):
        flows = []
        b, h, w, _ = x1_pyr[0].shape
        flow = jnp.zeros((b, h, w, 4), jnp.float32)
        for level, (x0, x1, x2) in enumerate(zip(x0_pyr, x1_pyr, x2_pyr)):
            if level == 0:
                x0_warp, x2_warp = x0, x2
            else:
                flow = resize_flow(flow, x1.shape[1], x1.shape[2])
                x0_warp = flow_warp(x0, flow[..., :2])
                x2_warp = flow_warp(x2, flow[..., 2:])
            corr_10 = self._corr(x1, x0_warp)
            corr_12 = self._corr(x1, x2_warp)
            x1_1by1 = self.conv_1x1[level](x1)
            feat_10 = jnp.concatenate(
                [x1_1by1, corr_10, corr_12, flow[..., :2], -flow[..., 2:]], -1)
            feat_12 = jnp.concatenate(
                [x1_1by1, corr_12, corr_10, flow[..., 2:], -flow[..., :2]], -1)
            x_intm_10, fr_10 = self.flow_estimators(feat_10)
            x_intm_12, fr_12 = self.flow_estimators(feat_12)
            flow = flow + jnp.concatenate([fr_10, fr_12], -1)
            feat_10 = jnp.concatenate(
                [x_intm_10, x_intm_12, flow[..., :2], -flow[..., 2:]], -1)
            feat_12 = jnp.concatenate(
                [x_intm_12, x_intm_10, flow[..., 2:], -flow[..., :2]], -1)
            fr_10 = self.context_networks(feat_10)
            fr_12 = self.context_networks(feat_12)
            flow = flow + jnp.concatenate([fr_10, fr_12], -1)
            flows.append(flow)
            if level == self.output_level:
                break
        if self.upsample:
            flows = [resize_flow(f, f.shape[1] * 4, f.shape[2] * 4)
                     for f in flows]
        flows_10 = [f[..., :2] for f in flows[::-1]]
        flows_12 = [f[..., 2:] for f in flows[::-1]]
        return flows_10, flows_12

    def __call__(self, x, with_bk: bool = False):
        """x: (B, H, W, 3*n_frames) stacked frames."""
        n = x.shape[-1] // 3
        imgs = [x[..., 3 * i: 3 * i + 3] for i in range(n)]
        pyrs = [self.feature_pyramid_extractor(im) + [im] for im in imgs]
        out = {}
        if n == 2:
            out["flows_fw"] = self.forward_2_frames(pyrs[0], pyrs[1])
            if with_bk:
                out["flows_bw"] = self.forward_2_frames(pyrs[1], pyrs[0])
        elif n == 3:
            flows_10, flows_12 = self.forward_3_frames(*pyrs[:3])
            out["flows_fw"], out["flows_bw"] = flows_12, flows_10
        else:
            raise NotImplementedError(f"n_frames={n}")
        return out
